"""Loop-based golden table extractor.

Mirrors the reference's deterministic coordinate-based table pipeline:

- table-region detection over word layouts
  (/root/reference/services/spatial_preprocessor.py:465-556): lines
  with >= 3 words whose x0 spacings are all within +/-10 of their mean
  (``has_regular_spacing`` :510-528), grouped while the vertical gap
  to the previous candidate line is <= 20 px (:487-506); regions need
  >= 2 lines; headers = the first line's word texts (:548)
- header-anchored column boundaries
  (/root/reference/services/coordinate_table_extractor.py:70-129):
  single-word headers match EVERY word with equal stripped text in the
  region (so a cell repeating the header text widens its extent —
  reference behaviour, kept bug-for-bug); multi-word headers match the
  first consecutive word window with equal joined text and y-range <=
  5 (:131-154); boundaries at midpoints of adjacent header centers,
  first column starts at 0, last extends to +inf
- row grouping by center_y with anchored tolerance 5 (:156-186),
  header row excluded when |y - header_row_y| < 5 (:52), words
  assigned to the column whose [left, right) contains center_x with
  closest-header-center fallback (:205-224), cell text = x0-sorted
  join, empty rows dropped (:58)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

from ..config import (
    REGULAR_SPACING_TOL,
    ROW_Y_TOL,
    TABLE_MIN_COLS,
    TABLE_MIN_ROWS,
    TABLE_ROW_GAP,
)
from .spatial import Word, center_x, group_lines, keep_word, reading_order


def center_y(w: Word) -> float:
    return (w[2] + w[4]) / 2.0


def has_regular_spacing(x_positions: Sequence[float],
                        tol: float = REGULAR_SPACING_TOL) -> bool:
    """spatial_preprocessor.py:510-528."""
    if len(x_positions) < 3:
        return False
    gaps = [x_positions[i + 1] - x_positions[i] for i in range(len(x_positions) - 1)]
    mean = sum(gaps) / len(gaps)
    return all(abs(g - mean) <= tol for g in gaps)


def identify_table_regions(words: Sequence[Word]) -> List[Dict[str, Any]]:
    """spatial_preprocessor.py:465-508 + create_table_region :530-556."""
    kept = [w for w in words if keep_word(w[0])]
    lines = group_lines(kept)
    candidates = [
        ln for ln in lines
        if len(ln) >= TABLE_MIN_COLS and has_regular_spacing([w[1] for w in ln])
    ]
    regions: List[List[List[Word]]] = []
    if candidates:
        cur = [candidates[0]]
        for ln in candidates[1:]:
            prev_y1 = max(w[4] for w in cur[-1])
            cur_y0 = min(w[2] for w in ln)
            if cur_y0 - prev_y1 <= TABLE_ROW_GAP:
                cur.append(ln)
            else:
                if len(cur) >= TABLE_MIN_ROWS:
                    regions.append(cur)
                cur = [ln]
        if len(cur) >= TABLE_MIN_ROWS:
            regions.append(cur)
    out = []
    for reg in regions:
        allw = [w for ln in reg for w in ln]
        out.append(
            {
                "bbox": [
                    min(w[1] for w in allw),
                    min(w[2] for w in allw),
                    max(w[3] for w in allw),
                    max(w[4] for w in allw),
                ],
                "headers": [w[0] for w in reg[0]],
                "row_count": len(reg),
                "column_count": len(reg[0]),
            }
        )
    return out


def find_header_words(header: str, words: Sequence[Word],
                      tol: float = ROW_Y_TOL) -> List[Word]:
    """coordinate_table_extractor.py:131-154."""
    parts = header.split()
    if len(parts) == 1:
        return [w for w in words if w[0].strip() == header.strip()]
    k = len(parts)
    for i in range(len(words) - k + 1):
        window = list(words[i:i + k])
        if " ".join(w[0] for w in window).strip() == header.strip():
            ys = [center_y(w) for w in window]
            if max(ys) - min(ys) <= tol:
                return window
    return []


def establish_boundaries(headers: Sequence[str], words: Sequence[Word]):
    """coordinate_table_extractor.py:70-129. Returns list of
    (header, left_x, right_x, header_center) sorted by center."""
    positions = []
    for h in headers:
        hw = find_header_words(h, words)
        if hw:
            left = min(w[1] for w in hw)
            right = max(w[3] for w in hw)
            positions.append((h, (left + right) / 2.0))
    if not positions:
        return []
    positions.sort(key=lambda p: p[1])
    bounds = []
    for i, (h, c) in enumerate(positions):
        left = 0.0 if i == 0 else (positions[i - 1][1] + c) / 2.0
        right = (
            float("inf")
            if i == len(positions) - 1
            else (c + positions[i + 1][1]) / 2.0
        )
        bounds.append((h, left, right, c))
    return bounds


def group_rows(words: Sequence[Word], tol: float = ROW_Y_TOL):
    """coordinate_table_extractor.py:156-186: anchored center_y rows,
    words x-sorted (by center_x) within each row."""
    if not words:
        return []
    swords = sorted(words, key=center_y)
    rows: List[Tuple[List[Word], float]] = []
    cur = [swords[0]]
    anchor = center_y(swords[0])
    for w in swords[1:]:
        if abs(center_y(w) - anchor) <= tol:
            cur.append(w)
        else:
            rows.append((sorted(cur, key=center_x), anchor))
            cur = [w]
            anchor = center_y(w)
    rows.append((sorted(cur, key=center_x), anchor))
    return rows


def header_row_y(headers: Sequence[str], words: Sequence[Word]) -> Optional[float]:
    """coordinate_table_extractor.py:188-194."""
    for h in headers:
        hw = find_header_words(h, words)
        if hw:
            return sum(center_y(w) for w in hw) / len(hw)
    return None


def extract_table(headers: Sequence[str], words: Sequence[Word],
                  region: Optional[Dict] = None) -> List[Dict[str, Optional[str]]]:
    """coordinate_table_extractor.py:20-61 + :196-236."""
    if not headers or not words:
        return []
    if region:
        y_min = region.get("y_min", 0)
        y_max = region.get("y_max", float("inf"))
        words = [w for w in words if y_min <= center_y(w) <= y_max]
    bounds = establish_boundaries(headers, words)
    if not bounds:
        return []
    rows = group_rows(words)
    hy = header_row_y(headers, words)
    out = []
    for row_words, y_center in rows:
        if hy is not None and abs(y_center - hy) < ROW_Y_TOL:
            continue
        if not row_words:
            continue
        groups: Dict[str, List[Word]] = {h: [] for h, *_ in bounds}
        for w in row_words:
            cxv = center_x(w)
            col = None
            for h, left, right, _c in bounds:
                if left <= cxv < right:
                    col = h
                    break
            if col is None:
                col = min(bounds, key=lambda b: abs(b[3] - cxv))[0]
            groups[col].append(w)
        row: Dict[str, Optional[str]] = {}
        for h, *_ in bounds:
            g = groups[h]
            if g:
                text = " ".join(w[0] for w in sorted(g, key=lambda x: x[1])).strip()
                row[h] = text if text else None
            else:
                row[h] = None
        if any(v for v in row.values()):
            out.append(row)
    return out


def extract_doc_tables(words: Sequence[Word]):
    """Engine flow: detect regions, then run the coordinate extractor
    against each region's y-range with the region's first-line texts as
    headers. Returns a list of
    {headers: [str], columns: [str], rows: [[str|None]]} where
    ``columns`` is the boundary (x-sorted, matched-only) header order
    and each row lists cell values in that order.

    Words are put into reading order first — the reference's
    word_coordinates arrive that way from the scan (pdf_processor.py:81)
    and the multi-word header window match depends on it."""
    kept = reading_order([w for w in words if keep_word(w[0])])
    tables = []
    for region in identify_table_regions(kept):
        region_words = [
            w
            for w in kept
            if region["bbox"][1] <= center_y(w) <= region["bbox"][3]
        ]
        bounds = establish_boundaries(region["headers"], region_words)
        rows = extract_table(
            region["headers"],
            kept,
            {"y_min": region["bbox"][1], "y_max": region["bbox"][3]},
        )
        columns = [b[0] for b in bounds]
        tables.append(
            {
                "headers": list(region["headers"]),
                "columns": columns,
                "rows": [[r[c] for c in columns] for r in rows],
            }
        )
    return tables
