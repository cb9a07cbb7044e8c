"""Vectorized Arrow-batch layout-reflow kernel.

Implements the reference's spatial pipeline
(/root/reference/services/spatial_preprocessor.py) for EVERY document
in a batch simultaneously, with NumPy/pandas primitives only — no
per-word Python in the hot path (the north rule). The loop-based
oracle (oracle/spatial.py) defines the semantics; pytest asserts exact
agreement.

Vectorization notes
-------------------
- reading order: one global ``np.lexsort`` keyed (doc, y0, x0)
- anchored line grouping (y-tol 5.0, spatial_preprocessor.py:184-223):
  the "compare against the line's first word" recurrence is resolved
  with frontier jumps — each iteration advances ALL documents one line
  via a single ``np.searchsorted`` on a doc-offset y array, so the
  Python loop length is max-lines-per-doc (~dozens), not word count
- proximity clustering (:255-296): per-line mean gap via
  ``np.add.reduceat``, break flags + cumsum
- field classification (:298-390): pandas vectorized str/regex ops on
  cluster texts; title-case rule on word-level flags reduced per
  cluster (exactly the reference's per-word test)
- multiline consume (:49-85): the sequential "i += 2" recurrence is a
  parity pattern within runs of consumable lines — closed form via
  anchor index + parity, fully vectorized
- cross-line pairing (:129-182): pandas merge of field clusters to the
  next line's value clusters, min |Δcenter| <= 50 with first-min
  tie-break reproduced by a stable sort on (distance, cluster index)
"""

from __future__ import annotations

import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from ..config import (
    ALLCAPS_VALUE_MAXLEN,
    CLUSTER_GAP_MULT,
    CLUSTER_SEP,
    COMMON_FIELDS,
    EMPTY_SENTINEL,
    FIELD_ENDINGS,
    FIELD_KEYWORDS,
    LAST_WORD_FIELDS,
    LINE_Y_TOL,
    PAIR_DIST_TOL,
    TITLE_CASE_RATIO,
    VALUE_ALIGN_TOL,
)

_DOC_STRIDE = 1.0e6  # >> page_height + tolerances; keeps docs disjoint

_KW_RE = re.compile("|".join(map(re.escape, FIELD_KEYWORDS)))
_END_RE = re.compile("(?:" + "|".join(map(re.escape, FIELD_ENDINGS)) + ")$")
_COMMON_RE = re.compile("|".join(map(re.escape, COMMON_FIELDS)))
_DATE_RE = re.compile(r"^\d{1,2}/\d{1,2}/\d{4}")
_PHONE_RE = re.compile(r"^\d{3}-\d{3}-\d{4}")
_SSN_RE = re.compile(r"^\d{3}-\d{2}-\d{4}")
_NUMCH_RE = re.compile(r"[.,\-/]")


def _is_obvious_value(s: pd.Series) -> np.ndarray:
    """Vectorized is_obvious_value_pattern (spatial_preprocessor.py:349-390)."""
    t = s.str.strip()
    low = t.str.lower()
    single = (t.str.len() == 1) & t.str.isalpha()
    pure_num = t.str.replace(_NUMCH_RE, "", regex=True).str.isdigit().fillna(False)
    curr = t.str.startswith("$") | t.str.endswith("%")
    date = t.str.contains(_DATE_RE, regex=True)
    phone = t.str.contains(_PHONE_RE, regex=True)
    ssn = t.str.contains(_SSN_RE, regex=True)
    kw = low.str.contains(_KW_RE, regex=True)
    caps = t.str.isupper() & (t.str.len() <= ALLCAPS_VALUE_MAXLEN) & ~kw
    return (single | pure_num | curr | date | phone | ssn | caps).to_numpy()


def _joined_text_rules(joined: pd.Series) -> Tuple[np.ndarray, ...]:
    """Rules evaluated on the space-joined cluster text: obvious-value
    veto, keyword substring, ending match, common-field substring,
    last-word match."""
    low = joined.str.lower()
    obvious = _is_obvious_value(joined)
    kw = low.str.contains(_KW_RE, regex=True).to_numpy()
    end = low.str.contains(_END_RE, regex=True).to_numpy()
    common = low.str.contains(_COMMON_RE, regex=True).to_numpy()
    last = (
        low.str.rsplit(" ", n=1).str[-1].isin(LAST_WORD_FIELDS).to_numpy()
    )
    return obvious, kw, end, common, last


def _word_is_field(texts: pd.Series) -> np.ndarray:
    """Single-word is_field_pattern (title-case rule needs >=2 words so
    it never fires)."""
    obvious, kw, end, common, last = _joined_text_rules(texts)
    return ~obvious & (kw | end | common | last)


def _segment_starts(sorted_ids: np.ndarray) -> np.ndarray:
    """Offsets of each run start in a sorted id array (incl. 0)."""
    if len(sorted_ids) == 0:
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(np.r_[True, sorted_ids[1:] != sorted_ids[:-1]])


def _anchored_lines(yk: np.ndarray, seg_starts: np.ndarray,
                    seg_ends: np.ndarray, tol: float) -> np.ndarray:
    """Anchored sessionization: given a globally non-decreasing keyed
    array ``yk`` (y0 + doc-ordinal stride) and per-doc [start, end)
    ranges, return a boolean line-start mask replicating
    group_words_into_lines's "new line when y0 - first_of_line.y0 >
    tol" recurrence. Python loop length == max lines per doc."""
    n = len(yk)
    starts = np.zeros(n, dtype=bool)
    frontier = seg_starts.copy()
    ends = seg_ends
    active = frontier < ends
    while active.any():
        f = frontier[active]
        starts[f] = True
        nxt = np.searchsorted(yk, yk[f] + tol, side="right")
        frontier[active] = nxt
        active = frontier < ends
    return starts


def reflow_batch(
    doc_words: Sequence[Optional[Sequence[Tuple[str, float, float, float, float]]]]
):
    """Reflow a batch of word-lists.

    Args:
        doc_words: per document, a sequence of (text, x0, y0, x1, y1)
            or None (undecodable envelope).

    Returns:
        list per document of (label, line_text) tuples — same contract
        as oracle.spatial.reflow; None entries stay None.
    """
    n_docs = len(doc_words)
    flat_t: List[str] = []
    flat_coord: List[Tuple[float, float, float, float]] = []
    flat_d: List[int] = []
    for di, words in enumerate(doc_words):
        if not words:
            continue
        for w in words:
            flat_t.append(w[0])
            flat_coord.append((w[1], w[2], w[3], w[4]))
            flat_d.append(di)
    results: List[Optional[List[Tuple[str, str]]]] = [
        None if doc_words[i] is None else [] for i in range(n_docs)
    ]
    if not flat_t:
        return results

    t = pd.Series(flat_t, dtype="object")
    coord = np.asarray(flat_coord, dtype=np.float64)
    d = np.asarray(flat_d, dtype=np.int64)

    # F1: drop whitespace-only words (pdf_processor.py:61-62)
    keep = (t.str.strip().str.len() > 0).to_numpy()
    t, coord, d = t[keep].reset_index(drop=True), coord[keep], d[keep]
    if len(t) == 0:
        return results
    x0, y0, x1 = coord[:, 0], coord[:, 1], coord[:, 2]
    cx = (x0 + x1) / 2.0

    # reading order: (doc, y0, x0) — pdf_processor.py:81
    order = np.lexsort((x0, y0, d))
    t = t.iloc[order].reset_index(drop=True)
    x0, y0, x1, cx, d = x0[order], y0[order], x1[order], cx[order], d[order]

    n = len(t)
    seg_starts = _segment_starts(d)
    seg_ends = np.r_[seg_starts[1:], n]
    doc_ord = np.cumsum(np.r_[False, d[1:] != d[:-1]])  # dense 0..k-1

    # W1: anchored line grouping at y-tol 5.0
    yk = y0 + doc_ord * _DOC_STRIDE
    line_start = _anchored_lines(yk, seg_starts, seg_ends, LINE_Y_TOL)
    line_id = np.cumsum(line_start) - 1

    # in-line stable x sort (spatial_preprocessor.py:211)
    order2 = np.lexsort((np.arange(n), x0, line_id))
    t = t.iloc[order2].reset_index(drop=True)
    x0, y0, x1, cx, d = x0[order2], y0[order2], x1[order2], cx[order2], d[order2]
    line_id = line_id[order2]
    doc_ord = doc_ord[order2]

    line_starts_idx = _segment_starts(line_id)
    n_lines = len(line_starts_idx)
    line_ends_idx = np.r_[line_starts_idx[1:], n]
    line_len = line_ends_idx - line_starts_idx
    line_doc = doc_ord[line_starts_idx]

    # W2/A2: per-line mean gap, threshold 2.0x, cluster breaks
    same_line = np.r_[False, line_id[1:] == line_id[:-1]]
    gap = np.r_[0.0, x0[1:] - x1[:-1]]
    gap_sum = np.add.reduceat(np.where(same_line, gap, 0.0), line_starts_idx)
    n_gaps = np.maximum(line_len - 1, 1)
    thr_line = (gap_sum / n_gaps) * CLUSTER_GAP_MULT
    thr_word = thr_line[line_id]  # line_id is dense 0..n_lines-1
    cluster_start = ~same_line | (gap > thr_word)
    cluster_id = np.cumsum(cluster_start) - 1

    cl_starts = _segment_starts(cluster_id)
    n_clusters = len(cl_starts)
    cl_ends = np.r_[cl_starts[1:], n]
    cl_len = cl_ends - cl_starts
    cl_line = line_id[cl_starts]

    # cluster text + mean word-center (spatial_preprocessor.py:156-157)
    cl_text = t.groupby(cluster_id).agg(" ".join)
    cl_text = pd.Series(cl_text.to_numpy(), dtype="object")
    cl_cx = np.add.reduceat(cx, cl_starts) / cl_len

    # cluster-level field classification
    obvious, kw, end, common, last = _joined_text_rules(cl_text)
    w_title = (
        t.str.len().gt(0)
        & t.str[0].str.isupper().fillna(False)
        & ~t.str.isupper().fillna(False)
    ).to_numpy()
    n_title = np.add.reduceat(w_title.astype(np.int64), cl_starts)
    title = (cl_len >= 2) & (n_title >= cl_len * TITLE_CASE_RATIO)
    cl_is_field = ~obvious & (kw | end | title | common | last)

    # word-level field flags -> line_has_field_words (:87-96)
    w_field = np.asarray(_word_is_field(t), dtype=bool)
    line_hf = np.bitwise_or.reduceat(w_field, line_starts_idx)

    # 30px alignment gate (:98-127): any field word of line i within 30
    # of any word of line i+1 (same doc). Next-line word centers are
    # searched via one searchsorted on a line-offset-keyed center array.
    next_line_exists = np.r_[line_doc[1:] == line_doc[:-1], False]
    cxsort = np.lexsort((cx, line_id))
    cx_by_line = cx[cxsort]
    ck = cx_by_line + line_id[cxsort] * _DOC_STRIDE
    consume_gate = np.zeros(n_lines, dtype=bool)
    # reference checks ALL words of the field line against the next
    # line's words (spatial_preprocessor.py:113-124), not only the
    # field-classified ones
    q_mask = line_hf[line_id] & next_line_exists[line_id]
    if q_mask.any():
        q_cx = cx[q_mask]
        q_next_line = line_id[q_mask] + 1
        q_lo = np.searchsorted(ck, q_cx - VALUE_ALIGN_TOL + q_next_line * _DOC_STRIDE, side="left")
        q_hi = np.searchsorted(ck, q_cx + VALUE_ALIGN_TOL + q_next_line * _DOC_STRIDE, side="right")
        hits = q_hi > q_lo
        np.logical_or.at(consume_gate, line_id[q_mask][hits], True)

    # W5 consume recurrence -> closed-form parity (see module docstring)
    c = line_hf & consume_gate  # line i consumes line i+1 IF processed
    doc_first = np.r_[True, line_doc[1:] != line_doc[:-1]]
    lidx = np.arange(n_lines)
    # anchor positions: doc starts, and i+1 for every c[i]==False
    anchor = np.where(doc_first, lidx, np.where(np.r_[True, ~c[:-1]], lidx, -1))
    anchor = np.maximum.accumulate(anchor)
    processed = ((lidx - anchor) % 2) == 0

    # ---- formatting -------------------------------------------------
    # Per-cluster "next cluster on same line" (J1, :392-420)
    nxt_same = np.r_[cl_line[1:] == cl_line[:-1], False]
    nxt_text = np.concatenate([cl_text.to_numpy()[1:], np.array([""], dtype=object)])
    nxt_is_field = np.r_[cl_is_field[1:], False]

    cl_line_hf = line_hf[cl_line]
    cl_processed = processed[cl_line]

    parts = cl_text.to_numpy().copy()

    # plain-line branch (line has NO field words): field clusters pair
    # with the next cluster (:225-253)
    plain_field = cl_is_field & ~cl_line_hf & cl_processed
    if plain_field.any():
        val = np.where(nxt_same & ~nxt_is_field, nxt_text, EMPTY_SENTINEL)
        idxs = np.flatnonzero(plain_field)
        parts[idxs] = (
            pd.Series(parts[idxs]).str.cat(val[idxs], sep=":\t").to_numpy()
        )

    # field-line branch (J2, :129-182): pair vs NEXT LINE's clusters
    field_rows = np.flatnonzero(cl_is_field & cl_line_hf & cl_processed
                                & next_line_exists[cl_line])
    if len(field_rows):
        fdf = pd.DataFrame(
            {"fc": field_rows, "vline": cl_line[field_rows] + 1,
             "fcx": cl_cx[field_rows]}
        )
        vdf = pd.DataFrame(
            {"vline": cl_line, "vc": np.arange(n_clusters),
             "vcx": cl_cx, "vfield": cl_is_field,
             "vtext": cl_text.to_numpy()}
        )
        m = fdf.merge(vdf, on="vline", how="inner")
        m = m[(~m["vfield"]) & ((m["fcx"] - m["vcx"]).abs() <= PAIR_DIST_TOL)]
        if len(m):
            m["dist"] = (m["fcx"] - m["vcx"]).abs()
            m = m.sort_values(["fc", "dist", "vc"], kind="stable")
            best = m.drop_duplicates("fc", keep="first").set_index("fc")["vtext"]
        else:
            best = pd.Series(dtype="object")
        vals = pd.Series(
            np.full(len(field_rows), EMPTY_SENTINEL, dtype=object),
            index=field_rows,
        )
        vals.update(best)
        parts[field_rows] = (
            pd.Series(parts[field_rows]).str.cat(vals.to_numpy(), sep=":\t").to_numpy()
        )
    # field clusters on a field line with NO next line -> [EMPTY]
    lone = cl_is_field & cl_line_hf & cl_processed & ~next_line_exists[cl_line]
    if lone.any():
        idxs = np.flatnonzero(lone)
        parts[idxs] = pd.Series(parts[idxs]).str.cat(
            np.full(len(idxs), EMPTY_SENTINEL), sep=":\t"
        ).to_numpy()

    # join clusters -> line text (4-space separator, :253/:182)
    line_df = pd.DataFrame({"line": cl_line, "part": parts})
    line_text = line_df.groupby("line")["part"].agg(CLUSTER_SEP.join)
    line_text = line_text.reindex(np.arange(n_lines), fill_value="").to_numpy()

    # emission: processed lines; non-field lines only if non-blank (:81-82)
    blank = pd.Series(line_text).str.strip().str.len().eq(0).to_numpy()
    emit = processed & (line_hf | ~blank)
    labels = np.where(line_hf, "fields", "text")

    emit_idx = np.flatnonzero(emit)
    for li in emit_idx:
        results[int(d[line_starts_idx[li]])].append((labels[li], line_text[li]))
    return results
