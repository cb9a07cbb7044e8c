"""Golden-oracle parquet tables for the driver's DuckDB correctness
gate (VERDICT r1 item 2).

The pytest suite already pins the vectorized kernels byte-for-byte to
the loop-based oracle (pdfextraction_spark/oracle/). This module runs
that SAME oracle over a fixture tier and writes its outputs as plain
parquet, so the driver's DuckDB side can check the Spark queries with
``SELECT ... FROM read_parquet('<golden>')`` — turning the extraction
family from rows-only checks into real row/schema/value-hash checks.

Array-valued outputs are serialized to scalar strings with the same
conventions the Spark queries use (the driver canonicalizer cannot
hash list cells):

- spans:            "label:start:end" joined by "|"
- headers/columns:  joined by US (\\x1f)
- cells:            joined by US; NUL (\\x00) marks a missing cell
- int lists/maps:   joined by ","  (rows_by_turn as "turn:count")

Cache is keyed by FIXTURE_VERSION + GOLDEN_VERSION: bump
GOLDEN_VERSION whenever golden derivation changes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from fixtures.generate import FIXTURE_VERSION, gen_transcripts, golden_frame

GOLDEN_VERSION = 11  # v11: + template propagation golden (r6 item 8)

SPAN_SEP = "|"
US = "\x1f"
NUL = "\x00"


def _ser_spans(spans) -> str:
    return SPAN_SEP.join(f"{d['label']}:{d['start']}:{d['end']}" for d in spans)


def _ser_cells(cells) -> str:
    return US.join(NUL if c is None else c for c in cells)


def _turns_golden(df: pd.DataFrame) -> pd.DataFrame:
    g = golden_frame(df)
    g["spans"] = [_ser_spans(s) for s in g["spans"]]
    g = g.merge(df[["conv_id", "turn_idx", "role", "ts"]],
                on=["conv_id", "turn_idx"], how="left")
    return pd.DataFrame(
        {
            "conv_id": g["conv_id"].astype(str),
            "turn_idx": g["turn_idx"].astype(np.int32),
            "role": g["role"].astype(str),
            "ts": g["ts"].astype("datetime64[us]"),
            "payload_kind": g["payload_kind"].astype(str),
            "extracted_text": g["extracted_text"].astype(str),
            "spans": g["spans"].astype(str),
            "blocks_kept": g["blocks_kept"].astype(np.int32),
            "blocks_dropped": g["blocks_dropped"].astype(np.int32),
            "parse_failed": g["parse_failed"].astype(bool),
        }
    )


def _pdf_docs(df: pd.DataFrame):
    """(conv_id, turn_idx, words) for every decodable pdf_layout turn."""
    from pdfextraction_spark.payload import (
        KIND_PDF,
        decode_pdf_envelope,
        detect_kind,
    )

    for conv_id, turn_idx, text in zip(df["conv_id"], df["turn_idx"], df["text"]):
        if detect_kind(text) != KIND_PDF:
            continue
        words = decode_pdf_envelope(text)
        if words is None:
            continue
        yield str(conv_id), int(turn_idx), words


def _tables_golden(df: pd.DataFrame) -> pd.DataFrame:
    from pdfextraction_spark.oracle.tables import extract_doc_tables

    rows = []
    for conv_id, turn_idx, words in _pdf_docs(df):
        for ti, tab in enumerate(extract_doc_tables(words)):
            headers = US.join(tab["headers"])
            columns = US.join(tab["columns"])
            for ri, cells in enumerate(tab["rows"]):
                rows.append((conv_id, turn_idx, ti, headers, columns, ri,
                             _ser_cells(cells)))
    out = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "table_idx", "headers", "columns",
                 "row_idx", "cells"],
    )
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    out["table_idx"] = out["table_idx"].astype(np.int32)
    out["row_idx"] = out["row_idx"].astype(np.int32)
    return out


def _spacing_golden(df: pd.DataFrame) -> pd.DataFrame:
    from pdfextraction_spark.oracle.spatial import spacing_stats

    rows = [
        (conv_id, turn_idx, *spacing_stats(words))
        for conv_id, turn_idx, words in _pdf_docs(df)
    ]
    out = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "avg_spacing", "median_spacing",
                 "spacing_std"],
    )
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    return out


def _merge_golden(turns_golden: pd.DataFrame) -> pd.DataFrame:
    from pdfextraction_spark.oracle.mergeops import (
        merge_conversation_fields_golden,
    )

    merged = merge_conversation_fields_golden(
        zip(turns_golden["conv_id"], turns_golden["turn_idx"],
            turns_golden["extracted_text"])
    )
    out = pd.DataFrame(
        merged,
        columns=["conv_id", "field", "value", "source_turn",
                 "conflict_detected", "n_occurrences"],
    )
    out["source_turn"] = out["source_turn"].astype(np.int32)
    out["n_occurrences"] = out["n_occurrences"].astype(np.int64)
    out["conflict_detected"] = out["conflict_detected"].astype(bool)
    return out


def _fence_golden(df: pd.DataFrame) -> pd.DataFrame:
    from pdfextraction_spark.oracle.mergeops import parse_fence_golden

    rows = []
    for conv_id, turn_idx, text in zip(df["conv_id"], df["turn_idx"], df["text"]):
        r = parse_fence_golden(text)
        if r is None:
            continue
        rows.append((str(conv_id), int(turn_idx), r[0], r[1], r[2]))
    out = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "status", "count", "n_items"]
    )
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    out["count"] = out["count"].astype("Int32")
    out["n_items"] = out["n_items"].astype("Int32")
    return out


def _table_merge_golden(tables_golden: pd.DataFrame) -> pd.DataFrame:
    from pdfextraction_spark.oracle.mergeops import (
        merge_conversation_tables_golden,
    )

    grouped = (
        tables_golden.groupby(
            ["conv_id", "turn_idx", "table_idx", "headers"], sort=False
        )
        .size()
        .reset_index(name="n_rows")
    )
    merged = merge_conversation_tables_golden(
        (r.conv_id, int(r.turn_idx), int(r.table_idx),
         r.headers, int(r.n_rows))
        for r in grouped.itertuples()
    )
    out = pd.DataFrame(
        [
            (
                m["conv_id"],
                m["headers"],
                m["total_rows"],
                ",".join(str(t) for t in m["source_turns"]),
                ",".join(f"{t}:{c}" for t, c in m["rows_by_turn"].items()),
                m["spans_multiple_turns"],
            )
            for m in merged
        ],
        columns=["conv_id", "headers", "total_rows", "source_turns",
                 "rows_by_turn", "spans_multiple_turns"],
    )
    out["total_rows"] = out["total_rows"].astype(np.int64)
    return out


# step-2 schema payload samples (engine contract: values are strings
# or null; no '='/',' in names; duplicate names dedup last-wins, the
# dict-comprehension policy of the reference normalizers). Shared
# input for the Spark normalizer query and the loop-oracle golden.
SCHEMA_SAMPLES = [
    (0, '{"Employee Name": "Jane Q", "Emp Id": "77001"}'),
    (1, '{"Status": null, "Department": "R&D"}'),
    (2, '{}'),
    (3, '["Employee Name", "Emp Id", "Hire Date"]'),
    (4, '[]'),
    (5, '[{"field_name": "Emp Id"}, {"field_name": "Status"}]'),
    (6, '[{"field_name": "Emp Id", "estimated_value": "ignored"}]'),
    (7, '[{"label": "Emp Id", "estimated_value": "77001"}, '
        '{"label": "Status"}]'),
    (8, '[{"label": "Pay Group", "estimated_value": null}]'),
    (9, '"just a string"'),
    (10, '42'),
    (11, '{"Emp Id": "77001"'),     # malformed
    (12, '[{"neither": "shape"}]'),  # objects without field_name/label
    (13, '[1, 2]'),                  # array of non-strings
    (14, '  [ "Spaced Name" ]'),     # leading whitespace
    (15, '[{"field_name": null, "label": "Emp Id"}]'),  # null name -> label shape
    (16, '[{"field_name": "A"}, {"field_name": null}]'),  # null mid-array -> Field_i
    (17, '["Emp Id", "Emp Id"]'),    # duplicate names -> one entry
    (18, '{"Emp Id": "1", "Emp Id": "2"}'),  # duplicate dict keys -> last wins
    (19, '[{"label": "A", "estimated_value": "1"}, '
         '{"label": "A", "estimated_value": "2"}]'),  # last value wins
    (20, '[{"field_name": "Field_1"}, {"field_name": null}]'),  # fallback collides
]


def _schema_norm_golden() -> pd.DataFrame:
    from pdfextraction_spark.oracle.mergeops import (
        normalized_schema_str_golden,
    )

    out = pd.DataFrame(
        [(sid, normalized_schema_str_golden(p)) for sid, p in SCHEMA_SAMPLES],
        columns=["sample_id", "normalized"],
    )
    out["sample_id"] = out["sample_id"].astype(np.int32)
    return out


def _final_json_golden(turns_golden: pd.DataFrame,
                       tables_golden: pd.DataFrame,
                       merge_golden: pd.DataFrame) -> pd.DataFrame:
    """Golden per-conversation final JSON (result_merger.py:168-210),
    assembled in plain Python with the same canonical ordering as the
    Spark operator (sorted field names; tables by headers signature;
    rows by (turn, table, row))."""
    import json
    import re

    fields_by_conv: dict = {}
    for r in merge_golden.itertuples():
        fields_by_conv.setdefault(r.conv_id, {})[r.field] = r.value
    tables_by_conv: dict = {}
    for r in tables_golden.itertuples():
        cells = [None if c == NUL else c for c in r.cells.split(US)]
        key = (r.conv_id, r.headers)
        tables_by_conv.setdefault(key, []).append(
            (int(r.turn_idx), int(r.table_idx), int(r.row_idx), cells)
        )
    rows = []
    for conv_id, grp in turns_golden.groupby("conv_id", sort=True):
        total_turns = int(len(grp))
        failed = int(grp["parse_failed"].sum())
        fields = dict(sorted(fields_by_conv.get(conv_id, {}).items()))
        tables = []
        # sort by the SPLIT headers tuple (element-wise), matching the
        # Spark operator's array_sort over the headers ARRAY — sorting
        # the US-joined string would diverge whenever a header contains
        # a character below 0x1f (e.g. a decoded tab)
        sigs = sorted(
            (h for (c, h) in tables_by_conv if c == conv_id),
            key=lambda h: tuple(h.split(US)),
        )
        for h in sigs:
            trows = sorted(tables_by_conv[(conv_id, h)])
            tables.append(
                {
                    "headers": h.split(US),
                    "data": [t[3] for t in trows],
                    "total_rows": len(trows),
                }
            )
        obj = {
            "extracted_fields": fields,
            "extracted_tables": tables,
            "processing_summary": {
                "total_fields": len(fields),
                "total_tables": len(tables),
                "total_table_rows": sum(t["total_rows"] for t in tables),
                "total_turns": total_turns,
                "successful_turns": total_turns - failed,
                "failed_turns": failed,
            },
        }
        s = json.dumps(obj, separators=(",", ":"), ensure_ascii=False)
        # Jackson (Spark to_json) writes control-char escapes with
        # UPPERCASE hex (\\u001F); json.dumps writes lowercase —
        # normalize so byte equality holds for control-char payloads.
        # The alternation consumes '\\\\' (an escaped literal
        # backslash) first, left-to-right, so data that merely LOOKS
        # like an escape (literal backslash + 'u001f') is never
        # uppercased — only real control-char escapes match
        s = re.sub(
            r"\\\\|\\u00([0-9a-f]{2})",
            lambda m: m.group(0) if m.group(1) is None
            else "\\u00" + m.group(1).upper(),
            s,
        )
        rows.append((conv_id, s))
    return pd.DataFrame(rows, columns=["conv_id", "final_json"])


def _anomalies_golden(merge_golden: pd.DataFrame,
                      tables_golden: pd.DataFrame) -> pd.DataFrame:
    """Typed anomaly records (result_merger.py:212-244): field
    conflicts from the merge golden + multi-turn row-structure
    inconsistencies from the tables golden — plain Python, no operator
    code paths."""
    rows = []
    for r in merge_golden.itertuples():
        if r.conflict_detected:
            rows.append((
                r.conv_id, "field_conflict", r.field,
                "Multiple different values found across turns",
                f"resolved to longest value; occurrences={r.n_occurrences}",
            ))
    by_table: dict = {}
    for r in tables_golden.itertuples():
        filled = sum(c != NUL for c in r.cells.split(US))
        turns, counts = by_table.setdefault((r.conv_id, r.headers),
                                            (set(), set()))
        turns.add(int(r.turn_idx))
        counts.add(filled)
    for (conv_id, headers), (turns, counts) in sorted(by_table.items()):
        if len(turns) > 1 and len(counts) > 1:
            rows.append((
                conv_id, "inconsistent_row_structure", headers,
                "Inconsistent row structure across turns",
                "row cell counts vary: ["
                + ", ".join(str(c) for c in sorted(counts)) + "]",
            ))
    return pd.DataFrame(
        rows,
        columns=["conv_id", "anomaly_type", "subject", "issue", "detail"],
    )


def _corrections_golden(turns_golden: pd.DataFrame,
                        merge_golden: pd.DataFrame) -> pd.DataFrame:
    """Corrections overlay golden (app.py:822 precedence): the same
    deterministic overrides fixture_corrections derives, applied over
    the merge golden in plain Python."""
    import re

    corr = {}
    for c in sorted(set(turns_golden["conv_id"])):
        n = int(re.sub(r"\D", "", c))
        if n % 5 == 0:
            corr[(c, "Employee Name")] = f"Validated Name {n}"
        if n % 10 == 0:
            corr[(c, "Reviewer Note")] = f"reviewed-{n}"
    rows, seen = [], set()
    for r in merge_golden.itertuples():
        key = (r.conv_id, r.field)
        seen.add(key)
        if key in corr:
            rows.append((r.conv_id, r.field, corr[key], "validated",
                         r.value, int(r.source_turn),
                         bool(r.conflict_detected)))
        else:
            rows.append((r.conv_id, r.field, r.value, "machine", None,
                         int(r.source_turn), bool(r.conflict_detected)))
    for (c, f), v in sorted(corr.items()):
        if (c, f) not in seen:
            rows.append((c, f, v, "validated", None, None, False))
    out = pd.DataFrame(
        rows,
        columns=["conv_id", "field", "value", "source", "machine_value",
                 "source_turn", "conflict_detected"],
    )
    out["source_turn"] = out["source_turn"].astype("Int32")
    out["conflict_detected"] = out["conflict_detected"].astype(bool)
    return out


def _template_golden(turns_golden: pd.DataFrame) -> pd.DataFrame:
    """Multipage template propagation golden
    (multipage_processor.py:72-159): the loop mirror derives the
    validated-page template and applies it to every layout page; the
    corrections dict is the same deterministic fixture
    _corrections_golden uses."""
    import re

    from pdfextraction_spark.oracle.mergeops import template_apply_golden

    corr = {}
    for c in sorted(set(turns_golden["conv_id"])):
        n = int(re.sub(r"\D", "", c))
        if n % 5 == 0:
            corr[(c, "Employee Name")] = f"Validated Name {n}"
        if n % 10 == 0:
            corr[(c, "Reviewer Note")] = f"reviewed-{n}"
    rows = template_apply_golden(
        zip(turns_golden["conv_id"], turns_golden["turn_idx"],
            turns_golden["payload_kind"], turns_golden["extracted_text"]),
        corr,
    )
    out = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "field", "value", "source",
                 "found", "created_from_turn", "template_version"],
    )
    out["turn_idx"] = out["turn_idx"].astype(np.int32)
    out["created_from_turn"] = out["created_from_turn"].astype(np.int32)
    out["found"] = out["found"].astype(bool)
    return out


def _render_golden(df: pd.DataFrame, dpi: int = 36) -> pd.DataFrame:
    """S4 render facts via an INDEPENDENT rasterization algorithm:
    ink_pixels is the exact pixel area of the clamped-box UNION by
    coordinate-compression sweep (unique box edges form a grid; a grid
    cell is inked iff covered by >= 1 box) — never the engine's
    per-box canvas fill. Width/height follow the dpi/72 ceil rule and
    the clamping semantics mirror functions/render.rasterize_words
    (that is the CONTRACT under test, not shared code). The PNG
    container length reuses the codec (functions/png.py) on a canvas
    painted from the coverage grid; the codec itself is value-gated by
    the pytest round-trip pins."""
    import math

    from pdfextraction_spark.functions.png import encode_png
    from pdfextraction_spark.functions.render import MAX_PIXELS
    from pdfextraction_spark.payload import decode_pdf_envelope_full

    s = dpi / 72.0
    rows = []
    for conv_id, turn_idx, text in zip(
        df["conv_id"], df["turn_idx"], df["text"]
    ):
        full = decode_pdf_envelope_full(text) if text else None
        if full is None:
            continue
        words, pw, ph = full
        w = max(1, int(math.ceil(pw * s)))
        h = max(1, int(math.ceil(ph * s)))
        if w * h > MAX_PIXELS:
            rows.append((str(conv_id), int(turn_idx), dpi, 0, 0,
                         len(words), 0, False, 0))
            continue
        rects = []
        for _t, x0, y0, x1, y1 in words:
            xa = min(max(int(math.floor(x0 * s)), 0), w - 1)
            ya = min(max(int(math.floor(y0 * s)), 0), h - 1)
            xb = min(max(int(math.ceil(x1 * s)), xa + 1), w)
            yb = min(max(int(math.ceil(y1 * s)), ya + 1), h)
            rects.append((xa, ya, xb, yb))
        canvas = np.full((h, w), 255, dtype=np.uint8)
        ink = 0
        if rects:
            xs = np.array(sorted({v for r in rects for v in (r[0], r[2])}))
            ys = np.array(sorted({v for r in rects for v in (r[1], r[3])}))
            cover = np.zeros((len(ys) - 1, len(xs) - 1), dtype=bool)
            for xa, ya, xb, yb in rects:
                i0, i1 = np.searchsorted(xs, xa), np.searchsorted(xs, xb)
                j0, j1 = np.searchsorted(ys, ya), np.searchsorted(ys, yb)
                cover[j0:j1, i0:i1] = True
            cell_area = np.diff(ys)[:, None] * np.diff(xs)[None, :]
            ink = int(cell_area[cover].sum())
            for j, i in zip(*np.nonzero(cover)):
                canvas[ys[j]:ys[j + 1], xs[i]:xs[i + 1]] = 0
        rows.append((str(conv_id), int(turn_idx), dpi, w, h,
                     len(words), ink, True, len(encode_png(canvas))))
    out = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "dpi", "width", "height",
                 "n_words", "ink_pixels", "rendered", "png_bytes"],
    )
    for c in ("turn_idx", "dpi", "width", "height", "n_words",
              "ink_pixels", "png_bytes"):
        out[c] = out[c].astype(np.int64)
    out["rendered"] = out["rendered"].astype(bool)
    return out


def _media_golden():
    """Golden multimodal features: decode every fixture blob with the
    codecs directly (no Spark, no operator code paths) and recompute
    the feature formulas inline. Returns (image_df, audio_df,
    video_df); video covers BOTH the real GIF decode and the
    fake-container degrade path (every_k=5, matching the driver
    query)."""
    import hashlib

    from pdfextraction_spark.functions.gif import GIF_MAGIC, decode_gif
    from pdfextraction_spark.functions.multimodal import (
        _fake_pixel_stats,
        decode_audio_real,
        frame_stats,
        gen_media_rows,
    )
    from pdfextraction_spark.functions.png import ahash64, decode_png

    img_rows, aud_rows, vid_rows = [], [], []
    for media_id, _conv, _turn, kind, blob, meta in gen_media_rows():
        if kind == "video":
            data = bytes(blob)
            if data[:4] == GIF_MAGIC:
                frames, _pal = decode_gif(data)
                for fi in range(0, len(frames), 5):
                    m, s, d = frame_stats(frames[fi])
                    vid_rows.append((media_id, fi, m, s, d, True))
            else:
                m, s, _ = _fake_pixel_stats(data)
                for fi in range(0, int(meta[3]), 5):
                    d = hashlib.sha256(
                        data + fi.to_bytes(4, "big")
                    ).hexdigest()[:16]
                    vid_rows.append((media_id, fi, m, s, d, False))
        if kind == "image":
            px = decode_png(bytes(blob)).astype(np.float64)
            img_rows.append(
                (media_id, meta[0], meta[1], float(px.mean()),
                 float(px.std()), ahash64(px))
            )
        elif kind == "audio":
            s, rate = decode_audio_real(bytes(blob))
            f = s.astype(np.float64)
            zc = int(np.count_nonzero(np.signbit(f[1:]) != np.signbit(f[:-1])))
            aud_rows.append(
                (media_id, rate, len(s) / rate,
                 float(np.sqrt((f ** 2).mean())),
                 zc / max(len(s) - 1, 1), int(np.abs(s).max()))
            )
    img = pd.DataFrame(
        img_rows,
        columns=["media_id", "width", "height", "mean_byte", "std_byte",
                 "phash"],
    )
    img["media_id"] = img["media_id"].astype(np.int64)
    img["width"] = img["width"].astype(np.int32)
    img["height"] = img["height"].astype(np.int32)
    img["phash"] = img["phash"].astype(np.int64)
    aud = pd.DataFrame(
        aud_rows,
        columns=["media_id", "sample_rate", "duration_sec", "rms", "zcr",
                 "peak"],
    )
    aud["media_id"] = aud["media_id"].astype(np.int64)
    aud["sample_rate"] = aud["sample_rate"].astype(np.int32)
    aud["peak"] = aud["peak"].astype(np.int32)
    vid = pd.DataFrame(
        vid_rows,
        columns=["media_id", "frame_idx", "frame_mean", "frame_std",
                 "frame_digest", "decoded"],
    )
    vid["media_id"] = vid["media_id"].astype(np.int64)
    vid["frame_idx"] = vid["frame_idx"].astype(np.int32)
    vid["decoded"] = vid["decoded"].astype(bool)
    return img, aud, vid


def golden_dir(tier: str, cache_dir: str = "/tmp/pdfx_fixtures") -> str:
    return os.path.join(
        cache_dir, f"golden_{tier}_f{FIXTURE_VERSION}_g{GOLDEN_VERSION}"
    )


def ensure_golden(tier: str, cache_dir: str = "/tmp/pdfx_fixtures") -> str:
    """Build (once) and cache all golden tables for a tier; returns the
    directory holding {turns,tables,spacing,merge,fence,table_merge}
    .parquet."""
    path = golden_dir(tier, cache_dir)
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)
    # private build dir per process: two concurrent builders (driver's
    # oracle_sql() + pytest) must never interleave writes; the loser of
    # the final rename just discards its copy
    import tempfile

    tmp = tempfile.mkdtemp(prefix=os.path.basename(path) + ".", dir=cache_dir)
    df = gen_transcripts(tier)
    turns = _turns_golden(df)
    turns.to_parquet(os.path.join(tmp, "turns.parquet"), index=False)
    tables = _tables_golden(df)
    tables.to_parquet(os.path.join(tmp, "tables.parquet"), index=False)
    _spacing_golden(df).to_parquet(os.path.join(tmp, "spacing.parquet"), index=False)
    merge = _merge_golden(turns)
    merge.to_parquet(os.path.join(tmp, "merge.parquet"), index=False)
    _final_json_golden(turns, tables, merge).to_parquet(
        os.path.join(tmp, "final_json.parquet"), index=False
    )
    _fence_golden(df).to_parquet(os.path.join(tmp, "fence.parquet"), index=False)
    _table_merge_golden(tables).to_parquet(
        os.path.join(tmp, "table_merge.parquet"), index=False
    )
    _anomalies_golden(merge, tables).to_parquet(
        os.path.join(tmp, "anomalies.parquet"), index=False
    )
    _corrections_golden(turns, merge).to_parquet(
        os.path.join(tmp, "corrections.parquet"), index=False
    )
    _schema_norm_golden().to_parquet(
        os.path.join(tmp, "schema_norm.parquet"), index=False
    )
    _render_golden(df).to_parquet(
        os.path.join(tmp, "render.parquet"), index=False
    )
    _template_golden(turns).to_parquet(
        os.path.join(tmp, "template_apply.parquet"), index=False
    )
    img, aud, vid = _media_golden()
    img.to_parquet(os.path.join(tmp, "image_features.parquet"), index=False)
    aud.to_parquet(os.path.join(tmp, "audio_features.parquet"), index=False)
    vid.to_parquet(os.path.join(tmp, "video_frames.parquet"), index=False)
    try:
        os.replace(tmp, path)
    except OSError:
        # a concurrent builder won the rename: its output is complete
        # and version-identical — drop ours
        import shutil

        if os.path.exists(path):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return path
