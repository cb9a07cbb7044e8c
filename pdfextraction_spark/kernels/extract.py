"""Batch extraction dispatcher — the body of the Spark mapInArrow stage.

Takes one Arrow-batch worth of turn texts, detects payload kinds
vectorized, routes each kind to its kernel, and assembles the output
columns (payload_kind, extracted_text, spans, blocks_kept,
blocks_dropped, parse_failed). Replaces the reference's three LLM call
sites with its own deterministic machinery (SURVEY.md §2.10).
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from ..payload import (
    KIND_HTML,
    KIND_PDF,
    KIND_PLAIN,
    _HTML_PREFIX_RE,
    _PDF_PREFIX_RE,
)
from .htmlstrip import strip_html_doc
from .layout import reflow_batch

Span = Tuple[str, int, int]


def detect_kinds(texts: pd.Series) -> np.ndarray:
    """Vectorized payload-kind detection (payload.py spec)."""
    s = texts.fillna("")
    is_pdf = s.str.contains(_PDF_PREFIX_RE, regex=True).to_numpy()
    is_html = s.str.contains(_HTML_PREFIX_RE, regex=True).to_numpy() & ~is_pdf
    kinds = np.full(len(s), KIND_PLAIN, dtype=object)
    kinds[is_html] = KIND_HTML
    kinds[is_pdf] = KIND_PDF
    return kinds


def _decode_envelope_fast(text: str) -> Optional[List[Tuple[str, float, float, float, float]]]:
    try:
        obj = json.loads(text)
        return [
            (str(w["t"]), float(w["x0"]), float(w["y0"]), float(w["x1"]), float(w["y1"]))
            for w in obj["words"]
        ]
    except Exception:
        return None


def _assemble_lines(lines: List[Tuple[str, str]]) -> Tuple[str, List[Span]]:
    parts: List[str] = []
    spans: List[Span] = []
    pos = 0
    for label, text in lines:
        parts.append(text)
        spans.append((label, pos, pos + len(text)))
        pos += len(text) + 1
    return "\n".join(parts), spans


def extract_batch(texts: pd.Series) -> pd.DataFrame:
    """Extract one batch of turn texts.

    Returns a DataFrame aligned with ``texts`` (same order) with
    columns payload_kind, extracted_text, spans (list of (label,
    start, end)), blocks_kept, blocks_dropped, parse_failed.
    """
    n = len(texts)
    s = texts.fillna("").reset_index(drop=True)
    kinds = detect_kinds(s)

    out_text = np.empty(n, dtype=object)
    out_spans: List[List[Span]] = [[] for _ in range(n)]
    kept = np.zeros(n, dtype=np.int32)
    dropped = np.zeros(n, dtype=np.int32)
    failed = np.zeros(n, dtype=bool)

    # plain: passthrough (golden: text unchanged, one [0, len) span)
    plain_idx = np.flatnonzero(kinds == KIND_PLAIN)
    for i in plain_idx:
        t = s.iloc[int(i)]
        out_text[i] = t
        if t:
            out_spans[i] = [("text", 0, len(t))]
            kept[i] = 1

    # html: boilerplate strip
    html_idx = np.flatnonzero(kinds == KIND_HTML)
    for i in html_idx:
        t, spans, k, d, f = strip_html_doc(s.iloc[int(i)])
        out_text[i] = t
        out_spans[i] = spans
        kept[i], dropped[i], failed[i] = k, d, f

    # pdf_layout: decode envelopes, reflow the whole sub-batch at once
    pdf_idx = np.flatnonzero(kinds == KIND_PDF)
    if len(pdf_idx):
        decoded = [_decode_envelope_fast(s.iloc[int(i)]) for i in pdf_idx]
        reflowed = reflow_batch(decoded)
        for i, words, lines in zip(pdf_idx, decoded, reflowed):
            if words is None:
                # undecodable envelope -> conservative passthrough
                t = s.iloc[int(i)]
                out_text[i] = t
                out_spans[i] = [("text", 0, len(t))] if t else []
                kept[i] = 1 if t else 0
                failed[i] = True
                continue
            text, spans = _assemble_lines(lines)
            out_text[i] = text
            out_spans[i] = spans
            kept[i] = len(lines)
            failed[i] = len(lines) == 0

    return pd.DataFrame(
        {
            "payload_kind": kinds,
            "extracted_text": out_text,
            "spans": out_spans,
            "blocks_kept": kept,
            "blocks_dropped": dropped,
            "parse_failed": failed,
        }
    )
