"""Golden per-turn extractor (single-process, eager).

Dispatches on payload kind and produces the golden row used by the
pytest equality gate (FIXTURES.md §3):

    (extracted_text, spans[(label,start,end)], blocks_kept,
     blocks_dropped, parse_failed, payload_kind)

Span labels: 'text' (passthrough / plain layout line), 'fields'
(field-bearing layout line), or the HTML block tag.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..payload import KIND_HTML, KIND_PDF, KIND_PLAIN, decode_pdf_envelope, detect_kind
from . import htmlstrip, spatial

Span = Tuple[str, int, int]


def _passthrough(text: str, failed: bool) -> Tuple[str, List[Span], int, int, bool]:
    spans = [("text", 0, len(text))] if text else []
    return text, spans, (1 if text else 0), 0, failed


def extract_turn(text: Optional[str]):
    """Return (payload_kind, extracted_text, spans, blocks_kept,
    blocks_dropped, parse_failed) for one turn."""
    text = text or ""
    kind = detect_kind(text)
    if kind == KIND_PLAIN:
        return (KIND_PLAIN, *_passthrough(text, False))
    if kind == KIND_HTML:
        out, spans, kept, dropped, failed = htmlstrip.strip_html(text)
        return (KIND_HTML, out, spans, kept, dropped, failed)
    # pdf_layout
    words = decode_pdf_envelope(text)
    if words is None:
        return (KIND_PDF, *_passthrough(text, True))
    lines = spatial.reflow(words)
    parts: List[str] = []
    spans: List[Span] = []
    pos = 0
    for label, line_text in lines:
        start = pos
        parts.append(line_text)
        pos += len(line_text)
        spans.append((label, start, pos))
        pos += 1  # '\n'
    out = "\n".join(parts)
    # an envelope that decoded but yielded no lines is a parse failure
    # (mirrors the reference's fallback scaffolds,
    # openai_service.py:159-197)
    return (KIND_PDF, out, spans, len(lines), 0, len(lines) == 0)
