"""Payload-kind detection + pdf_layout envelope codec.

Detection spec (shared by the oracle and the vectorized kernels; the
reference's LLM classifier /root/reference/services/openai_service.py:256-283
is replaced by this deterministic prefix rule, conservative in the
sense of SURVEY.md §7.4: misdetection degrades to passthrough, never
to destructive stripping):

- ``pdf_layout``: text (after left-strip) starts with the exact JSON
  envelope prefix ``{"kind": "pdf_layout"``. A prefix match whose JSON
  fails to parse degrades to plain passthrough with parse_failed=True.
- ``html``: first non-whitespace char is ``<`` (markup documents in
  this engine always start with a tag or doctype).
- ``plain``: everything else (prose, markdown, fenced tool output).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Tuple

from .config import PDF_ENVELOPE_PREFIX

KIND_PLAIN = "plain"
KIND_HTML = "html"
KIND_PDF = "pdf_layout"

_HTML_PREFIX_RE = re.compile(r"^\s*<")
_PDF_PREFIX_RE = re.compile(r"^\s*" + re.escape(PDF_ENVELOPE_PREFIX))


def detect_kind(text: Optional[str]) -> str:
    if not text:
        return KIND_PLAIN
    if _PDF_PREFIX_RE.match(text):
        return KIND_PDF
    if _HTML_PREFIX_RE.match(text):
        return KIND_HTML
    return KIND_PLAIN


def encode_pdf_envelope(
    words, page_width: float = 612.0, page_height: float = 792.0
) -> str:
    """Serialize words [(text,x0,y0,x1,y1)] into the layout-hint envelope
    (FIXTURES.md §2c; page dims default to the reference sample's
    612x792, /root/reference/documents.json step1 page_data)."""
    return json.dumps(
        {
            "kind": "pdf_layout",
            "page_width": page_width,
            "page_height": page_height,
            "words": [
                {"t": t, "x0": x0, "y0": y0, "x1": x1, "y1": y1}
                for (t, x0, y0, x1, y1) in words
            ],
        },
        separators=(", ", ": "),
    )


def decode_pdf_envelope(text: str) -> Optional[List[Tuple[str, float, float, float, float]]]:
    """Parse the envelope; None on any structural failure (caller then
    falls back to passthrough + parse_failed)."""
    try:
        obj = json.loads(text)
        words = obj["words"]
        return [
            (str(w["t"]), float(w["x0"]), float(w["y0"]), float(w["x1"]), float(w["y1"]))
            for w in words
        ]
    except Exception:
        return None


def decode_pdf_envelope_full(
    text: str,
) -> Optional[Tuple[List[Tuple[str, float, float, float, float]], float, float]]:
    """Like decode_pdf_envelope but also returns the page dimensions
    (defaulting to the reference sample's 612x792 when absent or
    malformed) — the render path (S4) needs the page canvas, not just
    the words. ONE json parse per envelope (this sits in the render
    hot loop)."""
    try:
        obj = json.loads(text)
        words = [
            (str(w["t"]), float(w["x0"]), float(w["y0"]),
             float(w["x1"]), float(w["y1"]))
            for w in obj["words"]
        ]
    except Exception:
        return None
    try:
        pw = float(obj.get("page_width", 612.0))
        ph = float(obj.get("page_height", 792.0))
    except Exception:
        pw, ph = 612.0, 792.0
    return words, pw, ph
