"""Golden HTML boilerplate stripper (stdlib HTMLParser, event-driven).

The reference has no HTML modality; per the north star the engine adds
a Readability/Boilerpipe-style text-density + link-density block
classifier. This oracle implementation defines the semantics; the
vectorized kernel (kernels/htmlstrip.py, regex tokenizer) must agree
byte-for-byte.

Semantics
---------
1. Comments and the subtrees of HTML_DROP_SUBTREES (script, style,
   nav, header, footer, aside, ...) contribute nothing.
2. A *candidate block* is the maximal run of text between block-tag
   boundaries (HTML_BLOCK_TAGS); inline tags (a, b, span, ...) do not
   split blocks. Text is whitespace-normalized (runs -> single space,
   stripped). Empty blocks are not candidates.
3. Each candidate carries the tag of the block element that opened it
   ('p' at top level / unknown) and its link density =
   normalized-chars-inside-<a> / normalized-chars.
4. Keep iff link_density <= 1/3 and len >= 25 (headings h1-h6: >= 3).
5. extracted_text = kept blocks joined by '\n'; spans: one per kept
   block, label = block tag; blocks_kept/blocks_dropped over
   candidates; parse_failed iff no block was kept.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Tuple

from ..config import (
    HTML_BLOCK_TAGS,
    HTML_DROP_SUBTREES,
    HTML_HEADING_TAGS,
    HTML_MAX_LINK_DENSITY,
    HTML_MIN_HEADING_LEN,
    HTML_MIN_TEXT_LEN,
)

_WS_RE = re.compile(r"\s+")

# HTML void elements never open a subtree (so a stray <header/> like
# <br> inside a dropped region cannot unbalance the drop-depth stack).
_VOID = frozenset(["br", "hr", "img", "input", "meta", "link", "area",
                   "base", "col", "embed", "source", "track", "wbr"])


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


class _BlockCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: List[Tuple[str, str, int, int]] = []  # (tag, raw, chars, link_chars)
        self._drop_depth = 0
        self._cur_tag = "p"
        self._buf: List[str] = []
        self._link_depth = 0
        self._chars = 0
        self._link_chars = 0

    def _flush(self, next_tag: str) -> None:
        raw = "".join(self._buf)
        self.blocks.append((self._cur_tag, raw, self._chars, self._link_chars))
        self._buf = []
        self._chars = 0
        self._link_chars = 0
        self._cur_tag = next_tag

    def handle_starttag(self, tag, attrs):
        if tag in HTML_DROP_SUBTREES:
            if tag in _VOID:
                return
            self._drop_depth += 1
            return
        if self._drop_depth:
            return
        if tag in HTML_BLOCK_TAGS:
            self._flush(tag if tag not in ("br", "hr") else self._cur_tag)
        elif tag == "a":
            self._link_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag in HTML_DROP_SUBTREES:
            return  # self-closing boilerplate tag: no subtree
        if self._drop_depth:
            return
        if tag in HTML_BLOCK_TAGS:
            self._flush(self._cur_tag if tag in ("br", "hr") else tag)

    def handle_endtag(self, tag):
        if tag in HTML_DROP_SUBTREES:
            if tag in _VOID:
                return
            if self._drop_depth:
                self._drop_depth -= 1
            return
        if self._drop_depth:
            return
        if tag in HTML_BLOCK_TAGS:
            self._flush("p")
        elif tag == "a" and self._link_depth:
            self._link_depth -= 1

    def handle_data(self, data):
        if self._drop_depth or not data:
            return
        self._buf.append(data)
        n = len(_norm(data))
        self._chars += n
        if self._link_depth:
            self._link_chars += n


def segment_blocks(html: str) -> List[Tuple[str, str, float]]:
    """Return candidate blocks as (tag, normalized_text, link_density)."""
    parser = _BlockCollector()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        pass  # salvage whatever was collected; HTMLParser is forgiving
    parser._flush("p")
    out: List[Tuple[str, str, float]] = []
    for tag, raw, chars, link_chars in parser.blocks:
        # convert_charrefs=True already unescaped entities in handle_data
        text = _norm(raw)
        if not text:
            continue
        density = (link_chars / chars) if chars else 0.0
        out.append((tag, text, density))
    return out


def keep_block(tag: str, text: str, link_density: float) -> bool:
    if link_density > HTML_MAX_LINK_DENSITY:
        return False
    min_len = HTML_MIN_HEADING_LEN if tag in HTML_HEADING_TAGS else HTML_MIN_TEXT_LEN
    return len(text) >= min_len


def strip_html(html: str):
    """Return (extracted_text, spans, blocks_kept, blocks_dropped,
    parse_failed); spans are (label, start, end) into extracted_text."""
    blocks = segment_blocks(html)
    kept: List[Tuple[str, str]] = []
    dropped = 0
    for tag, text, density in blocks:
        if keep_block(tag, text, density):
            kept.append((tag, text))
        else:
            dropped += 1
    spans: List[Tuple[str, int, int]] = []
    pos = 0
    parts: List[str] = []
    for tag, text in kept:
        start = pos
        parts.append(text)
        pos += len(text)
        spans.append((tag, start, pos))
        pos += 1  # '\n'
    return "\n".join(parts), spans, len(kept), dropped, len(kept) == 0
