"""Loop-based golden mirrors for the conversation-level merge and the
fenced-JSON tool-output parser — the oracle side of the Spark operators
in operators/merge.py and the fence_json query.

Field merge mirrors /root/reference/services/result_merger.py:93-120
(longest non-null value wins, first-seen wins ties, repeated non-null
occurrence flags a conflict), applied to the engine's 'Field:\\tvalue'
line format (spatial_preprocessor.py:174). Table merge mirrors
result_merger.py:122-163 (rows accumulate across pages in order, with
source-page bookkeeping metadata).
"""

from __future__ import annotations

import json
import re
from typing import Dict, Iterable, List, Optional, Tuple

from ..config import CLUSTER_SEP, EMPTY_SENTINEL


def field_pairs(extracted_text: str) -> List[Tuple[int, str, Optional[str]]]:
    """(pos, field, value) triples from one turn's extracted text.
    Mirrors operators/merge.py:parse_field_pairs position encoding:
    pos = line_pos * 1000 + part_pos; value None for the [EMPTY]
    sentinel. Spark's substring_index(part, ':\\t', 1 / -1) = text
    before the FIRST / after the LAST separator."""
    out: List[Tuple[int, str, Optional[str]]] = []
    for line_pos, line in enumerate((extracted_text or "").split("\n")):
        for part_pos, part in enumerate(line.split(CLUSTER_SEP)):
            if ":\t" not in part:
                continue
            field = part.split(":\t", 1)[0]
            value: Optional[str] = part.rsplit(":\t", 1)[-1]
            if value == EMPTY_SENTINEL:
                value = None
            out.append((line_pos * 1000 + part_pos, field, value))
    return out


def merge_conversation_fields_golden(
    turns: Iterable[Tuple[str, int, str]],
) -> List[dict]:
    """Longest-wins field merge over (conv_id, turn_idx, extracted_text)
    rows (result_merger.py:93-120 semantics: replace only on strictly
    greater length, so the earliest (turn, pos) wins ties; every
    repeated non-null occurrence marks a conflict)."""
    state: Dict[Tuple[str, str], dict] = {}
    rows = sorted(turns, key=lambda r: (r[0], r[1]))
    for conv_id, turn_idx, text in rows:
        for pos, field, value in field_pairs(text):
            # Spark trim() strips ASCII spaces only — mirror exactly
            if value is None or not value.strip(" "):
                continue
            key = (conv_id, field)
            cur = state.get(key)
            if cur is None:
                state[key] = {
                    "conv_id": conv_id,
                    "field": field,
                    "value": value,
                    "source_turn": turn_idx,
                    "conflict_detected": False,
                    "n_occurrences": 1,
                }
            else:
                cur["n_occurrences"] += 1
                cur["conflict_detected"] = True
                if len(value) > len(cur["value"]):
                    cur["value"] = value
                    cur["source_turn"] = turn_idx
    return list(state.values())


def merge_conversation_tables_golden(
    table_rows: Iterable[Tuple[str, int, int, Tuple[str, ...], int]],
) -> List[dict]:
    """Cross-turn table accumulation (result_merger.py:122-163): rows
    from (conv_id, turn_idx, table_idx, headers, n_rows) groups merge
    by table identity = headers signature, in (turn_idx, table_idx)
    order; metadata records total rows, source turns, per-turn row
    counts and the multi-turn flag. Headers are taken from the first
    contributing turn (the reference keeps the first page's headers,
    result_merger.py:133-137)."""
    state: Dict[Tuple[str, Tuple[str, ...]], dict] = {}
    for conv_id, turn_idx, table_idx, headers, n_rows in sorted(
        table_rows, key=lambda r: (r[0], r[1], r[2])
    ):
        key = (conv_id, headers)
        cur = state.get(key)
        if cur is None:
            state[key] = cur = {
                "conv_id": conv_id,
                "headers": headers,
                "total_rows": 0,
                "source_turns": [],
                "rows_by_turn": {},
            }
        cur["total_rows"] += n_rows
        if turn_idx not in cur["rows_by_turn"]:
            cur["source_turns"].append(turn_idx)
            cur["rows_by_turn"][turn_idx] = 0
        cur["rows_by_turn"][turn_idx] += n_rows
    out = []
    for cur in state.values():
        turns_sorted = sorted(cur["source_turns"])
        out.append(
            {
                "conv_id": cur["conv_id"],
                "headers": cur["headers"],
                "total_rows": cur["total_rows"],
                "source_turns": turns_sorted,
                "rows_by_turn": {t: cur["rows_by_turn"][t] for t in turns_sorted},
                "spans_multiple_turns": len(turns_sorted) > 1,
            }
        )
    return out


def template_apply_golden(
    turns: Iterable[Tuple[str, int, str, str]],
    corrections: Dict[Tuple[str, str], str],
) -> List[dict]:
    """Loop mirror of operators/corrections.template_apply (reference
    multipage_processor.py:72-159): template = validated page's field
    set + human-added correction fields; applied to every pdf_layout
    page of the conversation; per-page longest-wins values (strictly
    greater replaces, earliest position wins ties); correction
    overrides on the validation page only. ``turns`` rows are
    (conv_id, turn_idx, payload_kind, extracted_text)."""
    rows = sorted(turns, key=lambda r: (r[0], r[1]))
    # per-page values + per-conv validated turn
    page_vals: Dict[Tuple[str, int, str], str] = {}
    vturn: Dict[str, int] = {}
    pages: Dict[str, List[int]] = {}
    for conv_id, turn_idx, kind, text in rows:
        if kind == "pdf_layout":
            pages.setdefault(conv_id, []).append(turn_idx)
        for _pos, field, value in field_pairs(text):
            if value is None or not value.strip(" "):
                continue
            if conv_id not in vturn:
                vturn[conv_id] = turn_idx
            key = (conv_id, turn_idx, field)
            cur = page_vals.get(key)
            if cur is None or len(value) > len(cur):
                page_vals[key] = value
    templates: Dict[str, List[str]] = {}
    for (conv_id, turn_idx, field) in page_vals:
        if vturn.get(conv_id) == turn_idx:
            t = templates.setdefault(conv_id, [])
            if field not in t:
                t.append(field)
    for (conv_id, field) in corrections:
        if conv_id in vturn:
            t = templates.setdefault(conv_id, [])
            if field not in t:
                t.append(field)
    out: List[dict] = []
    for conv_id, fields in templates.items():
        for turn_idx in pages.get(conv_id, []):
            for field in fields:
                pval = page_vals.get((conv_id, turn_idx, field))
                cval = corrections.get((conv_id, field))
                on_vpage = turn_idx == vturn[conv_id]
                if on_vpage and cval is not None:
                    value, source = cval, "validated"
                elif pval is not None:
                    value, source = pval, "machine"
                else:
                    value, source = None, "missing"
                out.append({
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "field": field,
                    "value": value,
                    "source": source,
                    "found": value is not None,
                    "created_from_turn": vturn[conv_id],
                    "template_version": "1.0",
                })
    return out


def normalize_form_fields_golden(payload_json: str) -> Dict[str, Optional[str]]:
    """Loop mirror of the reference's step-2 schema normalization
    (openai_service.py:688-718): three historical shapes -> one
    canonical {field: value_or_null} dict; unknown shapes and
    malformed JSON -> {} (the reference's fallthrough; it receives
    pre-parsed objects, the engine receives JSON strings)."""
    try:
        form_fields = json.loads(payload_json)
    except ValueError:
        return {}
    if isinstance(form_fields, dict):
        return form_fields
    if isinstance(form_fields, list):
        if not form_fields:
            return {}
        if isinstance(form_fields[0], str):
            return {name: None for name in form_fields}
        # engine contract divergence from the reference: a JSON-null
        # field_name/label counts as ABSENT (the reference's `in` test
        # treats present-null as present and can produce a None dict
        # key, which a Spark map cannot represent)
        if (isinstance(form_fields[0], dict)
                and form_fields[0].get("field_name") is not None):
            return {
                (f.get("field_name") if f.get("field_name") is not None
                 else f"Field_{i}"): None
                for i, f in enumerate(form_fields)
            }
        if (isinstance(form_fields[0], dict)
                and form_fields[0].get("label") is not None):
            return {
                (f.get("label") if f.get("label") is not None
                 else f"Field_{i}"): f.get("estimated_value")
                for i, f in enumerate(form_fields)
            }
    return {}


def normalized_schema_str_golden(payload_json: str) -> str:
    """Canonical serialization matching functions/schema_norm.py:
    'k=v' sorted by key, null value -> 'k='."""
    m = normalize_form_fields_golden(payload_json)
    return ",".join(
        f"{k}={'' if m[k] is None else m[k]}" for k in sorted(m)
    )


# ---------------------------------------------------------------------------
# fenced-JSON tool-output parsing (X16/X17 golden)

_FENCE_RE = re.compile(r"```(?:json)?\s*(\{[\s\S]*?\})\s*```")
_BARE_RE = re.compile(r"(\{[\s\S]*\})")
_TRAILING_COMMA_RE = re.compile(r",\s*([}\]])")


def fenced_json_golden(text: str) -> str:
    """First ```json {...}``` block, else first bare {...}, else ''
    (openai_service.py:115-157)."""
    m = _FENCE_RE.search(text or "")
    if m:
        return m.group(1)
    m = _BARE_RE.search(text or "")
    return m.group(1) if m else ""


def repair_json_golden(s: str) -> str:
    """Strip trailing commas, append closers for unbalanced {/[
    (openai_service.py:199-220)."""
    cleaned = _TRAILING_COMMA_RE.sub(r"\1", s).strip()
    braces = max(cleaned.count("{") - cleaned.count("}"), 0)
    brackets = max(cleaned.count("[") - cleaned.count("]"), 0)
    return cleaned + "}" * braces + "]" * brackets


def parse_fence_golden(text: str):
    """(status, count, n_items) for one turn, or None when no JSON
    object is present. Field-level null on type mismatch / absence —
    matching from_json's PERMISSIVE per-field behavior."""
    fenced = fenced_json_golden(text)
    if fenced == "":
        return None
    try:
        obj = json.loads(repair_json_golden(fenced))
    except ValueError:
        return (None, None, None)
    if not isinstance(obj, dict):
        return (None, None, None)
    status = obj.get("status")
    status = status if isinstance(status, str) else None
    count = obj.get("count")
    count = count if isinstance(count, int) and not isinstance(count, bool) else None
    items = obj.get("items")
    n_items = len(items) if isinstance(items, list) else None
    return (status, count, n_items)
