"""Step-2 field-schema normalization (openai_service.py:688-718).

The reference accepts three historical shapes for the step-2
``form_fields`` payload and normalizes them to one canonical
``{field_name: value_or_null}`` dict:

1. dict            ``{"Employee Name": "Jane", "Emp Id": null}``
2. array of names  ``["Employee Name", "Emp Id"]``          -> null values
3. array of objs   ``[{"field_name": "Emp Id"}, ...]``      -> null values
   legacy variant  ``[{"label": "Emp Id", "estimated_value": "77001"}]``
                                                            -> given values
Anything else normalizes to the empty schema (the reference's
fallthrough). The shape decision follows the reference exactly: it is
made from the FIRST array element's keys and applied to the whole
array; absent names fall back to ``Field_<i>``.

Engine contract: the payload arrives as a JSON STRING column and
values are strings or null (the reference operates on pre-parsed
objects; a malformed string here normalizes to the empty schema).
Pure column expressions — from_json probes each shape, no UDFs."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_OBJ_DDL = (
    "array<struct<field_name:string,label:string,estimated_value:string>>"
)


def _map_last_wins(keys: Column, vals: Column) -> Column:
    """map_from_entries with duplicate keys dropped, LAST occurrence
    winning — the policy a Python dict comprehension implements, which
    is what the reference's normalizers do (openai_service.py:688-718)
    and what json.loads does for duplicate object keys. Spark's
    map_from_arrays would instead throw DUPLICATED_MAP_KEY under the
    default mapKeyDedupPolicy, crashing the job on payloads like
    '["Emp Id", "Emp Id"]'."""
    n = F.size(keys)
    rev = F.reverse(keys)
    entries = F.zip_with(
        keys, vals, lambda k, v: F.struct(k.alias("key"), v.alias("value"))
    )
    # 0-based index of the LAST occurrence of k = n - (1-based first
    # position of k in the reversed array)
    kept = F.filter(
        entries, lambda e, i: i == n - F.array_position(rev, e["key"])
    )
    return F.map_from_entries(kept)


def normalize_field_schema(col: Column) -> Column:
    """map<string,string> of the canonical schema (values nullable)."""
    as_map = F.from_json(col, "map<string,string>")
    # from_json keeps duplicate JSON object keys in the parsed map —
    # re-dedup so '{"Emp Id": "1", "Emp Id": "2"}' normalizes like
    # json.loads (last value wins), not to a two-entry map
    _ents = F.map_entries(as_map)
    as_map_clean = _map_last_wins(
        F.transform(_ents, lambda e: e["key"]),
        F.transform(_ents, lambda e: e["value"]),
    )
    as_names = F.from_json(col, "array<string>")
    as_objs = F.from_json(col, _OBJ_DDL)
    null_str = F.lit(None).cast("string")

    names_map = _map_last_wins(
        as_names, F.transform(as_names, lambda _: null_str)
    )
    # shape decided by the first element, reference-style
    first = F.element_at(as_objs, 1)
    obj_keys = F.transform(
        as_objs,
        lambda o, i: F.coalesce(
            F.when(first["field_name"].isNotNull(), o["field_name"])
            .otherwise(o["label"]),
            F.concat(F.lit("Field_"), i.cast("string")),
        ),
    )
    obj_vals = F.transform(
        as_objs,
        lambda o: F.when(
            first["field_name"].isNotNull(), null_str
        ).otherwise(o["estimated_value"]),
    )
    objs_map = _map_last_wins(obj_keys, obj_vals)
    empty = F.from_json(F.lit("{}"), "map<string,string>")
    # from_json(array<string>) STRINGIFIES object elements rather than
    # rejecting them, so the string/object decision needs the raw
    # text: the first array element's opening character
    first_char = F.regexp_extract(col, r"^\s*\[\s*(.)", 1)
    return (
        F.when(as_map.isNotNull(), as_map_clean)
        .when(as_names.isNotNull() & (F.size(as_names) == 0), empty)
        .when(as_names.isNotNull() & (first_char == '"'), names_map)
        .when(
            as_objs.isNotNull()
            & (first_char == "{")
            & (first["field_name"].isNotNull() | first["label"].isNotNull()),
            objs_map,
        )
        .otherwise(empty)
    )


def normalized_schema_str(col: Column) -> Column:
    """Canonical scalar serialization: 'k=v' pairs sorted by key,
    comma-joined; null values serialize as 'k='. Empty schema -> ''."""
    m = normalize_field_schema(col)
    return F.array_join(
        F.transform(
            F.array_sort(F.map_keys(m)),
            lambda k: F.concat(k, F.lit("="), F.coalesce(
                F.element_at(m, k), F.lit("")
            )),
        ),
        ",",
    )
