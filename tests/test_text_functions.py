"""Column-function unit tests (X16/X17 JSON fence + repair, token
counting, fingerprints)."""

import pytest
from pyspark.sql import functions as F

from pdfextraction_spark.functions import text as X


@pytest.mark.slow
class TestFenceAndRepair:
    def _one(self, spark, col, value):
        return spark.createDataFrame([(value,)], "t string").select(
            col(F.col("t")).alias("v")
        ).collect()[0].v

    def test_fenced_json_extraction(self, spark):
        t = 'prefix\n```json\n{"a": 1}\n```\nsuffix'
        assert self._one(spark, X.fenced_json, t) == '{"a": 1}'

    def test_fence_without_lang_tag(self, spark):
        t = "```\n{\"a\": 2}\n```"
        assert self._one(spark, X.fenced_json, t) == '{"a": 2}'

    def test_bare_object_fallback(self, spark):
        # greedy-to-last-brace bare match (openai_service.py:129)
        t = 'text {"a": 3} more'
        assert self._one(spark, X.fenced_json, t) == '{"a": 3}'

    def test_repair_trailing_commas_and_truncation(self, spark):
        """openai_service.py:199-220: trailing commas stripped, open
        braces then brackets appended."""
        assert self._one(spark, X.repair_json, '{"a": [1, 2,], "b": 3,}') \
            == '{"a": [1, 2], "b": 3}'
        assert self._one(spark, X.repair_json, '{"a": [1, 2') == '{"a": [1, 2}]'
        assert self._one(spark, X.repair_json, '{"a": {"b": 1') \
            == '{"a": {"b": 1}}'

    def test_repaired_parses(self, spark):
        # note: a truncated string ENDING in a comma stays broken — the
        # reference strips commas before appending closers, same quirk
        out = spark.createDataFrame(
            [('{"status": "ok", "count": 5',)], "t string"
        ).select(
            F.from_json(X.repair_json(F.col("t")), "status string, count int")
            .alias("p")
        ).collect()[0].p
        assert out["status"] == "ok" and out["count"] == 5


@pytest.mark.slow
class TestTokenFunctions:
    def test_counts_and_fingerprint(self, spark):
        df = spark.createDataFrame(
            [("hello world, it is 42!",), ("",), ("  hello   world, it is 42! ",)],
            "t string",
        ).select(
            X.ws_token_count(F.col("t")).alias("ws"),
            X.bpe_token_count(F.col("t")).alias("bpe"),
            X.fingerprint64(F.col("t")).alias("fp"),
        )
        rows = df.collect()
        assert rows[0].ws == 5
        # hello|world|,|it|is|42|!
        assert rows[0].bpe == 7
        assert rows[1].ws == 0
        # fingerprint is whitespace-normalized: rows 0 and 2 collide
        assert rows[0].fp == rows[2].fp


def test_schema_normalization_all_shapes(spark):
    """Step-2 schema normalization: Spark column expression must equal
    the loop mirror of openai_service.py:688-718 on every sample shape
    (dict / name array / field_name objs / legacy label objs /
    unknown / malformed)."""
    from pyspark.sql import functions as F

    from fixtures.golden import SCHEMA_SAMPLES
    from pdfextraction_spark.functions.schema_norm import normalized_schema_str
    from pdfextraction_spark.oracle.mergeops import normalized_schema_str_golden

    df = spark.createDataFrame(SCHEMA_SAMPLES, "sample_id int, payload string")
    got = {
        r.sample_id: r.normalized
        for r in df.select(
            "sample_id", normalized_schema_str(F.col("payload")).alias("normalized")
        ).collect()
    }
    for sid, payload in SCHEMA_SAMPLES:
        assert got[sid] == normalized_schema_str_golden(payload), (sid, payload)
    # spot-pin the legacy shape with values
    assert got[7] == "Emp Id=77001,Status="


def test_winnowing_guarantee(spark):
    """Winnowing property (Schleimer et al.): two documents sharing a
    substring of length >= window + k - 1 share at least one selected
    fingerprint; fingerprints of unrelated random texts differ."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdfextraction_spark.functions.text import winnow_fingerprints

    rng = np.random.default_rng(31)

    def rand_text(n):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=n))

    shared = rand_text(40)  # >= window+k-1 = 11
    rows = [
        (0, rand_text(60) + shared + rand_text(60)),
        (1, rand_text(80) + shared + rand_text(40)),
        (2, rand_text(150)),
        (3, "short"),   # < k: no grams
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps = {
        r.doc_id: set(r.fps)
        for r in df.select(
            "doc_id", winnow_fingerprints(F.col("text"), k=8, window=4).alias("fps")
        ).collect()
    }
    assert fps[0] & fps[1], "shared substring must share a fingerprint"
    assert not (fps[0] & fps[2] & fps[1] & fps[3])
    assert fps[3] == set() and fps[4] == set()
    # selection actually compresses: far fewer fingerprints than grams
    assert 0 < len(fps[2]) < 150 - 7


def test_winnowed_staged_equals_expression_form(spark):
    """The staged df-transform (the O(len*w) pipeline form) must be
    value-identical to the single-expression reference form, for both
    hash families."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdfextraction_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_fast,
        winnowed,
    )

    rng = np.random.default_rng(3)
    rows = [(i, "".join(chr(97 + int(c))
                        for c in rng.integers(0, 26, size=int(n))))
            for i, n in enumerate([0, 3, 8, 11, 40, 200])]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    expr = df.select(
        "doc_id",
        winnow_fingerprints(F.col("text")).alias("slow"),
        winnow_fingerprints_fast(F.col("text")).alias("fast"),
    )
    staged_slow = winnowed(df, out_col="fps")
    staged_fast = winnowed(df, fast=True, out_col="fps")
    e = {r.doc_id: (list(r.slow), list(r.fast)) for r in expr.collect()}
    for r in staged_slow.collect():
        assert list(r.fps) == e[r.doc_id][0], r.doc_id
    for r in staged_fast.collect():
        assert list(r.fps) == e[r.doc_id][1], r.doc_id


def test_winnowing_fast_matches_portable_contract(spark):
    """winnow_fingerprints_fast (xxhash64 production form) keeps the
    winnowing guarantee and the selection density of the portable md5
    form on the same corpus: every substring-sharing pair detected by
    the portable form is detected by the fast form (and vice versa),
    and per-doc fingerprint counts track closely (the ~2/(w+1)
    density is hash-family-independent in expectation)."""
    import numpy as np
    from pyspark.sql import functions as F

    from pdfextraction_spark.functions.text import (
        winnow_fingerprints,
        winnow_fingerprints_fast,
    )

    rng = np.random.default_rng(47)

    def rand_text(n):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, size=n))

    # 30 docs; every even doc shares a 40-char block with its successor
    rows, did = [], 0
    for b in range(15):
        shared = rand_text(40)
        rows.append((did, rand_text(50) + shared + rand_text(50))); did += 1
        rows.append((did, rand_text(70) + shared + rand_text(30))); did += 1
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = df.select(
        "doc_id",
        winnow_fingerprints(F.col("text"), k=8, window=4).alias("slow"),
        winnow_fingerprints_fast(F.col("text"), k=8, window=4).alias("fast"),
    ).collect()
    slow = {r.doc_id: set(r.slow) for r in out}
    fast = {r.doc_id: set(r.fast) for r in out}

    def overlap_pairs(fp):
        ids = sorted(fp)
        return {
            (a, b)
            for i, a in enumerate(ids) for b in ids[i + 1:]
            if fp[a] & fp[b]
        }

    planted = {(2 * b, 2 * b + 1) for b in range(15)}
    sp, fp_ = overlap_pairs(slow), overlap_pairs(fast)
    assert planted <= sp and planted <= fp_  # guarantee holds for both
    # no rampant false positives in either family
    assert len(sp - planted) <= 2 and len(fp_ - planted) <= 2
    # density parity: counts within 25% per doc
    for d in slow:
        assert abs(len(slow[d]) - len(fast[d])) <= max(
            3, 0.25 * len(slow[d])
        ), d
