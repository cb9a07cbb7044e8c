"""Vocab-file BPE token counting (the tokenizer-exact budget dial):
merges-format parsing, the greedy lowest-rank merge loop, and the
Spark-vs-loop parity of the broadcast pandas_udf path."""

import pytest

from pdfextraction_spark.functions.tokenizer import (
    bpe_segment,
    bpe_vocab_counter,
    count_tokens,
    parse_merges,
)

MERGES = [
    "#version: 0.2",
    "h e",
    "he l",
    "l o",
    "hel lo",
    "t h",
    "th e",
    "",
]


class TestBpeAlgorithm:
    def test_parse_merges(self):
        r = parse_merges(MERGES)
        assert r[("h", "e")] == 0 and r[("hel", "lo")] == 3
        assert len(r) == 6
        with pytest.raises(ValueError):
            parse_merges(["a b c"])
        # duplicate pair keeps the earlier (better) rank
        assert parse_merges(["a b", "a b", "b c"])[("a", "b")] == 0

    def test_parse_merges_keeps_hash_pairs(self):
        # GPT-2-style merges files contain real merge lines whose left
        # token begins with '#' (e.g. "# #" -> the "##" token); only
        # the conventional #version header may be skipped
        r = parse_merges(["#version: 0.2", "# #", "## #", "a b"])
        assert r[("#", "#")] == 0
        assert r[("##", "#")] == 1
        assert r[("a", "b")] == 2
        assert len(r) == 3

    def test_hand_computed_merge_chain(self):
        r = parse_merges(MERGES)
        # hello: h e l l o -> he -> hel -> lo -> hello (1 token)
        assert bpe_segment("hello", r) == ["hello"]
        # help: he -> hel, p unmergeable -> 2 tokens
        assert bpe_segment("help", r) == ["hel", "p"]
        # the: t h -> th -> the (rank order: "h e"(0) fires before
        # "t h"(4)? NO -- in "the" the pairs are (t,h) and (h,e);
        # (h,e) has rank 0 < 4 so it merges FIRST: t he; then (t,he)
        # is not a merge -> 2 tokens. Greedy-rank order matters.
        assert bpe_segment("the", r) == ["t", "he"]
        assert bpe_segment("", r) == []
        assert bpe_segment("x", r) == ["x"]

    def test_count_tokens_ws_presplit(self):
        r = parse_merges(MERGES)
        assert count_tokens("hello help the", r) == 1 + 2 + 2
        assert count_tokens("", r) == 0
        assert count_tokens(None, r) == 0
        assert count_tokens("  hello   hello  ", r) == 2

    def test_no_merges_is_char_count(self):
        assert count_tokens("ab c", {}) == 3


@pytest.mark.slow
class TestSparkParity:
    def test_udf_matches_loop(self, spark):
        import pyspark.sql.functions as F

        rows = [
            (0, "hello help"),
            (1, "the the the hello"),
            (2, ""),
            (3, None),
            (4, "unmergeable words only"),
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        cnt = bpe_vocab_counter(spark, MERGES)
        got = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id", cnt(F.col("text")).alias("n")
            ).collect()
        }
        ranks = parse_merges(MERGES)
        want = {i: count_tokens(t, ranks) for i, t in rows}
        assert got == want
        assert got[1] == 2 * 3 + 1  # 'the'=2 tokens x3 + hello

    def test_fixture_scale_smoke(self, spark):
        """Counter over the real documents table: positive counts,
        bounded above by character count, ws-split lower bound."""
        import pyspark.sql.functions as F

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(200)
        cnt = bpe_vocab_counter(spark, MERGES)
        from pdfextraction_spark.functions.text import ws_token_count

        out = docs.select(
            cnt(F.col("text")).alias("bpe"),
            ws_token_count(F.col("text")).alias("ws"),
            F.length(F.regexp_replace("text", r"\s", "")).alias("chars"),
        ).toPandas()
        assert (out.bpe >= out.ws).all()      # BPE never merges across ws
        assert (out.bpe <= out.chars).all()   # never more tokens than chars
