"""Connected-components clustering, deterministic hash sampling, and
PII redaction (round-3 training-pipeline additions): semantic unit
tests + DuckDB cross-engine parity for each."""

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pdfextraction_spark.functions.sampling import hash_sample, hash_uniform
from pdfextraction_spark.functions.text import pii_counts, redact_pii
from pdfextraction_spark.operators.graph import (
    connected_components,
    dedup_clusters,
)
from pdfextraction_spark.oracle import portable_sql as P


def _duck(views: dict):
    con = duckdb.connect()
    for name, pdf in views.items():
        con.register(name, pdf)
    return con


class TestConnectedComponents:
    def test_known_graph(self, spark):
        """Chain 1-2-3, pair 10-11, isolated 20: components are the
        min ids; a chain needs >1 propagation round (diameter 2)."""
        nodes = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 10, 11, 20)], "doc_id long"
        )
        edges = spark.createDataFrame(
            [(2, 3), (1, 2), (10, 11)], "id_a long, id_b long"
        )
        got = {
            r.node: r.component
            for r in connected_components(nodes, edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}

    def test_string_ids_chain(self, spark):
        """STRING node ids (the representative pick is ordering-based
        on purpose, so string keys are legal): the numeric label-sum
        convergence probe casts strings to null — the type-aware
        fallback must keep propagating past round 1 on a diameter-2
        chain instead of silently splitting the component."""
        nodes = spark.createDataFrame(
            [(s,) for s in ("a", "b", "c", "x", "z")], "doc_id string"
        )
        edges = spark.createDataFrame(
            [("b", "c"), ("a", "b")], "id_a string, id_b string"
        )
        got = {
            r.node: r.component
            for r in connected_components(nodes, edges).collect()
        }
        assert got == {"a": "a", "b": "a", "c": "a",
                       "x": "x", "z": "z"}

    def test_long_chain_converges(self, spark):
        """A 12-node path graph (diameter 11) — the worst case for
        min-label propagation; must still converge within max_iter."""
        n = 12
        nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        got = connected_components(nodes, edges).collect()
        assert all(r.component == 0 for r in got)

    def test_clusters_canonical_contract(self, spark):
        nodes = spark.createDataFrame(
            [(i,) for i in (5, 7, 9, 30)], "doc_id long"
        )
        pairs = spark.createDataFrame([(7, 9)], "id_a long, id_b long")
        out = {r.doc_id: r for r in dedup_clusters(nodes, pairs).collect()}
        assert out[7].cluster_id == 7 and out[9].cluster_id == 7
        assert out[7].is_canonical and not out[9].is_canonical
        assert out[7].cluster_size == 2
        assert out[5].cluster_size == 1 and out[5].is_canonical

    @pytest.mark.slow
    def test_matches_duckdb_recursive_closure(self, spark):
        """Spark label propagation == DuckDB WITH RECURSIVE transitive
        closure over the same ngram-Jaccard pair graph."""
        from pdfextraction_spark.functions.dedup import ngram_jaccard_pairs

        rng = np.random.default_rng(23)
        vocab = [f"w{i}" for i in range(120)]
        rows, did = [], 0
        for b in range(15):
            base = list(rng.choice(vocab, size=25))
            rows.append((did, " ".join(base))); did += 1
            if b % 2 == 0:
                mut = list(base)
                mut[0] = "zz"
                rows.append((did, " ".join(mut))); did += 1
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = ngram_jaccard_pairs(docs, threshold=0.3).select("id_a", "id_b")
        got = (
            dedup_clusters(docs, pairs)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = _duck({"documents": pd.DataFrame(rows,
                                               columns=["doc_id", "text"])})
        exp = (
            con.execute(P.dedup_clusters_sql(threshold=0.3))
            .fetchdf().sort_values("doc_id").reset_index(drop=True)
        )
        assert list(got["cluster_id"]) == list(exp["cluster_id"])
        assert list(got["cluster_size"]) == list(exp["cluster_size"])
        assert (got["cluster_size"] > 1).any()  # near-dups actually group


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, spark):
        df = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(300)],
            "doc_id long, source string",
        )
        a = sorted(
            r.doc_id for r in hash_sample(df, 0.4).collect()
        )
        b = sorted(
            r.doc_id
            for r in hash_sample(df.repartition(7), 0.4).collect()
        )
        assert a == b and 0 < len(a) < 300
        # rate lands near the target
        assert abs(len(a) / 300 - 0.4) < 0.1

    def test_stratified_fractions(self, spark):
        df = spark.createDataFrame(
            [(i, "keep_all" if i % 2 else "drop_most") for i in range(400)],
            "doc_id long, source string",
        )
        out = hash_sample(
            df, 0.5, stratum_col="source",
            fractions={"keep_all": 1.0, "drop_most": 0.0},
        ).toPandas()
        assert (out["source"] == "keep_all").all()
        assert len(out) == 200

    def test_matches_duckdb(self, spark):
        pdf = pd.DataFrame(
            {"doc_id": range(250),
             "source": [f"src{i % 4}" for i in range(250)]}
        )
        df = spark.createDataFrame(pdf)
        got = sorted(
            r.doc_id
            for r in hash_sample(
                df, 0.3, stratum_col="source",
                fractions={"src0": 1.0, "src1": 0.05},
            ).collect()
        )
        con = _duck({"documents": pdf})
        exp = sorted(
            r[0]
            for r in con.execute(
                P.hash_sample_sql(fraction=0.3,
                                  fractions={"src0": 1.0, "src1": 0.05})
            ).fetchall()
        )
        assert got == exp
        # uniform values really are uniform-ish: src0 fully kept
        assert {i for i in got if i % 4 == 0} == {i for i in range(250)
                                                 if i % 4 == 0}


class TestRedactPii:
    CASES = [
        (0, "call 555-123-4567 or mail a@b.co",
         "call [PHONE] or mail [EMAIL]"),
        (1, "ssn 123-45-6789 on 12/31/2024", "ssn [SSN] on [DATE]"),
        (2, "no pii here", "no pii here"),
        (3, "x 111-22-3333 111-222-3333 1/1/1999",
         "x [SSN] [PHONE] [DATE]"),
        (4, "john.doe+tag@mail.example.org wrote", "[EMAIL] wrote"),
    ]

    def test_redaction_and_counts(self, spark):
        df = spark.createDataFrame(
            [(i, t) for i, t, _ in self.CASES], "doc_id int, text string"
        )
        counts = pii_counts(F.col("text"))
        out = {
            r.doc_id: r
            for r in df.select(
                "doc_id",
                redact_pii(F.col("text")).alias("red"),
                *[counts[k].alias(k) for k in ("email", "ssn", "phone", "date")],
            ).collect()
        }
        for i, _t, exp in self.CASES:
            assert out[i].red == exp, (i, out[i].red)
        assert (out[0].phone, out[0].email) == (1, 1)
        assert (out[1].ssn, out[1].date) == (1, 1)
        assert sum((out[2].email, out[2].ssn, out[2].phone, out[2].date)) == 0
        assert (out[3].ssn, out[3].phone, out[3].date) == (1, 1, 1)

    def test_matches_duckdb(self, spark):
        pdf = pd.DataFrame(
            {"doc_id": [i for i, _, _ in self.CASES],
             "text": [t for _, t, _ in self.CASES]}
        )
        df = spark.createDataFrame(pdf)
        counts = pii_counts(F.col("text"))
        got = (
            df.select(
                "doc_id",
                *[counts[k].alias(f"n_{k}")
                  for k in ("email", "ssn", "phone", "date")],
                redact_pii(F.col("text")).alias("redacted"),
            )
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        con = _duck({"documents": pdf})
        exp = (
            con.execute(P.redact_pii_sql())
            .fetchdf().sort_values("doc_id").reset_index(drop=True)
        )
        for c in ("n_email", "n_ssn", "n_phone", "n_date", "redacted"):
            assert list(got[c]) == list(exp[c]), c


def test_hash_uniform_range(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    vals = [
        r.u for r in df.select(hash_uniform(F.col("doc_id")).alias("u")).collect()
    ]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert 0.4 < float(np.mean(vals)) < 0.6


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter without convergence must fail loudly —
    silently splitting one cluster in two corrupts dedup output."""
    n = 8
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=2)


def test_cluster_representatives_best_copy_wins(spark):
    """The representative is the highest-score member (ties ->
    smallest id), not the min id: cluster {1,2,3} keeps 2 (longest),
    tie-cluster {10,11} keeps 10, singleton 20 keeps itself."""
    from pdfextraction_spark.operators.graph import (
        cluster_representatives,
    )

    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 70), (10, 40), (11, 40), (20, 10)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r.doc_id: r
        for r in cluster_representatives(
            docs, pairs, score_col="n_chars"
        ).collect()
    }
    assert [out[i].is_representative for i in (1, 2, 3)] == [
        False, True, False]
    assert out[2].cluster_id == 1 and out[2].cluster_size == 3
    assert out[10].is_representative and not out[11].is_representative
    assert out[20].is_representative and out[20].cluster_size == 1


def test_fractional_ids_use_join_probe(spark):
    """DOUBLE node ids: the decimal(38,0) label-sum probe ROUNDS, so a
    sub-integer label change (5.4 -> 5.2) leaves the sum equal and the
    old integral-sum probe would declare convergence one round early.
    Diameter-3 chain 5.2-5.9-5.4-5.6: round 2's only change is
    rounding-invisible, yet node 5.6 still needs round 3 to reach the
    true min 5.2 — the type gate must route doubles to the join probe."""
    nodes = spark.createDataFrame(
        [(x,) for x in (5.2, 5.9, 5.4, 5.6)], "doc_id double"
    )
    edges = spark.createDataFrame(
        [(5.2, 5.9), (5.9, 5.4), (5.4, 5.6)],
        "id_a double, id_b double",
    )
    got = {
        r.node: r.component
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {5.2: 5.2, 5.9: 5.2, 5.4: 5.2, 5.6: 5.2}
