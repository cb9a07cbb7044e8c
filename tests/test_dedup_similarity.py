"""Dedup + similarity operator verification (the non-SQL-checkable
ops): MinHash-LSH candidates vs exact Jaccard ground truth, LSH-ANN
recall vs brute force, SimHash sanity, conversation merge semantics
vs the reference merger's rules."""

import numpy as np
import pandas as pd
import pytest

from pdfextraction_spark.functions import dedup as D
from pdfextraction_spark.functions import similarity as S


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic near-dup corpus: base docs + mutated copies."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    did = 0
    for b in range(30):
        base = list(rng.choice(vocab, size=40))
        rows.append((did, " ".join(base))); did += 1
        if b % 2 == 0:  # near-dup: mutate 3 tokens
            mut = list(base)
            for j in rng.integers(0, 40, size=3):
                mut[int(j)] = vocab[int(rng.integers(0, 200))]
            rows.append((did, " ".join(mut))); did += 1
        if b % 5 == 0:  # exact dup
            rows.append((did, " ".join(base))); did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def emb(spark):
    """Clustered embeddings (30 centroids x 10 points, small noise) —
    real embedding spaces have strong neighbors; for isotropic random
    vectors sign-LSH recall is provably ~(1-theta/pi)^bits ~ chance."""
    rng = np.random.default_rng(11)
    cents = rng.standard_normal((30, 32))
    vecs = np.concatenate(
        [c + 0.15 * rng.standard_normal((10, 32)) for c in cents]
    ).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df.cache().count()
    return df


@pytest.mark.slow
class TestDedup:
    def test_exact_dedup_counts(self, docs):
        out = D.exact_dedup(docs).toPandas()
        n_docs = docs.count()
        assert out["dup_count"].sum() == n_docs
        assert (out["dup_count"] >= 2).sum() >= 6  # planted exact dups

    def test_minhash_lsh_finds_near_dups(self, docs):
        truth = D.ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
        # r=2, b=16 -> catch prob 1-(1-s^2)^16 = 0.99 at s=0.5
        got = D.minhash_lsh_pairs(docs, threshold=0.5,
                                  num_hashes=32, bands=16).toPandas()
        t = set(zip(truth.id_a, truth.id_b))
        g = set(zip(got.id_a, got.id_b))
        assert t, "fixture must contain near-dup pairs"
        # candidates are verified by exact jaccard -> no false positives
        assert g <= t
        assert len(g) / len(t) >= 0.9
        # jaccard values agree exactly where both report the pair
        merged = truth.merge(got, on=["id_a", "id_b"], suffixes=("_t", "_g"))
        assert (merged["jaccard_t"] == merged["jaccard_g"]).all()

    def test_signatures_accept_precomputed_shingles(self, docs):
        """minhash_signatures(shingles=...) — the share-the-shingle-
        table contract the LSH operators rely on — must yield exactly
        the signatures of the self-shingling path."""
        base = D.minhash_signatures(docs, num_hashes=8).toPandas()
        sh = D.with_shingles(docs)
        via = D.minhash_signatures(docs, num_hashes=8,
                                   shingles=sh).toPandas()
        b = base.sort_values("doc_id").reset_index(drop=True)
        v = via.sort_values("doc_id").reset_index(drop=True)
        assert (b["doc_id"] == v["doc_id"]).all()
        assert all(
            list(x) == list(y)
            for x, y in zip(b["signature"], v["signature"])
        )

    def test_pair_ops_empty_corpus(self, spark):
        """Every pair operator must return an EMPTY frame with its
        documented schema on an empty corpus — the eager stage
        materializations run at call time, so an empty input exercises
        them all (a crash here would take down an incremental job
        whose batch diff happens to be empty)."""
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert D.ngram_jaccard_pairs(empty).count() == 0
        assert D.minhash_lsh_pairs(empty).count() == 0
        assert D.simhash_near_pairs(empty).count() == 0
        assert D.winnow_containment_pairs(empty).count() == 0
        out = D.incremental_update(empty, empty)
        assert out.count() == 0
        assert set(out.columns) == {
            "doc_id", "status", "verdict", "dup_of", "jaccard"}

    def test_bucket_cap_bounds_pairs_keeps_component(self, spark):
        """Saturated-bucket dial (crawl-mirror failure mode): a
        120-member near-identical cluster makes the true pair output
        itself quadratic (C(120,2)=7140 pairs); bucket_cap=8 must cut
        the emitted pair list to ~cap x size while the capped pairs
        still connect the WHOLE cluster into one component — the
        property clustering consumers (components/representatives)
        actually need."""
        from pdfextraction_spark.operators.graph import (
            connected_components,
        )

        rng = np.random.default_rng(3)
        vocab = [f"w{i}" for i in range(500)]
        base = list(rng.choice(vocab, size=60))
        rows = []
        for i in range(120):  # the planted mirror cluster: ids 0..119
            mut = list(base)
            j = int(rng.integers(0, 60))
            mut[j] = vocab[int(rng.integers(0, 500))]
            rows.append((i, " ".join(mut)))
        for i in range(120, 220):  # background singletons
            rows.append(
                (i, " ".join(rng.choice(vocab, size=40))))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        full = D.minhash_lsh_pairs(docs, threshold=0.5,
                                   num_hashes=32, bands=16).toPandas()
        capped = D.minhash_lsh_pairs(docs, threshold=0.5,
                                     num_hashes=32, bands=16,
                                     bucket_cap=8).toPandas()
        n_cluster_full = len(full[(full.id_a < 120) & (full.id_b < 120)])
        n_cluster_capped = len(
            capped[(capped.id_a < 120) & (capped.id_b < 120)])
        assert n_cluster_full >= 6500  # ~all-pairs without the cap
        assert n_cluster_capped < n_cluster_full / 4
        # capped pairs are a subset of the verified truth
        assert (set(zip(capped.id_a, capped.id_b))
                <= set(zip(full.id_a, full.id_b)))
        # ... and still connect the whole cluster into ONE component
        nodes = docs.select("doc_id")
        edges = spark.createDataFrame(
            capped[["id_a", "id_b"]], "id_a long, id_b long")
        comp = connected_components(nodes, edges).toPandas()
        cluster = comp[comp.node < 120]
        assert cluster.component.nunique() == 1
        assert (cluster.component == 0).all()

    def test_simhash_exact_dups_collide(self, docs, spark):
        sh = D.simhash64(docs).toPandas()
        texts = docs.toPandas().set_index("doc_id")["text"]
        by_text = {}
        for _, r in sh.iterrows():
            by_text.setdefault(texts[r.doc_id], []).append(r.simhash)
        for t, hashes in by_text.items():
            assert len(set(hashes)) == 1  # identical text -> identical hash
        pairs = D.simhash_near_pairs(docs, max_hamming=0).toPandas()
        assert len(pairs) >= 6  # exact dups at hamming 0


@pytest.mark.slow
class TestSimilarity:
    def test_lsh_recall_vs_brute_force(self, emb):
        from pyspark.sql import functions as F

        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bf = S.brute_force_topk(emb, queries, k=10).toPandas()
        approx = S.lsh_bucket_topk(emb, queries, k=10, bits=4, dim=32).toPandas()
        recalls = []
        for q in range(10):
            t = set(bf[bf.query_id == q].vec_id)
            g = set(approx[approx.query_id == q].vec_id)
            recalls.append(len(t & g) / len(t))
        # 4-bit sign LSH keeps ~1/16 of candidates; same-cluster
        # neighbors (cos ~0.95) land in the query's bucket most bits
        assert np.mean(recalls) >= 0.5
        # approx sims must be a subset of exact sims (same scorer)
        merged = bf.merge(approx, on=["query_id", "vec_id"],
                          suffixes=("_t", "_g"))
        assert (merged["sim_t"] == merged["sim_g"]).all()

    def test_brute_force_self_consistency(self, emb):
        from pyspark.sql import functions as F

        queries = emb.filter(F.col("vec_id") == 0).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        out = S.brute_force_topk(emb, queries, k=5).toPandas()
        assert list(out["rank"]) == [1, 2, 3, 4, 5]
        assert (out["sim"].diff().dropna() <= 0).all()  # descending


@pytest.mark.slow
class TestConversationMerge:
    def test_longest_wins_and_conflicts(self, spark):
        """result_merger.py:93-120 semantics: longest non-null value
        wins; repeated non-null occurrences flag a conflict; ties go to
        the earliest turn."""
        from pdfextraction_spark.operators.merge import (
            merge_conversation_fields,
        )

        rows = [
            ("c1", 0, "Emp Id:\t123"),
            ("c1", 1, "Emp Id:\t12345    Status:\t[EMPTY]"),
            ("c1", 2, "Status:\tA"),
            ("c2", 0, "Phone:\t509-121-3247"),
            ("c2", 1, "Phone:\t509-121-3247"),
            ("c3", 0, "Dept:\tB2    Dept:\tA1"),  # tie length, same turn
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, extracted_text string"
        )
        out = {
            (r.conv_id, r.field): r
            for r in merge_conversation_fields(df).collect()
        }
        assert out[("c1", "Emp Id")].value == "12345"
        assert out[("c1", "Emp Id")].conflict_detected
        assert out[("c1", "Emp Id")].source_turn == 1
        # [EMPTY] -> null, not an occurrence
        assert out[("c1", "Status")].value == "A"
        assert not out[("c1", "Status")].conflict_detected
        # identical repeated value still flags (reference marks any re-see)
        assert out[("c2", "Phone")].conflict_detected
        # tie on length within one turn -> earliest position wins
        assert out[("c3", "Dept")].value == "B2"

    def test_accumulate_lines_ordered(self, spark):
        from pdfextraction_spark.operators.merge import (
            accumulate_conversation_lines,
        )

        rows = [
            ("c1", 1, "b1\nb2"),
            ("c1", 0, "a1"),
            ("c1", 2, "c1line"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, extracted_text string"
        )
        out = accumulate_conversation_lines(df).collect()[0]
        assert out.lines == ["a1", "b1", "b2", "c1line"]
        assert out.source_turns == [0, 1, 2]
        assert out.spans_multiple_turns


@pytest.mark.slow
class TestIVF:
    def test_ivf_recall_vs_brute_force(self, emb):
        from pyspark.sql import functions as F

        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bf = S.brute_force_topk(emb, queries, k=10).toPandas()
        ivf = S.ivf_topk(emb, queries, k=10, n_centroids=16,
                         n_probe=4).toPandas()
        recalls = []
        for q in range(10):
            t = set(bf[bf.query_id == q].vec_id)
            g = set(ivf[ivf.query_id == q].vec_id)
            recalls.append(len(t & g) / len(t))
        # clustered corpus: the query's own cluster list is probed
        assert np.mean(recalls) >= 0.6
        merged = bf.merge(ivf, on=["query_id", "vec_id"], suffixes=("_t", "_g"))
        assert (merged["sim_t"] == merged["sim_g"]).all()

    def test_vectorized_assignment_equals_expression(self, emb):
        """The numpy-matmul production assignment must produce the
        exact same (vec_id -> list_id) mapping and the same ivf_topk
        output as the literal-expression oracle path (both round to
        6dp, argmax first-wins)."""
        from pyspark.sql import functions as F

        rows = (emb.orderBy("vec_id").limit(16)
                .select("embedding").collect())
        cents = [list(map(float, r[0])) for r in rows]
        expr = S._staged_assign(
            emb.select(F.col("vec_id"), F.col("embedding")),
            "embedding", cents, keep=("vec_id",),
        ).select("vec_id", "list_id").toPandas().set_index("vec_id")
        vec = emb.select(
            "vec_id",
            S.np_centroid_assign_udf(cents)(F.col("embedding"))
            .alias("list_id"),
        ).toPandas().set_index("vec_id")
        assert expr["list_id"].sort_index().equals(
            vec["list_id"].sort_index().astype(expr["list_id"].dtype))

        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        a = S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4,
                       lloyd_iters=1, vectorized=False).toPandas()
        b = S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4,
                       lloyd_iters=1, vectorized=True).toPandas()
        key = ["query_id", "vec_id"]
        a = a.sort_values(key).reset_index(drop=True)
        b = b.sort_values(key).reset_index(drop=True)
        assert a[key + ["sim", "rank"]].equals(b[key + ["sim", "rank"]])


@pytest.mark.slow
def test_asof_join_formulations_agree(spark):
    """Range-join+agg and union+window as-of forms must be identical."""
    from pdfextraction_spark.operators.asof import asof_join, asof_join_union_window

    rng = np.random.default_rng(5)
    rows_l = [(i, int(rng.integers(0, 20)), int(rng.integers(0, 10000)))
              for i in range(500)]
    rows_r = [(int(rng.integers(0, 20)), int(rng.integers(0, 10000)))
              for _ in range(800)]
    left = spark.createDataFrame(rows_l, "event_id long, user_id long, ts long")
    right = spark.createDataFrame(rows_r, "user_id long, ts long")
    a = asof_join(left, right, key="user_id", left_id="event_id") \
        .orderBy("event_id").toPandas()
    b = asof_join_union_window(left, right, key="user_id", left_id="event_id") \
        .orderBy("event_id").toPandas()
    assert len(a) == len(b)
    assert (a["event_id"].to_numpy() == b["event_id"].to_numpy()).all()
    assert (a["asof_ts"].to_numpy() == b["asof_ts"].to_numpy()).all()


def test_simhash_banded_recall_exact(spark, docs):
    """Banded blocking (bands = d+1) must find EVERY pair within
    Hamming distance d — pigeonhole guarantee — verified against an
    exact all-pairs Hamming join."""
    import itertools

    d = 12
    sims = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}

    def ham(a, b):  # simhashes are signed longs: mask to 64 bits
        return bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")

    exact = {
        (a, b, ham(a, b))
        for a, b in itertools.combinations(sorted(sims), 2)
        if ham(a, b) <= d
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in D.simhash_near_pairs(docs, max_hamming=d).collect()
    }
    assert len(exact) > 0
    assert got == exact


def test_ngram_stoplist_skew_equivalence(spark):
    """Hot-shingle stoplist: on a corpus where every doc shares one
    boilerplate sentence (the quadratic-join hazard), the df-filtered
    blocking returns byte-identical pairs to the unfiltered run —
    candidate generation shrinks, reported Jaccard stays exact."""
    rng = np.random.default_rng(99)
    vocab = [f"t{i}" for i in range(4000)]
    boiler = " ".join(f"b{i}" for i in range(12))
    rows = []
    did = 0
    for b in range(300):
        tail = list(rng.choice(vocab, size=30, replace=False))
        rows.append((did, boiler + " " + " ".join(tail))); did += 1
        if b % 10 == 0:  # planted near-dup
            mut = list(tail)
            mut[5] = vocab[int(rng.integers(0, 4000))]
            rows.append((did, boiler + " " + " ".join(mut))); did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.cache().count()
    try:
        hot = {r.sh for r in D.hot_shingles(df, max_df=50).collect()}
        assert "b0 b1 b2" in hot  # boilerplate shingles are caught
        assert all(s.startswith("b") for s in hot)
        with_stop = sorted(
            map(tuple, D.ngram_jaccard_pairs(df, threshold=0.3,
                                             max_shingle_df=50).collect())
        )
        without = sorted(
            map(tuple, D.ngram_jaccard_pairs(df, threshold=0.3,
                                             max_shingle_df=10**9).collect())
        )
        assert with_stop == without
        assert len(with_stop) == 30  # exactly the planted pairs
    finally:
        df.unpersist()


@pytest.mark.slow
def test_multiprobe_and_lloyd_improve_recall(emb):
    """Multiprobe LSH must dominate single-probe recall; Lloyd-refined
    IVF centroids must dominate seed-only centroids on the clustered
    corpus (same candidates scored by the same exact scorer)."""
    from pyspark.sql import functions as F

    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    bf = S.brute_force_topk(emb, queries, k=10).toPandas()

    def mean_recall(approx):
        rs = []
        for q in range(10):
            t = set(bf[bf.query_id == q].vec_id)
            g = set(approx[approx.query_id == q].vec_id)
            rs.append(len(t & g) / len(t))
        return float(np.mean(rs))

    single = mean_recall(
        S.lsh_bucket_topk(emb, queries, k=10, bits=4, dim=32,
                          multiprobe=False).toPandas())
    multi = mean_recall(
        S.lsh_bucket_topk(emb, queries, k=10, bits=4, dim=32,
                          multiprobe=True).toPandas())
    assert multi >= single
    assert multi >= 0.8

    seed_only = mean_recall(
        S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4,
                   lloyd_iters=0).toPandas())
    refined = mean_recall(
        S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4,
                   lloyd_iters=2).toPandas())
    assert refined >= seed_only - 0.05  # never materially worse
    assert refined >= 0.7


@pytest.mark.slow
def test_cosine_near_pairs_blocked_vs_exact(emb):
    """LSH-blocked near-dup pairs: no false positives (exact verify),
    high recall vs the exact all-pairs form on the clustered corpus,
    identical cos_sim where both report."""
    exact = S.cosine_near_pairs(emb, threshold=0.85, blocked=False,
                                dim=32).toPandas()
    blocked = S.cosine_near_pairs(emb, threshold=0.85, blocked=True,
                                  bits=6, dim=32).toPandas()
    t = set(zip(exact.id_a, exact.id_b))
    g = set(zip(blocked.id_a, blocked.id_b))
    assert t, "clustered fixture must contain near pairs"
    assert g <= t  # exact verify -> no false positives
    assert len(g) / len(t) >= 0.8
    merged = exact.merge(blocked, on=["id_a", "id_b"], suffixes=("_t", "_g"))
    assert (merged["cos_sim_t"] == merged["cos_sim_g"]).all()


class TestAsymmetricJoin:
    def test_cross_side_equals_restricted_self_pairs(self, spark, docs):
        """ngram_jaccard_join(A, B) must equal ngram_jaccard_pairs over
        the union restricted to cross-side pairs (same threshold) —
        the asymmetric form is a subset computation, not a different
        similarity."""
        from pyspark.sql import functions as F

        a = docs.filter(F.col("doc_id") % 3 == 0)
        b = docs.filter(F.col("doc_id") % 3 != 0)
        joined = {
            (r.left_id, r.right_id, r.jaccard)
            for r in D.ngram_jaccard_join(a, b, threshold=0.5).collect()
        }
        self_pairs = D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
        expected = set()
        for r in self_pairs:
            sa, sb = r.id_a % 3 == 0, r.id_b % 3 == 0
            if sa != sb:  # cross-side only
                l, rr = (r.id_a, r.id_b) if sa else (r.id_b, r.id_a)
                expected.add((l, rr, r.jaccard))
        assert joined == expected
        assert len(joined) > 0

    def test_no_same_side_pairs(self, spark, docs):
        from pyspark.sql import functions as F

        a = docs.filter(F.col("doc_id") % 3 == 0)
        b = docs.filter(F.col("doc_id") % 3 != 0)
        out = D.ngram_jaccard_join(a, b, threshold=0.3).toPandas()
        assert (out.left_id % 3 == 0).all()
        assert (out.right_id % 3 != 0).all()

    def test_hot_shingle_exactness_across_sides(self, spark):
        """A shingle made hot by the UNION df is excluded from
        candidate generation on BOTH sides but added back into the
        intersection count, keeping the reported Jaccard exact."""
        boiler = "common boiler plate line here now"
        rows_a = [(1, boiler + " alpha beta gamma delta")]
        rows_b = [(100 + i, boiler + f" tail{i} x{i} y{i} z{i}")
                  for i in range(6)]
        a = spark.createDataFrame(rows_a, "doc_id long, text string")
        b = spark.createDataFrame(rows_b, "doc_id long, text string")
        # max_shingle_df=3: the boilerplate shingles (df=7) are hot
        got = {
            (r.left_id, r.right_id): r.jaccard
            for r in D.ngram_jaccard_join(
                a, b, threshold=0.0, max_shingle_df=3
            ).collect()
        }
        # exact jaccard computed off raw shingle sets
        import itertools

        def shset(text):
            t = text.lower().split()
            return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

        for (la, ta), (lb, tb) in itertools.product(rows_a, rows_b):
            sa, sb = shset(ta), shset(tb)
            j = round(len(sa & sb) / len(sa | sb), 6)
            if (la, lb) in got:
                assert got[(la, lb)] == j

    def test_minhash_join_recall_vs_exact(self, spark, docs):
        """LSH-blocked asymmetric join: emitted pairs are a verified
        subset of the exact asymmetric join with high recall (r=2,
        b=16 -> ~0.99 catch probability at s=0.5)."""
        from pyspark.sql import functions as F

        a = docs.filter(F.col("doc_id") % 3 == 0)
        b = docs.filter(F.col("doc_id") % 3 != 0)
        exact = {
            (r.left_id, r.right_id, r.jaccard)
            for r in D.ngram_jaccard_join(a, b, threshold=0.5).collect()
        }
        lsh = {
            (r.left_id, r.right_id, r.jaccard)
            for r in D.minhash_lsh_join(a, b, threshold=0.5,
                                        num_hashes=32,
                                        bands=16).collect()
        }
        assert exact, "fixture must contain cross-side near-dups"
        assert lsh <= exact          # verify-before-emit: no FPs
        assert len(lsh) / len(exact) >= 0.9

    def test_cosine_join_recall_vs_exact(self, spark, emb):
        """Asymmetric embedding join: emitted pairs are exact-cosine
        verified; recall measured vs the exact cross-side pair set."""
        from pyspark.sql import functions as F

        a = emb.filter(F.col("vec_id") % 4 == 0)
        b = emb.filter(F.col("vec_id") % 4 != 0)
        exact_all = S.cosine_near_pairs(
            emb, threshold=0.85, blocked=False, dim=32
        ).toPandas()
        exact = {
            (l, r, c) if l % 4 == 0 else (r, l, c)
            for l, r, c in zip(exact_all.id_a, exact_all.id_b,
                               exact_all.cos_sim)
            if (l % 4 == 0) != (r % 4 == 0)
        }
        got = {
            (r.left_id, r.right_id, r.cos_sim)
            for r in S.cosine_near_join(
                a, b, threshold=0.85, bits=4, dim=32
            ).collect()
        }
        assert exact, "fixture must contain cross-side near pairs"
        assert got <= exact
        assert len(got) / len(exact) >= 0.6  # 4-bit + multiprobe


@pytest.mark.slow
class TestPQ:
    def test_codes_shape_and_determinism(self, emb):
        books = S.pq_train_codebooks(emb, m=8, k=16, dim=32)
        assert len(books) == 8 and len(books[0]) == 16
        assert len(books[0][0]) == 4  # dim/m
        coded = S.pq_encode(emb, books).toPandas()
        assert len(coded) == emb.count()
        assert coded.codes.map(len).eq(8).all()
        assert coded.codes.map(lambda cs: all(1 <= c <= 16
                                              for c in cs)).all()
        again = S.pq_encode(emb.repartition(5), books).toPandas()
        a = coded.sort_values("vec_id").reset_index(drop=True)
        b = again.sort_values("vec_id").reset_index(drop=True)
        assert (a.codes.map(tuple) == b.codes.map(tuple)).all()

    def test_adc_recall_vs_brute_force(self, emb):
        """PQ approximation must keep most true neighbors: clustered
        fixture, m=8 sub-quantizers of the 32-dim space."""
        from pyspark.sql import functions as F

        books = S.pq_train_codebooks(emb, m=8, k=16, dim=32)
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bf = S.brute_force_topk(emb, queries, k=10).toPandas()
        pq = S.pq_adc_topk(emb, queries, books, k=10).toPandas()
        recalls = []
        for q in range(10):
            t = set(bf[bf.query_id == q].vec_id)
            g = set(pq[pq.query_id == q].vec_id)
            recalls.append(len(t & g) / len(t))
        assert np.mean(recalls) >= 0.5
        # within each query the approx distances are non-decreasing
        for q in range(10):
            d = list(pq[pq.query_id == q].sort_values("rank")
                     .approx_dist_micros)
            assert d == sorted(d)

    def test_ivf_pq_composition(self, emb):
        """IVF-PQ end to end: IVF probing shrinks the candidate set,
        ADC ranks the survivors by codes — composed from the two
        oracle-green halves; recall stays useful while candidates
        drop well below the corpus."""
        from pyspark.sql import functions as F

        books = S.pq_train_codebooks(emb, m=8, k=16, dim=32)
        cents = S.train_ivf_centroids(emb, n_centroids=16,
                                      lloyd_iters=0)
        assigned = S._staged_assign(
            emb.select("vec_id", "embedding"), "embedding", cents,
            keep=("vec_id",),
        ).select("vec_id", "list_id")
        corpus = emb.join(assigned, "vec_id")
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bf = S.brute_force_topk(emb, queries, k=10).toPandas()
        q_assigned = {
            r.vec_id: r.list_id for r in assigned.filter(
                F.col("vec_id") < 5).collect()
        }
        recalls, cand_counts = [], []
        for qid, lid in q_assigned.items():
            cand = corpus.filter(F.col("list_id") == lid)
            cand_counts.append(cand.count())
            q1 = queries.filter(F.col("query_id") == qid)
            pq = S.pq_adc_topk(cand, q1, books, k=10).toPandas()
            t = set(bf[bf.query_id == qid].vec_id)
            recalls.append(len(t & set(pq.vec_id)) / len(t))
        assert max(cand_counts) < emb.count() / 2
        assert sum(recalls) / len(recalls) >= 0.5

    def test_vectorized_encode_equality(self, emb):
        """The Arrow/numpy encoder must produce the exact codes the
        expression path does (same 6dp rounding + first-wins argmin)
        — the k=256 production path is only trustworthy if it is
        bit-equal where both paths run."""
        books = S.pq_train_codebooks(emb, m=8, k=16, dim=32)
        a = (S.pq_encode(emb, books).toPandas()
             .sort_values("vec_id").reset_index(drop=True))
        b = (S.pq_encode(emb, books, vectorized=True).toPandas()
             .sort_values("vec_id").reset_index(drop=True))
        assert (a.codes.map(tuple) == b.codes.map(tuple)).all()

    def test_vectorized_encode_large_k(self, emb):
        """k=256 — the PQ-standard codebook size where the
        literal-expression plan hits its planning wall — runs fine on
        the numpy path and yields in-range codes."""
        books = S.pq_train_codebooks(emb, m=8, k=256, dim=32)
        # fixture has 300 vectors; strided seeding caps distinct seeds,
        # but the codebook shape is what matters for the path
        assert len(books[0]) == 256
        out = S.pq_encode(emb, books, vectorized=True).toPandas()
        assert len(out) == emb.count()
        assert out.codes.map(
            lambda cs: all(1 <= c <= 256 for c in cs)).all()

    @staticmethod
    def _quantization_mse(emb, books):
        """Mean squared reconstruction error of the codebooks over the
        fixture — the quantity Lloyd monotonically non-increases."""
        import pandas as pd  # noqa: F401

        rows = emb.orderBy("vec_id").toPandas()
        M = np.array([np.asarray(v, dtype=np.float64)
                      for v in rows.embedding])
        B = np.asarray(books, dtype=np.float64)  # (m, k, d_sub)
        m, _, d_sub = B.shape
        err = 0.0
        for j in range(m):
            sub = M[:, j * d_sub:(j + 1) * d_sub]
            diff = sub[:, None, :] - B[j][None, :, :]
            d = (diff ** 2).sum(-1)
            err += d.min(axis=1).sum()
        return err / M.shape[0]

    def test_lloyd_training_dominates_seeds(self, emb):
        """Per-subspace Lloyd refinement must beat the strided seed
        codebooks: strictly lower quantization MSE, and ADC recall vs
        brute force at least as good."""
        from pyspark.sql import functions as F

        seed = S.pq_train_codebooks(emb, m=8, k=16, dim=32)
        trained = S.pq_train_codebooks(emb, m=8, k=16, dim=32,
                                       lloyd_iters=2)
        mse_seed = self._quantization_mse(emb, seed)
        mse_trained = self._quantization_mse(emb, trained)
        assert mse_trained < mse_seed
        queries = emb.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        bf = S.brute_force_topk(emb, queries, k=10).toPandas()

        def recall(books):
            pq = S.pq_adc_topk(emb, queries, books, k=10).toPandas()
            rs = []
            for q in range(10):
                t = set(bf[bf.query_id == q].vec_id)
                rs.append(len(t & set(pq[pq.query_id == q].vec_id))
                          / len(t))
            return np.mean(rs)

        assert recall(trained) >= recall(seed)

    def test_lloyd_vectorized_parity(self, emb):
        """The numpy-assignment Lloyd path must train the same
        codebooks as the expression path (same rounding/tie policy ->
        same assignments -> same means)."""
        a = S.pq_train_codebooks(emb, m=8, k=16, dim=32,
                                 lloyd_iters=1)
        b = S.pq_train_codebooks(emb, m=8, k=16, dim=32,
                                 lloyd_iters=1, vectorized=True)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_ivfpq_topk(self, emb):
        """The composed ivfpq_topk function (driver query shape):
        recall vs brute force stays useful, the two execution paths
        agree, and ADC distances are non-decreasing in rank."""
        from pyspark.sql import functions as F

        books = S.pq_train_codebooks(emb, m=8, k=16, dim=32,
                                     lloyd_iters=2)
        cents = S.train_ivf_centroids(emb, n_centroids=16,
                                      lloyd_iters=0)
        queries = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        expr = S.ivfpq_topk(emb, queries, books, centroids=cents,
                            k=10, n_probe=4, vectorized=False).toPandas()
        vec = S.ivfpq_topk(emb, queries, books, centroids=cents,
                           k=10, n_probe=4, vectorized=True).toPandas()
        key = ["query_id", "vec_id", "approx_dist_micros", "rank"]
        a = expr[key].sort_values(key).reset_index(drop=True)
        b = vec[key].sort_values(key).reset_index(drop=True)
        assert a.equals(b)
        bf = S.brute_force_topk(emb, queries, k=10).toPandas()
        recalls = []
        for q in range(5):
            t = set(bf[bf.query_id == q].vec_id)
            recalls.append(
                len(t & set(expr[expr.query_id == q].vec_id)) / len(t))
        assert np.mean(recalls) >= 0.5
        for q in range(5):
            d = list(expr[expr.query_id == q].sort_values("rank")
                     .approx_dist_micros)
            assert d == sorted(d)

    def test_resolve_vectorized_dial(self):
        """The expression-vs-numpy switch: explicit override always
        wins; None flips to numpy above IVF_EXPR_CENTROID_MAX."""
        assert S._resolve_vectorized(True, 4) is True
        assert S._resolve_vectorized(False, 10_000) is False
        assert S._resolve_vectorized(
            None, S.IVF_EXPR_CENTROID_MAX) is False
        assert S._resolve_vectorized(
            None, S.IVF_EXPR_CENTROID_MAX + 1) is True

    def test_ivf_auto_switch_plan(self, emb, monkeypatch):
        """Above the centroid threshold ivf_topk must pick the Arrow
        path without the caller setting any dial: the executed plan
        contains ArrowEvalPython stages instead of the literal
        expression tree."""
        from pyspark.sql import functions as F

        cents = S.train_ivf_centroids(emb, n_centroids=16,
                                      lloyd_iters=0)
        queries = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        monkeypatch.setattr(S, "IVF_EXPR_CENTROID_MAX", 8)
        auto = S.ivf_topk(emb, queries, k=5, centroids=cents,
                          n_probe=2)
        plan = auto._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan
        monkeypatch.setattr(S, "IVF_EXPR_CENTROID_MAX", 512)
        expr = S.ivf_topk(emb, queries, k=5, centroids=cents,
                          n_probe=2)
        plan2 = expr._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan2


@pytest.mark.slow
class TestContainment:
    def _docs(self, spark):
        rng = np.random.default_rng(23)
        vocab = [f"tok{i}" for i in range(300)]
        long_doc = " ".join(rng.choice(vocab, size=160))
        # doc 1 is a 40-token excerpt of the 160-token doc 2 with a
        # tiny unique tail: containment(1 in 2) ~ 1 while the reverse
        # direction is ~ the excerpt's quarter share of doc 2
        words = long_doc.split()
        quote = " ".join(words[20:60]) + " uniq1 uniq2"
        other = " ".join(rng.choice(vocab, size=60))
        return spark.createDataFrame(
            [(1, quote), (2, long_doc), (3, other)],
            "doc_id long, text string",
        )

    def test_quote_containment_detected(self, spark):
        out = {
            (r.inner_id, r.outer_id): r.containment
            for r in D.winnow_containment_pairs(
                self._docs(spark), threshold=0.5
            ).collect()
        }
        assert out.get((1, 2), 0) >= 0.8      # the excerpt is contained
        assert (2, 1) not in out              # not symmetric
        assert not any(3 in p for p in out)   # unrelated doc clean

    def test_duckdb_parity(self, spark):
        import duckdb

        from pdfextraction_spark.oracle import portable_sql as P

        docs = self._docs(spark)
        got = sorted(
            (r.inner_id, r.outer_id, r.containment)
            for r in D.winnow_containment_pairs(
                docs, threshold=0.1
            ).collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(
            map(tuple,
                con.execute(
                    P.winnow_containment_sql(threshold=0.1)
                ).fetchall())
        )
        assert got == want

    def test_fast_family_finds_the_same_pair(self, spark):
        got = {
            (r.inner_id, r.outer_id)
            for r in D.winnow_containment_pairs(
                self._docs(spark), threshold=0.5, fast=True
            ).collect()
        }
        assert (1, 2) in got

    def test_hot_fp_stoplist_keeps_exact_containment(self, spark):
        """With max_fp_df=1 every shared fp is 'hot': candidates can
        only come from cold collisions, so pairs sharing ONLY hot fps
        vanish — but any pair that still surfaces must report the
        SAME exact containment as the unstoplisted run."""
        docs = self._docs(spark)
        base = {
            (r.inner_id, r.outer_id): r.containment
            for r in D.winnow_containment_pairs(
                docs, threshold=0.1
            ).collect()
        }
        capped = {
            (r.inner_id, r.outer_id): r.containment
            for r in D.winnow_containment_pairs(
                docs, threshold=0.1, max_fp_df=2
            ).collect()
        }
        assert set(capped) <= set(base)
        for pair, c in capped.items():
            assert c == base[pair]


@pytest.mark.slow
class TestCorpusDiff:
    def test_statuses_and_normalized_unchanged(self, spark):
        """Whitespace/case-mangled re-crawls are UNCHANGED (shared
        normalized fingerprint); real edits are changed; one-sided
        ids are added/removed; unchanged docs are omitted."""
        old = spark.createDataFrame(
            [(1, "a b c"), (2, "same text"), (3, "will vanish")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "  A   b  C "), (2, "same text edited"), (4, "fresh")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.status
               for r in D.corpus_diff(old, new).collect()}
        assert got == {2: "changed", 3: "removed", 4: "added"}

    def test_dup_rate_by_source(self, spark):
        """Two sources: s0 has 3 docs of which 2 share normalized
        text (rate 1/3); s1 all unique (rate 0)."""
        df = spark.createDataFrame(
            [(1, "a b", "s0"), (2, "  A  B ", "s0"), (3, "c", "s0"),
             (4, "d", "s1"), (5, "e", "s1")],
            "doc_id long, text string, source string",
        )
        got = {r.source: r for r in
               D.dup_rate_by_source(df).collect()}
        assert got["s0"].n_docs == 3 and got["s0"].n_unique == 2
        assert got["s0"].dup_rate == round(1 - 2 / 3, 6)
        assert got["s1"].dup_rate == 0.0


@pytest.mark.slow
class TestSemanticDedup:
    """SemDeDup-style within-cluster epsilon-ball prune."""

    def test_planted_near_identicals_pruned(self, spark):
        # 3 clusters x 5 members; in cluster 0 vectors 1 and 2 are
        # near-copies of vector 0 (cosine ~ 1) — both must be dropped,
        # the lowest-id copy kept
        rng = np.random.default_rng(23)
        cents = rng.standard_normal((3, 16))
        rows = []
        vid = 0
        for ci, c in enumerate(cents):
            for j in range(5):
                v = c + 2.0 * rng.standard_normal(16)
                if ci == 0 and j in (1, 2):
                    v = cents[0] * 3.0 + 0.001 * rng.standard_normal(16)
                if ci == 0 and j == 0:
                    v = cents[0] * 3.0
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        out = S.semantic_dedup(
            df, threshold=0.95, n_centroids=3, lloyd_iters=0
        ).toPandas().set_index("vec_id")
        assert len(out) == 15
        assert bool(out.loc[0, "is_kept"])        # first copy survives
        assert not bool(out.loc[1, "is_kept"])    # later copies pruned
        assert not bool(out.loc[2, "is_kept"])
        # everything outside the planted ball survives at 0.95
        assert out.loc[3:, "is_kept"].all()

    def test_every_vector_appears_once(self, emb):
        out = S.semantic_dedup(emb, threshold=0.9, n_centroids=8,
                               lloyd_iters=0).toPandas()
        assert len(out) == emb.count()
        assert out["vec_id"].is_unique
        assert set(out.columns) == {"vec_id", "list_id", "is_kept"}

    def test_vectorized_assignment_parity(self, emb):
        a = S.semantic_dedup(emb, threshold=0.9, n_centroids=8,
                             lloyd_iters=0, vectorized=False).toPandas()
        b = S.semantic_dedup(emb, threshold=0.9, n_centroids=8,
                             lloyd_iters=0, vectorized=True).toPandas()
        pd.testing.assert_frame_equal(
            a.sort_values("vec_id").reset_index(drop=True),
            b.sort_values("vec_id").reset_index(drop=True),
        )


class TestIncrementalUpdate:
    """Composite crawl-increment step: diff -> asymmetric near-dup
    join -> verdicts."""

    def test_planted_scenario(self, spark):
        base = " ".join(f"w{i}" for i in range(40))
        near = " ".join(
            f"w{i}" if i != 3 else "zz" for i in range(40))
        old = spark.createDataFrame(
            [(1, base), (2, "totally different text about other things"),
             (3, "this one will change")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, base), (2, "totally different text about other things"),
             (3, "this one has now changed"),
             (10, near),                      # added near-copy of doc 1
             (11, "novel content nothing like the corpus")],  # added
            "doc_id long, text string",
        )
        out = D.incremental_update(old, new, threshold=0.2) \
            .toPandas().set_index("doc_id").sort_index()
        # only added/changed docs appear
        assert set(out.index) == {3, 10, 11}
        assert out.loc[3, "status"] == "changed"
        assert out.loc[10, "status"] == "added"
        assert out.loc[10, "verdict"] == "dup_of"
        assert out.loc[10, "dup_of"] == 1
        assert out.loc[10, "jaccard"] > 0.2
        assert out.loc[11, "verdict"] == "unique"
        assert out.loc[11, "dup_of"] == -1
        assert out.loc[11, "jaccard"] == 0.0

    def test_unchanged_docs_never_probe(self, spark):
        """Byte-identical snapshots produce ZERO output rows — the
        no-op increment costs no near-dup work."""
        docs = spark.createDataFrame(
            [(i, f"text number {i} with words") for i in range(20)],
            "doc_id long, text string",
        )
        assert D.incremental_update(docs, docs).count() == 0

    def test_string_ids_keep_null_sentinel(self, spark):
        """STRING doc ids: the -1 unique sentinel is numeric-only — a
        coerced '-1' string would silently shift the dup_of column
        type, so unique docs keep NULL and dup_of stays the id's own
        type."""
        base = "the quick brown fox jumps over the lazy dog " * 3
        old = spark.createDataFrame(
            [("a", base)], "doc_id string, text string"
        )
        new = spark.createDataFrame(
            [("a", base),
             ("b", base + "extra tail words"),
             ("c", "novel content nothing like the corpus")],
            "doc_id string, text string",
        )
        out = D.incremental_update(old, new, threshold=0.2) \
            .toPandas().set_index("doc_id").sort_index()
        assert set(out.index) == {"b", "c"}
        assert out.loc["b", "verdict"] == "dup_of"
        assert out.loc["b", "dup_of"] == "a"
        assert out.loc["c", "verdict"] == "unique"
        assert out.loc["c", "dup_of"] is None or pd.isna(
            out.loc["c", "dup_of"])


@pytest.mark.slow
class TestAnnIndexPersistence:
    """Build-once/search-many: parquet index layout, partition-pruned
    probes, search equality vs the in-memory composition."""

    def test_roundtrip_search_equality(self, emb, tmp_path):
        from pdfextraction_spark.sources.ann_index import (
            build_ann_index,
            ivfpq_topk_indexed,
            load_ann_index,
        )

        spark = emb.sparkSession
        p = str(tmp_path / "ivfpq_index")
        built = build_ann_index(
            emb, p, n_centroids=8, m=8, k=16, dim=32,
            lloyd_iters=1, pq_lloyd_iters=1,
        )
        loaded = load_ann_index(spark, p)
        assert loaded.centroids == built.centroids
        assert loaded.codebooks == built.codebooks
        queries = emb.filter(emb.vec_id < 4).select(
            emb.vec_id.alias("query_id"), "embedding")
        got = ivfpq_topk_indexed(loaded, queries, k=5, n_probe=3) \
            .toPandas().sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        want = S.ivfpq_topk(
            emb, queries, built.codebooks, centroids=built.centroids,
            k=5, n_probe=3,
        ).toPandas().sort_values(["query_id", "rank"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype(want.dtypes.to_dict()), want)

    def test_append_equals_rebuild(self, emb, tmp_path):
        """Incremental maintenance: build on 9 of every cluster's 10
        points, append the held-out tenth (same distribution — an
        id-range split would put whole UNSEEN clusters in the batch
        and trip the drift signal) with the FROZEN quantizers — search
        results must be bit-identical to a from-scratch build of the
        full corpus under the same quantizers (the rebuild a
        non-incremental pipeline would pay), and meta must carry the
        summed vector count."""
        from pdfextraction_spark.sources.ann_index import (
            append_to_ann_index,
            build_ann_index,
            ivfpq_topk_indexed,
            load_ann_index,
        )

        spark = emb.sparkSession
        old = emb.filter(emb.vec_id % 10 < 9)
        new = emb.filter(emb.vec_id % 10 == 9)
        p_inc = str(tmp_path / "idx_incremental")
        built = build_ann_index(
            old, p_inc, n_centroids=8, m=8, k=16, dim=32,
            lloyd_iters=1, pq_lloyd_iters=1,
        )
        stats = append_to_ann_index(load_ann_index(spark, p_inc), new)
        assert stats["n_appended"] == 30
        assert stats["n_vectors"] == 300
        assert stats["build_quant_mse"] > 0
        # same clustered distribution -> the frozen quantizers still
        # represent the batch (no drift)
        assert 0.5 < stats["staleness_ratio"] < 2.0
        # meta is a versioned append-only log now: the loader's
        # max-ver row carries the post-append count, and the build
        # row (ver=0) must still be present underneath
        from pdfextraction_spark.sources.ann_index import _read_meta

        meta = _read_meta(spark, p_inc)
        assert meta.n_vectors == 300 and meta.ver == 1
        all_meta = spark.read.parquet(p_inc + "/meta.parquet").collect()
        assert sorted(r.ver for r in all_meta) == [0, 1]
        # the CLI's ann-build report must read the MAX-VER meta row:
        # exercised against this appended 2-row log — a raw
        # collect()[0] could report the stale ver-0 row's pre-append
        # n_vectors (the round-5 latent trap)
        from pdfextraction_spark.cli import _ann_index_report

        report = _ann_index_report(spark, p_inc, 8)
        assert report["n_vectors"] == 300 and report["ver"] == 1
        p_full = str(tmp_path / "idx_rebuild")
        build_ann_index(
            emb, p_full, n_centroids=8, m=8, k=16, dim=32,
            centroids=built.centroids, codebooks=built.codebooks,
        )
        queries = emb.filter(emb.vec_id % 50 == 0).select(
            emb.vec_id.alias("query_id"), "embedding")

        def run(path):
            return ivfpq_topk_indexed(
                load_ann_index(spark, path), queries, k=5, n_probe=3
            ).toPandas().sort_values(["query_id", "rank"]) \
                .reset_index(drop=True)

        pd.testing.assert_frame_equal(run(p_inc), run(p_full))

    def test_append_staleness_signal(self, emb, tmp_path):
        """A drifted batch (shifted distribution) must show a
        quantization MSE well above build-time — the retrain signal
        the staleness ratio exists to surface."""
        from pdfextraction_spark.sources.ann_index import (
            append_to_ann_index,
            build_ann_index,
            load_ann_index,
        )

        from pyspark.sql import functions as F

        spark = emb.sparkSession
        p = str(tmp_path / "idx_drift")
        build_ann_index(emb, p, n_centroids=8, m=8, k=16, dim=32,
                        lloyd_iters=1, pq_lloyd_iters=1)
        drifted = emb.select(
            (emb.vec_id + 1000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x * F.lit(3.0) + F.lit(2.0)
            ).alias("embedding"),
        )
        stats = append_to_ann_index(load_ann_index(spark, p), drifted)
        assert stats["staleness_ratio"] > 3.0

    def test_probe_scan_partition_pruned(self, emb, tmp_path):
        from pdfextraction_spark.sources.ann_index import (
            build_ann_index,
            ivfpq_topk_indexed,
            load_ann_index,
        )

        spark = emb.sparkSession
        p = str(tmp_path / "ivfpq_index2")
        build_ann_index(emb, p, n_centroids=8, m=8, k=16, dim=32,
                        lloyd_iters=0, pq_lloyd_iters=0)
        loaded = load_ann_index(spark, p)
        queries = emb.filter(emb.vec_id < 2).select(
            emb.vec_id.alias("query_id"), "embedding")
        df = ivfpq_topk_indexed(loaded, queries, k=5, n_probe=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the coded scan must carry the probed-list partition filter
        assert "PartitionFilters" in plan
        import re
        pf = [ln for ln in plan.splitlines()
              if "PartitionFilters" in ln and "list_id" in ln]
        assert pf, plan
        assert re.search(r"PartitionFilters: \[[^\]]*list_id", pf[0])


@pytest.mark.slow
class TestAnnIndexValidation:
    def test_truncated_centroids_rejected(self, emb, tmp_path):
        from pdfextraction_spark.sources.ann_index import (
            build_ann_index,
            load_ann_index,
        )

        spark = emb.sparkSession
        p = str(tmp_path / "idx")
        built = build_ann_index(emb, p, n_centroids=8, m=8, k=16,
                                dim=32, lloyd_iters=0, pq_lloyd_iters=0)
        # simulate a partial centroid write: drop the last row
        import os
        spark.createDataFrame(
            [(i + 1, c) for i, c in enumerate(built.centroids[:-1])],
            "list_id int, c array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(p, "centroids.parquet"))
        with pytest.raises(ValueError, match="centroids on"):
            load_ann_index(spark, p)


class TestConversationDedup:
    def test_mangled_copy_collapses_and_order_matters(self, spark):
        rows = [
            ("c1", 0, "Hello  there"), ("c1", 1, "general kenobi"),
            # whitespace/case-mangled re-ingest of c1
            ("c9", 0, "  hello THERE"), ("c9", 1, "GENERAL  kenobi "),
            # same turn texts as c1 but swapped order -> NOT a dup
            ("c2", 0, "general kenobi"), ("c2", 1, "Hello  there"),
            # turn-boundary aliasing: "hello there general"+"kenobi"
            ("c3", 0, "hello there general"), ("c3", 1, "kenobi"),
            ("c4", 0, None), ("c4", 1, "x"),
        ]
        t = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string")
        out = D.conversation_dedup(t).toPandas().set_index("conv_id")
        assert out.loc["c9", "canonical_id"] == "c1"
        assert not bool(out.loc["c9", "is_canonical"])
        assert out.loc["c1", "group_size"] == 2
        assert bool(out.loc["c1", "is_canonical"])
        for c in ("c2", "c3", "c4"):
            assert bool(out.loc[c, "is_canonical"])
            assert out.loc[c, "group_size"] == 1

    def test_separator_byte_cannot_alias_boundary(self, spark):
        # a literal \x1e inside a turn must NOT fake a turn boundary
        # (per-turn digests are joined, never raw text)
        rows = [("a", 0, "x\x1ey"), ("b", 0, "x"), ("b", 1, "y")]
        t = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string")
        out = D.conversation_dedup(t).toPandas().set_index("conv_id")
        assert bool(out.loc["a", "is_canonical"])
        assert bool(out.loc["b", "is_canonical"])
        assert (out.group_size == 1).all()
