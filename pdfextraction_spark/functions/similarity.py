"""Embedding similarity search (array<float> columns, JVM-side math).

- cosine_sim: F.zip_with/F.aggregate dot products — whole-stage
  codegen, no Python
- brute_force_topk: exact top-k per query (cross join; broadcast the
  query side — correct baseline and the verifier for the ANN path)
- lsh_bucket_topk: random-hyperplane (sign) LSH — queries only join
  candidates sharing a bucket; the scale path (candidates/query drops
  from N to N/2^bits on average)
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_sim(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def _as_double(col):
    return F.transform(col, lambda v: v.cast("double"))


# --------------------------------------------------------------------------
# codegen'd fixed-width dot products (optimization guide §4.1: prefer
# built-ins/codegen over interpreted paths).
#
# The HOF forms above (aggregate over zip_with) are evaluated by the
# INTERPRETED expression walker — measured ~53 s of pure JVM CPU for
# one pair-verify stage at bench scale. When the vector width is known
# statically, the identical left-to-right float fold unrolls into a
# codegen'd Add chain: 0.0 + a[0]*b[0] + a[1]*b[1] + ... reproduces
# the fold order bit-for-bit (same additions, same sequence), so every
# rounded-6dp value — and therefore every oracle hash — is unchanged.
# A size guard keeps any row whose array width differs from the
# declared dim on the exact HOF fallback (ANSI mode would otherwise
# throw on the out-of-bounds index), so the functions stay correct on
# arbitrary inputs.
#
# Scope discipline (measured, round 7): the unrolled chain is used
# ONLY at the high-cardinality pair-verify sites, where one O(pairs)
# stage carries a single dot. Unrolling every dot (norms, buckets,
# 16-centroid score arrays) multiplies generated-code size past the
# JIT sweet spot and pays a Janino compile per stage per query
# (generated sources embed fresh expression ids, so the codegen cache
# cannot reuse them across queries) — a measured net LOSS at the
# O(corpus-rows) sites, which stay on the compact HOF form.

_FIXED_DIM_MAX = 256


def _dot_chain_sql(a: str, b: str, dim: int) -> str:
    """0.0 + a[0]*b[0] + ... — the HOF fold, unrolled (same order)."""
    terms = " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(dim))
    return f"(cast(0.0 as double) + {terms})"


def _dot_hof_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"cast(0.0 as double), (acc, v) -> acc + v)"
    )


def _dot_cols(a: str, b: str, dim: Optional[int]):
    """Dot product of two BOUND array<double> columns (by name), as a
    codegen'd fixed-width chain when ``dim`` is known, guarded back to
    the exact interpreted form for non-conforming rows."""
    if dim is None or dim > _FIXED_DIM_MAX:
        return _dot(F.col(a), F.col(b))
    return F.expr(
        f"CASE WHEN size({a}) = {dim} AND size({b}) = {dim} "
        f"THEN {_dot_chain_sql(a, b, dim)} "
        f"ELSE {_dot_hof_sql(a, b)} END"
    )


def _lit_arr(vals) -> "F.Column":
    """Array literal in ONE py4j call (F.lit over a Python list) —
    the per-element F.array(F.lit(x), ...) form costs a py4j round
    trip per element (~1 ms each; a 64-dim centroid array built that
    way costs ~0.1 s of driver time, and a 16-centroid codebook ~1 s).
    Same literal values, same plan semantics."""
    return F.lit([float(x) for x in vals])


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k for every query vector.

    queries: (query_id, embedding). Output: (query_id, vec_id, sim,
    rank). Ties broken by vec_id for determinism."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    blocked: bool = True,
    bits: int = 8,
    dim: int = 64,
    planes: Optional[List[List[float]]] = None,
    multiprobe: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b, cosine >= threshold).

    ``blocked=True`` (the scale path): candidates must share a sign-LSH
    bucket — one side additionally probes its Hamming-distance-1
    buckets (multiprobe), then exact cosine verifies. Shuffles
    (id, bucket, vector) once; no all-pairs. Recall is probabilistic
    (~(1 - theta/pi)^bits per bucket, boosted by multiprobe) —
    measured vs the exact form in tests.

    ``blocked=False``: exact all-pairs cross join — the verifier and
    the small-N path; O(n^2), never run this on a corpus.

    ``portable=True`` (blocked path only): md5-derived integer planes
    + quantized bucketing so the DuckDB oracle reproduces the blocked
    candidate set exactly."""
    # compute each vector's norm ONCE: the pair expression is then a
    # dot product and one division — recomputing both norms per pair
    # would triple the flops on an O(pairs) expression
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
    ).withColumn("n", _norm(F.col("v")))

    def pair_cos(a, b):
        return F.round(
            _dot_cols(f"{a}.v", f"{b}.v", dim)
            / (F.col(f"{a}.n") * F.col(f"{b}.n")),
            6,
        )

    if not blocked:
        a, b = e.alias("a"), e.alias("b")
        return (
            a.crossJoin(b)
            .filter(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                pair_cos("a", "b").alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    if portable and planes is None:
        planes = det_int_planes(dim, bits)
    planes = planes or random_hyperplanes(dim, bits)
    bucket = lsh_bucket_id("v", planes, quantize=portable, is_double=True)
    eb = e.withColumn("bucket", bucket)
    probe_list = (
        F.array(F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                  for i in range(len(planes))])
        if multiprobe
        else F.array(F.col("bucket"))
    )
    pb = eb.select(
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("v_b"),
        F.col("n").alias("n_b"),
        F.explode(probe_list).alias("bucket"),
    )
    pa = eb.select(
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("v_a"),
        F.col("n").alias("n_a"),
        "bucket",
    )
    return (
        pa.join(pb, (pa.bucket == pb.bucket) & (F.col("id_a") < F.col("id_b")))
        .select(
            "id_a",
            "id_b",
            F.round(
                _dot_cols("v_a", "v_b", dim)
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def cosine_near_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    dim: int = 64,
    planes: Optional[List[List[float]]] = None,
    multiprobe: bool = True,
    portable: bool = False,
) -> DataFrame:
    """ASYMMETRIC embedding near-dup join — incremental dedup on the
    embedding column: (left_id, right_id, cos_sim >= threshold) across
    two corpora, neither side self-joined. Candidates must share a
    sign-LSH bucket (the LEFT/new-batch side multiprobes its
    Hamming-1 buckets — the smaller side pays the probe fan-out);
    exact cosine verifies before emit. Same plane family and recall
    model as cosine_near_pairs(blocked=True)."""
    if portable and planes is None:
        planes = det_int_planes(dim, bits)
    planes = planes or random_hyperplanes(dim, bits)

    def side(df: DataFrame, out_id: str):
        e = df.select(
            F.col(id_col).alias(out_id),
            _as_double(F.col(vec_col)).alias("v"),
        ).withColumn("n", _norm(F.col("v")))
        return e.withColumn(
            "bucket",
            lsh_bucket_id("v", planes, quantize=portable, is_double=True),
        )

    el = side(left, "left_id")
    er = side(right, "right_id")
    probe_list = (
        F.array(F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                  for i in range(len(planes))])
        if multiprobe
        else F.array(F.col("bucket"))
    )
    pl = el.select(
        "left_id",
        F.col("v").alias("v_l"),
        F.col("n").alias("n_l"),
        F.explode(probe_list).alias("bucket"),
    )
    pr = er.select(
        "right_id",
        F.col("v").alias("v_r"),
        F.col("n").alias("n_r"),
        "bucket",
    )
    return (
        pl.join(pr, "bucket")
        .select(
            "left_id",
            "right_id",
            F.round(
                _dot_cols("v_l", "v_r", dim)
                / (F.col("n_l") * F.col("n_r")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


# --------------------------------------------------------------------------
# product quantization (PQ) — the compression half of IVF-PQ, the
# standard layout for billion-scale embedding stores: a dim-d vector
# becomes m one-byte-ish codes (one per subspace), an ~d*4/m x
# compression, and search scores candidates with an asymmetric
# distance computation (ADC): per query, one m x k table of exact
# sub-distances; a candidate's approximate distance is m table
# lookups, never a d-dim dot product. (Jegou et al., PAMI 2011.)


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 0,
    vectorized: Optional[bool] = None,
) -> List[List[List[float]]]:
    """Deterministic PQ codebooks: the strided seed sample's
    subvectors (same seeding discipline as train_ivf_centroids —
    reproducible in SQL, so the driver oracle can re-derive the exact
    codebooks), optionally refined by ``lloyd_iters`` per-subspace
    distributed Lloyd iterations (the PRODUCTION config — trained
    codebooks materially shrink quantization error; the recall and
    MSE improvements over seeds are pinned in tests). All m subspaces
    train in ONE Spark job per iteration: assign codes, explode the
    (subspace, code, subvector) triples once, per-(j, code, dim)
    mean; the collect is bounded at m x k x (dim/m) = k x dim rows.
    ``lloyd_iters=0`` is the oracle-exact seed config the driver
    checks. Returns m codebooks of k centroids of dim/m floats."""
    d_sub = dim // m
    vec = _resolve_vectorized(vectorized, k)
    seeds = _strided_seed_vectors(embeddings, k, id_col, vec_col)
    books = [
        [seed[j * d_sub:(j + 1) * d_sub] for seed in seeds]
        for j in range(m)
    ]
    for _ in range(lloyd_iters):
        books = _pq_lloyd_step(embeddings, vec_col, books,
                               vectorized=vec)
    return books


def _pq_staged_codes(
    embeddings: DataFrame,
    codebooks: List[List[List[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: Sequence[str] = (),
) -> DataFrame:
    """Expression-path PQ assignment, fully staged: returns (vec_id,
    v, __sub0.., c0..) where c{j} is the 1-based index of the nearest
    codebook-j centroid by squared L2 rounded to 6dp, first-wins ties
    — reproducible across engines. The cast vector and every
    per-subspace distance array are staged projection columns (the
    interpreted-HOF staging rule)."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    staged = embeddings.select(
        F.col(id_col).alias("vec_id"),
        *keep,
        _as_double(F.col(vec_col)).alias("v"),
    )
    # per-subspace distance arrays as ONE SQL expression each: the
    # squared-difference fold unrolls to a codegen chain with the
    # identical addition order (values unchanged), and the whole m x k
    # literal tree parses in one py4j call per subspace instead of
    # ~m x k x d_sub Column calls (~1 s of driver time per query at
    # the driver's k=16). Non-conforming subvector widths fall back to
    # the exact interpreted form (zip_with pads nulls, as before).
    for j, book in enumerate(codebooks):
        sub = F.slice(F.col("v"), j * d_sub + 1, d_sub)
        staged = staged.withColumn(f"__sub{j}", sub)
        sname = f"__sub{j}"

        def one(c, fixed: bool) -> str:
            if fixed:
                terms = " + ".join(
                    f"({sname}[{i}] - {float(x)!r}D) * "
                    f"({sname}[{i}] - {float(x)!r}D)"
                    for i, x in enumerate(c)
                )
                acc = f"cast(0.0 as double) + {terms}"
            else:
                arr = ", ".join(f"{float(x)!r}D" for x in c)
                acc = (
                    f"aggregate(transform(zip_with({sname}, array({arr}), "
                    f"(a, b) -> a - b), x -> x * x), "
                    f"cast(0.0 as double), (acc, x) -> acc + x)"
                )
            return f"round({acc}, 6)"

        fixed_arr = ", ".join(one(c, True) for c in book)
        hof_arr = ", ".join(one(c, False) for c in book)
        staged = staged.withColumn(
            f"__d{j}",
            F.expr(
                f"CASE WHEN size({sname}) = {d_sub} "
                f"THEN array({fixed_arr}) ELSE array({hof_arr}) END"
            ),
        )
    code_cols = [
        F.array_position(F.col(f"__d{j}"), F.array_min(F.col(f"__d{j}")))
        .cast("int")
        .alias(f"c{j}")
        for j in range(m)
    ]
    return staged.select(
        "vec_id", *keep, "v",
        *[F.col(f"__sub{j}") for j in range(m)], *code_cols
    )


def np_pq_encode_udf(codebooks: List[List[List[float]]]):
    """Vectorized (Arrow-batch numpy) PQ encoder — the PRODUCTION
    path. The expression form embeds m x k literal centroid arrays in
    the plan; at production k=256 that is the same planning-cost wall
    the IVF expression path hits near ~1k centroids. Here the
    codebooks live in the UDF closure and a whole Arrow batch is
    scored with one vectorized squared-difference reduction per
    subspace — no giant plan, arbitrary k.

    Tie/rounding policy matches the expression path: squared L2
    rounded to 6dp, argmin first-wins (np.argmin = first occurrence;
    np.round is half-to-even vs Spark's half-up — they differ only
    for a distance landing exactly on a 5e-7 boundary, pinned absent
    on the fixture by the equality test)."""
    from pyspark.sql.functions import pandas_udf

    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, d_sub)
    m, _, d_sub = B.shape

    @pandas_udf("array<int>")
    def encode(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v],
                     dtype=np.float64)
        if M.size == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((M.shape[0], m), dtype=np.int32)
        for j in range(m):
            sub = M[:, j * d_sub:(j + 1) * d_sub]
            # (rows, k, d_sub) diff tensor — same terms the expression
            # path sums, so the 6dp-rounded argmin agrees
            diff = sub[:, None, :] - B[j][None, :, :]
            d = np.round(np.einsum("rkd,rkd->rk", diff, diff), 6)
            codes[:, j] = np.argmin(d, axis=1) + 1
        return pd.Series(list(codes))

    # same §4.4 marking as np_centroid_assign_udf (the fused
    # assign+encode select must stay ONE ArrowEvalPython node)
    return encode.asNondeterministic()


def np_pq_recon_err_udf(codebooks: List[List[List[float]]]):
    """Per-vector squared PQ reconstruction error (Arrow-batch numpy):
    for each subspace, the (6dp-rounded, argmin-first — the encode
    tie/rounding contract) distance to the NEAREST codeword, summed
    over subspaces. That sum is exactly ||v - reconstruction(v)||^2
    for the code pq_encode would assign, so averaging it over a batch
    gives the batch's quantization MSE without materializing codes."""
    from pyspark.sql.functions import pandas_udf

    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, d_sub)
    m, _, d_sub = B.shape

    @pandas_udf("double")
    def err(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v],
                     dtype=np.float64)
        if M.size == 0:
            return pd.Series([], dtype=np.float64)
        out = np.zeros(M.shape[0], dtype=np.float64)
        for j in range(m):
            sub = M[:, j * d_sub:(j + 1) * d_sub]
            diff = sub[:, None, :] - B[j][None, :, :]
            d = np.round(np.einsum("rkd,rkd->rk", diff, diff), 6)
            out += d[np.arange(d.shape[0]), np.argmin(d, axis=1)]
        return pd.Series(out)

    return err


def pq_quantization_mse(
    embeddings: DataFrame,
    codebooks: List[List[List[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean squared PQ reconstruction error of ``embeddings`` under
    ``codebooks`` — the index-staleness probe: a fresh crawl batch
    whose MSE is far above the build-time MSE is drifting away from
    the frozen quantizers (retrain signal). One scan, one avg
    aggregation, a single-double collect — corpus-scale safe."""
    row = embeddings.select(
        np_pq_recon_err_udf(codebooks)(
            _as_double(F.col(vec_col))
        ).alias("__e")
    ).agg(F.avg("__e").alias("mse")).collect()[0]
    return float(row.mse) if row.mse is not None else 0.0


def pq_encode(
    embeddings: DataFrame,
    codebooks: List[List[List[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: Optional[bool] = None,
    keep: Sequence[str] = (),
) -> DataFrame:
    """(vec_id, keep..., codes array<int>): per subspace, the 1-based
    index of the nearest codebook centroid by squared L2, rounded to
    6dp with first-wins ties — reproducible across engines. ``keep``
    columns ride along (so a composed pipeline like IVF-PQ carries
    list_id through the encode instead of re-joining the corpus).

    ``vectorized=True`` (production): Arrow-batch numpy assignment
    (np_pq_encode_udf) instead of literal-array column expressions —
    same codes (equality pinned in tests), but the plan stays small
    so k can grow to the PQ-standard 256. ``None`` auto-selects on
    the codebook size k (the m x k literal plan is the wall), so a
    k=256 codebook never silently takes the expression path; the
    oracle-exact expression form stays the default at the driver's
    k=16."""
    m = len(codebooks)
    vectorized = _resolve_vectorized(vectorized, len(codebooks[0]))
    if vectorized:
        return embeddings.select(
            F.col(id_col).alias("vec_id"),
            *keep,
            np_pq_encode_udf(codebooks)(_as_double(F.col(vec_col)))
            .alias("codes"),
        )
    staged = _pq_staged_codes(embeddings, codebooks, id_col, vec_col,
                              keep=keep)
    return staged.select(
        "vec_id", *keep,
        F.array(*[F.col(f"c{j}") for j in range(m)]).alias("codes"),
    )


def _pq_lloyd_step(
    embeddings: DataFrame,
    vec_col: str,
    codebooks: List[List[List[float]]],
    vectorized: bool = False,
) -> List[List[List[float]]]:
    """One distributed per-subspace Lloyd iteration for ALL m
    subspaces in a single Spark job: assign every subvector to its
    nearest code, recompute each (subspace, code) centroid as the
    per-dimension mean of its members. The shuffle moves (j, code,
    pos, partial mean) — never vectors; the collect is bounded at
    m x k x d_sub = k x dim rows. Empty cells keep their previous
    centroid (same policy as the IVF _lloyd_step).

    Explode discipline: the assignment columns and subvector slices
    are staged projections BEFORE the explode select, so the Generate
    cannot lift the scoring above itself and re-run it per element
    (the generate-lift trap documented on _staged_assign)."""
    m = len(codebooks)
    k = len(codebooks[0])
    d_sub = len(codebooks[0][0])
    if vectorized:
        staged = embeddings.select(
            _as_double(F.col(vec_col)).alias("v")
        ).withColumn(
            "__codes", np_pq_encode_udf(codebooks)(F.col("v"))
        )
        for j in range(m):
            staged = staged.withColumn(
                f"__sub{j}", F.slice(F.col("v"), j * d_sub + 1, d_sub)
            ).withColumn(f"c{j}", F.element_at("__codes", j + 1))
    else:
        # the Lloyd step needs no real id — a constant satisfies the
        # staged-codes projection and is pruned by the explode select
        staged = _pq_staged_codes(
            embeddings.withColumn("__pq_id", F.lit(0)), codebooks,
            id_col="__pq_id", vec_col=vec_col,
        )
    entries = F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.col(f"c{j}").alias("code"),
            F.col(f"__sub{j}").alias("sub"),
        )
        for j in range(m)
    ])
    ex = (
        staged.withColumn("__e", entries)
        .select(F.explode("__e").alias("e"))
        .select("e.j", "e.code", F.posexplode("e.sub").alias("pos", "val"))
    )
    means = (
        ex.groupBy("j", "code", "pos")
        .agg(F.avg("val").alias("mu"))
        .collect()
    )
    new = [[list(c) for c in book] for book in codebooks]
    got: dict = {}
    for r in means:
        got.setdefault((r.j, r.code), [0.0] * d_sub)[r.pos] = r.mu
    for (j, code), vec in got.items():
        new[j][code - 1] = vec  # code is 1-based (array_position)
    return new


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: List[List[List[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    vectorized: Optional[bool] = None,
) -> DataFrame:
    """PQ search by asymmetric distance: corpus vectors are REDUCED TO
    CODES (pq_encode — at store scale only the codes are persisted);
    each query's exact m x k sub-distance table rides the plan as a
    literal, and a candidate's approximate distance is the sum of m
    table lookups via zip_with(codes, table) — O(m) per candidate,
    independent of dim. Queries are collected driver-side (the query
    set is bounded, same stance as the IVF centroid collect).

    Output: (query_id, vec_id, approx_dist_micros, rank) — rank 1 =
    nearest, ties by vec_id. Distances are INTEGER micro-units
    (round(dist, 6) * 1e6 per table entry, summed as longs): an
    8-term float sum's addition order differs between engines and
    could flip a 6dp rounding, while integer sums are order-free —
    the same exact-arithmetic stance as the repetition fractions.
    Recall vs exact brute force is pinned in pytest (approximation
    error is the quantization error; raise m/k to shrink it)."""
    coded = pq_encode(embeddings, codebooks, id_col, vec_col,
                      vectorized=vectorized)
    tq = _adc_query_tables(queries, codebooks, query_id_col, vec_col)
    scored = (
        coded.crossJoin(F.broadcast(tq))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                _adc_score().alias("approx_dist_micros"))
    )
    return _adc_rank(scored, k)


def _adc_query_tables(
    queries: DataFrame,
    codebooks: List[List[List[float]]],
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, tbl array<array<bigint>>): each query's exact m x k
    sub-distance table in integer micro-units. The per-query tables
    travel as DATA in one broadcast table — one scan of the coded
    corpus however many queries there are (a per-query union would
    re-derive the encode lineage per query). Queries are collected
    driver-side (the query set is bounded, same stance as the IVF
    centroid collect)."""
    d_sub = len(codebooks[0][0])
    q_rows = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).collect()
    tables = []
    for r in q_rows:
        qv = list(map(float, r.qv))
        tables.append((
            int(r.query_id),
            [
                [
                    int(round(
                        round(
                            sum(
                                (qv[j * d_sub + t] - c[t]) ** 2
                                for t in range(d_sub)
                            ),
                            6,
                        ) * 1_000_000
                    ))
                    for c in book
                ]
                for j, book in enumerate(codebooks)
            ],
        ))
    return queries.sparkSession.createDataFrame(
        tables, "query_id long, tbl array<array<bigint>>"
    )


def _adc_score():
    """Approximate distance of a coded candidate against the joined
    query table: sum of m integer table lookups (order-free BIGINT
    sums — an 8-term float sum's addition order is engine-dependent
    and could flip a 6dp rounding)."""
    return F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("tbl"),
            lambda c, row: F.element_at(row, c),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _adc_rank(scored: DataFrame, k: int) -> DataFrame:
    """Per-query ADC top-k: rank 1 = smallest integer distance, ties
    by vec_id — the single home for the rank contract both pq_adc_topk
    and ivfpq_topk (and their green oracles) pin."""
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist_micros"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _coarse_assigned(
    df: DataFrame,
    centroids: List[List[float]],
    vectorized: bool,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vec_id, v array<double>, list_id) — corpus-side coarse
    assignment to the nearest centroid by rounded-6dp cosine,
    first-wins ties; single home for the assignment both IVF and
    IVF-PQ search paths (and their green oracles) pin. Expression
    path below the centroid wall, Arrow/numpy matmul above it."""
    base = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col))
    if vectorized:
        return base.select(
            "vec_id",
            _as_double(F.col(vec_col)).alias("v"),
            np_centroid_assign_udf(centroids)(F.col(vec_col))
            .alias("list_id"),
        )
    return _staged_assign(base, vec_col, centroids, keep=("vec_id",))


def _probe_lists(
    queries: DataFrame,
    centroids: List[List[float]],
    n_probe: int,
    vectorized: bool,
    query_id_col: str,
    vec_col: str,
    keep_qv: bool = False,
) -> DataFrame:
    """(query_id[, qv], __probes array<int>) — each query's n_probe
    nearest coarse lists, best-first, ties by smaller list id; the
    single home for the probe tie/rounding policy both IVF and IVF-PQ
    search paths (and their green oracles) pin. The expression path
    stages qv and the score array as bound columns (the probe
    expression consumes the scores once, but staging keeps the
    n_centroids x dim literal tree out of the explode's parent)."""
    if vectorized:
        cols = [F.col(query_id_col).alias("query_id")]
        if keep_qv:
            cols.append(_as_double(F.col(vec_col)).alias("qv"))
        return queries.select(
            *cols,
            np_probe_lists_udf(centroids, n_probe)(F.col(vec_col))
            .alias("__probes"),
        )
    q0 = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn(
        "__nq", _norm(F.col("qv"))
    ).withColumn(
        "__qs", _centroid_scores_named("qv", "__nq", centroids),
    )
    probes = F.slice(
        F.transform(
            F.array_sort(
                F.zip_with(
                    F.col("__qs"),
                    F.sequence(F.lit(1), F.lit(len(centroids))),
                    lambda s, i: F.struct((-s).alias("neg"),
                                          i.alias("i")),
                )
            ),
            lambda st: st["i"],
        ),
        1,
        n_probe,
    )
    out = ["query_id"] + (["qv"] if keep_qv else []) + ["__probes"]
    return q0.withColumn("__probes", probes).select(*out)


def ivfpq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    codebooks: List[List[List[float]]],
    centroids: Optional[List[List[float]]] = None,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    lloyd_iters: int = 0,
    vectorized: Optional[bool] = None,
) -> DataFrame:
    """IVF-PQ — the search stack a 10^9-vector corpus actually runs
    (Jegou et al., PAMI 2011): the IVF coarse quantizer restricts
    candidates to the query's n_probe nearest inverted lists, and ADC
    over PQ CODES ranks them — per candidate O(m) integer table
    lookups, never a dim-d dot product, over a corpus stored at
    ~dim*4/m x compression.

    Plan shape: corpus side is encode (codes) + coarse assignment
    (list_id) — both single-pass projections over one scan; query
    side is the probe-list explode joined to the broadcast ADC tables
    (bounded query set); the only shuffle is the per-query top-k
    window. Each vector lives in exactly one list, so a (query,
    candidate) pair appears at most once — no dedup aggregation
    needed.

    ``vectorized=None`` auto-selects the Arrow/numpy paths above
    IVF_EXPR_CENTROID_MAX coarse centroids (the expression path's
    literal-plan wall); the expression config (seed codebooks,
    lloyd_iters=0) is the oracle-exact driver form.

    Output: (query_id, vec_id, approx_dist_micros, rank), rank 1 =
    nearest by ADC distance, ties by vec_id."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, id_col=id_col, vec_col=vec_col,
            lloyd_iters=lloyd_iters,
            vectorized=_resolve_vectorized(vectorized, n_centroids),
        )
    # the dial considers BOTH literal-plan walls: the coarse centroid
    # count (assignment/probe expressions) and the PQ codebook size k
    # (the m x k encode expressions) — a k=256 codebook must not
    # silently take the expression encode behind a small coarse count
    vec = _resolve_vectorized(
        vectorized, max(len(centroids), len(codebooks[0]))
    )
    if vec:
        # ONE ArrowEvalPython node: the assign and encode UDFs both
        # read the raw vector column and have no interdependence, so
        # evaluating them in the same select ships the vectors across
        # the Python boundary once instead of chaining two Python
        # stages (guide §4.1; measured ~0.35 s per extra pandas-UDF
        # stage at 32 tasks). Same UDFs, same codes/list_ids.
        coded = embeddings.select(
            F.col(id_col).alias("vec_id"),
            np_centroid_assign_udf(centroids)(F.col(vec_col))
            .alias("list_id"),
            np_pq_encode_udf(codebooks)(_as_double(F.col(vec_col)))
            .alias("codes"),
        )
    else:
        assigned = _coarse_assigned(embeddings, centroids, vec,
                                    id_col, vec_col)
        coded = pq_encode(assigned, codebooks, "vec_id", "v",
                          vectorized=vec, keep=("list_id",))
    probes = _probe_lists(queries, centroids, n_probe, vec,
                          query_id_col, vec_col)
    probe_rows = probes.select(
        "query_id", F.explode("__probes").alias("list_id")
    )
    tq = _adc_query_tables(queries, codebooks, query_id_col, vec_col)
    q = probe_rows.join(tq, "query_id")
    scored = (
        coded.join(F.broadcast(q), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                _adc_score().alias("approx_dist_micros"))
    )
    return _adc_rank(scored, k)


def random_hyperplanes(dim: int, bits: int = 8, seed: int = 42) -> List[List[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


# quantization scale for the portable bucket path: embeddings are
# rounded to integers at this scale before the plane dot product, so
# the arithmetic is exact-integer (doubles are exact below 2^53) and
# the bucket id is bit-identical on any engine — no sign flips from
# summation-order ulp drift
QUANT_SCALE = 1000


def det_int_planes(dim: int, bits: int) -> List[List[int]]:
    """Deterministic integer hyperplanes derived from md5: component
    (b, d) is the first hex digit of md5('b:d') minus 8 (range -8..7).
    Any engine with md5 can rebuild the identical planes — the DuckDB
    oracle does, via strpos('0123456789abcdef', substring(md5(...),1,1))
    - 9. Uniform small-int components are fine for SIGN-LSH bucketing
    (only the sign of the projection matters); the Gaussian planes
    remain the default for the non-oracle path."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"{b}:{d}".encode()).hexdigest()[0], 16) - 8
            for d in range(dim)
        ]
        for b in range(bits)
    ]


def lsh_bucket_id(vec_name: str, planes: Sequence[Sequence[float]],
                  quantize: bool = False, is_double: bool = False):
    """Sign-LSH bucket: bit i set iff dot(vec, plane_i) > 0.

    ``quantize=True`` (portable path): the vector is rounded to
    integers at QUANT_SCALE first, making the dot product exact
    integer arithmetic — reproducible bit-for-bit across engines.

    ``vec_name`` is a column name; plane literal arrays are built in
    one py4j call each (_lit_arr). ``is_double=True`` skips the
    element cast for columns already staged as array<double> (the
    cast is a no-op on doubles, so bucket values are unchanged)."""
    v = F.col(vec_name) if is_double else _as_double(F.col(vec_name))
    if quantize:
        v = F.transform(v, lambda x: F.round(x * QUANT_SCALE))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bucket = bucket + F.when(
            _dot(v, _lit_arr(plane)) > 0, F.lit(1 << i).cast("long")
        ).otherwise(0)
    return bucket


def _centroid_scores(vec_col, centroids: Sequence[Sequence[float]],
                     assume_double: bool = False):
    """Array of cosine scores against each centroid, ROUNDED to 6dp.
    Rounding pins the downstream argmax/top-probe decisions against
    last-ulp drift, so the assignment is reproducible across engines
    (the DuckDB oracle computes round(list_cosine_similarity(v, c),
    6)); a 1e-6 score difference is far below any meaningful centroid
    margin.

    ``assume_double=True``: ``vec_col`` is already a bound
    array<double> attribute — skip the cast ``transform``. Callers
    MUST stage the cast as a real projection column first: higher-order
    functions are interpreted, and a non-attribute input expression
    nested under them is re-evaluated per element/per consumer."""
    v = vec_col if assume_double else _as_double(vec_col)
    norm_v = _norm(v)
    scores = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        norm_c = float(np.linalg.norm(np.asarray(c, dtype=np.float64))) or 1.0
        scores.append(F.round(_dot(v, lit) / (norm_v * F.lit(norm_c)), 6))
    return F.array(*scores)


def ivf_assign(vec_col, centroids: Sequence[Sequence[float]]):
    """IVF list id = argmax cosine over the centroid set.

    NOTE: this duplicates the scores array in the expression tree
    (array_position + array_max); prefer :func:`_staged_assign`, which
    stages the scores as a bound column so they are computed once."""
    s = _centroid_scores(vec_col, centroids)
    return F.array_position(s, F.array_max(s)).cast("int")


def _centroid_scores_named(vec_name: str, norm_name: str,
                           centroids: Sequence[Sequence[float]]):
    """Array of rounded-6dp cosine scores against each centroid over a
    BOUND array<double> column and its STAGED norm column. Two savings
    vs the original Column-by-Column form, both value-preserving: the
    per-vector norm is computed once per row (the old form inlined the
    norm expression into every one of the k score expressions), and
    each centroid literal array is one py4j call (_lit_arr) instead of
    dim calls. The dot itself stays the compact HOF form — see the
    scope-discipline note above (unrolling k x dim chains was a
    measured net loss here)."""
    scores = []
    for c in centroids:
        nc = float(np.linalg.norm(np.asarray(c, dtype=np.float64))) or 1.0
        scores.append(
            F.round(
                _dot(F.col(vec_name), _lit_arr(c))
                / (F.col(norm_name) * F.lit(nc)),
                6,
            )
        )
    return F.array(*scores)


def _staged_assign(df: DataFrame, vec_col: str,
                   centroids: Sequence[Sequence[float]],
                   keep: Sequence[str] = ()) -> DataFrame:
    """(keep..., v array<double>, list_id int) with the scoring staged:
    the cast vector, its norm, and the 16..k-score array are real
    projection columns, so (a) the scoring runs once per ROW, not
    once per downstream consumer, and (b) a later generate/explode
    cannot lift the scoring above itself and re-run it per element —
    the exact pathology that made each Lloyd step pay dim x the
    assignment cost before staging (measured 21 s -> 2 s at sf0.1)."""
    staged = df.select(
        *keep, _as_double(F.col(vec_col)).alias("v")
    ).withColumn(
        "__nv", _norm(F.col("v"))
    ).withColumn(
        "__cs", _centroid_scores_named("v", "__nv", centroids)
    )
    return staged.select(
        *keep,
        "v",
        F.array_position(F.col("__cs"), F.array_max(F.col("__cs")))
        .cast("int")
        .alias("list_id"),
    )


# Above this many coarse centroids the expression-path assignment is
# the wrong plan: it embeds n_centroids x dim literal arrays, and
# Catalyst analysis cost grows with the codebook (measured unusable
# past ~1k centroids). The scale dial is automatic — callers passing
# vectorized=None get the Arrow/numpy path whenever the codebook
# crosses this line; both paths are equality-pinned in tests.
IVF_EXPR_CENTROID_MAX = 512


def _resolve_vectorized(override: Optional[bool],
                        n_centroids: int) -> bool:
    """The one home for the expression-vs-numpy scale dial: an
    explicit True/False wins; None auto-selects numpy above
    IVF_EXPR_CENTROID_MAX centroids."""
    if override is not None:
        return override
    return n_centroids > IVF_EXPR_CENTROID_MAX


def np_centroid_assign_udf(centroids: Sequence[Sequence[float]]):
    """Vectorized (Arrow-batch numpy matmul) centroid assignment — the
    PRODUCTION path. The expression form keeps the summation order
    identical to the SQL oracle (sequential aggregate), but its plan
    embeds n_centroids x dim literals: analysis cost grows with the
    codebook and the approach is unusable past ~1k centroids. This
    path broadcasts the codebook inside the UDF closure and scores a
    whole Arrow batch with one BLAS matmul — O(batch x k x dim) flops,
    no giant plan, arbitrary codebook size.

    Tie policy matches the expression path: scores rounded to 6dp,
    argmax first-wins (numpy argmax = first occurrence; np.round is
    half-to-even vs Spark's half-up — they differ only for a cosine
    landing exactly on a 5e-7 boundary, which test_dedup_similarity
    pins as not occurring on the fixture)."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v],
                     dtype=np.float64)
        Mn = np.linalg.norm(M, axis=1, keepdims=True)
        Mn[Mn == 0] = 1.0
        sims = np.round((M @ C.T) / (Mn * Cn[None, :]), 6)
        return pd.Series(np.argmax(sims, axis=1) + 1, dtype="int32")

    # nondeterministic marking (guide §4.4): join-key null filters the
    # optimizer infers (isnotnull(list_id)) otherwise get pushed BELOW
    # this UDF, duplicating the whole Arrow round trip — the plan grew
    # two ArrowEvalPython nodes per side, each evaluating assign. The
    # function is pure; the marking only blocks the duplicating
    # rewrite, so results are unchanged (plan-asserted in tests).
    return assign.asNondeterministic()


def np_probe_lists_udf(centroids: Sequence[Sequence[float]],
                       n_probe: int):
    """Vectorized query-side probe selection: the 1-based ids of the
    ``n_probe`` highest-cosine centroids, ordered best-first with ties
    broken by smaller id (stable argsort on -score — identical to the
    expression path's array_sort over struct(-score, id))."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        M = np.array([np.asarray(x, dtype=np.float64) for x in v],
                     dtype=np.float64)
        Mn = np.linalg.norm(M, axis=1, keepdims=True)
        Mn[Mn == 0] = 1.0
        sims = np.round((M @ C.T) / (Mn * Cn[None, :]), 6)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe] + 1
        return pd.Series([row.astype("int32") for row in order])

    # same §4.4 marking as np_centroid_assign_udf: the explode over
    # __probes infers a size(__probes) > 0 filter that was pushed
    # below the UDF, evaluating probe twice per query row
    return probe.asNondeterministic()


def _lloyd_step(embeddings: DataFrame, vec_col: str,
                centroids: List[List[float]],
                vectorized: bool = False) -> List[List[float]]:
    """One distributed Lloyd iteration: assign every vector to its
    nearest centroid, recompute centroids as per-list per-dimension
    means. The shuffle moves (list_id, dim, partial mean) — never
    vectors; the collect is n_centroids x dim rows. Empty lists keep
    their previous centroid."""
    if vectorized:
        staged = embeddings.select(
            _as_double(F.col(vec_col)).alias("v"),
            np_centroid_assign_udf(centroids)(F.col(vec_col))
            .alias("list_id"),
        )
    else:
        staged = _staged_assign(embeddings, vec_col, centroids)
    assigned = staged.select(
        "list_id", F.posexplode(F.col("v")).alias("pos", "val")
    )
    means = (
        assigned.groupBy("list_id", "pos")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    dim = len(centroids[0])
    new = [list(c) for c in centroids]
    got = {}
    for r in means:
        got.setdefault(r.list_id, [0.0] * dim)[r.pos] = r.m
    for lid, vec in got.items():
        new[lid - 1] = vec  # list_id is 1-based (array_position)
    return new


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    vectorized: Optional[bool] = None,
) -> List[List[float]]:
    """IVF index build: deterministic strided seed sample refined by
    ``lloyd_iters`` distributed Lloyd iterations. Each iteration is
    one Spark aggregation (posexplode -> per-(list, dim) mean) whose
    collect is bounded at n_centroids x dim rows — vectors never leave
    the cluster. Returned codebook feeds ivf_topk(centroids=...).
    ``vectorized=None`` auto-selects the numpy assignment path above
    IVF_EXPR_CENTROID_MAX centroids (explicit True/False wins)."""
    vec = _resolve_vectorized(vectorized, n_centroids)
    centroids = _strided_seed_vectors(embeddings, n_centroids, id_col,
                                      vec_col)
    for _ in range(lloyd_iters):
        centroids = _lloyd_step(embeddings, vec_col, centroids,
                                vectorized=vec)
    return centroids


def _strided_seed_vectors(embeddings: DataFrame, k: int, id_col: str,
                          vec_col: str) -> List[List[float]]:
    """THE deterministic seed-sampling discipline (single home — both
    the IVF and PQ oracles re-derive exactly this in SQL): every
    (total // k)-th id in id order, first k. Bounded collect."""
    total = embeddings.count()
    step = max(total // k, 1)
    rows = (
        embeddings.filter(F.pmod(F.col(id_col), F.lit(step)) == 0)
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    return [list(map(float, r[0])) for r in rows]


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    centroids: Optional[List[List[float]]] = None,
    lloyd_iters: int = 2,
    vectorized: Optional[bool] = None,
) -> DataFrame:
    """IVF-style ANN: vectors are inverted-listed by nearest centroid;
    each query probes its n_probe nearest lists and scores only those
    candidates.

    Centroid training: strided deterministic seed sample, refined by
    ``lloyd_iters`` distributed Lloyd iterations — each iteration is
    one Spark aggregation (posexplode -> per-(list, dim) mean) whose
    result is a bounded n_centroids x dim collect; vectors never leave
    the cluster. Recall measured vs brute force in tests.

    ``vectorized``: corpus-side assignment as an Arrow-batch numpy
    matmul (np_centroid_assign_udf) instead of the literal-array
    column expressions — same rounded-6dp/first-wins assignment
    (equality pinned in tests), but the codebook lives in the UDF
    closure, so the plan stays small and n_centroids can grow to
    IVF-realistic sizes (thousands). The default ``None`` picks the
    path automatically: expression below IVF_EXPR_CENTROID_MAX
    centroids (oracle-exact, what the driver query runs at 16),
    numpy above it — callers never need to know the planning wall.

    Index-build vs query: centroid training is the BUILD step a
    production deployment runs once and reuses across queries — call
    :func:`train_ivf_centroids` yourself and pass ``centroids=`` to
    amortize it (the bench reports build and query separately)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids, id_col=id_col, vec_col=vec_col,
            lloyd_iters=lloyd_iters, vectorized=vectorized,
        )
    # the scale dial is automatic: above IVF_EXPR_CENTROID_MAX actual
    # centroids the literal-expression plan hits its planning wall, so
    # vectorized=None switches to the numpy path without the caller
    # having to know the threshold (What's-wrong #3, round 3)
    vectorized = _resolve_vectorized(vectorized, len(centroids))
    e = _coarse_assigned(embeddings, centroids, vectorized,
                         id_col, vec_col)
    q0 = _probe_lists(queries, centroids, n_probe, vectorized,
                      query_id_col, vec_col, keep_qv=True)
    q = q0.select(
        "query_id", "qv", F.explode(F.col("__probes")).alias("list_id")
    )
    scored = (
        e.join(F.broadcast(q), "list_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: Optional[List[List[float]]] = None,
    multiprobe: bool = True,
    portable: bool = False,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's LSH bucket(s)
    are scored.

    ``multiprobe``: the QUERY side additionally probes every bucket at
    Hamming distance 1 (one sign flipped) — the standard multiprobe-LSH
    recall boost. Cost scales the query side only (bits+1 probe rows
    per query, still broadcast); the corpus is hashed exactly once.
    Recall measured against brute_force_topk in tests.

    ``portable=True``: md5-derived integer planes + quantized exact-
    integer bucketing (det_int_planes) so the DuckDB oracle rebuilds
    the identical candidate sets; default keeps Gaussian planes."""
    if portable and planes is None:
        planes = det_int_planes(dim, bits)
    planes = planes or random_hyperplanes(dim, bits)
    e = embeddings.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("v"),
        lsh_bucket_id(vec_col, planes, quantize=portable).alias("bucket"),
    )
    qb = lsh_bucket_id(vec_col, planes, quantize=portable)
    probe_list = (
        F.array(qb, *[qb.bitwiseXOR(F.lit(1 << i).cast("long"))
                      for i in range(len(planes))])
        if multiprobe
        else F.array(qb)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
        F.explode(probe_list).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_sim(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
        .groupBy("query_id", "vec_id")
        .agg(F.max("sim").alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.6,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: Optional[List[List[float]]] = None,
    lloyd_iters: int = 0,
    vectorized: Optional[bool] = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, then
    prune WITHIN each cluster any vector whose cosine similarity to a
    lower-id cluster member reaches ``threshold``. Output one row per
    input vector: (vec_id, list_id, is_kept).

    Semantics vs the other dedup ops: cosine_near_pairs emits the pair
    list; cluster_representatives keeps the best copy per TRANSITIVE
    component. SemDeDup is the pairwise epsilon-ball prune the paper
    runs at web scale — a vector is dropped iff SOME earlier (smaller
    id) vector in its own cluster is within the ball; no transitive
    closure, no global pair materialization.

    Scale shape: the only shuffle is the self-join keyed on list_id,
    so the quadratic term is sum(cluster_size^2) — production dials
    n_centroids ~ sqrt(n) (the paper uses ~100k clusters for 10^9
    LAION embeddings), keeping each cluster a few thousand vectors.
    Assignment is the shared staged-expression / numpy-matmul pair
    (auto-dialed above IVF_EXPR_CENTROID_MAX); cosines are rounded to
    6dp so the DuckDB oracle reproduces the keep set bit-for-bit.
    ``lloyd_iters=0`` (strided seeds) is the oracle config; production
    refines with train_ivf_centroids.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_centroids=n_centroids, id_col=id_col,
            vec_col=vec_col, lloyd_iters=lloyd_iters,
            vectorized=vectorized,
        )
    vec = _resolve_vectorized(vectorized, len(centroids))
    if vec:
        assigned = embeddings.select(
            F.col(id_col).alias("vec_id"),
            _as_double(F.col(vec_col)).alias("v"),
            np_centroid_assign_udf(centroids)(F.col(vec_col))
            .alias("list_id"),
        )
    else:
        assigned = _staged_assign(
            embeddings.select(F.col(id_col).alias("vec_id"), vec_col),
            vec_col, centroids, keep=("vec_id",),
        )
    # stage the norm once per vector; the pair expression is then one
    # dot product + a division (the cosine_near_pairs discipline)
    assigned = assigned.withColumn("n", _norm(F.col("v")))
    # materialize the FULL assignment once (round 7: was a slim
    # (vec_id, list_id) cut only, which left the O(n*k*dim) assignment
    # subtree to run separately for EACH self-join side — two extra
    # scoring passes per action). One cut feeds the two join sides and
    # the verdict join; the extra materialized payload is the vector +
    # norm (~dim doubles/row), exactly the persisted-assignment layout
    # production keeps — sources/ann_index.py writes the same thing.
    assigned = assigned.localCheckpoint()
    slim = assigned.select("vec_id", "list_id")
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("n").alias("na"), "list_id",
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("n").alias("nb"), "list_id",
    )
    dup = (
        a.join(b, "list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.round(
                _dot_cols("va", "vb", len(centroids[0]))
                / (F.col("na") * F.col("nb")),
                6,
            )
            >= threshold
        )
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )
    return slim.join(
        dup.withColumn("__dup", F.lit(True)), "vec_id", "left"
    ).select(
        "vec_id",
        "list_id",
        F.col("__dup").isNull().alias("is_kept"),
    )
