"""Near-duplicate CLUSTERING — connected components over the pair
graph the dedup family emits.

Pair lists (ngram_jaccard_pairs / minhash_lsh_pairs / simhash /
cosine near-dups) answer "which pairs are dups"; a curation pipeline
needs "which GROUP does each doc belong to, and who is canonical".
That is connected components: cluster_id = the minimum doc id
reachable through the pair graph.

Implementation: distributed min-label propagation — per iteration,
every node takes the min of its own label and its neighbors' labels;
converges in graph-diameter iterations. Near-dup graphs are
overwhelmingly tiny cliques/chains (diameter 1-3), so the driver loop
runs 2-4 rounds of one shuffle join + one aggregation each. Lineage
is cut with localCheckpoint per round (iterative plans otherwise grow
unboundedly). For adversarial long-chain graphs at web scale, the
standard acceleration is the large-star/small-star alternation
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14), which converges in O(log^2 n) rounds with the identical
per-round shuffle shape — the propagation loop here is that
algorithm's simple form, chosen because near-dup diameters make the
star transforms' extra edge rewriting a net loss.

DuckDB oracle: transitive closure via WITH RECURSIVE, min reachable
id per node (oracle/portable_sql.py style — exact, engine-portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    ByteType, IntegerType, LongType, ShortType,
)


def connected_components(nodes: DataFrame, edges: DataFrame,
                         id_col: str = "doc_id",
                         max_iter: int = 25) -> DataFrame:
    """(node, component) for every node: component = min id reachable.

    nodes: one column ``id_col`` (isolated nodes keep their own id as
    component). edges: (id_a, id_b) undirected pairs."""
    # materialize the edge list once: it is consumed by EVERY
    # propagation iteration, and without the lineage cut each round
    # would re-derive the pair list's whole upstream plan (for
    # minhash-LSH edges that is the full sketch/band/verify chain —
    # measured ~2x the funnel's wall before the cut). The edge list
    # is the near-dup pair set: tiny relative to the corpus.
    from pyspark.sql import Observation

    und = (
        edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(
            edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    ).localCheckpoint()
    # convergence probe: labels are per-node monotonically
    # non-increasing, so for INTEGRAL ids the total label sum strictly
    # decreases iff any label changed — one reduce per iteration.
    # Fractional numerics (double/float/decimal-with-scale) are
    # excluded: the decimal(38,0) cast ROUNDS, so two distinct labels
    # can collapse to the same summand and the probe would declare
    # convergence early with wrong components. Non-integral ids
    # (strings are legal too: the representative pick is
    # ordering-based on purpose) keep the type-agnostic join probe.
    integral_ids = isinstance(
        labels.schema["component"].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )

    def _label_sum(df: DataFrame):
        # decimal(38,0) sum: overflow-safe for any realistic id space
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    def _changed(new: DataFrame, old: DataFrame) -> bool:
        return (
            new.alias("n")
            .join(old.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
            > 0
        )

    prev_sum = _label_sum(labels) if integral_ids else None
    for it in range(max_iter):
        # neighbor minimum: one shuffle join (edges x labels) + one
        # grouped min — both hash-partial, fixed-width keys
        nbr = (
            und.join(labels, und.src == labels.node)
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_plan = (
            labels.join(nbr, labels.node == nbr.dst, "left")
            .select(
                "node",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
        )
        if integral_ids:
            # the convergence sum rides the checkpoint job via observe
            # (fires on localCheckpoint's materialization), so each
            # iteration is ONE job instead of checkpoint + a separate
            # sum pass — same decimal(38,0) sum over the same rows
            obs = Observation(f"cc_label_sum_{it}")
            new_plan = new_plan.observe(
                obs,
                F.sum(F.col("component").cast("decimal(38,0)"))
                .alias("lsum"),
            )
        new_labels = new_plan.localCheckpoint()
        if integral_ids:
            cur_sum = obs.get["lsum"]
            converged = cur_sum == prev_sum
            prev_sum = cur_sum
        else:
            converged = not _changed(new_labels, labels)
        labels = new_labels
        if converged:
            break
    else:
        # exhausting max_iter without convergence means the labels are
        # WRONG for some component (diameter > max_iter) — failing
        # loudly beats silently splitting one near-dup cluster in two
        raise RuntimeError(
            f"connected_components did not converge within "
            f"{max_iter} iterations (component diameter exceeds "
            f"max_iter); raise max_iter"
        )
    return labels


def _components(df: DataFrame, pairs: DataFrame,
                id_col: str) -> DataFrame:
    """(id_col, cluster_id) labeling shared by every clustering
    operator — one home for the component contract."""
    return connected_components(
        df.select(id_col), pairs, id_col=id_col
    ).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )


def dedup_clusters(df: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """Cluster assignment for a corpus given its near-dup pairs:
    (doc_id, cluster_id, cluster_size, is_canonical). cluster_id is
    the min doc id of the component; the canonical doc is that
    minimum (the keep-one-drop-rest curation contract)."""
    comp = _components(df, pairs, id_col)
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        comp.join(sizes, "cluster_id")
        .select(
            id_col,
            "cluster_id",
            "cluster_size",
            (F.col(id_col) == F.col("cluster_id")).alias("is_canonical"),
        )
    )


def cluster_representatives(df: DataFrame, pairs: DataFrame,
                            score_col: str = "score",
                            id_col: str = "doc_id") -> DataFrame:
    """Quality-aware canonicalization: ONE representative per near-dup
    cluster, chosen by highest score (ties -> smallest id) instead of
    dedup_clusters' min-id rule — near-dup copies differ in OCR noise,
    truncation, or boilerplate, and a curation pipeline wants to keep
    the BEST copy, not an arbitrary one.

    ``df`` must carry ``score_col`` (e.g. text.quality_score rounded
    upstream). Output: (doc_id, cluster_id, cluster_size, score,
    is_representative) for every doc — filter is_representative for
    the kept corpus. One shuffle (the cluster-keyed window; the rank
    and size ride the same partitioning), and no arithmetic on the id
    — the ordering-based pick works for ANY orderable id type, where
    a negate-and-maximize trick would break on string or decimal
    ids."""
    comp = _components(df, pairs, id_col)
    scored = comp.join(df.select(id_col, score_col), id_col)
    by_cluster = Window.partitionBy("cluster_id")
    pick = by_cluster.orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return scored.select(
        id_col,
        "cluster_id",
        F.count("*").over(by_cluster).alias("cluster_size"),
        F.col(score_col),
        (F.row_number().over(pick) == 1).alias("is_representative"),
    )
