"""Graph analytics over edge lists (PageRank).

Complements the connected-components tier (operators/dedup.py): where
min-label propagation answers "which near-dup cluster", PageRank ranks
nodes by link structure — e.g. scoring documents by citation/link
graphs, or picking the canonical member of a k-NN cluster.

Scale shape: each iteration is one shuffle of edge contributions on
the dst key plus a tiny dangling-mass scalar; rank state is one double
per node, re-derived per iteration with its lineage cut
(localCheckpoint) so a deep iteration chain never re-executes from the
source. Nothing is collected to the driver.

Engine-stable like the IVF/PQ kernels: per-iteration ranks are rounded
to 6 decimals and all cross-row sums go through DECIMAL, so the DuckDB
oracle (unrolling the same fixed iterations in chained CTEs)
reproduces ranks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    weight: str | None = None,
) -> DataFrame:
    """(node, rank) after ``iterations`` of standard damped PageRank.

    Nodes are ``distinct(src) ∪ distinct(dst)``; parallel edges count
    as multi-edges (their contributions add); nodes without out-edges
    are dangling and redistribute their mass uniformly. Ranks start at
    1/N and every iteration preserves total mass 1 (up to round-6).

    ``weight`` names an edge-weight column: each node splits its rank
    over out-edges proportionally to weight instead of uniformly (the
    k-NN use case: stronger cosine neighbors receive more mass).
    Weights must be positive; the unweighted form is the weight=1
    special case.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    # normalize to an explicit weight column: the unweighted form is
    # exactly weight=1 (rank * 1.0 / out is bit-identical to rank/out,
    # so the unrolled SQL oracle's parity is unaffected)
    wcol = F.col(weight) if weight is not None else F.lit(1.0)
    edges = edges.select(
        F.col(src).alias(src), F.col(dst).alias(dst), wcol.alias("__w")
    )
    # The edge list feeds node derivation, out-degrees, and every
    # iteration's contribution join — an expensive upstream plan (e.g.
    # the LSH k-NN graph) would otherwise be re-executed 3 + iterations
    # times. Persist once BEFORE the weight probe below, so the probe
    # is the cache-filling action instead of a full extra execution of
    # the upstream lineage; released before returning (ranks are
    # checkpointed, so the result does not depend on it).
    edges = edges.persist()
    if weight is not None:
        bad = edges.filter(
            F.col("__w").isNull() | (F.col("__w") <= 0)
        ).limit(1).count()
        if bad:
            edges.unpersist()
            raise ValueError(
                "edge weights must be positive and non-null — a zero-sum "
                "source divides by zero mid-iteration and a NULL edge "
                "silently vanishes"
            )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every iteration, rank-sized
    )
    n_df = nodes.agg(F.count(F.lit(1)).alias("__N"))
    # out "measure": total out-weight (== edge count when __w is the
    # unweighted 1.0) — the per-src normalizer of contribution shares
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum("__w").cast("double").alias("__out")
    ).localCheckpoint(eager=True)
    # rank0 = 1/N, already round-6 for iteration parity
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.round(F.lit(1.0) / F.col("__N"), 6).alias("rank")
    )
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        with_deg = ranks.join(F.broadcast(outdeg), "node", "left")
        contrib = (
            edges.select(
                F.col(src).alias("node"), F.col(dst).alias("__dst"), "__w"
            )
            .join(with_deg.filter(F.col("__out").isNotNull()), "node")
            .select(
                F.col("__dst").alias("node"),
                (F.col("rank") * F.col("__w") / F.col("__out")).alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum(F.col("__c").cast("decimal(38,12)")).cast("double").alias("__in"))
        )
        dangling = with_deg.filter(F.col("__out").isNull()).agg(
            F.coalesce(
                F.sum(F.col("rank").cast("decimal(38,12)")).cast("double"), F.lit(0.0)
            ).alias("__dang")
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("__N")
                    + F.lit(damping)
                    * (F.coalesce("__in", F.lit(0.0)) + F.col("__dang") / F.col("__N")),
                    6,
                ).alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    return ranks
