"""Graph analytics over edge lists (PageRank).

Complements the connected-components tier (operators/dedup.py): where
min-label propagation answers "which near-dup cluster", PageRank ranks
nodes by link structure — e.g. scoring documents by citation/link
graphs, or picking the canonical member of a k-NN cluster.

Scale shape: each iteration is one shuffle of edge contributions on
the dst key plus a tiny dangling-mass scalar; rank state is one long
per node, re-derived per iteration with its lineage cut
(localCheckpoint) so a deep iteration chain never re-executes from the
source. Nothing is collected to the driver.

Engine-stable by INTEGER arithmetic (registry rule 3): rank state is a
micro-rank BIGINT (rank × 10⁶). The only floating step per edge is the
IEEE-deterministic share ``(rank_micro·10⁶) · (w/out)`` — single
correctly-rounded ops, identical in Spark and DuckDB — floored to a
pico-rank long; every cross-row SUM, the damping multiply, the
teleport/dangling splits, and the final half-up back to micro are pure
integer ops both engines evaluate bit-identically. Unlike the earlier
ROUND-6 double form, no reachable .xxxxxx5 midpoint exists where the
engines can disagree (the r12 registry caveat this replaces).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


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
    1/N and every iteration preserves total mass 1 (up to the micro
    grid).

    ``weight`` names an edge-weight column: each node splits its rank
    over out-edges proportionally to weight instead of uniformly (the
    k-NN use case: stronger cosine neighbors receive more mass).
    Weights must be positive; the unweighted form is the weight=1
    special case (bit-identical — both run the same plan).

    Numeric contract: ranks live on the 1e-6 grid (micro-ranks held as
    BIGINT). Per iteration, edge shares are floored to the 1e-12 grid
    and the update ``(1-d)/N + d·(in + dang/N)`` runs entirely in
    integer pico-rank arithmetic with a final half-up to micro, so the
    result is reproducible across engines and partitionings. ``damping``
    is interpreted at micro resolution (rounded to the nearest 1e-6).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    damp_micro = round(damping * MICRO)
    if not 0 <= damp_micro <= MICRO:
        raise ValueError("damping must be within [0, 1]")
    teleport_num = (MICRO - damp_micro) * MICRO  # (1-d) in pico units
    # normalize to an explicit weight column: the unweighted form is
    # exactly weight=1 and shares the weighted plan verbatim
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
    # out "measure": total out-weight — the per-src normalizer of
    # contribution shares. Summed through DECIMAL so the double is
    # order-independent; for the unweighted __w=1.0 case it is the
    # exact out-degree count.
    outdeg = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum(F.col("__w").cast("decimal(38,12)")).cast("double").alias("__out")
    ).localCheckpoint(eager=True)
    # rank0 = half-up(1e6/N) micro-ranks — integer both engines
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node",
        F.expr(f"(2 * {MICRO}L + __N) DIV (2 * __N)").alias("rank_micro"),
    )
    ranks = ranks.localCheckpoint(eager=True)
    for _ in range(iterations):
        with_deg = ranks.join(F.broadcast(outdeg), "node", "left")
        # per-edge pico contribution: the ONLY floating step — two
        # correctly-rounded IEEE ops on exactly-representable operands
        # (rank_micro·1e6 < 2^53), then a deterministic floor. The
        # DuckDB oracle spells the identical parenthesization.
        contrib = (
            edges.select(
                F.col(src).alias("node"), F.col(dst).alias("__dst"), "__w"
            )
            .join(with_deg.filter(F.col("__out").isNotNull()), "node")
            .select(
                F.col("__dst").alias("node"),
                F.floor(
                    (F.col("rank_micro").cast("double") * F.lit(1000000.0))
                    * (F.col("__w") / F.col("__out"))
                ).alias("__c_pico"),
            )
            .groupBy("node")
            .agg(F.sum("__c_pico").alias("__in_pico"))
        )
        dangling = with_deg.filter(F.col("__out").isNull()).agg(
            F.coalesce(F.sum("rank_micro"), F.lit(0).cast("long")).alias(
                "__dang_micro"
            )
        )
        # update in pure integer pico arithmetic:
        #   new_pico = (1-d)·1e12 DIV N
        #            + d_micro · (in_pico + dang_micro·1e6 DIV N) DIV 1e6
        #   new_micro = half_up(new_pico / 1e6)
        # magnitudes: in/dang ≤ total mass 1e12 pico, d_micro ≤ 1e6 →
        # products ≤ ~2e18 < 2^63.
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.expr(
                    f"(2 * ("
                    f"  ({teleport_num}L DIV __N)"
                    f"  + ({damp_micro}L * (COALESCE(__in_pico, 0L)"
                    f"       + (__dang_micro * {MICRO}L) DIV __N)) DIV {MICRO}L"
                    f") + {MICRO}L) DIV (2 * {MICRO}L)"
                ).alias("rank_micro"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    return ranks.select(
        "node", (F.col("rank_micro").cast("double") / F.lit(1000000.0)).alias("rank")
    )
