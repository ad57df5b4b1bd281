"""Distribution-drift statistics between corpus slices.

The KL tier (operators/text.py source_unigram_divergence) compares
DISCRETE token distributions; this module compares NUMERIC
distributions — document length, quality score, timestamp density —
where the natural two-sample question is "did this slice's
distribution move?" and the classic nonparametric answer is the
Kolmogorov–Smirnov statistic: the maximum gap between the two
empirical CDFs.

Engine parity: the ECDF comparison runs entirely in integer space by
cross-multiplying the two cumulative counts — |F_a(v) - F_b(v)| is
maximized exactly where |cum_a(v) * n_b - cum_b(v) * n_a| is, so the
max is taken over EXACT integers and only the final normalization
divides (one IEEE op on identical operands — bit-identical across
engines). Products ride as decimal(19,0) x decimal(19,0): cum * n can
pass int64 at the documented 100 TB target (the corpus_stats ADVICE
class), and 19 + 19 = 38 is the widest multiply DuckDB's decimal
binder accepts, so the mirrored oracle stays exact too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_drift_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group two-sample KS statistic: each group's value
    distribution vs the REST of the table (leave-one-out).

    The drift monitor for source mixes and snapshot diffs: a source
    whose length/score distribution has drifted from the pool shows a
    large KS even when its mean moved little. For group g,
    KS(g) = max over v of |F_g(v) - F_rest(v)|, evaluated at every
    observed value (ECDFs only jump there, so the max over the full
    grid is the true supremum).

    Scale shape: the table collapses to (group, value) counts first —
    one linear shuffle to a cardinality of groups x distinct-values.
    The evaluation grid is that product's completion (distinct values
    x groups, built by a crossJoin of two SMALL aggregates); per-group
    cumsums run as group-partitioned windows, and the GLOBAL cumsum at
    each value is recovered as sum-over-groups of the per-group
    cumsums (the grid is complete, so the identity is exact) via a
    value-partitioned window — no single-task global window anywhere,
    the widest partition is groups-sized or values-per-group-sized.
    For unbounded continuous value domains, quantile-bucket first.
    """
    counts = (
        df.select(F.col(group_col).alias("__g"), F.col(value_col).alias("__v"))
        .where(F.col("__v").isNotNull())
        .groupBy("__g", "__v")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    totals = counts.groupBy("__g").agg(F.sum("__c").alias("__ng"))
    grand = counts.agg(F.sum("__c").alias("__n"))
    vals = counts.select("__v").distinct()
    grid = totals.crossJoin(vals)
    g = grid.join(counts, ["__g", "__v"], "left").withColumn(
        "__c", F.coalesce("__c", F.lit(0))
    )
    cum_g = F.sum("__c").over(
        Window.partitionBy("__g").orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    )
    with_cum = g.select("__g", "__ng", "__v", cum_g.alias("__cg"))
    # complete grid => global ECDF count at v == sum of group cumsums
    cum_all = F.sum("__cg").over(Window.partitionBy("__v"))
    dec = "decimal(19,0)"
    scored = with_cum.crossJoin(F.broadcast(grand)).select(
        "__g",
        "__ng",
        (F.col("__n") - F.col("__ng")).alias("__nr"),
        F.col("__cg").cast(dec).alias("__cg"),
        (cum_all - F.col("__cg")).cast(dec).alias("__cr"),
    )
    num = F.abs(
        F.col("__cg") * F.col("__nr").cast(dec) - F.col("__cr") * F.col("__ng").cast(dec)
    )
    return (
        scored.groupBy("__g", "__ng", "__nr")
        .agg(F.max(num).alias("__num"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__ng").alias("n_rows"),
            # A single-group input has an empty "rest" sample (__nr ==
            # 0); 0/0 would yield NaN, which reads as a drift score.
            # Null states "no comparison population" (ADVICE r10).
            F.when(
                F.col("__nr") > 0,
                F.col("__num").cast("double")
                / (F.col("__ng").cast(dec) * F.col("__nr").cast(dec)).cast("double"),
            ).alias("ks_stat"),
        )
    )
