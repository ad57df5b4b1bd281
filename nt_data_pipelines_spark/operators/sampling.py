"""Weight-proportional sampling over an exact distributed prefix sum.

The training-data mixer's missing primitive: stratified/Bernoulli
sampling (operators/text.py) picks DOCUMENTS uniformly, but a token
budget wants mass picked uniformly — a 100k-token document should be
sampled 100x more often than a 1k one. Systematic PPS (probability
proportional to size) does exactly that with ZERO variance in the
realized sample size: lay every document's weight end-to-end on a
line, then take every (total/m)-th point.

The hard part at scale is the EXACT prefix sum the line layout needs.
``repartitionByRange`` range-partitions by sampling — a separate
nondeterministic job whose boundaries can differ between the offsets
pass and the cumsum pass — so the order key here is md5(id) and the
partition is the key's OWN first hex byte: uniform by construction,
deterministic, and prefix-ordered (bucket order = hash order), which
makes the two-pass prefix sum (in-bucket window + 256-row bucket
offsets joined back) a pure function of the data. No sampling job, no
driver collect, no skew: every bucket holds ~1/256th of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pps_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    m: int,
) -> DataFrame:
    """Systematic probability-proportional-to-size sample of ``m``
    picks, deterministic via md5(id) ordering.

    Each row owns the half-open interval
    ``(cum_before, cum_before + weight]`` on the total-weight line;
    pick points sit at ``k * total / m`` for ``k = 1..m``. A row is
    returned with ``n_picks`` = how many pick points its interval
    contains (a row heavier than the step can be picked several
    times; realized total picks is EXACTLY m). The count is the
    integer identity ``(cum_after*m) div total - (cum_before*m) div
    total`` — no floats anywhere, so both engines agree bit-for-bit.

    Weights must be positive integers (token counts, byte sizes).
    Sums ride decimal(38,0): a 100-TB corpus's weight-line exceeds
    int64 once cum*m crosses ~9e18 (the corpus_stats ADVICE class).

    Scale shape: one shuffle keyed by the md5 first byte (256 uniform
    buckets — each window task holds ~1/256th of the rows, never the
    corpus), a 256-row offsets aggregate cumsum'd in a single tiny
    task and broadcast back, then codegen interval arithmetic per
    row. Returns (id, weight, n_picks) for picked rows only.
    """
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.col(weight_col).cast("long").alias("__w"),
        h.alias("__h"),
        F.substring(h, 1, 2).alias("__bkt"),
    ).where(F.col("__w") > 0)
    wloc = (
        Window.partitionBy("__bkt")
        .orderBy("__h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn(
        "__lc", F.sum(F.col("__w").cast("decimal(38,0)")).over(wloc)
    )
    # bucket totals aggregate from the BASE, not the window output: a
    # partial (map-side) aggregate ships at most 256 rows per input
    # partition, while re-deriving them from __lc would replay the
    # full corpus window shuffle on this path too (verified in the
    # executed plan). The window's exchange stays the ONLY
    # corpus-sized shuffle; this path's scan reads two columns.
    per_bucket = base.groupBy("__bkt").agg(
        F.sum(F.col("__w").cast("decimal(38,0)")).alias("__bs")
    )
    woff = (
        Window.orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # the grand total rides as one more column of the 256-row offsets
    # frame (computed over the same tiny single partition) instead of
    # a third scan + crossJoin
    offsets = per_bucket.select(
        "__bkt",
        (F.sum("__bs").over(woff) - F.col("__bs")).alias("__off"),
        F.sum("__bs").over(wall).alias("__total"),
    )
    cum = local.join(F.broadcast(offsets), "__bkt").select(
        id_col,
        F.col("__w").alias(weight_col),
        (F.col("__off") + F.col("__lc")).alias("__after"),
        (F.col("__off") + F.col("__lc") - F.col("__w")).alias("__before"),
        "__total",
    )
    picks = F.expr(
        f"CAST((__after * {m}) DIV __total - (__before * {m}) DIV __total AS BIGINT)"
    )
    return (
        cum.withColumn("n_picks", picks)
        .filter(F.col("n_picks") >= 1)
        .select(id_col, weight_col, "n_picks")
    )
