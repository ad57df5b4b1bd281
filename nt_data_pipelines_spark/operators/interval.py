"""Interval (range) join — points matched into containing intervals.

Spark has no native range-join optimization: a raw
``point.ts BETWEEN i.start AND i.end`` join condition plans as a
nested-loop (BroadcastNestedLoopJoin or cartesian) — quadratic work
that dies at corpus scale. The standard distributed shape is
bucketing:

1. quantize time into fixed buckets of ``bucket_seconds``;
2. each point lands in exactly ONE bucket; each interval EXPLODES to
   every bucket it overlaps (cheap: intervals are short relative to
   the bucket size, so the fan-out is 1-2 rows);
3. equi-join on the bucket (plus any ``by`` keys) — a plain shuffled
   hash join;
4. verify exact containment on the candidates.

A point inside an interval shares at least the bucket containing the
point (the interval overlaps that bucket by construction), so recall
is exact; because a point has one bucket, no pair appears twice and
no distinct is needed. Bucket size trades shuffle width (smaller ->
more interval clones) against candidate precision (bigger -> more
false candidates filtered in step 4); ``'auto'`` sizes it from the
p99 interval length so the long tail of a skewed distribution still
fans out to only ~1-2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_col: str,
    end_col: str,
    by: str | list[str] | None = None,
    bucket_seconds: int | str | None = 3600,
    how: str = "inner",
    point_id: str | None = None,
    max_fanout: int = 4096,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    Output: all point columns + all interval columns (caller aliases
    collisions beforehand). ``by`` adds equality keys (e.g. user_id)
    to the bucket join. ``how='left'`` keeps unmatched points with
    null interval columns and needs ``point_id`` — a unique point key
    for the anti-join that recovers them.

    ``bucket_seconds`` defaults to a fixed 3600. CHANGED in round 4:
    earlier versions auto-sized by default (a median pre-pass over the
    data); callers that relied on data-driven sizing must now pass
    ``'auto'`` explicitly — with the fixed default, long-interval data
    fans out to more buckets instead of erroring, and there is no
    pre-pass job in the default path. Pass ``'auto'`` (or ``None``)
    to size the bucket from
    one cheap pre-pass over the data: the approximate p99 interval
    length, floored so the single longest interval spans at most
    ``max_fanout/2`` buckets — a skewed length distribution can
    therefore never trip the guard (median-based sizing did exactly
    that on skewed data).

    Invalid intervals (``end < start``) contain no point by definition
    and are dropped before bucketing — otherwise Spark's ``sequence``
    would silently emit a DESCENDING bucket list for them. An interval
    overlapping more than ``max_fanout`` buckets fails the job loudly
    (raise_error) instead of exploding the candidate set / tripping
    sequence's element cap; re-run with a larger ``bucket_seconds``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and not point_id:
        raise ValueError("how='left' needs point_id (a unique point key)")
    keys = [by] if isinstance(by, str) else list(by or [])
    intervals = intervals.filter(F.col(end_col) >= F.col(start_col))
    if bucket_seconds is None or bucket_seconds == "auto":
        length_us = F.unix_micros(F.col(end_col).cast("timestamp_ltz")) - F.unix_micros(
            F.col(start_col).cast("timestamp_ltz")
        )
        stats = intervals.select(
            F.percentile_approx(length_us, F.lit(0.99)).alias("p99"),
            F.max(length_us).alias("mx"),
        ).first()
        p99 = stats["p99"] or 3600 * 1_000_000
        # Floor the bucket so even the single LONGEST interval spans at
        # most max_fanout/2 buckets — a p99 alone still trips the guard
        # when the outlier is rarer than 1-in-100.
        floor_us = (stats["mx"] or p99) / max(1, max_fanout // 2)
        bucket_seconds = max(1, round(max(p99, floor_us) / 1_000_000))
    elif type(bucket_seconds) is not int or bucket_seconds <= 0:
        # bool subclasses int — True would silently become a 1-second
        # bucket, so reject it (and non-positive sizes) explicitly.
        raise ValueError(
            f"bucket_seconds must be a positive int, None, or 'auto'; got {bucket_seconds!r}"
        )
    b = F.lit(int(bucket_seconds) * 1_000_000)

    def to_bucket(c):
        return F.floor(F.unix_micros(F.col(c).cast("timestamp_ltz")) / b)

    p = points.withColumn("__bucket", to_bucket(point_ts))
    lo_b, hi_b = to_bucket(start_col), to_bucket(end_col)
    span = hi_b - lo_b + F.lit(1)
    buckets = F.when(span <= max_fanout, F.sequence(lo_b, hi_b)).otherwise(
        F.raise_error(
            F.concat(
                F.lit("interval_join: interval spans "),
                span.cast("string"),
                F.lit(f" buckets (> max_fanout={max_fanout}); "
                      f"raise bucket_seconds (now {bucket_seconds}) or max_fanout"),
            )
        )
    )
    i = intervals.withColumn("__bucket", F.explode(buckets))
    cond = F.col(point_ts).between(F.col(start_col), F.col(end_col))
    matched = p.join(i, [*keys, "__bucket"]).filter(cond).drop("__bucket")
    if how == "inner":
        return matched
    unmatched = points.join(matched.select(point_id), point_id, "left_anti")
    for c in intervals.columns:
        if c not in unmatched.columns:
            unmatched = unmatched.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(unmatched)


def merge_intervals(
    df: DataFrame,
    by: str | list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key into maximal
    disjoint islands — the interval-union primitive (total coverage
    time, availability windows, in-transit periods).

    Classic gaps-and-islands: per key, order by (start, end); an
    interval opens a NEW island iff its start is strictly after the
    running max of all previous ends (touching intervals — start ==
    previous end — merge); the island id is the running count of
    openers. One window shuffle on the key, one groupBy on the same
    key (shared partitioning, no second exchange).

    Duplicate intervals are pre-aggregated to ONE weighted row per
    distinct (key, start, end) BEFORE the windows. This is load-
    bearing for correctness, not just shuffle size: with duplicate
    sort keys the opener-flag window and the cumulative-sum window
    are separate computations that may order ties differently (DuckDB
    re-sorts per CTE; Spark and DuckDB also tie-break differently),
    and a duplicate of an island-opening row can then land in the
    PREVIOUS island, silently inflating its span — caught live at
    sf0.1 where small scales had no duplicate (start, end) pairs.
    After the pre-aggregation the order is total per key and every
    engine computes the same islands.

    Returns one row per island: (by..., island_id, island_start,
    island_end, n_intervals) where n_intervals counts input rows
    (duplicates included). Per-key work is a bounded sort of that
    key's DISTINCT intervals — the same per-key-window contract as
    the sessionize tier; keys with pathologically many intervals are
    a data-model smell, not a shuffle-skew one (AQE cannot split a
    window partition).
    """
    from pyspark.sql import Window

    keys = [by] if isinstance(by, str) else list(by)
    uniq = df.groupBy(*keys, start_col, end_col).agg(
        F.count(F.lit(1)).alias("__w")
    )
    w = Window.partitionBy(*keys).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    opener = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    islands = uniq.withColumn(
        "__island", F.sum(opener).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        islands.groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.sum("__w").alias("n_intervals"),
        )
        .select(
            *keys,
            (F.col("__island") - 1).cast("long").alias("island_id"),
            "island_start",
            "island_end",
            "n_intervals",
        )
    )


def numeric_band_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_val: str,
    delta: float,
    slack: int = 2,
) -> DataFrame:
    """Band join: every (left, right) pair with
    ``abs(left_val - right_val) <= delta`` — the numeric sibling of
    :func:`interval_join` (tolerance matching on price/balance/score
    instead of time).

    Catalyst plans a raw ``abs(a - b) <= d`` predicate as
    BroadcastNestedLoopJoin — O(n*m) compares even when almost nothing
    matches. Blocking on the band index ``floor(val / delta)`` makes
    it an EQUI-join: in real arithmetic a matching pair's buckets
    differ by at most 1, so the left side explodes to neighboring
    buckets (fixed fan-out, shuffle stays linear) and the exact
    predicate re-filters after the hash join. Both sides compute
    ``floor(x / delta)`` with the same IEEE ops, so the blocking is
    engine-identical; the gap itself is row-level double arithmetic
    (exact, registry preamble).

    Recall contract (ADVICE r10): the ±1 real-arithmetic bound is NOT
    an IEEE bound — when ``|val| / delta`` is large enough that
    ``fl(val / delta)`` sits within an ulp of an integer, each side's
    floor can flip by one more, so matching pairs' buckets may differ
    by 2. The fan-out is therefore ±2 by default (5 buckets — still a
    fixed linear fan-out), which covers one rounding flip per side on
    top of the real bound. That makes every-pair recall exact for
    ``|val| / delta < 2**51`` (quotient error < 1 ulp of the integer
    grid); beyond that, pairs whose gap is within an ulp of exactly
    ``delta`` may still be missed — raise ``slack`` if operating
    there.

    Returns left row + right row + ``band_gap`` (absolute difference).
    Columns must not collide (select/alias before joining).
    """
    if delta <= 0:
        raise ValueError(f"delta must be positive, got {delta}")
    if slack < 1:
        raise ValueError(f"slack must be >= 1, got {slack}")
    lb = F.floor(F.col(left_val) / delta)
    rb = F.floor(F.col(right_val) / delta)
    lx = left.withColumn(
        "__band",
        F.explode(F.array(*[lb + off for off in range(-slack, slack + 1)])),
    )
    rx = right.withColumn("__band", rb)
    gap = F.abs(F.col(left_val) - F.col(right_val))
    return (
        lx.join(rx, "__band")
        .filter(gap <= delta)
        .drop("__band")
        .withColumn("band_gap", gap)
    )


def nearest_value_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_val: str,
    right_key: str,
    right_val: str,
    radius: float,
) -> DataFrame:
    """For each left row, the SINGLE closest right row by value within
    ``radius`` — the numeric as-of: :func:`numeric_band_join` returns
    every in-band pair, this resolves them to one deterministic best
    match (smallest gap, ties to the smaller right value then key).

    Left rows with no right value inside the radius are dropped (the
    bounded-radius contract is what keeps the join an equi-join — an
    unbounded nearest-neighbor needs a sort-merge the band blocking
    cannot express; widen ``radius`` rather than post-filtering a
    global product).

    Scale shape: the band join's fixed-fan-out equi-join, then a rank
    over that row's IN-BAND matches only (a handful of rows, never a
    table) — the window partitions by (left_key, left_val), and its
    input is already bounded by the radius.

    Identity contract (ADVICE r10): a "left row" is identified by the
    (left_key, left_val) pair — the rank window partitions on both, so
    duplicate left keys with DIFFERENT values each keep their own
    nearest match. Fully duplicated rows (same key AND value) still
    collapse to one output row; pass a unique key column if duplicate
    rows must survive.
    """
    j = numeric_band_join(
        left.select(left_key, left_val),
        right.select(right_key, right_val),
        left_val,
        right_val,
        radius,
    )
    from pyspark.sql import Window

    w = Window.partitionBy(left_key, left_val).orderBy(
        "band_gap", F.col(right_val), F.col(right_key)
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(left_key, left_val, right_key, right_val, "band_gap")
    )
