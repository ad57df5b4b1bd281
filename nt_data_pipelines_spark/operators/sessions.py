"""Event sessionization and time-bucket (OHLC) resampling.

Reference parity: the reference's event pipelines group activity into
gap-delimited sessions before feature extraction and downsample tick
streams to bar aggregates (see reference pipelines' daily rollups);
both are re-expressed here as single-shuffle Spark window/agg plans.

Scale notes
-----------
- ``sessionize`` shuffles once on the user key; every later per-session
  aggregate reuses that partitioning (window partitionBy and the
  follow-up groupBy share the hash keys, so Catalyst plans ONE
  exchange).  Per-user partitions are bounded by a user's own event
  count — no global sort, no skew beyond a genuinely hyperactive user
  (salt upstream with operators.skew if one appears).
- ``resample_ohlc`` computes open/close via tie-broken ``row_number``
  (ts, then id) instead of ``min_by``/``max_by`` so results stay
  deterministic under duplicate timestamps — a requirement for the
  cross-engine value-hash parity gate and for retry-stable output at
  scale.  high/low/count/volume are plain hash aggregates; the window
  and the groupBy again share one shuffle on (keys..., bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_US = 1_000_000


def _epoch_us(ts_col: str) -> Column:
    """Epoch microseconds; accepts TIMESTAMP and TIMESTAMP_NTZ (the
    cast is identity under the engine's fixed UTC session timezone,
    matching DuckDB's ``epoch_us`` on naive timestamps)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    gap_seconds: int = 1800,
    out_col: str = "session_seq",
) -> DataFrame:
    """Assign 1-based per-user session numbers; a new session starts
    when the gap since the previous event exceeds ``gap_seconds``.

    ``id_col`` tie-breaks identical timestamps so the assignment is
    deterministic (retry-safe, engine-portable).  Comparison happens in
    epoch microseconds to match DuckDB's ``epoch_us`` exactly.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _epoch_us(ts_col)
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_seconds * _US), F.lit(1)
    ).otherwise(F.lit(0))
    cum = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, cum.cast("long"))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: event count, duration, total value.

    The value sum goes through DECIMAL(18,6) so it is exact and
    shuffle-order-independent (parity rule for float sums).
    """
    s = sessionize(df, user_col, ts_col, id_col, gap_seconds)
    us = _epoch_us(ts_col)
    return (
        s.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.max(us) - F.min(us)).alias("duration_us"),
            F.sum(F.col(value_col).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
    )


def _bucket(ts_col: str, freq: str) -> Column:
    if freq not in ("hour", "day", "week", "month", "year"):
        raise ValueError(f"unsupported resample freq: {freq!r}")
    return F.date_trunc(freq, F.col(ts_col))


def resample_ohlc(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    id_col: str,
    freq: str = "day",
) -> DataFrame:
    """Downsample a point series to OHLC bars per (keys..., bucket).

    open/close are the values at the earliest/latest (ts, id) in the
    bucket — ``row_number`` with that explicit tie-break rather than
    ``min_by``/``max_by``, which are non-deterministic under ties.
    """
    bucketed = df.withColumn("bucket", _bucket(ts_col, freq))
    keys = [*key_cols, "bucket"]
    asc = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    whole = Window.partitionBy(*keys)
    v = F.col(value_col)
    # close = the row where rn_asc == partition count: one ascending
    # sort serves both ends of the bar (no second descending sort)
    return (
        bucketed.withColumn("__rn_a", F.row_number().over(asc))
        .withColumn("__rn_d", (F.count(F.lit(1)).over(whole) - F.col("__rn_a") + 1))
        .groupBy(*keys)
        .agg(
            F.max(F.when(F.col("__rn_a") == 1, v)).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max(F.when(F.col("__rn_d") == 1, v)).alias("close"),
            F.count(F.lit(1)).alias("n_points"),
            F.sum(v.cast("decimal(18,6)")).cast("double").alias("volume"),
        )
    )
