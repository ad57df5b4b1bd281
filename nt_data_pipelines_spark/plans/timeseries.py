"""Window / time-series queries (SURVEY.md §2.5, §2.9 extensions).

The `events` table stands in for the reference's per-ticker daily
series (user_id <-> ticker, ts <-> date, value <-> price/return; see
FIXTURES.md). Oracle windows use 21 rows (reference's reversal
window) because events has ~67 rows/user — the 252-row variants are
exercised by the domain pipelines' tests on Family-B fixtures.

Every rolling op carries the reference's full-window gate (null until
the frame holds exactly N rows) — see operators/windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import windows as W
from nt_data_pipelines_spark.operators.ewma import ewm_mean
from nt_data_pipelines_spark.plans.registry import dsum, register, sql_dsum
from nt_data_pipelines_spark.sources.testdata import load_table

ROLL = 21  # reference reversal window (pipelines/reversal_flow.py:17)


@register(
    "w1_pct_change",
    oracle="""
    SELECT user_id, ts, value, ret FROM (
      SELECT user_id, ts, value,
             value / lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS ret
      FROM events)
    WHERE ret IS NOT NULL
    """,
    doc="W1 pct_change per key: x/lag(x)-1, null head dropped (returns_flow.py:13-24).",
)
def w1_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.pct_change(
        ev, "user_id", ["ts", "event_id"], "value", out_col="ret", drop_null=True,
        zero_base="null",  # match the SQL oracle: x/0 -> NULL -> dropped
    ).select("user_id", "ts", "value", "ret")


@register(
    "w2_rolling_sum21",
    oracle=f"""
    SELECT user_id, ts, ROUND(-1.0 * signal, 6) + 0.0 AS signal FROM (
      SELECT user_id, ts,
        CASE WHEN COUNT(value) OVER w = {ROLL}
             THEN SUM(LN(1 + value)) OVER w END AS signal
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW))
    WHERE signal IS NOT NULL
    """,
    doc="W2 gated rolling 21-row sum of ln(1+x), negated (reversal_flow.py:12-29).",
)
def w2_rolling_sum21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # ln(1+x) spelled identically on both sides (not log1p) so the
    # element values match bit-for-bit before the rounded sum.
    out = W.rolling_sum(
        ev,
        "user_id",
        ["ts", "event_id"],
        F.log(F.lit(1.0) + F.col("value")),
        ROLL,
        out_col="signal",
    )
    return (
        out.filter(F.col("signal").isNotNull())
        .select("user_id", "ts", (F.round(F.col("signal") * -1.0, 6) + 0.0).alias("signal"))
    )


@register(
    "w3_rolling_std21",
    oracle=f"""
    SELECT user_id, ts, ROUND(vol, 6) + 0.0 AS vol FROM (
      SELECT user_id, ts,
        CASE WHEN COUNT(value) OVER w = {ROLL}
             THEN STDDEV_SAMP(value) OVER w END AS vol
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW))
    WHERE vol IS NOT NULL
    """,
    doc="W3 gated rolling sample std (factor_model_flow.py:94-104; ddof=1).",
)
def w3_rolling_std21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = W.rolling_std(ev, "user_id", ["ts", "event_id"], "value", ROLL, out_col="vol")
    return (
        out.filter(F.col("vol").isNotNull())
        .select("user_id", "ts", (F.round("vol", 6) + 0.0).alias("vol"))
    )


@register(
    "w5_rolling_cov21",
    oracle=f"""
    SELECT user_id, ts, ROUND((sxy - sx * sy / {ROLL}.0) / {ROLL - 1}.0, 6) + 0.0 AS cov FROM (
      SELECT user_id, ts,
        CASE WHEN COUNT(CASE WHEN lag_value IS NOT NULL THEN value END) OVER w = {ROLL}
             THEN CAST(SUM(CAST(value * lag_value AS DECIMAL(38,8))) OVER w AS DOUBLE) END AS sxy,
        CAST(SUM(CASE WHEN lag_value IS NOT NULL
                      THEN CAST(value AS DECIMAL(38,8)) END) OVER w AS DOUBLE) AS sx,
        CAST(SUM(CAST(lag_value AS DECIMAL(38,8))) OVER w AS DOUBLE) AS sy
      FROM (
        SELECT user_id, ts, event_id, value,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag_value
        FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW))
    WHERE sxy IS NOT NULL
    """,
    doc="W5 gated rolling pairwise sample covariance "
    "(factor_covariances_flow.py:11-29). Engine-parity form: cov from exact "
    "decimal windowed sums, cov = (Sxy - SxSy/n)/(n-1) — the engines' native "
    "COVAR_SAMP kernels disagree at ~1e-4 over sliding frames. The pipelines "
    "use operators.windows.rolling_cov (covar_samp) internally.",
)
def w5_rolling_cov21(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    lagged = W.lag_col(ev, "user_id", ["ts", "event_id"], "value", 1, out_col="lag_value")
    w = W.keyed_window("user_id", ["ts", "event_id"]).rowsBetween(-(ROLL - 1), 0)
    both = F.when(F.col("lag_value").isNotNull(), F.col("value"))
    dec = "decimal(38,8)"
    sxy = F.sum((F.col("value") * F.col("lag_value")).cast(dec)).over(w).cast("double")
    sx = F.sum(both.cast(dec)).over(w).cast("double")
    sy = F.sum(F.col("lag_value").cast(dec)).over(w).cast("double")
    gated = lagged.select(
        "user_id",
        "ts",
        F.when(F.count(both).over(w) == ROLL, sxy).alias("sxy"),
        sx.alias("sx"),
        sy.alias("sy"),
    )
    return gated.filter(F.col("sxy").isNotNull()).select(
        "user_id",
        "ts",
        (F.round((F.col("sxy") - F.col("sx") * F.col("sy") / ROLL) / (ROLL - 1), 6) + 0.0).alias("cov"),
    )


@register(
    "a5_zscore_global",
    oracle="""
    SELECT event_id, ROUND((value - AVG(value) OVER ()) / STDDEV_SAMP(value) OVER (), 6) + 0.0 AS z
    FROM events
    """,
    doc="A5 whole-frame z-score, exactly as the backfill computes it (reversal_flow.py:33-43).",
)
def a5_zscore_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return W.zscore(ev, "value", out_col="z").select("event_id", (F.round("z", 6) + 0.0).alias("z"))


@register(
    "a5_zscore_per_date",
    oracle="""
    SELECT event_id,
           ROUND((value - AVG(value) OVER w) / STDDEV_SAMP(value) OVER w, 6) + 0.0 AS z
    FROM events
    WINDOW w AS (PARTITION BY CAST(ts AS DATE))
    """,
    doc="A5 cross-sectional per-date z-score (the daily-flow variant).",
)
def a5_zscore_per_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    return (
        W.zscore(ev, "value", out_col="z", partition_by="date")
        .select("event_id", (F.round("z", 6) + 0.0).alias("z"))
    )


@register(
    "a6_equal_weight_benchmark",
    oracle="""
    SELECT date,
           CAST(SUM(CAST(value * w AS DECIMAL(18,9))) AS DOUBLE) AS bench_value,
           COUNT(*) AS n
    FROM (
      SELECT CAST(ts AS DATE) AS date, value,
             1.0 / COUNT(*) OVER (PARTITION BY CAST(ts AS DATE)) AS w
      FROM events)
    GROUP BY date
    """,
    doc="A6+A1 equal weights per date then weighted sum (benchmark_flow.py:11-31). "
    "decimal(18,9), not (38,9): per-date sums fit in a long-backed decimal, "
    "which aggregates ~40% faster than Int128 while staying order-exact.",
)
def a6_equal_weight_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("date", F.to_date("ts"))
    weighted = W.partition_count(ev, "date", out_col="n_date").withColumn(
        "w", F.lit(1.0) / F.col("n_date")
    )
    return weighted.groupBy("date").agg(
        F.sum((F.col("value") * F.col("w")).cast("decimal(18,9)"))
        .cast("double")
        .alias("bench_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "t_sessionize",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN epoch(ts)
                       - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                       > 3600.0
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM gaps)
    SELECT user_id,
           CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id
    """,
    doc="Sessionization: lag-gap > 1h starts a session; cumsum session ids.",
)
def t_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    # ntz -> ltz is identity wall-time under the pinned UTC session,
    # and ltz casts to fractional epoch seconds (DuckDB's epoch()).
    epoch = F.col("ts").cast("timestamp_ltz").cast("double")
    gap = epoch - F.lag(F.col("ts").cast("timestamp_ltz")).over(w).cast("double")
    sess = (
        ev.withColumn("new_session", F.when(gap > 3600.0, 1).otherwise(0))
        .withColumn("session_id", F.sum("new_session").over(run))
    )
    return sess.groupBy("user_id").agg(
        F.count_distinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "t_asof_last_view",
    oracle="""
    SELECT event_id, user_id, ts, value, last_view FROM (
      SELECT event_id, user_id, ts, value, event_type,
             last_value(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view
      FROM events)
    WHERE event_type = 'purchase'
    """,
    doc="As-of join within a series: each purchase picks the latest prior view value.",
)
def t_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = ev.withColumn(
        "last_view",
        F.last(F.when(F.col("event_type") == "view", F.col("value")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value", "last_view"
    )


@register(
    "w6_rolling_regression",
    oracle=f"""
    SELECT user_id, ts, ROUND(slope, 6) + 0.0 AS slope, ROUND(icept, 6) + 0.0 AS icept FROM (
      SELECT user_id, ts,
        CASE WHEN COUNT(value) OVER w = {ROLL} THEN REGR_SLOPE(value, x) OVER w END AS slope,
        CASE WHEN COUNT(value) OVER w = {ROLL} THEN REGR_INTERCEPT(value, x) OVER w END AS icept
      FROM (
        SELECT user_id, ts, event_id, value,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS x
        FROM events)
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW))
    WHERE slope IS NOT NULL
    """,
    doc="W6-class rolling OLS (1 regressor): windowed regr_slope/intercept with full-window gate "
    "(factor_model_flow.py:23-57 / betas_flow.py:24-48; multi-factor version is the "
    "applyInPandas kernel in operators/rolling_ols.py).",
)
def w6_rolling_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w = rn.rowsBetween(-(ROLL - 1), 0)
    base = ev.withColumn("x", F.row_number().over(rn).cast("double"))
    gate = F.count("value").over(w) == ROLL
    out = base.select(
        "user_id",
        "ts",
        F.when(gate, F.regr_slope("value", "x").over(w)).alias("slope"),
        F.when(gate, F.regr_intercept("value", "x").over(w)).alias("icept"),
    )
    return out.filter(F.col("slope").isNotNull()).select(
        "user_id", "ts", (F.round("slope", 6) + 0.0).alias("slope"), (F.round("icept", 6) + 0.0).alias("icept")
    )


@register(
    "w4_ewma_halflife",
    oracle="""
    WITH indexed AS (
      SELECT user_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events)
    SELECT a.user_id, a.ts,
           ROUND(SUM(POWER(0.5, (a.rn - b.rn) / 60.0) * b.value)
                 / SUM(POWER(0.5, (a.rn - b.rn) / 60.0)), 6) + 0.0 AS ewma
    FROM indexed a JOIN indexed b
      ON a.user_id = b.user_id AND b.rn <= a.rn
    GROUP BY a.user_id, a.ts
    """,
    doc="W4 EWMA half-life 60, Polars ewm_mean(adjust=True) semantics "
    "(factor_model_flow.py:86-88). Spark side: applyInPandas kernel; oracle: "
    "the closed-form normalized weighted sum (O(n^2) but n~67/key at sf0.01).",
)
def w4_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = ewm_mean(
        ev,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        value_col="value",
        half_life=60.0,
        out_col="ewma",
    )
    return out.select("user_id", "ts", (F.round("ewma", 6) + 0.0).alias("ewma"))
