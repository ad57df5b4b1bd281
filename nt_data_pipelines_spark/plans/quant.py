"""Cross-sectional / labeling window queries (round-4 additions).

The quant primitives the reference's flows compose around but never
name as operators: cross-sectional ranking into quantile portfolios,
forward-return label generation, drawdown tracking, gap-fill, and
per-date winsorization. All run on the ``events`` stand-in series
(user_id <-> ticker, ts <-> time, value <-> price/signal; FIXTURES.md)
and follow the engine-parity rules in :mod:`plans.registry`.

Scale shapes: every query here is one shuffle on its key (user or
day); winsorize adds a tiny per-day bounds aggregate broadcast back,
so the fact table shuffles at most once in each plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import windows as W
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table


@register(
    "w_xsec_rank",
    oracle="""
    SELECT event_id, CAST(ts AS DATE) AS d, value,
           RANK() OVER w AS rnk,
           NTILE(10) OVER w AS decile
    FROM events
    WINDOW w AS (PARTITION BY CAST(ts AS DATE) ORDER BY value, event_id)
    """,
    doc="Cross-sectional rank + decile bucket within each day "
    "(the signal-ranking step ahead of portfolio construction).",
)
def w_xsec_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = ev.withColumn("d", F.col("ts").cast("date"))
    ranked = W.xsec_rank(
        day, "d", ["value", "event_id"], rank_col="rnk", ntile_col="decile", buckets=10
    )
    # rank/ntile are int32 in Spark, int64 in the oracle engine
    return ranked.select(
        "event_id", "d", "value",
        F.col("rnk").cast("long").alias("rnk"),
        F.col("decile").cast("long").alias("decile"),
    )


@register(
    "w_forward_returns",
    oracle="""
    SELECT user_id, ts, value,
           LEAD(NULLIF(value, 0), 1) OVER w / NULLIF(value, 0) - 1 AS fwd_ret_1,
           LEAD(NULLIF(value, 0), 5) OVER w / NULLIF(value, 0) - 1 AS fwd_ret_5
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Multi-horizon forward returns (supervised-label twin of W1 "
    "pct_change); one shared window. Zero observations are treated as "
    "missing on both engines, so no inf/NULL divergence can appear.",
)
def w_forward_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    guarded = ev.withColumn("__base", F.nullif(F.col("value"), F.lit(0)))
    out = W.forward_returns(
        guarded, "user_id", ["ts", "event_id"], "__base", horizons=(1, 5)
    )
    return out.select("user_id", "ts", "value", "fwd_ret_1", "fwd_ret_5")


@register(
    "w_drawdown",
    oracle="""
    SELECT user_id, ts, value,
           MAX(value) OVER w AS running_peak,
           value / NULLIF(MAX(value) OVER w, 0) - 1 AS dd
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Running peak + drawdown per key (risk-tracking primitive); "
    "cumulative max window, IEEE division, zero-peak guarded.",
)
def w_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = W.drawdown(ev, "user_id", ["ts", "event_id"], "value", out_col="__dd_raw")
    return out.select(
        "user_id",
        "ts",
        "value",
        "running_peak",
        (F.col("value") / F.nullif(F.col("running_peak"), F.lit(0)) - 1).alias("dd"),
    )


@register(
    "w_gap_fill",
    oracle="""
    SELECT user_id, ts, event_id,
           LAST_VALUE(gapped IGNORE NULLS) OVER w AS filled
    FROM (SELECT user_id, ts, event_id,
                 CASE WHEN event_id % 7 <> 0 THEN value END AS gapped
          FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc="Forward-fill after deterministic gap injection (every 7th "
    "event nulled): last non-null observation carried forward per key "
    "— the calendar-upsample fill shape.",
)
def w_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    gapped = ev.withColumn(
        "gapped", F.when(F.col("event_id") % 7 != 0, F.col("value"))
    )
    filled = W.forward_fill(
        gapped, "user_id", ["ts", "event_id"], "gapped", out_col="filled"
    )
    return filled.select("user_id", "ts", "event_id", "filled")


@register(
    "p_winsorize",
    oracle="""
    SELECT e.event_id, e.d, ROUND(LEAST(GREATEST(e.value, b.lo), b.hi), 6) + 0.0 AS wvalue
    FROM (SELECT event_id, CAST(ts AS DATE) AS d, value FROM events) e
    JOIN (SELECT CAST(ts AS DATE) AS d,
                 PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY value) AS lo,
                 PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY value) AS hi
          FROM events GROUP BY 1) b USING (d)
    """,
    doc="Per-day winsorization at exact p05/p95 (outlier clip before "
    "z-scoring). Spark side: grouped exact percentile broadcast back; "
    "bounds rounded jointly with the clip (engine-parity rule 2).",
)
def p_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn("d", F.col("ts").cast("date"))
    out = W.winsorize(ev, "d", "value", lower=0.05, upper=0.95, out_col="__w")
    return out.select(
        "event_id", "d", (F.round(F.col("__w"), 6) + F.lit(0.0)).alias("wvalue")
    )


# ---- corpus curation addition (round 4): exact-substring dedup signal ----

from nt_data_pipelines_spark.operators import text as TX  # noqa: E402

NGRAM_N = 8


@register(
    "d_dup_ngram_fraction",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    grams AS (
      -- gram hashed to a 60-bit BIGINT key, mirroring operators/text.gram_key
      SELECT DISTINCT doc_id,
             UNNEST(list_transform(range(1, LEN(ws) - {NGRAM_N} + 2),
                                   i -> CAST(concat('0x', substr(md5(
                                       array_to_string(ws[i:i + {NGRAM_N} - 1], ' ')
                                   ), 1, 15)) AS BIGINT))) AS gram
      FROM w WHERE LEN(ws) >= {NGRAM_N}
    ),
    dfreq AS (SELECT gram, COUNT(*) AS df FROM grams GROUP BY gram),
    per_doc AS (
      SELECT g.doc_id, COUNT(*) AS n_grams,
             SUM(CASE WHEN f.df > 1 THEN 1 ELSE 0 END) AS dup
      FROM grams g JOIN dfreq f USING (gram) GROUP BY 1
    )
    SELECT d.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.dup / p.n_grams, 0.0) AS dup_ngram_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
    doc=f"Exact-substring dedup signal: per-doc fraction of word "
    f"{NGRAM_N}-grams occurring in any other document (RefinedWeb-style "
    "span dedup adapted to shingles). Two linear shuffles, no pairwise join.",
)
def d_dup_ngram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return TX.duplicated_ngram_fraction(docs, "doc_id", "text", n=NGRAM_N)


# decimal window sum over w of an expression (engine-parity: exact,
# order-independent; powers spelled as explicit multiplications so the
# double values match bit-for-bit before the sum)
def _dwsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(38,8))) OVER w AS DOUBLE)"


_MOM = f"""
    WITH sums AS (
      SELECT user_id, ts, event_id,
             COUNT(value) OVER w AS cnt,
             {_dwsum('value')} AS s1,
             {_dwsum('value * value')} AS s2,
             {_dwsum('value * value * value')} AS s3,
             {_dwsum('value * value * value * value')} AS s4
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND CURRENT ROW)
    ),
    mom AS (
      SELECT user_id, ts,
             s1 / 21 AS mean,
             s2 / 21 - (s1/21) * (s1/21) AS m2,
             s3 / 21 - 3 * (s1/21) * (s2/21) + 2 * (s1/21)*(s1/21)*(s1/21) AS m3,
             s4 / 21 - 4 * (s1/21) * (s3/21) + 6 * (s1/21)*(s1/21) * (s2/21)
                     - 3 * (s1/21)*(s1/21)*(s1/21)*(s1/21) AS m4
      FROM sums WHERE cnt = 21
    )
    SELECT user_id, ts,
           ROUND((m3 / POWER(m2, 1.5)) * SQRT(21.0 * 20.0) / 19.0, 6) + 0.0 AS skew,
           ROUND(((21.0 + 1) * (m4 / (m2 * m2) - 3) + 6) * 20.0 / (19.0 * 18.0), 6) + 0.0
             AS kurt
    FROM mom
"""


@register(
    "w_rolling_skew_kurt",
    oracle=_MOM,
    doc="Trailing 21-row sample skewness + excess kurtosis "
    "(pandas-adjusted G1/G2 estimators) from decimal power sums in one "
    "window pass — tail-risk labeling for return series.",
)
def w_rolling_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = W.rolling_skew_kurt(ev, "user_id", ["ts", "event_id"], "value", 21)
    return (
        out.filter(F.col("skew").isNotNull())
        .select(
            "user_id", "ts",
            (F.round("skew", 6) + 0.0).alias("skew"),
            (F.round("kurt", 6) + 0.0).alias("kurt"),
        )
    )


@register(
    "w_rsi14",
    oracle="""
    WITH d AS (
      SELECT user_id, ts, event_id,
             value - LAG(value, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS diff
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             COUNT(diff) OVER w AS cnt,
             CAST(SUM(CAST(GREATEST(diff, 0.0) AS DECIMAL(38,8))) OVER w AS DOUBLE) AS ag,
             CAST(SUM(CAST(GREATEST(-diff, 0.0) AS DECIMAL(38,8))) OVER w AS DOUBLE) AS al
      FROM d
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, ts,
           ROUND(CASE WHEN al = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + ag / al) END, 6) + 0.0 AS rsi
    FROM s WHERE cnt = 14
    """,
    doc="Cutler's RSI (simple-average gains/losses over 14 diffs): the "
    "window-expression form; the Wilder EWMA recursion lives in the "
    "stateful ewma kernel tier.",
)
def w_rsi14(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = W.rsi(ev, "user_id", ["ts", "event_id"], "value", period=14)
    return (
        out.filter(F.col("rsi").isNotNull())
        .select("user_id", "ts", (F.round("rsi", 6) + 0.0).alias("rsi"))
    )


@register(
    "w_robust_zscore",
    oracle="""
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type, median(ABS(e.value - m.med)) AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND(0.6744897501960817 * (e.value - m.med) / NULLIF(d.mad, 0.0), 6) + 0.0
             AS robust_z
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    """,
    doc="Median/MAD robust z-score per group — the outlier-immune A5 "
    "variant used ahead of winsorization. Fact table never shuffles: two "
    "tiny per-group aggregates broadcast back.",
)
def w_robust_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.windows import robust_zscore

    ev = load_table(spark, sf_dir, "events")
    out = robust_zscore(ev, "event_type", "value")
    return out.select(
        "event_id", "event_type", (F.round("robust_z", 6) + 0.0).alias("robust_z")
    )
