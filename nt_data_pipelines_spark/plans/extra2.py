"""Final coverage batch: rollup, rolling extrema/median, and the
composite corpus-cleaning pipeline (normalize -> dedup -> quality
filter -> accounting) as one oracle-paired query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.text import normalize_text
from nt_data_pipelines_spark.operators.windows import keyed_window
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

ROLL = 21


@register(
    "a_rollup_counts",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
    doc="ROLLUP grouping sets (hierarchical subtotals).",
)
def a_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "w_rolling_minmax",
    oracle=f"""
    SELECT user_id, ts, lo, hi FROM (
      SELECT user_id, ts,
        CASE WHEN COUNT(value) OVER w = {ROLL} THEN MIN(value) OVER w END AS lo,
        CASE WHEN COUNT(value) OVER w = {ROLL} THEN MAX(value) OVER w END AS hi
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW))
    WHERE lo IS NOT NULL
    """,
    doc="Gated rolling extrema (drawdown/range monitoring primitives).",
)
def w_rolling_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = keyed_window("user_id", ["ts", "event_id"]).rowsBetween(-(ROLL - 1), 0)
    gate = F.count("value").over(w) == ROLL
    out = ev.select(
        "user_id",
        "ts",
        F.when(gate, F.min("value").over(w)).alias("lo"),
        F.when(gate, F.max("value").over(w)).alias("hi"),
    )
    return out.filter(F.col("lo").isNotNull())


@register(
    "w_rolling_median",
    oracle=f"""
    SELECT user_id, ts, ROUND(med, 6) + 0.0 AS med FROM (
      SELECT user_id, ts,
        CASE WHEN COUNT(value) OVER w = {ROLL} THEN median(value) OVER w END AS med
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN {ROLL - 1} PRECEDING AND CURRENT ROW))
    WHERE med IS NOT NULL
    """,
    doc="Gated rolling exact median (interpolated; identical definition "
    "in both engines, unlike approximate sketches).",
)
def w_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.windows import rolling_median

    ev = load_table(spark, sf_dir, "events")
    # Spark's median() rejects window frames; the operator's sort path
    # takes the middle order statistic of the full odd window. W=21 is
    # inside the sort form's cost envelope; rolling_median switches to
    # the grouped pandas kernel past max_sort_window (W=252-class).
    out = rolling_median(ev, "user_id", ["ts", "event_id"], "value", ROLL, method="sort")
    return out.filter(F.col("med").isNotNull()).select(
        "user_id", "ts", (F.round("med", 6) + 0.0).alias("med")
    )


@register(
    "j_asof_join",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.value AS right_value, r.ts AS right_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="Cross-table as-of join: each purchase picks the latest prior-or-"
    "simultaneous view per user. Spark side is the union+carry-forward "
    "operator (operators/asof.py); oracle is DuckDB's native ASOF JOIN.",
)
def j_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof_join(purchases, views, on="ts", by="user_id").select(
        "event_id", "user_id", "ts", "value", "right_value", "right_ts"
    )


@register(
    "j_asof_forward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.value AS right_value, r.ts AS right_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    doc="Forward as-of join: each purchase picks the EARLIEST "
    "at-or-after view per user (direction='forward'); oracle is "
    "DuckDB's native forward ASOF JOIN (l.ts <= r.ts).",
)
def j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof_join(purchases, views, on="ts", by="user_id", direction="forward").select(
        "event_id", "user_id", "ts", "value", "right_value", "right_ts"
    )


@register(
    "j_asof_tolerance",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN CAST(epoch_us(l.ts) AS DOUBLE) / 1000000.0
                     - CAST(epoch_us(r.ts) AS DOUBLE) / 1000000.0 <= 3600.0
                THEN r.value END AS right_value,
           CASE WHEN CAST(epoch_us(l.ts) AS DOUBLE) / 1000000.0
                     - CAST(epoch_us(r.ts) AS DOUBLE) / 1000000.0 <= 3600.0
                THEN r.ts END AS right_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join with a 1-hour tolerance: matches older than the "
    "allowance null out (ALL carried columns together, keyed off the "
    "matched row). Oracle: native ASOF JOIN + an age cutoff computed "
    "with the SAME double-epoch arithmetic as the Spark operator — an "
    "exact INTERVAL compare could flip a match whose age is exactly "
    "the tolerance (double ulp at epoch scale is ~0.24 microseconds).",
)
def j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts", "value")
    return asof_join(
        purchases, views, on="ts", by="user_id", tolerance_seconds=3600
    ).select("event_id", "user_id", "ts", "right_value", "right_ts")


@register(
    "j_interval_join",
    oracle="""
    WITH iv AS (
      SELECT user_id AS iv_user, MIN(ts) AS start_ts,
             MIN(ts) + INTERVAL 2 HOUR AS end_ts
      FROM events WHERE user_id < 20 GROUP BY user_id
    ),
    p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, iv.iv_user, iv.start_ts, iv.end_ts
    FROM p JOIN iv ON p.ts BETWEEN iv.start_ts AND iv.end_ts
    """,
    doc="Interval (range) join via bucketed equi-join: purchases matched "
    "into each low-id user's first-2h activity window. A raw BETWEEN "
    "join would plan as a nested loop; the operator quantizes time, "
    "explodes intervals to overlapped buckets, equi-joins on the "
    "bucket, and verifies containment (operators/interval.py).",
)
def j_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.interval import interval_join

    ev = load_table(spark, sf_dir, "events")
    iv = (
        ev.filter(F.col("user_id") < 20)
        .groupBy(F.col("user_id").alias("iv_user"))
        .agg(
            F.min("ts").alias("start_ts"),
            (F.min("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
        )
    )
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    return interval_join(p, iv, "ts", "start_ts", "end_ts", bucket_seconds=3600).select(
        "event_id", "user_id", "ts", "iv_user", "start_ts", "end_ts"
    )


@register(
    "p_clean_corpus",
    oracle="""
    WITH normalized AS (
      SELECT doc_id, lang, source,
             TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', ' ', 'g'),
                                 ' +', ' ', 'g')) AS norm_text
      FROM documents
    ),
    survivors AS (
      SELECT MIN(doc_id) AS doc_id FROM normalized GROUP BY md5(norm_text)
    ),
    kept AS (
      SELECT n.* FROM normalized n JOIN survivors s ON n.doc_id = s.doc_id
      WHERE LEN(string_split(norm_text, ' ')) >= 5
        AND LENGTH(regexp_replace(norm_text, '[^a-z]', '', 'g'))
              > 0.5 * LENGTH(norm_text)
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(string_split(norm_text, ' '))) AS BIGINT) AS total_words
    FROM kept GROUP BY lang
    """,
    doc="The canonical training-data cleaning pipeline in one plan: "
    "normalize -> exact-dedup survivors on normalized text -> quality "
    "filter (length + alpha ratio) -> per-language accounting.",
)
def p_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    normalized = docs.select(
        "doc_id", "lang", "source", normalize_text("text").alias("norm_text")
    )
    survivors = (
        normalized.groupBy(F.md5("norm_text"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    words = F.split(F.col("norm_text"), " ")
    alpha_len = F.length(F.regexp_replace("norm_text", "[^a-z]", ""))
    kept = (
        normalized.join(survivors, "doc_id")
        .filter(F.size(words) >= 5)
        .filter(alpha_len > 0.5 * F.length("norm_text"))
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(words)).alias("total_words"),
    )
