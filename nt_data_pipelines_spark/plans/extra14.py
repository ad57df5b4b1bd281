"""Round-10 additions, fourth batch: band join, hopping windows,
per-group discrete quantile table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nt_data_pipelines_spark.plans.registry import register, sql_dsum
from nt_data_pipelines_spark.sources.testdata import load_table


@register(
    "j_band_join",
    oracle="""
    WITH l AS (
      -- +-2 band offsets: MUST mirror numeric_band_join's slack=2
      -- fan-out exactly, or engine and oracle disagree on the IEEE
      -- floor-flip corner cases the slack exists to catch (ADVICE r11)
      SELECT s_suppkey, s_acctbal,
             UNNEST([CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) - 2,
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) - 1,
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT),
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) + 1,
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) + 2]) AS band
      FROM supplier
    ),
    r AS (
      SELECT c_custkey, c_acctbal,
             CAST(FLOOR(c_acctbal / 5.0) AS BIGINT) AS band
      FROM customer
    )
    SELECT s_suppkey, c_custkey,
           abs(s_acctbal - c_acctbal) AS band_gap
    FROM l JOIN r USING (band)
    WHERE abs(s_acctbal - c_acctbal) <= 5.0
    """,
    doc="Numeric band join: supplier-customer account-balance matches "
    "within +-5.00. A raw abs(a-b)<=d predicate plans as a nested-loop "
    "join (O(n*m) compares); blocking on floor(val/delta) makes it an "
    "equi-join with a fixed 5x left fan-out (+-2 buckets: the IEEE "
    "recall margin) and an exact re-filter — "
    "the shuffle stays linear at any scale. The gap is row-level IEEE "
    "arithmetic (exact, no rounding machinery).",
)
def j_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.interval import numeric_band_join

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    return numeric_band_join(sup, cust, "s_acctbal", "c_acctbal", 5.0).select(
        "s_suppkey", "c_custkey", "band_gap"
    )


@register(
    "w_hopping_counts",
    oracle=f"""
    WITH e AS (
      SELECT event_type, value, epoch_us(ts) AS us FROM events
    ),
    x AS (
      SELECT event_type, value,
             UNNEST([us - us % 300000000,
                     us - us % 300000000 - 300000000]) AS ws
      FROM e
    )
    SELECT event_type, make_timestamp(ws) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {sql_dsum("value")} AS sum_value
    FROM x GROUP BY event_type, ws
    """,
    doc="Hopping event-time windows in batch (10-minute windows every "
    "5 minutes): Spark's native F.window(slideDuration) assigns each "
    "event to its two overlapping windows; the oracle mirrors with "
    "the two 5-minute-aligned starts covering each timestamp. The "
    "streaming tier's windowed aggregation, expressed as one explode "
    "+ one linear groupBy; value sums ride decimal (rule 1).",
)
def w_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.plans.registry import dsum

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.window("ts", "10 minutes", "5 minutes").alias("__w"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("__w.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "a_quantile_table",
    oracle="""
    WITH c AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
      FROM documents GROUP BY source, n_chars
    ),
    tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM c GROUP BY source),
    cum AS (
      SELECT source, v,
             SUM(c) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM c
    ),
    q AS (SELECT UNNEST([25, 50, 75, 95]) AS pct)
    SELECT cum.source, pct,
           MIN(v) AS value
    FROM cum JOIN tot USING (source) CROSS JOIN q
    WHERE 100 * cum >= pct * n
    GROUP BY cum.source, pct
    """,
    doc="Per-source discrete quantile table (p25/p50/p75/p95 of doc "
    "length): each cutoff is the value at ascending rank ceil(q*n) "
    "via the integer identity 100*cum >= pct*n over the (source, "
    "value) VALUE domain — no float interpolation (engines disagree), "
    "no per-source row sort (the window orders distinct values only).",
)
def a_quantile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    c = docs.groupBy("source", F.col("n_chars").alias("__v")).agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = c.groupBy("source").agg(F.sum("__c").cast("long").alias("__n"))
    cum = c.select("source", "__v", F.sum("__c").over(w).alias("__cum"))
    pcts = F.explode(F.array(*[F.lit(p) for p in (25, 50, 75, 95)])).alias("pct")
    return (
        cum.join(tot, "source")
        .select("source", "__v", "__cum", "__n", pcts)
        .filter(F.col("__cum") * 100 >= F.col("pct") * F.col("__n"))
        .groupBy("source", "pct")
        .agg(F.min("__v").alias("value"))
    )


@register(
    "j_nearest_balance",
    oracle="""
    WITH l AS (
      -- +-2 band offsets: mirrors numeric_band_join's slack=2 (ADVICE r11)
      SELECT s_suppkey, s_acctbal,
             UNNEST([CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) - 2,
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) - 1,
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT),
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) + 1,
                     CAST(FLOOR(s_acctbal / 5.0) AS BIGINT) + 2]) AS band
      FROM supplier
    ),
    r AS (
      SELECT c_custkey, c_acctbal,
             CAST(FLOOR(c_acctbal / 5.0) AS BIGINT) AS band
      FROM customer
    ),
    m AS (
      SELECT s_suppkey, s_acctbal, c_custkey, c_acctbal,
             abs(s_acctbal - c_acctbal) AS band_gap
      FROM l JOIN r USING (band)
      WHERE abs(s_acctbal - c_acctbal) <= 5.0
    )
    SELECT s_suppkey, s_acctbal, c_custkey, c_acctbal, band_gap
    FROM m
    -- partition by (key, val): mirrors nearest_value_join's identity
    -- contract — a duplicate left key with two values ranks per VALUE
    QUALIFY ROW_NUMBER() OVER (PARTITION BY s_suppkey, s_acctbal
                               ORDER BY band_gap, c_acctbal, c_custkey) = 1
    """,
    doc="Nearest-match join: for each supplier, the SINGLE closest "
    "customer balance within +-5.00 — the numeric as-of. Band-blocked "
    "equi-join candidates, then a per-left-key rank over that row's "
    "in-band matches only (bounded by the radius, never a table); "
    "ties break deterministically on (gap, value, key).",
)
def j_nearest_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.interval import nearest_value_join

    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    return nearest_value_join(
        sup, cust, "s_suppkey", "s_acctbal", "c_custkey", "c_acctbal", 5.0
    )


@register(
    "a_event_burstiness",
    oracle="""
    WITH c AS (
      SELECT event_type, date_trunc('minute', ts) AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY event_type, b
    ),
    g AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_buckets,
             CAST(SUM(c) AS BIGINT) AS total_events,
             SUM(CAST(c AS HUGEINT) * c) AS sxx
      FROM c GROUP BY event_type
    )
    SELECT event_type, n_buckets, total_events,
           CAST((2 * (n_buckets * sxx
                      - CAST(total_events AS HUGEINT) * total_events)
                 * 1000000
                 + (n_buckets - 1) * CAST(total_events AS HUGEINT))
                // (2 * (n_buckets - 1)
                    * CAST(total_events AS HUGEINT)) AS DOUBLE)
             / 1000000.0 AS fano
    FROM g WHERE n_buckets >= 2
    """,
    doc="Per-event-type Fano factor (variance/mean of per-minute "
    "counts over observed minutes) — the burstiness audit: ~1 for "
    "Poisson-like streams, >>1 for batchy upstreams, <1 for "
    "rate-limited feeds. Counts are integers so the sample "
    "variance-to-mean ratio is an exact rational: all integer in "
    "decimal(38,0)/HUGEINT until one rule-3 half-up micro division; "
    "two linear map-side-partial aggregations, no windows.",
)
def a_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nt_data_pipelines_spark.operators.stats import burstiness_by_group

    ev = load_table(spark, sf_dir, "events")
    return burstiness_by_group(ev, "event_type", "ts", bucket="minute")


@register(
    "j_prefix_filter_match",
    oracle="""
    WITH nm AS (
      SELECT MIN(p_partkey) AS id, p_name AS name FROM part GROUP BY p_name
    ),
    gl AS (
      SELECT id, CASE WHEN len(name) >= 3 THEN list_distinct(
        list_transform(range(1, len(name) - 1), i -> substr(name, i, 3))
      ) ELSE [name] END AS grams FROM nm
    ),
    g AS (SELECT id, UNNEST(grams) AS gram FROM gl),
    sz AS (SELECT id, CAST(len(grams) AS BIGINT) AS n_g FROM gl),
    dfreq AS (SELECT gram, COUNT(*) AS dfr FROM g GROUP BY gram),
    rk AS (
      SELECT g.id, g.gram,
             ROW_NUMBER() OVER (PARTITION BY g.id ORDER BY dfr, g.gram) AS rk
      FROM g JOIN dfreq USING (gram)
    ),
    -- prefix length n - ceil(2n/5) + 1, integer ceil
    pre AS (
      SELECT rk.id, gram FROM rk JOIN sz USING (id)
      WHERE rk <= n_g - ((2 * n_g + 4) // 5) + 1
    ),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b
      FROM pre a JOIN pre b ON a.gram = b.gram AND a.id < b.id
    ),
    p AS (
      SELECT id_a, id_b,
             CAST(len(list_intersect(ga.grams, gb.grams)) AS BIGINT) AS inter
      FROM cand JOIN gl ga ON cand.id_a = ga.id
                JOIN gl gb ON cand.id_b = gb.id
    )
    SELECT id_a, id_b,
           CAST((2 * inter * 1000000 + (sa.n_g + sb.n_g - inter))
                // (2 * (sa.n_g + sb.n_g - inter)) AS DOUBLE) / 1000000.0
             + 0.0 AS name_jaccard
    FROM p JOIN sz sa ON p.id_a = sa.id JOIN sz sb ON p.id_b = sb.id
    WHERE inter * 5 >= (sa.n_g + sb.n_g - inter) * 2
    """,
    doc="Set-similarity self-join at Jaccard >= 2/5 over DISTINCT part "
    "names via LOSSLESS prefix filtering (SSJoin/PPJoin family): grams "
    "rank globally by (df asc, gram), and only each set's first "
    "n - ceil(t*n) + 1 grams enter the candidate join — a pair at the "
    "threshold must share a prefix gram, so recall is exact (equality "
    "with the uncapped quadratic form is test-pinned), while the join "
    "keys are by construction the RAREST grams: the hot-gram blow-up "
    "prunes itself. Prefix length and threshold compare are all-"
    "integer (rational threshold 2/5, never a float ceil).",
)
def j_prefix_filter_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.linkage import prefix_filtered_pairs

    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    return prefix_filtered_pairs(names.select("id", "p_name"), "id", "p_name", 2, 5)


@register(
    "w_overnight_gaps",
    oracle="""
    WITH b AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS bucket,
             value,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('day', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    ),
    bars AS (
      SELECT event_type, bucket,
             MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
             MAX(CASE WHEN rn_d = 1 THEN value END) AS close
      FROM b GROUP BY event_type, bucket
    ),
    g AS (
      SELECT event_type, bucket, open,
             lag(close) OVER (PARTITION BY event_type ORDER BY bucket)
               AS prev_close
      FROM bars
    )
    SELECT event_type, bucket, open, prev_close,
           open - prev_close AS gap
    FROM g WHERE prev_close IS NOT NULL
    """,
    doc="Overnight gap per (event_type, day): today's open minus "
    "yesterday's close over the deterministic OHLC bars (tie-broken "
    "open/close) — the session-boundary jump a bar-level rollup "
    "hides. The lag runs over the BARS frame (days x types, never "
    "raw events); the gap is row-level IEEE arithmetic, exact.",
)
def w_overnight_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.operators.sessions import resample_ohlc

    ev = load_table(spark, sf_dir, "events")
    bars = resample_ohlc(ev, ["event_type"], "ts", "value", "event_id", freq="day")
    w = Window.partitionBy("event_type").orderBy("bucket")
    return (
        bars.select(
            "event_type",
            F.to_date("bucket").alias("bucket"),
            "open",
            F.lag("close").over(w).alias("prev_close"),
        )
        .filter(F.col("prev_close").isNotNull())
        .withColumn("gap", F.col("open") - F.col("prev_close"))
    )
