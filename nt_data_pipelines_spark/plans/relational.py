"""Relational operator queries (SURVEY.md §2.2-§2.4, §2.6-§2.8).

Each query exercises one operator class from the reference on the
TPC-H-ish driver tables and carries an equivalent DuckDB oracle.
Spark-first notes are inline: broadcasts for dimension joins,
decimal sums for engine parity, explicit pivot values.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.plans.registry import (
    davg,
    dsum,
    register,
    sql_davg,
    sql_dsum,
)
from nt_data_pipelines_spark.sources.testdata import load_table


# ---------------------------------------------------------------- A-class
@register(
    "a1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity', 2)} AS sum_qty,
      {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
      {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
      {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
      {sql_davg('l_quantity', 2)} AS avg_qty,
      {sql_davg('l_extendedprice', 2)} AS avg_price,
      {sql_davg('l_discount', 2)} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-class pricing summary: multi-agg groupBy (A1-family).",
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "j2_shipping_priority",
    oracle=f"""
    SELECT
      l.l_orderkey,
      {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue,
      o.o_orderdate,
      o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-class: 3-way join + filter + agg + top-k (J1/J4, O3).",
)
def j2_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    # customer/orders are ~1/10 the probe side — broadcast the filtered
    # dimension so the big lineitem scan never shuffles for the join.
    joined = li.join(
        F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
        li.l_orderkey == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "j1_universe_gated_join",
    oracle=f"""
    WITH universe AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'signup'
    )
    SELECT e.user_id,
           COUNT(*) AS n_events,
           {sql_dsum('e.value', 2)} AS total_value
    FROM universe u
    LEFT JOIN events e ON e.user_id = u.user_id
    WHERE e.value IS NOT NULL
    GROUP BY e.user_id
    """,
    doc="J1 universe-gating left join + null filter (utils/data.py:21-29).",
)
def j1_universe_gated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    universe = ev.filter(F.col("event_type") == "signup").select("user_id").distinct()
    # The reference gates every fact table through the (small) universe
    # with a left join; in Spark the universe is the broadcast side.
    gated = F.broadcast(universe.alias("u")).join(
        ev.alias("e"), F.col("e.user_id") == F.col("u.user_id"), "left"
    )
    return (
        gated.filter(F.col("e.value").isNotNull())
        .groupBy(F.col("e.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("e.value", 2).alias("total_value"))
    )


@register(
    "j5_full_outer_coalesce",
    oracle=f"""
    WITH buys AS (
      SELECT user_id, {sql_dsum('value', 2)} AS buy_value
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    views AS (
      SELECT user_id, {sql_dsum('value', 2)} AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id
    )
    SELECT
      COALESCE(b.user_id, v.user_id) AS user_id,
      COALESCE(b.buy_value, 0) AS buy_value,
      COALESCE(v.view_value, 0) AS view_value,
      COALESCE(b.buy_value, 0) - COALESCE(v.view_value, 0) AS delta
    FROM buys b FULL OUTER JOIN views v ON b.user_id = v.user_id
    """,
    doc="J5 full-outer join + key coalesce + null-fill (trading_flow.py:53-59).",
)
def j5_full_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(dsum("value", 2).alias("buy_value"))
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(dsum("value", 2).alias("view_value"))
    )
    j = buys.alias("b").join(views.alias("v"), F.col("b.user_id") == F.col("v.user_id"), "full_outer")
    buy = F.coalesce(F.col("b.buy_value"), F.lit(0.0))
    view = F.coalesce(F.col("v.view_value"), F.lit(0.0))
    return j.select(
        F.coalesce(F.col("b.user_id"), F.col("v.user_id")).alias("user_id"),
        buy.alias("buy_value"),
        view.alias("view_value"),
        (buy - view).alias("delta"),
    )


@register(
    "j6_semi_anti",
    oracle="""
    SELECT 'with_orders' AS cohort, COUNT(*) AS n_customers
    FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS cohort, COUNT(*) AS n_customers
    FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="Semi/anti-join idiom (trading_flow.py:69,80-81 is_in/not).",
)
def j6_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    on = cust.c_custkey == orders.o_custkey
    semi = cust.join(orders, on, "left_semi").agg(F.count(F.lit(1)).alias("n_customers"))
    anti = cust.join(orders, on, "left_anti").agg(F.count(F.lit(1)).alias("n_customers"))
    return semi.select(F.lit("with_orders").alias("cohort"), "n_customers").unionByName(
        anti.select(F.lit("without_orders").alias("cohort"), "n_customers")
    )


@register(
    "a2_collect_sorted_list",
    oracle="""
    SELECT user_id, string_agg(event_type, ',' ORDER BY event_type) AS types
    FROM (SELECT DISTINCT user_id, event_type FROM events)
    GROUP BY user_id
    """,
    doc="A2 group-by collect-list (universe_flow.py:94-96), sorted for determinism.",
)
def a2_collect_sorted_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "event_type")
        .distinct()
        .groupBy("user_id")
        .agg(F.array_join(F.array_sort(F.collect_list("event_type")), ",").alias("types"))
    )


@register(
    "a3_global_max",
    oracle="SELECT MAX(ts) AS max_ts, MIN(ts) AS min_ts, COUNT(*) AS n_rows FROM events",
    doc="A3 global max/min scalar aggregate (utils/calendar.py:10-12).",
)
def a3_global_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.max("ts").alias("max_ts"), F.min("ts").alias("min_ts"), F.count(F.lit(1)).alias("n_rows")
    )


@register(
    "a4_distinct",
    oracle="""
    SELECT user_id, event_type FROM events
    GROUP BY user_id, event_type
    """,
    doc="A4 distinct (stock_prices_flow.py:19).",
)
def a4_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# ---------------------------------------------------------------- O-class
@register(
    "o3_topk_dates",
    oracle="""
    SELECT DISTINCT CAST(ts AS DATE) AS date FROM events
    ORDER BY date DESC LIMIT 21
    """,
    doc="O3 top-k trailing dates (utils/calendar.py:15-19).",
)
def o3_topk_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    # top-21 DISTINCT dates as one partial-aggregated collect_set pass:
    # each task contributes its (tiny: ~trading-calendar-sized) date
    # set, one single-partition merge sorts and slices — one exchange
    # of a few hundred values, no hash-distinct shuffle + TakeOrdered
    # pair. Benched vs the distinct().orderBy().limit() form: 35 ms vs
    # 63 ms at sf1, 34 vs 51 at sf5 (prod config). Only viable because
    # the key space is DATES (bounded); a high-cardinality top-k keeps
    # the TakeOrdered shape.
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.to_date("ts").alias("date"))
        .agg(
            F.slice(F.sort_array(F.collect_set("date"), asc=False), 1, 21).alias(
                "__top"
            )
        )
        .select(F.explode("__top").alias("date"))
    )


@register(
    "o4_top3_per_group",
    oracle="""
    SELECT event_type, rk, event_id, value FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
      FROM events)
    WHERE rk <= 3
    """,
    doc="O4 top-k per group via ranked window (slack_daily_summary.py:33-34).",
)
def o4_top3_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
        .select("event_type", "rk", "event_id", "value")
    )


# ---------------------------------------------------------------- R-class
@register(
    "r1_union_slices",
    oracle=f"""
    WITH unioned AS (
      SELECT * FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT * FROM events WHERE event_type = 'click'
    )
    SELECT event_type, COUNT(*) AS n, {sql_dsum('value', 2)} AS total
    FROM unioned GROUP BY event_type
    """,
    doc="R1 union-all of homogeneous slices (stock_prices_flow.py:86-90).",
)
def r1_union_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    slices = [ev.filter(F.col("event_type") == t) for t in ("purchase", "click")]
    unioned = reduce(DataFrame.unionByName, slices)
    return unioned.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", 2).alias("total")
    )


@register(
    "r3_unpivot_lineitem",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS amount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    doc="R3 unpivot wide->long (factor_model_flow.py:78-82).",
)
def r3_unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").withColumnsRenamed(
        {"l_quantity": "quantity", "l_extendedprice": "extendedprice", "l_discount": "discount"}
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["quantity", "extendedprice", "discount"],
        variableColumnName="measure",
        valueColumnName="amount",
    )


@register(
    "r4_explode_embeddings",
    oracle="""
    SELECT dim, n,
           -- signed 9-decimal rational: integer half-away round-6
           -- (registry rule 3; HALF_UP is away-from-zero on negatives)
           CAST(SIGN(nano) * ((2 * ABS(nano) + 1000) // 2000) AS DOUBLE)
             / 1000000.0 + 0.0 AS total
    FROM (
      SELECT g.dim AS dim, COUNT(*) AS n,
             CAST(SUM(CAST(CAST(e.embedding[g.dim + 1] AS DOUBLE) AS DECIMAL(38,9))
                      * 1000000000) AS HUGEINT) AS nano
      FROM embeddings e
      CROSS JOIN (SELECT UNNEST(range(64)) AS dim) g
      GROUP BY g.dim
    )
    """,
    doc="R4 explode array column + per-position aggregate (universe_flow.py:127-129).",
)
def r4_explode_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        F.posexplode("embedding").alias("dim", "val")
    ).withColumn("dim", F.col("dim").cast("long"))
    # signed 9-decimal rational: integer half-away round-6 (rule 3)
    return (
        exploded.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("val").cast("double").cast("decimal(38,9)") * 1000000000)
                .cast("decimal(38,0)")
            ).alias("__nano"),
        )
        .select(
            "dim",
            "n",
            (
                F.expr(
                    "CAST(SIGN(__nano) * ((2 * ABS(__nano) + 1000) DIV 2000) "
                    "AS DOUBLE)"
                )
                / 1000000.0
                + 0.0
            ).alias("total"),
        )
    )


# ---------------------------------------------------------------- P/F-class
@register(
    "p_scalar_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_quantity * l_extendedprice / 100.0 AS DECIMAL(38,4)) AS DOUBLE) AS notional,
           GREATEST(l_extendedprice - 50000.0, 0.0) AS clipped,
           ABS(l_quantity - 25.0) AS distance,
           CASE l_returnflag WHEN 'R' THEN 'returned' WHEN 'A' THEN 'accepted' ELSE 'none' END AS flag,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_quantity AS INTEGER) AS qty_int
    FROM lineitem
    WHERE l_extendedprice BETWEEN 1000.0 AND 90000.0
      AND ABS(l_quantity - 25.0) >= 1.0
      AND l_returnflag IN ('R', 'A', 'N')
    """,
    doc="P3/P6/P7/P10-P13 + F2/F4: casts, round, clip, abs, recode, between, is_in.",
)
def p_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dist = F.abs(F.col("l_quantity") - 25.0)
    return (
        li.filter(F.col("l_extendedprice").between(1000.0, 90000.0))
        .filter(dist >= 1.0)
        .filter(F.col("l_returnflag").isin("R", "A", "N"))
        .select(
            "l_orderkey",
            "l_linenumber",
            # exact decimal cast, not ROUND: the product has <=4 decimals, and
            # ROUND(x, 2) at an exact .xx5 midpoint is half-up in Spark but
            # half-even in DuckDB — the decimal cast sidesteps the tie.
            (F.col("l_quantity") * F.col("l_extendedprice") / 100.0)
            .cast("decimal(38,4)")
            .cast("double")
            .alias("notional"),
            F.greatest(F.col("l_extendedprice") - 50000.0, F.lit(0.0)).alias("clipped"),
            dist.alias("distance"),
            F.when(F.col("l_returnflag") == "R", "returned")
            .when(F.col("l_returnflag") == "A", "accepted")
            .otherwise("none")
            .alias("flag"),
            F.to_date("l_shipdate").alias("ship_date"),
            F.col("l_quantity").cast("int").alias("qty_int"),
        )
    )


@register(
    "f1_date_parts",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS order_quarter,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 2)} AS revenue
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY 1, 2
    """,
    doc="F1 date-part extraction + range predicate (returns_flow.py:19 dt.year).",
)
def f1_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", 2).alias("revenue"))
    )


@register(
    "f1_json_props",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, COUNT(*) AS n
    FROM events GROUP BY 1
    """,
    doc="Semi-structured extraction from a JSON string column.",
)
def f1_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(F.get_json_object("props", "$.k").cast("int").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "r2_pivot_event_type",
    oracle="""
    SELECT CAST(ts AS DATE) AS date,
           ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 6) + 0.0 AS click,
           ROUND(AVG(CASE WHEN event_type = 'error' THEN value END), 6) + 0.0 AS error,
           ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6) + 0.0 AS purchase,
           ROUND(AVG(CASE WHEN event_type = 'signup' THEN value END), 6) + 0.0 AS signup,
           ROUND(AVG(CASE WHEN event_type = 'view' THEN value END), 6) + 0.0 AS view
    FROM events GROUP BY 1
    """,
    doc="R2 pivot long->wide with explicit values (factor_model_flow.py:18).",
)
def r2_pivot_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Explicit, sorted pivot values: deterministic column order and a
    # single-pass pivot (no extra distinct-values job) — the reference
    # sorts keys before pivoting (utils/covariance_matrix.py:10,19).
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy(F.to_date("ts").alias("date"))
        .pivot("event_type", kinds)
        .agg(F.round(F.avg("value"), 6) + 0.0)
    )
