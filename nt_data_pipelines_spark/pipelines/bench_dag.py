"""Scheduled-DAG end-to-end at bench scale (VERDICT r10 #8).

The 12-stage daily DAG (pipelines/runner.py) is e2e-tested at fixture
scale (20 tickers x 150 days); this module runs ``backfill_flow`` plus
one ``daily_flow`` tick at the reference's UNIVERSE scale — an
S&P-sized panel (~503 tickers, BASELINE.md "workload scale implied by
the reference") — so pipeline-level regressions (a stage that stops
pruning, a join that stops broadcasting, a QP fan-out that serializes)
move a tracked bench number instead of hiding behind per-operator
rows.

Invariants checked on the OUTPUT tables (not just "it ran"):

- every optimization date's long-only weights sum to 1 within 1e-6
  and are non-negative (the QP's equality/inequality constraints);
- realized active risk sits in a sane band around
  ``TARGET_ACTIVE_RISK`` (the lambda line-search is approximate by
  design — LAMBDA_TOL/LAMBDA_MAX_ITER — so the band is wide, but a
  solver regression lands orders of magnitude outside it);
- the daily tick actually fires (freshness gate passes) and writes
  exactly the end date for signals and weights.

Used by ``bench.py`` (wall-time rows in the artifact) and by the
slow-marked pytest in tests/test_dag_bench.py (the CI tripwire, at a
reduced ticker count so the suite stays runnable).
"""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.catalog import Catalog
from nt_data_pipelines_spark.config import TARGET_ACTIVE_RISK
from nt_data_pipelines_spark.pipelines.runner import backfill_flow, daily_flow, ensure_tables
from nt_data_pipelines_spark.sources import synthetic as S


def run_dag_benchmark(
    spark: SparkSession,
    lake_dir: str,
    n_tickers: int = 503,
    n_days: int = 700,
    window: int = 252,
    half_life: float = 60.0,
) -> dict:
    """Backfill + one daily tick on a scaled panel; returns wall times
    and invariant measurements. Raises AssertionError on violation."""
    from nt_data_pipelines_spark.session import default_parallelism

    # Pin the production config here rather than inheriting whatever
    # the previous bench block (or a latency-profile session) left
    # behind — the tracked wall times must be comparable across
    # environments.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))

    tickers = [f"B{i:03d}" for i in range(n_tickers)]
    cat = Catalog(spark, lake_dir)
    ensure_tables(cat)

    prices = S.load_stock_prices(spark, n_days, tickers)
    etf = S.load_etf_prices(spark, n_days)
    last = prices.agg(F.max("date")).first()[0]

    cat.upsert("calendar", S.load_calendar(spark, n_days))
    cat.upsert("universe", S.load_universe(spark, n_days, tickers))
    cat.upsert("stock_prices", prices.filter(F.col("date") < F.lit(last)))
    cat.upsert("etf_prices", etf.filter(F.col("date") < F.lit(last)))

    t0 = time.perf_counter()
    backfill_flow(spark, cat, window=window, half_life=half_life)
    backfill_secs = round(time.perf_counter() - t0, 4)

    # ---- invariants on the backfilled outputs ----
    wsum = (
        cat.table("portfolio_weights")
        .groupBy("date")
        .agg(F.sum("weight").alias("s"), F.min("weight").alias("mn"))
        .agg(
            F.count(F.lit(1)).alias("n_dates"),
            F.max(F.abs(F.col("s") - 1.0)).alias("max_sum_err"),
            F.min("mn").alias("min_weight"),
        )
        .first()
    )
    assert wsum.n_dates > 0, "backfill produced no optimization dates"
    assert wsum.max_sum_err < 1e-6, f"weight sums off by {wsum.max_sum_err}"
    assert wsum.min_weight > -1e-9, f"negative weight {wsum.min_weight}"
    risk = (
        cat.table("portfolio_metrics")
        .agg(
            F.min("active_risk").alias("lo"),
            F.max("active_risk").alias("hi"),
            F.expr("percentile_approx(active_risk, 0.5)").alias("med"),
        )
        .first()
    )
    # an empty metrics table aggregates to med=None; fail with the
    # real cause instead of a TypeError in the band compare below
    # (explicit raise, not assert: must survive python -O)
    if risk.med is None:
        raise AssertionError("portfolio_metrics is empty")
    # the line-search stops within LAMBDA_TOL after <= LAMBDA_MAX_ITER
    # steps, so individual dates can overshoot; the MEDIAN landing an
    # order of magnitude off target is a solver regression
    assert 0.2 * TARGET_ACTIVE_RISK < risk.med < 5.0 * TARGET_ACTIVE_RISK, (
        f"median active risk {risk.med} vs target {TARGET_ACTIVE_RISK}"
    )

    # ---- one daily tick: the new day arrives ----
    cat.upsert("stock_prices", prices.filter(F.col("date") == F.lit(last)))
    cat.upsert("etf_prices", etf.filter(F.col("date") == F.lit(last)))
    t0 = time.perf_counter()
    ran = daily_flow(
        spark, cat, today=last + dt.timedelta(days=1), window=window, half_life=half_life
    )
    daily_secs = round(time.perf_counter() - t0, 4)
    assert ran is True, "daily freshness gate failed to fire"
    n_sig = cat.table("signals").filter(F.col("date") == F.lit(last)).count()
    n_w = cat.table("portfolio_weights").filter(F.col("date") == F.lit(last)).count()
    assert n_sig > 0, "daily tick wrote no end-date signals"
    assert n_w > 0, "daily tick wrote no end-date weights"

    return {
        "backfill_secs": backfill_secs,
        "daily_secs": daily_secs,
        "n_tickers": n_tickers,
        "n_days": n_days,
        "opt_dates": wsum.n_dates,
        "max_weight_sum_err": float(wsum.max_sum_err),
        "min_weight": float(wsum.min_weight),
        "active_risk_med": float(risk.med),
        "active_risk_range": [float(risk.lo), float(risk.hi)],
        "daily_rows": {"signals": n_sig, "weights": n_w},
    }
