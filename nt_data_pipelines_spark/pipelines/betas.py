"""Benchmark-beta pipeline (reference: pipelines/betas_flow.py).

Per ticker: rolling-252 OLS of stock return on [const, benchmark
return]; historical_beta = raw coefficient path (nulls dropped),
predicted_beta = EWMA(half-life 60) of it (betas_flow.py:24-73).
Tickers with < window rows are skipped (betas_flow.py:30-31).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nt_data_pipelines_spark.config import HALF_LIFE, WINDOW
from nt_data_pipelines_spark.operators.ewma import ewm_mean
from nt_data_pipelines_spark.operators.rolling_ols import rolling_ols


def estimate_betas(
    stock_returns: DataFrame,
    benchmark_returns: DataFrame,
    window: int = WINDOW,
    half_life: float = HALF_LIFE,
) -> DataFrame:
    joined = stock_returns.join(
        F.broadcast(benchmark_returns.withColumnRenamed("return", "benchmark_return")),
        "date",
        "left",
    )
    fitted = rolling_ols(
        joined,
        partition_by="ticker",
        order_by="date",
        y_col="return",
        x_cols=["benchmark_return"],
        window=window,
        add_const=True,
        const_name="alpha",
        coef_prefix="beta_",
        drop_partial=True,
    )
    raw = fitted.filter(F.col("beta_benchmark_return").isNotNull()).select(
        "ticker", "date", F.col("beta_benchmark_return").alias("historical_beta")
    )
    smoothed = ewm_mean(
        raw,
        partition_by="ticker",
        order_by="date",
        value_col="historical_beta",
        half_life=half_life,
        out_col="predicted_beta",
        # stock x benchmark enrichment join is 1:1 per (ticker, date)
        scan_fanout=1.0,
    )
    return smoothed.select(
        "ticker",
        "date",
        F.year("date").cast("int").alias("year"),
        "historical_beta",
        "predicted_beta",
    )
