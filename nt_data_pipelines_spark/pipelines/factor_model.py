"""Factor model pipeline (reference: pipelines/factor_model_flow.py).

stock returns x wide factor returns -> per-ticker rolling-252 OLS
coefficient paths (alpha + 5 betas), residuals, EWMA-smoothed long
loadings, and EWMA-smoothed rolling-252 idio vol.

Faithful semantics:
- tickers with < WINDOW rows are skipped outright
  (factor_model_flow.py:29-39 — their rows never reach the output),
- residual = return - (alpha + sum_f B_f * f_ret)
  (factor_model_flow.py:59-68),
- loadings melt B_<F> -> factor name, then
  ewm_mean(half_life=60).over(ticker, factor)
  (factor_model_flow.py:78-88),
- idio_vol = rolling_std(252) then ewm_mean(60) per ticker, nulls
  from the unfilled window pass through (factor_model_flow.py:94-104).

Spark shape: one grouped-map pass per ticker computes the OLS paths
(operators/rolling_ols.py); everything else is built-in window /
unpivot / join expressions. The factor pivot is tiny (dates x 5) and
broadcast into the per-ticker join.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nt_data_pipelines_spark.config import FACTORS, HALF_LIFE, WINDOW
from nt_data_pipelines_spark.operators.ewma import ewm_mean
from nt_data_pipelines_spark.operators.rolling_ols import rolling_ols
from nt_data_pipelines_spark.operators.windows import rolling_std


def pivot_factor_returns(etf_returns: DataFrame, factors: list[str] = FACTORS) -> DataFrame:
    """(ticker, date, return) long -> one column per factor, keyed by date.

    Explicit sorted pivot values: deterministic columns, single pass
    (factor_model_flow.py:18; reference sorts factor keys)."""
    return (
        etf_returns.groupBy("date")
        .pivot("ticker", sorted(factors))
        .agg(F.first("return"))
    )


def estimate_factor_model(
    stock_returns: DataFrame,
    etf_returns: DataFrame,
    factors: list[str] = FACTORS,
    window: int = WINDOW,
) -> DataFrame:
    """Per (ticker, date): return, factor returns, alpha, B_<f>, residual."""
    factors = sorted(factors)
    wide = pivot_factor_returns(etf_returns, factors)
    joined = stock_returns.join(F.broadcast(wide), "date", "left")
    fitted = rolling_ols(
        joined,
        partition_by="ticker",
        order_by="date",
        y_col="return",
        x_cols=factors,
        window=window,
        add_const=True,
        const_name="alpha",
        coef_prefix="B_",
        drop_partial=False,  # keep pre-window rows: loadings EWMA sees the null head
    )
    expected = F.col("alpha") + reduce(
        add, [F.col(f) * F.col(f"B_{f}") for f in factors]
    )
    return fitted.withColumn("residual", F.col("return") - expected)


def clean_factor_loadings(
    fitted: DataFrame, factors: list[str] = FACTORS, half_life: float = HALF_LIFE
) -> DataFrame:
    """Melt B_* to long and EWMA-smooth per (ticker, factor)."""
    factors = sorted(factors)
    long = fitted.select("ticker", "date", *[f"B_{f}" for f in factors]).unpivot(
        ids=["ticker", "date"],
        values=[f"B_{f}" for f in factors],
        variableColumnName="factor",
        valueColumnName="loading_raw",
    )
    long = long.withColumn("factor", F.expr("substring(factor, 3)"))
    smoothed = ewm_mean(
        long,
        partition_by=["ticker", "factor"],
        order_by="date",
        value_col="loading_raw",
        half_life=half_life,
        out_col="loading",
        # unpivot fans out by exactly len(factors); the enrichment
        # joins upstream are 1:1, so this bounds rows-per-scanned-row
        scan_fanout=float(len(factors)),
    )
    return smoothed.select(
        "ticker", "date", F.year("date").cast("int").alias("year"), "factor", "loading"
    )


def clean_idio_vol(fitted: DataFrame, window: int = WINDOW, half_life: float = HALF_LIFE) -> DataFrame:
    """residual -> rolling-``window`` std -> EWMA(60) per ticker."""
    vol = rolling_std(
        fitted.select("ticker", "date", "residual"),
        "ticker",
        "date",
        "residual",
        window,
        out_col="vol_raw",
    )
    smoothed = ewm_mean(
        vol,
        partition_by="ticker",
        order_by="date",
        value_col="vol_raw",
        half_life=half_life,
        out_col="idio_vol",
        # fitted's lineage joins are 1:1 per (ticker, date)
        scan_fanout=1.0,
    )
    return smoothed.select(
        "ticker", "date", F.year("date").cast("int").alias("year"), "idio_vol"
    )
