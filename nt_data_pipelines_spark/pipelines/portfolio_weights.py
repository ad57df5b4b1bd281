"""Portfolio weights pipeline (reference: portfolio_weights_flow.py).

Per date: assemble Sigma = B F B' + diag(idio)^2 from that date's
loadings / factor covariances / idio vols, then the lambda-searched
long-only QP (operators/portfolio.py). The reference fans dates out
with Ray (flow lines 102-132); here the per-date slices are shuffled
once by ``groupBy("date").applyInPandas`` and solved where they land.

Input assembly is pure joins: alphas ⋈ benchmark_weights ⋈ idio_vol
on (date, ticker), the per-(date, ticker, factor) loadings pivoted
wide, and the per-date factor-covariance matrix pivoted wide then
broadcast-joined on date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nt_data_pipelines_spark.config import FACTORS, TARGET_ACTIVE_RISK
from nt_data_pipelines_spark.operators.portfolio import optimize_portfolio_by_date


def _wide_loadings(factor_loadings: DataFrame, factors: list[str]) -> DataFrame:
    return (
        factor_loadings.groupBy("date", "ticker")
        .pivot("factor", factors)
        .agg(F.first("loading"))
        .select(
            "date", "ticker", *[F.col(f).alias(f"loading_{f}") for f in factors]
        )
    )


def _wide_covariances(factor_covariances: DataFrame, factors: list[str]) -> DataFrame:
    pairs = factor_covariances.select(
        "date",
        F.concat_ws("_", F.lit("cov"), "factor_1", "factor_2").alias("pair"),
        "covariance",
    )
    names = [f"cov_{f1}_{f2}" for f1 in factors for f2 in factors]
    return pairs.groupBy("date").pivot("pair", names).agg(F.first("covariance"))


def compute_portfolio_weights(
    alphas: DataFrame,
    benchmark_weights: DataFrame,
    factor_loadings: DataFrame,
    factor_covariances: DataFrame,
    idio_vol: DataFrame,
    factors: list[str] = FACTORS,
    target: float = TARGET_ACTIVE_RISK,
) -> DataFrame:
    """-> (date, ticker, weight, lambda, active_risk); weight>=0, sum=1/date."""
    factors = sorted(factors)
    base = (
        alphas.select("date", "ticker", "alpha")
        .join(
            benchmark_weights.select(
                "date", "ticker", F.col("weight").alias("benchmark_weight")
            ),
            ["date", "ticker"],
        )
        .join(idio_vol.select("date", "ticker", "idio_vol"), ["date", "ticker"])
        .join(_wide_loadings(factor_loadings, factors), ["date", "ticker"])
        .join(F.broadcast(_wide_covariances(factor_covariances, factors)), "date")
        .na.drop()
    )
    return optimize_portfolio_by_date(base, factors, target)
