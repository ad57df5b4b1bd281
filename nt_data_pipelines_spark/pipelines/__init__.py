"""The reference's flow graph as pure DataFrame -> DataFrame pipelines.

Each module mirrors one reference flow (SURVEY.md §3.1's DAG), with
the same numerical semantics, re-expressed Spark-first. The daily /
backfill split of the reference (SURVEY §2.9 T2/T3/T5) is a calling
convention: every function takes full-range inputs; callers slice
with ``filter(date == end)`` for the daily increment.
"""

from nt_data_pipelines_spark.pipelines.returns import compute_returns
from nt_data_pipelines_spark.pipelines.factor_model import (
    estimate_factor_model,
    clean_factor_loadings,
    clean_idio_vol,
)
from nt_data_pipelines_spark.pipelines.covariances import estimate_factor_covariances
from nt_data_pipelines_spark.pipelines.reversal import (
    calculate_signals,
    calculate_scores,
    calculate_alphas,
)
from nt_data_pipelines_spark.pipelines.benchmark import (
    calculate_benchmark_weights,
    calculate_benchmark_returns,
)
from nt_data_pipelines_spark.pipelines.betas import estimate_betas
from nt_data_pipelines_spark.pipelines.universe import construct_universe
from nt_data_pipelines_spark.pipelines.portfolio_weights import compute_portfolio_weights
from nt_data_pipelines_spark.pipelines.trading import (
    target_notionals,
    notional_deltas,
    positions_to_close,
)

__all__ = [
    "compute_returns",
    "estimate_factor_model",
    "clean_factor_loadings",
    "clean_idio_vol",
    "estimate_factor_covariances",
    "calculate_signals",
    "calculate_scores",
    "calculate_alphas",
    "calculate_benchmark_weights",
    "calculate_benchmark_returns",
    "estimate_betas",
    "construct_universe",
    "compute_portfolio_weights",
    "target_notionals",
    "notional_deltas",
    "positions_to_close",
]
