"""U3 — per-date mean-variance portfolio optimization.

Reference semantics (pipelines/utils/portfolio.py, SURVEY.md §4):

- QP: maximize  w'alpha - 0.5 * lambda * w' Sigma w
      s.t. sum(w) = 1, w >= 0                       (portfolio.py:6-27)
- covariance assembly: Sigma = B F B' + diag(idio)^2
      (utils/covariance_matrix.py:40-43)
- lambda line-search: start 100; refit M = sum(x*sigma)/sum(x^2) with
  x = 1/(2*lambda); next lambda = M / (2*target); stop when
  |risk - target| <= 0.005 or 5 iterations (portfolio.py:90-121)
- active risk = sqrt(w_a' Sigma w_a) * sqrt(252)    (portfolio.py:81-87)

The reference solves the QP with cvxpy; this container has none, so
the solver is a deterministic NNLS-style active-set method on the KKT
system — exact for convex QPs with PSD Sigma (golden-tested against
the KKT optimality conditions).

Spark shape: the reference fans the per-date solves out with Ray
(portfolio_weights_flow.py:102-132). Here the same fan-out is
``groupBy("date").applyInPandas`` — Spark's shuffle takes the place
of Ray's object store, and the solver runs where the date's slice
already lives.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from nt_data_pipelines_spark.config import (
    LAMBDA_MAX_ITER,
    LAMBDA_START,
    LAMBDA_TOL,
    TARGET_ACTIVE_RISK,
    TRADING_DAYS_PER_YEAR,
)


def solve_qp_long_only(alphas: np.ndarray, sigma: np.ndarray, lam: float) -> np.ndarray:
    """max w'a - 0.5*lam*w'Sw  s.t. sum w = 1, w >= 0.

    Active-set iteration: solve the equality-constrained KKT system on
    the free set, clamp violators to zero, re-solve; finished when the
    free solution is feasible and clamped coordinates have
    non-positive reduced gradient. Deterministic (no RNG, fixed
    clamping order) and exact at convergence.
    """
    n = len(alphas)
    free = np.ones(n, dtype=bool)
    w = np.full(n, 1.0 / n)
    for _ in range(4 * n + 8):
        k = int(free.sum())
        if k == 0:
            break
        A = lam * sigma[np.ix_(free, free)]
        a = alphas[free]
        # KKT: lam*S w - a + nu*1 = 0, 1'w = 1 on the free set
        kkt = np.zeros((k + 1, k + 1))
        kkt[:k, :k] = A
        kkt[:k, k] = 1.0
        kkt[k, :k] = 1.0
        rhs = np.concatenate([a, [1.0]])
        try:
            sol = np.linalg.solve(kkt, rhs)
        except np.linalg.LinAlgError:
            sol, *_ = np.linalg.lstsq(kkt, rhs, rcond=None)
        w_free, nu = sol[:k], sol[k]
        if (w_free < -1e-12).any():
            # block-clamp every negative coordinate and retry: one
            # variable per pass would mean O(n) dense solves on a
            # mostly-clamped cross-section (~2s/solve at n=500);
            # block clamping converges in a handful of passes.
            idx = np.where(free)[0]
            free[idx[w_free < -1e-12]] = False
            continue
        w = np.zeros(n)
        w[free] = np.clip(w_free, 0.0, None)
        # reduced gradient of clamped coords must not favor re-entry
        grad = alphas - lam * (sigma @ w) - nu
        clamped = ~free
        if not clamped.any() or (grad[clamped] <= 1e-9).all():
            break
        free[np.argmax(np.where(clamped, grad, -np.inf))] = True
    return w


def active_risk(
    weights: np.ndarray, benchmark_weights: np.ndarray, sigma: np.ndarray
) -> float:
    wa = weights - benchmark_weights
    return float(np.sqrt(wa @ sigma @ wa) * np.sqrt(TRADING_DAYS_PER_YEAR))


def predict_lambda(history: list[tuple[float, float]], target: float) -> float:
    """Reference's 1-parameter refit: M = sum(x*s)/sum(x*x), x=1/(2*lam)."""
    arr = np.asarray(history)
    x = 1.0 / (2.0 * arr[:, 0])
    m = float(np.dot(x, arr[:, 1]) / np.dot(x, x))
    return m / (2.0 * target)


def assemble_covariance(
    loadings: np.ndarray, factor_cov: np.ndarray, idio: np.ndarray
) -> np.ndarray:
    """Sigma = B F B' + diag(idio)^2."""
    return loadings @ factor_cov @ loadings.T + np.diag(idio) ** 2


def optimal_weights_dynamic(
    alphas: np.ndarray,
    sigma: np.ndarray,
    benchmark_weights: np.ndarray,
    target: float = TARGET_ACTIVE_RISK,
) -> tuple[np.ndarray, float, float]:
    """lambda line-search wrapper, faithful to portfolio.py:90-121."""
    risk = float("inf")
    lam = None
    history: list[tuple[float, float]] = []
    iterations = 1
    weights = np.full(len(alphas), 1.0 / len(alphas))
    while abs(risk - target) > LAMBDA_TOL:
        lam = LAMBDA_START if lam is None else predict_lambda(history, target)
        weights = solve_qp_long_only(alphas, sigma, lam)
        risk = active_risk(weights, benchmark_weights, sigma)
        history.append((lam, risk))
        if iterations >= LAMBDA_MAX_ITER:
            break
        iterations += 1
    return weights, float(lam), risk


PORTFOLIO_SCHEMA = T.StructType(
    [
        T.StructField("date", T.DateType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("weight", T.DoubleType()),
        T.StructField("lambda", T.DoubleType()),
        T.StructField("active_risk", T.DoubleType()),
    ]
)


def optimize_portfolio_by_date(
    joined: DataFrame,
    factors: list[str],
    target: float = TARGET_ACTIVE_RISK,
) -> DataFrame:
    """Distributed per-date optimization via grouped-map Pandas UDF.

    ``joined`` is long-format per (date, ticker):
    alpha, benchmark_weight, idio_vol, and one loading column per
    factor (loading_<F>), plus per-date factor covariances in wide
    columns cov_<F1>_<F2>. One shuffle on date; each group is one
    date's cross-section (~500 rows) — exactly the slice the solver
    needs, where Ray's object store used to broadcast it.
    """
    loading_cols = [f"loading_{f}" for f in factors]
    cov_cols = [f"cov_{f1}_{f2}" for f1 in factors for f2 in factors]

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ticker").reset_index(drop=True)
        k = len(factors)
        b = pdf[loading_cols].to_numpy(dtype=np.float64)
        f_cov = pdf.iloc[0][cov_cols].to_numpy(dtype=np.float64).reshape(k, k)
        sigma = assemble_covariance(b, f_cov, pdf["idio_vol"].to_numpy(np.float64))
        w, lam, risk = optimal_weights_dynamic(
            pdf["alpha"].to_numpy(np.float64),
            sigma,
            pdf["benchmark_weight"].to_numpy(np.float64),
            target,
        )
        return pd.DataFrame(
            {
                "date": pdf["date"],
                "ticker": pdf["ticker"],
                "weight": w,
                "lambda": lam,
                "active_risk": risk,
            }
        )

    return joined.repartition("date").groupBy("date").applyInPandas(fit, PORTFOLIO_SCHEMA)
