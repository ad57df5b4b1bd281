"""W6 — per-key rolling OLS regression (the reference's UDAF-class op).

The reference fits, per ticker, a rolling 252-row OLS of stock return
on [const + 5 factor returns] and keeps the per-date coefficient
paths (pipelines/factor_model_flow.py:23-57; the 1-factor benchmark
variant is pipelines/betas_flow.py:24-48). Keys with fewer than
``window`` rows are skipped entirely (factor_model_flow.py:29), and
rows before the window fills get null coefficients.

Spark-first shape: one grouped-map Pandas UDF per key. Inside the
group the fit is a vectorized sliding-window normal-equation solve —
cumulative X'X / X'y sums, one small (k x k) solve per output row —
O(n k^2) per key, no Python-level row loop over observations.

The 1-regressor case is SQL-expressible (windowed REGR_SLOPE — see
plans/timeseries.py w6_rolling_regression) and serves as the oracle;
this kernel is the general k-factor path.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_list(x: Sequence[str] | str) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def _rolling_ols_numpy(
    y: np.ndarray, X: np.ndarray, window: int, min_valid: int | None = None
) -> np.ndarray:
    """Coefficients of OLS(y, X) over each trailing ``window`` rows.

    Returns (n, k) array, NaN rows until the window is full. Uses
    cumulative cross-products so each output row costs one k x k solve.

    Rows with any non-finite value are excluded from the cumulative
    sums (zero-filled) and tracked with a validity counter — a raw NaN
    would otherwise poison every subsequent prefix sum. A window keeps
    its estimate as long as it holds at least ``min_valid`` valid rows
    (default: k, the minimum to identify the fit), solved on the valid
    subset — the semantics of statsmodels RollingOLS(missing='drop')
    the reference uses (factor_model_flow.py:23-57). Pass
    ``min_valid=window`` for the strict variant where any bad row
    NaNs the window.
    """
    n, k = X.shape
    mv = k if min_valid is None else min_valid
    out = np.full((n, k), np.nan)
    if n < window:
        return out
    valid = np.isfinite(y) & np.isfinite(X).all(axis=1)
    Xc = np.where(valid[:, None], X, 0.0)
    yc = np.where(valid, y, 0.0)
    # cumulative sums of outer products, prepended with a zero row:
    # S_xx[t] = sum_{i<t} X_i X_i^T ; window sum = S[t+1] - S[t+1-window]
    xx = np.einsum("ni,nj->nij", Xc, Xc)
    xy = Xc * yc[:, None]
    c_xx = np.concatenate([np.zeros((1, k, k)), np.cumsum(xx, axis=0)])
    c_xy = np.concatenate([np.zeros((1, k)), np.cumsum(xy, axis=0)])
    c_valid = np.concatenate([[0], np.cumsum(valid)])
    for t in range(window - 1, n):
        if c_valid[t + 1] - c_valid[t + 1 - window] < mv:
            continue  # too few valid rows in the window -> NaN
        a = c_xx[t + 1] - c_xx[t + 1 - window]
        b = c_xy[t + 1] - c_xy[t + 1 - window]
        try:
            out[t] = np.linalg.solve(a, b)
        except np.linalg.LinAlgError:
            out[t], *_ = np.linalg.lstsq(a, b, rcond=None)
    return out


def rolling_ols(
    df: DataFrame,
    partition_by: Sequence[str] | str,
    order_by: Sequence[str] | str,
    y_col: str,
    x_cols: Sequence[str],
    window: int,
    add_const: bool = True,
    const_name: str = "const",
    coef_prefix: str = "beta_",
    drop_partial: bool = True,
    min_valid: int | None = None,
) -> DataFrame:
    """Append rolling OLS coefficient columns per key.

    Output columns: ``const`` (if add_const) and ``{coef_prefix}{x}``
    for each regressor. Keys with < ``window`` rows are dropped
    entirely — the reference never emits them
    (factor_model_flow.py:29-39 builds then discards their frame).
    ``drop_partial`` controls only whether a qualifying key's first
    ``window - 1`` rows (null coefficients) are kept for downstream
    EWMA null-head semantics. ``min_valid`` (default: number of
    regressors) sets how many finite rows a window needs to keep its
    estimate — non-finite rows are dropped from the fit like
    statsmodels RollingOLS(missing='drop'); ``min_valid=window``
    restores the strict any-bad-row-is-null behavior.
    """
    keys = _as_list(partition_by)
    order = _as_list(order_by)
    xs = list(x_cols)
    coef_cols = ([const_name] if add_const else []) + [coef_prefix + c for c in xs]
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(c, T.DoubleType()) for c in coef_cols]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n < window:
            # short keys vanish from the output, matching the reference
            return pdf.iloc[0:0].reindex(columns=list(pdf.columns) + coef_cols)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        X = pdf[xs].to_numpy(dtype=np.float64)
        if add_const:
            X = np.column_stack([np.ones(n), X])
        coefs = _rolling_ols_numpy(y, X, window, min_valid)
        for i, c in enumerate(coef_cols):
            pdf[c] = coefs[:, i]
        if drop_partial:
            pdf = pdf.iloc[window - 1 :]
        return pdf

    # no explicit repartition: groupBy's EnsureRequirements already
    # plans the hash exchange (a leading repartition just doubled it)
    out = df.groupBy(*keys).applyInPandas(fit, schema=out_schema)
    # NaN -> NULL: the reference's Polars conversion maps the unfilled-
    # window NaNs to nulls (pl.from_pandas nan_to_null), and every
    # downstream null-gate/drop_nulls depends on that distinction.
    return out.withColumns(
        {c: F.when(~F.isnan(F.col(c)), F.col(c)) for c in coef_cols}
    )
