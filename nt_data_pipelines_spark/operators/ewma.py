"""W4 — exponentially-weighted moving average, exact reference semantics.

The reference smooths factor loadings, covariances, betas and
idio-vol with Polars ``ewm_mean(half_life=60)`` (default
``adjust=True, ignore_nulls=False``):
pipelines/factor_model_flow.py:86-88,99-103,
pipelines/factor_covariances_flow.py:42-44, pipelines/betas_flow.py:68-73.

``adjust=True`` means finite-history *normalized* weights:

    y_t = sum_{i<=t} (1-a)^(t-i) x_i / sum_{i<=t} (1-a)^(t-i),
    a = 1 - 0.5^(1/half_life)

which pandas ``Series.ewm(halflife=h, adjust=True).mean()`` computes
identically — so the kernel is a grouped-map Pandas UDF (Arrow
batches, one group per key, vectorized C inside pandas).

Scale notes: the shuffle is one hash partition on the group keys;
per-key state is a single series (days x 1), so group sizes are
bounded and skew-free. This is the idiomatic Spark shape for an
order-sensitive recursive operator that Catalyst can't express:
declare everything else relationally, isolate the recursion in one
Arrow-batched grouped map.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_list(x: Sequence[str] | str) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def ewm_mean(
    df: DataFrame,
    partition_by: Sequence[str] | str,
    order_by: Sequence[str] | str,
    value_col: str,
    half_life: float,
    out_col: str = "ewma",
    adjust: bool = True,
) -> DataFrame:
    """Append an EWMA column computed per key group, ordered by ``order_by``."""
    keys = _as_list(partition_by)
    order = _as_list(order_by)
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.DoubleType())])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(halflife=half_life, adjust=adjust, ignore_na=False).mean()
        )
        return pdf

    return df.repartition(*keys).groupBy(*keys).applyInPandas(fit, schema=out_schema)


def ewm_mean_many(
    df: DataFrame,
    partition_by: Sequence[str] | str,
    order_by: Sequence[str] | str,
    value_cols: Sequence[str],
    half_life: float,
    suffix: str = "_ewma",
    adjust: bool = True,
) -> DataFrame:
    """EWMA several columns in one grouped-map pass (one shuffle total)."""
    keys = _as_list(partition_by)
    order = _as_list(order_by)
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(c + suffix, T.DoubleType()) for c in value_cols]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        for c in value_cols:
            pdf[c + suffix] = pdf[c].ewm(halflife=half_life, adjust=adjust, ignore_na=False).mean()
        return pdf

    return df.repartition(*keys).groupBy(*keys).applyInPandas(fit, schema=out_schema)
