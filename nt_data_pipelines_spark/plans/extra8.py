"""Round-6 queries: the k-factor rolling-OLS driver oracle.

``w6_rolling_regression`` verifies the 1-regressor rolling OLS against
DuckDB's windowed REGR_SLOPE/REGR_INTERCEPT; DuckDB has no
multivariate regression, so the k-factor path — the applyInPandas
kernel the reference's factor model runs at k=5
(factor_model_flow.py:23-57) — is verified against a PINNED golden
(tests/golden/w6_k5.parquet, produced by scripts/make_w6_golden.py;
see that script's docstring for what the pin does and does not prove).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.rolling_ols import rolling_ols
from nt_data_pipelines_spark.plans.registry import register
from nt_data_pipelines_spark.sources.testdata import load_table

ROLL = 21
LAGS = 5
# checkout-relative: the oracle SQL string embeds an absolute path,
# resolved at import time so any clone location works
_GOLDEN = str(
    Path(__file__).resolve().parents[2] / "tests" / "golden" / "w6_k5.parquet"
)


@register(
    "w6_rolling_regression_k5",
    oracle=f"""
    SELECT user_id, ts, const,
           beta_lag1, beta_lag2, beta_lag3, beta_lag4, beta_lag5
    FROM read_parquet('{_GOLDEN}')
    WHERE src_rows = (SELECT COUNT(*) FROM events)
    """,
    doc="W6/U1 k-factor rolling OLS: per-user AR(5) — rolling window-21 "
    "regression of value on [const + 5 lags] via the grouped-map kernel "
    "(operators/rolling_ols.py). Oracle = pinned golden (DuckDB cannot "
    "express multivariate regression), discriminated by the source "
    "table's row count so one artifact serves every sf.",
)
def w6_rolling_regression_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_names = [f"lag{i}" for i in range(1, LAGS + 1)]
    base = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        *[F.lag("value", i).over(w).alias(f"lag{i}") for i in range(1, LAGS + 1)],
    )
    for c in lag_names:
        base = base.filter(F.col(c).isNotNull())
    out = rolling_ols(
        base,
        partition_by="user_id",
        order_by=["ts", "event_id"],
        y_col="value",
        x_cols=lag_names,
        window=ROLL,
    )
    return out.filter(F.col("const").isNotNull()).select(
        "user_id",
        "ts",
        (F.round("const", 6) + 0.0).alias("const"),
        *[(F.round(f"beta_{c}", 6) + 0.0).alias(f"beta_{c}") for c in lag_names],
    )
