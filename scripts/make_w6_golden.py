"""Materialize the k-factor rolling-OLS golden for the driver oracle.

``w6_rolling_regression`` (1 regressor) verifies the rolling-OLS
surface against DuckDB's windowed REGR_*; DuckDB has no multivariate
regression, so the k-factor path (operators/rolling_ols.py — the
applyInPandas kernel the reference's factor model uses at k=5) gets a
PINNED GOLDEN instead: this script computes the AR(5) rolling betas
over `events` per scale factor and writes one parquet the oracle SQL
reads back with `read_parquet`, discriminated by a `src_rows` column
(= COUNT(*) of the events table at generation time) so one artifact
serves every sf the harness runs.

Honesty note: coefficient values are produced by the SAME numpy
routine the Spark kernel runs (`_rolling_ols_numpy`) — that makes the
hash compare bit-stable (identical doubles in, identical doubles out)
and means the driver entry verifies the DISTRIBUTED plumbing: lag
construction, per-key grouping, (ts, event_id) ordering, full-window
gating, NaN->NULL, schema. The numeric algorithm itself is
independently golden-tested against direct per-window ``np.linalg.
lstsq`` in tests/test_ewma_ols.py, and this script re-asserts that
agreement (rtol 1e-8) before writing the artifact.

Usage: python scripts/make_w6_golden.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nt_data_pipelines_spark.operators.rolling_ols import _rolling_ols_numpy

ROLL = 21  # same window as w6_rolling_regression
LAGS = 5
OUT = Path(__file__).resolve().parents[1] / "tests" / "golden" / "w6_k5.parquet"
SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",  # bench scale: parity harness may run here too
]


def golden_for(sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    ev = con.sql(
        f"SELECT user_id, ts, event_id, value FROM '{sf_dir}/events.parquet' "
        "ORDER BY user_id, ts, event_id"
    ).df()
    src_rows = len(ev)
    frames = []
    for uid, g in ev.groupby("user_id", sort=True):
        g = g.sort_values(["ts", "event_id"], kind="mergesort").reset_index(drop=True)
        v = g["value"].to_numpy(dtype=np.float64)
        lags = np.column_stack([np.roll(v, i) for i in range(1, LAGS + 1)])
        # rows whose full lag vector exists (mirror the Spark-side
        # lag-not-null filter)
        ok = np.arange(len(v)) >= LAGS
        y = v[ok]
        X = np.column_stack([np.ones(ok.sum()), lags[ok]])
        n = len(y)
        if n < ROLL:
            continue  # short keys vanish (rolling_ols contract)
        coefs = _rolling_ols_numpy(y, X, ROLL)
        # independent validation: direct per-window lstsq agrees
        for t in (ROLL - 1, n // 2, n - 1):
            want, *_ = np.linalg.lstsq(
                X[t - ROLL + 1 : t + 1], y[t - ROLL + 1 : t + 1], rcond=None
            )
            np.testing.assert_allclose(coefs[t], want, rtol=1e-8)
        keep = np.arange(n) >= ROLL - 1
        out = pd.DataFrame(
            {
                "user_id": uid,
                "ts": g.loc[ok, "ts"].to_numpy()[keep],
                "const": np.round(coefs[keep, 0], 6) + 0.0,
            }
        )
        for i in range(1, LAGS + 1):
            out[f"beta_lag{i}"] = np.round(coefs[keep, i], 6) + 0.0
        fitted = ~out["const"].isna()
        frames.append(out[fitted])
    full = pd.concat(frames, ignore_index=True)
    full["src_rows"] = np.int64(src_rows)
    return full


def main() -> None:
    OUT.parent.mkdir(parents=True, exist_ok=True)
    full = pd.concat([golden_for(d) for d in SF_DIRS], ignore_index=True)
    full.to_parquet(OUT, index=False)
    print(f"wrote {OUT}: {len(full)} rows, "
          f"{sorted(full['src_rows'].unique().tolist())} src_rows blocks")


if __name__ == "__main__":
    main()
