"""Pipeline-level tripwire (VERDICT r10 #8): the full scheduled DAG at
a scale where stage-level regressions show, with output invariants.

bench.py runs the same harness at full S&P scale (503 tickers) every
round; the CI copy runs a reduced universe so the suite stays
runnable while still exercising every stage at >5x the fixture size.
"""

from __future__ import annotations

import pytest

from nt_data_pipelines_spark.pipelines.bench_dag import run_dag_benchmark


@pytest.mark.slow
def test_dag_e2e_invariants_at_scale(spark, tmp_path):
    out = run_dag_benchmark(
        spark,
        str(tmp_path / "lake"),
        n_tickers=120,
        n_days=400,
        window=120,
        half_life=30.0,
    )
    # invariants are asserted inside run_dag_benchmark; pin the
    # measurements it reports too
    assert out["opt_dates"] > 100
    assert out["max_weight_sum_err"] < 1e-6
    assert out["min_weight"] >= -1e-9
    assert out["daily_rows"]["signals"] == 120
    assert out["daily_rows"]["weights"] == 120
