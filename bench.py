"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Mirrors BASELINE.md's DuckDB measurement protocol: warm runs, median
of 5, full materialization (Arrow collect). Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The seven headline queries map 1:1 to the baseline's operator classes
(W1 lag, W2 rolling sum, A5 z-score, A6+A1 weighted agg, J-class
3-way join, R2 pivot, O3 top-k).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from nt_data_pipelines_spark import plans
from nt_data_pipelines_spark.session import get_spark

HEADLINE = {
    "q1_lag_pct_change": "w1_pct_change",
    "q2_rolling_sum21": "w2_rolling_sum21",
    "q3_zscore_global": "a5_zscore_global",
    "q4_equal_weight_agg": "a6_equal_weight_benchmark",
    "q5_threeway_join_agg": "j2_shipping_priority",
    "q6_pivot": "r2_pivot_event_type",
    "q7_topk_dates": "o3_topk_dates",
}

WARMUP_RUNS = 2
TIMED_RUNS = 7


def materialize(df) -> int:
    # Arrow-batched transfer = the "fetchall" equivalent; row-based
    # collect() would benchmark Py4J serialization, not the engine.
    return len(df.toPandas())


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    profile = os.environ.get("SPARK_GRAFT_BENCH_SESSION", "latency")
    if profile == "prod":
        # The config a real batch job ships with: AQE on, default
        # shuffle sizing. Use for sf>=1 runs (scripts/make_benchdata.py)
        # where the work dwarfs AQE's re-planning overhead — the
        # headline number at that scale is the production config's.
        spark = get_spark("bench")
    else:
        # Latency profile for sub-second queries: AQE's between-stage
        # re-optimization costs 2-3x at this scale (measured: 57ms vs
        # 23ms for top-k dates), so bench runs with it off; shuffle=16
        # won a 4/8/16/32 sweep at sf0.1. Batch jobs at real scale keep
        # the session defaults (AQE on) — see session.py / docs/SCALE.md.
        spark = get_spark(
            "bench",
            shuffle_partitions=16,
            extra_conf={"spark.sql.adaptive.enabled": "false"},
        )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    for label, qname in HEADLINE.items():
        # Build the logical plan once and time repeated executions —
        # the DuckDB baseline likewise re-runs a parsed query; Python-
        # side DataFrame re-construction (~100ms of py4j chatter) is
        # API overhead, not engine time.
        df = plans.REGISTRY[qname].fn(spark, sf_dir)
        for _ in range(WARMUP_RUNS):
            materialize(df)
        runs = []
        for _ in range(TIMED_RUNS):
            t0 = time.perf_counter()
            materialize(df)
            runs.append(time.perf_counter() - t0)
        timings[label] = round(statistics.median(runs), 4)

    print(
        json.dumps(
            {
                "metric": "headline_median_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
