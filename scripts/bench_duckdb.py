"""DuckDB side of the sf1 bench: run each headline query's oracle SQL
over the same parquet with BASELINE.md's protocol (warm, median)."""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from bench import HEADLINE
from nt_data_pipelines_spark import plans
from nt_data_pipelines_spark.sources.testdata import TESTDATA_TABLES

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        glob = p if os.path.isfile(p) else f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    # scaled benchdata stores events.ts as int64 nanos (see
    # make_benchdata.py); the driver's testdata stores TIMESTAMP(NANOS),
    # which DuckDB reads natively. Normalize to microsecond timestamps.
    (ts_type,) = [r[1] for r in con.execute("DESCRIBE events").fetchall() if r[0] == "ts"]
    if ts_type == "BIGINT":
        con.execute("CREATE OR REPLACE VIEW events AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{os.path.join(sf_dir, 'events.parquet')}/*.parquet')")
    timings = {}
    for label, qname in HEADLINE.items():
        sql = plans.REGISTRY[qname].oracle
        for _ in range(2):
            con.execute(sql).fetch_arrow_table()
        runs = []
        for _ in range(7):
            t0 = time.perf_counter()
            con.execute(sql).fetch_arrow_table()
            runs.append(time.perf_counter() - t0)
        timings[label] = round(statistics.median(runs), 4)
    print(json.dumps({"metric": "duckdb_headline_median_total",
                      "value": round(sum(timings.values()), 4),
                      "unit": "sec", "queries": timings, "sf_dir": sf_dir}))

if __name__ == "__main__":
    main()
