"""Local differential check: Spark queries vs DuckDB oracles.

Mimics the driver's correctness gate so mismatches surface before a
round ends. Usage:

    python scripts/check_parity.py [sf_dir] [name ...]

Compares, per registered query: row count, sorted column names, and
an order-insensitive multiset of canonicalized row values.
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter
from datetime import date, datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from nt_data_pipelines_spark import plans
from nt_data_pipelines_spark.session import get_spark
from nt_data_pipelines_spark.sources.testdata import TESTDATA_TABLES


def canon(v):
    """Canonicalize a cell so Spark and DuckDB rows compare equal."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # fold -0.0
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def row_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, spec in sorted(plans.REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = sdf.collect()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.sql(spec.oracle)
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue

        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duck={sorted(d_cols)}")
        else:
            canon = {"bigint": "i64", "int": "i32", "integer": "i32", "double": "f64",
                     "float": "f32", "varchar": "str", "string": "str", "date": "date",
                     "timestamp_ntz": "ts", "timestamp": "ts", "timestamp_ns": "ts",
                     "boolean": "bool"}
            stypes = {f.name: canon.get(f.dataType.simpleString(), f.dataType.simpleString())
                      for f in sdf.schema.fields}
            rel = con.sql(spec.oracle)
            dtypes = {c: canon.get(str(t).lower(), str(t).lower())
                      for c, t in zip(rel.columns, rel.types)}
            tdiff = {c: (stypes[c], dtypes[c]) for c in stypes if stypes[c] != dtypes[c]}
            if tdiff:
                problems.append(f"dtypes {tdiff}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            ms, md = row_multiset(s_rows, s_cols), row_multiset(d_rows, d_cols)
            if ms != md:
                only_s = list((ms - md).items())[:3]
                only_d = list((md - ms).items())[:3]
                problems.append(f"values spark-only={only_s} duck-only={only_d}")
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(s_rows)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(plans.REGISTRY) - len(failures)}/{len(plans.REGISTRY)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
