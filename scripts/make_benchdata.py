"""Generate sf1-scale bench data: 10x sf0.1 with shifted keys.

The sub-100ms headline queries at sf0.1 sit on local-mode's ~20-30ms
job-scheduling floor, so per-query ratios there measure the scheduler,
not the plan. This script scales the three fact tables the headline
queries scan (events 10x with fresh event/user ids; the TPC-H trio
10x with shifted order/customer keys so join selectivity is
preserved) and copies the rest unchanged. Output lands under
``benchdata/sf1`` (gitignored — ~400 MB of derived parquet).

events.ts note: the source parquet stores TIMESTAMP(NANOS); we read
it as a nanosecond long (legacy conf) and write it back as a plain
int64, which ``load_table``'s ``ts div 1000`` conversion handles
identically (the nanosAsLong conf is a no-op on int64).

Usage: python scripts/make_benchdata.py [src_sf_dir] [dst_dir] [copies]
Then:  SPARK_GRAFT_SF_DIR=/root/repo/benchdata/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys
from functools import reduce
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nt_data_pipelines_spark.session import get_spark

COPY_UNCHANGED = ("region", "nation", "supplier", "part", "documents", "embeddings")


def scaled(df: DataFrame, key_spans: dict[str, int], copies: int) -> DataFrame:
    """Union ``copies`` shifted clones; each key column moves by its span."""
    parts = []
    for i in range(copies):
        d = df
        for col, span in key_spans.items():
            d = d.withColumn(col, (F.col(col) + F.lit(i * span)).cast(dict(df.dtypes)[col]))
        parts.append(d)
    return reduce(DataFrame.unionByName, parts)


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else str(Path(__file__).resolve().parents[1] / "benchdata" / "sf1")
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark("make_benchdata")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(dst, exist_ok=True)

    ev = spark.read.parquet(f"{src}/events.parquet")  # ts arrives as long
    spans = {
        "event_id": ev.agg(F.max("event_id")).first()[0] + 1,
        "user_id": ev.agg(F.max("user_id")).first()[0] + 1,
    }
    scaled(ev, spans, copies).repartition(32).write.mode("overwrite").parquet(
        f"{dst}/events.parquet"
    )

    cust = spark.read.parquet(f"{src}/customer.parquet")
    orders = spark.read.parquet(f"{src}/orders.parquet")
    li = spark.read.parquet(f"{src}/lineitem.parquet")
    cust_span = cust.agg(F.max("c_custkey")).first()[0] + 1
    order_span = orders.agg(F.max("o_orderkey")).first()[0] + 1
    scaled(cust, {"c_custkey": cust_span}, copies).repartition(8).write.mode(
        "overwrite"
    ).parquet(f"{dst}/customer.parquet")
    scaled(orders, {"o_orderkey": order_span, "o_custkey": cust_span}, copies).repartition(
        16
    ).write.mode("overwrite").parquet(f"{dst}/orders.parquet")
    scaled(li, {"l_orderkey": order_span}, copies).repartition(32).write.mode(
        "overwrite"
    ).parquet(f"{dst}/lineitem.parquet")

    for t in COPY_UNCHANGED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )
    print(f"wrote {copies}x {src} -> {dst}")


if __name__ == "__main__":
    main()
