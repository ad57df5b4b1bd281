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

COPY_UNCHANGED = ("region", "nation", "supplier", "part")


def scaled(df: DataFrame, key_spans: dict[str, int], copies: int) -> DataFrame:
    """Union ``copies`` shifted clones; each key column moves by its span."""
    parts = []
    for i in range(copies):
        d = df
        for col, span in key_spans.items():
            d = d.withColumn(col, (F.col(col) + F.lit(i * span)).cast(dict(df.dtypes)[col]))
        parts.append(d)
    return reduce(DataFrame.unionByName, parts)


def scaled_documents(docs: DataFrame, copies: int) -> DataFrame:
    """Union ``copies`` doc-id-shifted clones with per-copy token salting.

    Every token in copy i>0 gets a ``c{i}x`` prefix (no underscore —
    normalize_text would split an underscore salt back off), making the
    copies pairwise DISJOINT in word-shingle space: each clone carries
    the source corpus's exact/near-dup structure, and no cross-copy
    near-dups appear. Dedup work therefore scales LINEARLY with copies
    — without the salt, every doc would be a near-dup of its clones
    and the candidate-pair count would grow O(copies^2) per group,
    benchmarking a pathological corpus instead of a bigger one.
    """
    span = docs.agg(F.max("doc_id")).first()[0] + 1
    parts = []
    for i in range(copies):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * span))
        if i:
            # alphanumeric salt: it must survive normalize_text (which
            # maps [^a-z0-9 ] to space — an underscore salt would split
            # back into the ORIGINAL token and re-create cross-copy
            # near-dups after normalization)
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\S+)", f"c{i}x$1")
            ).withColumn("n_chars", F.length("text"))
        parts.append(d)
    return reduce(DataFrame.unionByName, parts)


def scaled_embeddings(emb: DataFrame, copies: int) -> DataFrame:
    """Union ``copies`` vec-id-shifted clones, rotating copy i's vectors
    by i positions. Rotation is a norm-preserving permutation: each
    copy keeps the source's intra-copy cosine structure exactly, while
    cross-copy cosines for these random-ish embeddings sit near zero —
    so the semantic-dedup tier also scales linearly, matching the
    salted documents."""
    span = emb.agg(F.max("vec_id")).first()[0] + 1
    dim = len(emb.select("embedding").first()[0])
    parts = []
    for i in range(copies):
        d = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * span))
        k = i % dim
        if k:
            d = d.withColumn(
                "embedding",
                F.concat(
                    F.expr(f"slice(embedding, {k + 1}, {dim - k})"),
                    F.expr(f"slice(embedding, 1, {k})"),
                ),
            )
        parts.append(d)
    return reduce(DataFrame.unionByName, parts)


def write_corpus(spark, src: str, dst: str, copies: int) -> None:
    docs = spark.read.parquet(f"{src}/documents.parquet")
    scaled_documents(docs, copies).repartition(16).write.mode("overwrite").parquet(
        f"{dst}/documents.parquet"
    )
    emb = spark.read.parquet(f"{src}/embeddings.parquet")
    scaled_embeddings(emb, copies).repartition(8).write.mode("overwrite").parquet(
        f"{dst}/embeddings.parquet"
    )


def main() -> None:
    corpus_only = "--corpus-only" in sys.argv
    argv = [a for a in sys.argv if a != "--corpus-only"]
    src = argv[1] if len(argv) > 1 else "/root/testdata/sf0.1"
    dst = argv[2] if len(argv) > 2 else str(Path(__file__).resolve().parents[1] / "benchdata" / "sf1")
    copies = int(argv[3]) if len(argv) > 3 else 10

    spark = get_spark("make_benchdata")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(dst, exist_ok=True)

    if corpus_only:
        write_corpus(spark, src, dst, copies)
        print(f"wrote {copies}x corpus tables from {src} -> {dst}")
        return

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
    write_corpus(spark, src, dst, copies)
    print(f"wrote {copies}x {src} -> {dst}")


if __name__ == "__main__":
    main()
