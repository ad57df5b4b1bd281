"""Streaming IVF-PQ index maintenance: batch parity and replay idempotence."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog
from nt_data_pipelines_spark.operators.ivf import assign_cells, kmeans_train
from nt_data_pipelines_spark.operators.pq import (
    ivfpq_search,
    pq_encode,
    pq_train,
)
from nt_data_pipelines_spark.streaming import (
    ann_index_foreach_batch,
    run_available_now,
    search_ann_index,
)
from nt_data_pipelines_spark.streaming.incremental import ANN_INDEX_SCHEMA
import pytest

DIM, M = 16, 4

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)


def _vectors(n, seed):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(4, DIM))
    return [
        (i, [float(x) for x in (centers[i % 4] + rng.normal(scale=0.3, size=DIM)).round(3)])
        for i in range(n)
    ]


@pytest.mark.slow  # ~15s: heaviest of its parity family; cheaper siblings stay default
def test_streaming_ann_index_matches_batch_build(spark, tmp_path):
    seed_rows = _vectors(40, seed=1)
    seed = spark.createDataFrame(seed_rows, EMB_SCHEMA)
    cents = kmeans_train(seed, n_cells=4, iterations=2)
    cb = pq_train(seed, m=M, k=8, dim=DIM, iterations=1)

    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("ann_idx", ANN_INDEX_SCHEMA, None, ["vec_id"])

    # stream the corpus in two file batches
    src = str(tmp_path / "stream")
    spark.createDataFrame(seed_rows[:25], EMB_SCHEMA).write.mode("append").parquet(src)
    spark.createDataFrame(seed_rows[25:], EMB_SCHEMA).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EMB_SCHEMA).parquet(src)
    run_available_now(
        stream,
        ann_index_foreach_batch(cat, "ann_idx", cents, cb, m=M, dim=DIM),
        checkpoint=str(tmp_path / "ckpt"),
        output_mode="append",
    )
    assert cat.table("ann_idx").count() == 40

    queries = seed.filter(F.col("vec_id") < 3)
    got = search_ann_index(cat, "ann_idx", queries, cents, cb, k=3, m=M, dim=DIM).collect()

    # batch-built twin must agree exactly
    cells = assign_cells(seed, cents, "vec_id", "embedding").select("vec_id", "cell")
    codes = pq_encode(seed, cb, m=M, dim=DIM)
    batch_idx = codes.join(cells, "vec_id")
    want = ivfpq_search(batch_idx, queries, cents, cb, k=3, m=M, dim=DIM).collect()
    key = lambda r: (r["query_id"], r["rank"], r["neighbor_id"], r["approx_dist2"])
    assert sorted(map(key, got)) == sorted(map(key, want))

    # replaying the same data (fresh checkpoint) converges, not duplicates
    run_available_now(
        spark.readStream.schema(EMB_SCHEMA).parquet(src),
        ann_index_foreach_batch(cat, "ann_idx", cents, cb, m=M, dim=DIM),
        checkpoint=str(tmp_path / "ckpt2"),
        output_mode="append",
    )
    assert cat.table("ann_idx").count() == 40
    got2 = search_ann_index(cat, "ann_idx", queries, cents, cb, k=3, m=M, dim=DIM).collect()
    assert sorted(map(key, got2)) == sorted(map(key, want))


def test_search_ann_index_with_custom_query_id_col(spark, tmp_path):
    rows = _vectors(20, seed=5)
    seed = spark.createDataFrame(rows, EMB_SCHEMA)
    cents = kmeans_train(seed, n_cells=2, iterations=1)
    cb = pq_train(seed, m=M, k=4, dim=DIM, iterations=1)
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("idx", ANN_INDEX_SCHEMA, None, ["vec_id"])
    cells = assign_cells(seed, cents, "vec_id", "embedding").select("vec_id", "cell")
    codes = pq_encode(seed, cb, m=M, dim=DIM)
    cat.insert("idx", codes.join(cells, "vec_id").select("vec_id", "cell", "codes"))
    # queries keyed by a different id column must still resolve
    q = seed.limit(2).withColumnRenamed("vec_id", "doc_id")
    got = search_ann_index(cat, "idx", q, cents, cb, id_col="doc_id",
                           k=3, n_probe=2, m=M, dim=DIM)
    assert got.count() > 0
    assert got.columns == ["query_id", "rank", "neighbor_id", "approx_dist2"]


def test_search_ann_index_exclude_self_toggle(spark, tmp_path):
    """Regression (review finding): an externally-keyed query whose id
    happens to collide with an indexed vec_id must be able to receive
    that vector back — exclude_self=False disables the corpus-self
    filter."""
    from nt_data_pipelines_spark.operators.ivf import kmeans_train
    from nt_data_pipelines_spark.operators.pq import pq_train
    from nt_data_pipelines_spark.catalog import Catalog
    from nt_data_pipelines_spark.streaming import (
        ann_index_foreach_batch,
        search_ann_index,
    )

    seed = spark.createDataFrame(_vectors(20, 11), EMB_SCHEMA)
    cents = kmeans_train(seed, n_cells=2, iterations=1)
    cb = pq_train(seed, m=M, k=4, dim=DIM)
    cat = Catalog(spark, str(tmp_path / "xs_lake"))
    from nt_data_pipelines_spark.streaming.incremental import ANN_INDEX_SCHEMA

    cat.create("idx", ANN_INDEX_SCHEMA, None, ["vec_id"])
    ann_index_foreach_batch(cat, "idx", cents, cb, m=M, dim=DIM)(seed, 0)
    # query vector IS indexed vector 7, re-keyed from another keyspace
    q = seed.filter(F.col("vec_id") == 7)
    with_self = search_ann_index(
        cat, "idx", q, cents, cb, k=20, m=M, dim=DIM, exclude_self=False
    ).collect()
    ids = [r["neighbor_id"] for r in with_self]
    assert 7 in ids  # its own twin is reachable again
    # ...and it sits in the best (zero-distance) tie group
    best = min(r["approx_dist2"] for r in with_self)
    assert any(r["neighbor_id"] == 7 and r["approx_dist2"] == best for r in with_self)
    without = search_ann_index(
        cat, "idx", q, cents, cb, k=20, m=M, dim=DIM
    ).collect()
    assert all(r["neighbor_id"] != 7 for r in without)  # default: corpus-self
