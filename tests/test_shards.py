"""Training-shard writer: one file per (split, shard), deterministic
membership and in-file order."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from nt_data_pipelines_spark.operators.shards import write_training_shards


def test_one_file_per_shard_deterministic_order(spark, tmp_path):
    docs = spark.createDataFrame(
        [(i, f"doc {i}", "train" if i % 10 else "val") for i in range(500)],
        "doc_id int, text string, split string",
    )
    out = str(tmp_path / "shards")
    write_training_shards(
        docs, out, id_col="doc_id", num_shards=8, split_col="split"
    )
    files = sorted(glob.glob(os.path.join(out, "split=*", "shard=*", "*.parquet")))
    # exactly one file per populated (split, shard) dir
    dirs = {os.path.dirname(f) for f in files}
    assert len(files) == len(dirs)
    assert any("split=train" in d for d in dirs) and any("split=val" in d for d in dirs)

    # all rows survive, none duplicated
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert back.select("doc_id").distinct().count() == 500

    # in-file order is ascending doc_id (the default order_by)
    for f in files[:4]:
        ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        assert ids == sorted(ids)

    # shard membership is stable across a rewrite from different partitioning
    m1 = {
        (r["doc_id"], r["shard"])
        for r in back.select("doc_id", "shard").collect()
    }
    write_training_shards(
        docs.repartition(13), out, id_col="doc_id", num_shards=8, split_col="split"
    )
    m2 = {
        (r["doc_id"], r["shard"])
        for r in spark.read.parquet(out).select("doc_id", "shard").collect()
    }
    assert m1 == m2

    with pytest.raises(ValueError, match="num_shards"):
        write_training_shards(docs, out, id_col="doc_id", num_shards=0)
