"""Training-shard writer: the materialization step after curation.

A training corpus ships as a directory tree of fixed-count shards —
``split=train/shard=17/part-....parquet`` — each shard one file whose
rows sit in a deterministic order, so a data loader can stripe workers
across shards and resume mid-epoch reproducibly. The writer shapes the
job so Spark produces EXACTLY one file per (split, shard):

- shard assignment is a content hash of the id (stable across runs,
  retries and repartitioning — the same property as assign_splits),
- ``repartition(split, shard)`` puts every row of a shard in one task,
- ``sortWithinPartitions`` fixes the in-file row order,
- ``write.partitionBy`` lays out the hive tree.

One shuffle total. No driver-side iteration at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHARD_COL = "shard"


def shard_assignment(id_col: str, num_shards: int):
    """Deterministic shard id 0..num_shards-1 from the row id (md5)."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
        % num_shards
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    num_shards: int | None = None,
    split_col: str | None = None,
    order_by: list[str] | str | None = None,
    shard_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as one parquet file per (split, shard).

    ``order_by`` defaults to the id column: in-file order is then
    reproducible run-to-run regardless of upstream partitioning.
    Pass ``shard_col`` to reuse an upstream shard assignment (e.g.
    pack_sequences' hash shard, so packed bins stay contiguous in
    their file) instead of deriving one from the id; exactly one of
    ``num_shards`` / ``shard_col`` is required.
    """
    if (num_shards is None) == (shard_col is None):
        raise ValueError("pass exactly one of num_shards / shard_col")
    if num_shards is not None and num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    order = (
        [order_by] if isinstance(order_by, str) else list(order_by or [id_col])
    )
    if shard_col is None:
        out = df.withColumn(SHARD_COL, shard_assignment(id_col, num_shards))
    else:
        out = df.withColumn(SHARD_COL, F.col(shard_col)) if shard_col != SHARD_COL else df
        num_shards = out.select(SHARD_COL).distinct().count()
    part_cols = ([split_col] if split_col else []) + [SHARD_COL]
    n_tasks = num_shards * (df.select(split_col).distinct().count() if split_col else 1)
    (
        out.repartition(max(1, n_tasks), *[F.col(c) for c in part_cols])
        .sortWithinPartitions(*part_cols, *order)
        .write.mode(mode)
        .partitionBy(*part_cols)
        .parquet(path)
    )
