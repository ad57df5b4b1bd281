"""Bucketed tables: shuffle-free fact-to-fact equi-joins.

Broadcast covers dim-to-fact joins; when BOTH sides are fact-scale
(reference: signal frames joined to vol frames on (date, ticker) —
pipelines/reversal_flow.py-class work at 100 TB), the scalable answer
is to pre-bucket both tables on the join key with the SAME bucket
count. Spark's bucketed scan then exposes the hash-partitioning to
the planner and the SortMergeJoin runs WITHOUT either exchange — the
shuffle is paid once at write time and amortized over every
subsequent join, the decisive trade for tables joined nightly.

Bucketing metadata lives in the session catalog (``saveAsTable``), so
these are external tables at an explicit path; the parquet files are
ordinary parquet with a bucket-id file layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: Sequence[str] | str,
    num_buckets: int,
    sort_cols: Sequence[str] | str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as an external bucketed table and return its scan.

    ``sort_cols`` (default: the bucket columns) sorts within each
    bucket file, letting the downstream SortMergeJoin skip its Sort
    when each bucket holds one file. Both join sides must use the
    same ``num_buckets`` (and, for a no-shuffle plan, bucket on
    exactly the join keys).
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sorts = (
        [sort_cols]
        if isinstance(sort_cols, str)
        else list(sort_cols) if sort_cols is not None else cols
    )
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *cols)
        .sortBy(*sorts)
        .option("path", path)
        .saveAsTable(name)
    )
    return df.sparkSession.table(name)


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Scan a previously written bucketed table (bucketing-aware)."""
    return spark.table(name)
