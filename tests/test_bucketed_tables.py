"""Bucketed tables: the join must run with ZERO exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.bucketed import write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("key"), (F.col("id") * 2).alias("lval")
    )
    right = spark.range(0, 10_000, 3).select(
        F.col("id").alias("key"), (F.col("id") + 7).alias("rval")
    )
    lt = write_bucketed_table(left, "bk_left", str(tmp_path / "bk_left"), "key", 8)
    rt = write_bucketed_table(right, "bk_right", str(tmp_path / "bk_right"), "key", 8)
    yield lt, rt, left, right
    spark.sql("DROP TABLE IF EXISTS bk_left")
    spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    lt, rt, left, right = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the merge path
    try:
        joined = lt.join(rt, "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: the whole point
        assert "SortMergeJoin" in plan
        # and it is still the CORRECT join
        want = left.join(right, "key").count()
        assert joined.count() == want > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_skips_shuffle(spark, bucketed_pair):
    lt, _, _, _ = bucketed_pair
    # aggregation on the bucket key reuses the write-time partitioning
    plan = (
        lt.groupBy("key").agg(F.sum("lval").alias("s"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
