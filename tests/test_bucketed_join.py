"""Bucketed co-located join: the fact-to-fact join path at scale.

When both sides of a big join are bucketed on the join key at write
time, Spark's planner joins bucket-to-bucket without a shuffle —
the prepared path docs/SCALE.md names for fact-to-fact joins. This
test writes two bucketed tables and asserts the join plan contains
no shuffle Exchange on either side.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        left = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("a")
        )
        right = spark.range(0, 10_000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        for name, df in (("bkt_left", left), ("bkt_right", right)):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            (
                df.write.mode("overwrite")
                .bucketBy(8, "k")
                .sortBy("k")
                .saveAsTable(name)
            )
        joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        shuffles = re.findall(r"^\(\d+\) Exchange$", plan, flags=re.M)
        assert shuffles == []  # bucket layout replaces the shuffle
        assert "SortMergeJoin" in plan
        assert joined.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")
