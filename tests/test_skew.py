"""Salted-join correctness and hot-key spreading."""

from __future__ import annotations

from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.skew import SALT_COL, salted_count, salted_join, with_salt


def _skewed(spark):
    # 90% of rows share one hot key
    hot = spark.range(0, 9000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(0, 1000).select((F.col("id") % 50 + 2).alias("k"), F.col("id").alias("v"))
    return hot.unionByName(cold)


def test_salted_join_equals_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 60)], ["k", "label"])
    plain = large.join(small, "k").groupBy("k", "label").agg(F.count(F.lit(1)).alias("n"))
    salted = (
        salted_join(large, small, "k", factor=8, salt_from="v")
        .groupBy("k", "label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    large = spark.createDataFrame([(1, 10), (2, 20), (99, 30)], ["k", "v"])
    small = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "label"])
    got = salted_join(large, small, "k", how="left", factor=4, salt_from="v")
    rows = {r["k"]: r["label"] for r in got.collect()}
    assert rows == {1: "a", 2: "b", 99: None}
    assert got.count() == 3


def test_salt_spreads_hot_key(spark):
    large = _skewed(spark)
    salted = with_salt(large.filter(F.col("k") == 1), "v", 8)
    per_salt = salted.groupBy(SALT_COL).count().collect()
    assert len(per_salt) == 8  # hot key occupies all salt buckets
    counts = [r["count"] for r in per_salt]
    assert max(counts) < 9000 * 0.25  # no bucket holds the whole key


def test_salted_join_rejects_right_outer(spark):
    import pytest

    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="right")


def test_salted_count_matches_plain(spark):
    large = _skewed(spark)
    plain = {r["k"]: r["n"] for r in large.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    salted = {r["k"]: r["n"] for r in salted_count(large, "k", factor=8).collect()}
    assert salted == plain
