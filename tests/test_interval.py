"""Interval join: bucketed equi-join equals the naive range join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.interval import interval_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 9, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def data(spark):
    # intervals spanning multiple 10-min buckets, touching boundaries,
    # overlapping each other, and one empty of points
    points = spark.createDataFrame(
        [(i, _ts(m), "u1" if i % 2 else "u2") for i, m in enumerate([0, 5, 10, 21, 35, 59, 100])],
        "pid long, ts timestamp, user string",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(0), _ts(10), "u1"),    # inclusive both ends
            (101, _ts(8), _ts(40), "u2"),    # spans 4 buckets
            (102, _ts(200), _ts(240), "u1"), # matches nothing
        ],
        "iid long, start_ts timestamp, end_ts timestamp, iv_user string",
    )
    return points, intervals


def _naive(points, intervals, keys=()):
    cond = F.col("ts").between(F.col("start_ts"), F.col("end_ts"))
    for k_p, k_i in keys:
        cond = cond & (F.col(k_p) == F.col(k_i))
    return {
        (r["pid"], r["iid"])
        for r in points.join(intervals, cond).select("pid", "iid").collect()
    }


def test_interval_join_matches_naive_range_join(spark, data):
    points, intervals = data
    got_df = interval_join(points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=600)
    got = {(r["pid"], r["iid"]) for r in got_df.collect()}
    assert got == _naive(points, intervals)
    assert (0, 100) in got and (2, 100) in got  # inclusive boundaries
    assert (4, 101) in got  # middle bucket of a multi-bucket interval
    assert not any(i == 102 for _, i in got)
    # the scale property: candidates come from an equi-join, never a
    # nested loop over the range predicate
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_interval_join_by_key_and_bucket_sizes(spark, data):
    points, intervals = data
    by = interval_join(
        points.withColumn("iv_user", F.col("user")),
        intervals,
        "ts", "start_ts", "end_ts", by="iv_user", bucket_seconds=600,
    )
    got = {(r["pid"], r["iid"]) for r in by.collect()}
    naive = _naive(points.withColumnsRenamed({"user": "p_user"}), intervals,
                   keys=[("p_user", "iv_user")])
    assert got == naive and got  # keyed variant non-empty and exact
    # result is bucket-size invariant
    for bs in (60, 3600, 86400):
        alt = interval_join(points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=bs)
        assert {(r["pid"], r["iid"]) for r in alt.collect()} == _naive(points, intervals)


def test_interval_join_auto_bucket_and_guards(spark, data):
    points, intervals = data
    # default is the fixed 1h bucket (no pre-pass); 'auto' opts into
    # p99 sizing — both give the exact result
    default = interval_join(points, intervals, "ts", "start_ts", "end_ts")
    assert {(r["pid"], r["iid"]) for r in default.collect()} == _naive(points, intervals)
    auto = interval_join(points, intervals, "ts", "start_ts", "end_ts", bucket_seconds="auto")
    assert {(r["pid"], r["iid"]) for r in auto.collect()} == _naive(points, intervals)
    with pytest.raises(ValueError, match="bucket_seconds"):
        interval_join(points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=1.5)
    # invalid intervals (end < start) are dropped, not silently bucketed
    bad = intervals.union(
        spark.createDataFrame([(999, _ts(50), _ts(10), "u1")], intervals.schema)
    )
    got = interval_join(points, bad, "ts", "start_ts", "end_ts", bucket_seconds=600)
    assert not any(r["iid"] == 999 for r in got.collect())
    # pathological long interval vs tiny bucket fails loudly, not OOM
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    with pytest.raises(SparkRuntimeException, match="max_fanout"):
        interval_join(
            points, intervals, "ts", "start_ts", "end_ts",
            bucket_seconds=1, max_fanout=100,
        ).collect()


def test_interval_join_auto_survives_skewed_lengths(spark):
    """p99 auto-sizing: a length distribution with a huge outlier must
    not trip max_fanout (median sizing did — a 30-day interval over a
    60 s median bucket spans 43200 buckets > 4096)."""
    points = spark.createDataFrame(
        [(0, _ts(5)), (1, _ts(60 * 24 * 15))], "pid long, ts timestamp"
    )
    short = [(i, _ts(i), _ts(i + 1)) for i in range(99)]  # 60 s each
    long_iv = [(999, _ts(0), _ts(60 * 24 * 30))]  # 30 days
    intervals = spark.createDataFrame(
        short + long_iv, "iid long, start_ts timestamp, end_ts timestamp"
    )
    got = interval_join(
        points, intervals, "ts", "start_ts", "end_ts", bucket_seconds="auto"
    )
    pairs = {(r["pid"], r["iid"]) for r in got.collect()}
    assert (1, 999) in pairs and (0, 999) in pairs and (0, 5) in pairs


def test_interval_join_left_keeps_unmatched_points(spark, data):
    points, intervals = data
    out = interval_join(
        points, intervals, "ts", "start_ts", "end_ts",
        bucket_seconds=600, how="left", point_id="pid",
    ).collect()
    matched_pids = {r["pid"] for r in out if r["iid"] is not None}
    unmatched = [r for r in out if r["iid"] is None]
    assert {r["pid"] for r in unmatched} == set(range(7)) - matched_pids
    assert 6 in {r["pid"] for r in unmatched}  # point at minute 100
    with pytest.raises(ValueError, match="point_id"):
        interval_join(points, intervals, "ts", "start_ts", "end_ts", how="left")


def test_interval_join_rejects_bool_and_nonpositive_bucket(spark, data):
    """bool subclasses int: True as bucket_seconds would silently mean
    a 1-second bucket (huge fan-out). Reject it and non-positive sizes
    explicitly."""
    points, intervals = data
    for bad in (True, False, 0, -5, 1.5):
        with pytest.raises(ValueError, match="positive int"):
            interval_join(
                points, intervals, "ts", "start_ts", "end_ts", bucket_seconds=bad
            )
