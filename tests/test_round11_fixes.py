"""Regression tests for the round-11 ADVICE fixes.

Each test pins the exact failure mode ADVICE.md (round 10) described:
band-join fan-out recall, nearest-join duplicate left keys, HLL's
needless corpus distinct, single-group KS NaN, and pairwise_corr's
name-join alias collisions.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_band_join_wide_fanout_recall(spark):
    """Pairs whose gap is exactly delta must be kept, including when
    values sit on bucket boundaries; slack widens the blocking only,
    never the predicate."""
    from nt_data_pipelines_spark.operators.interval import numeric_band_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 4.999999999), (3, 1e15)], ["lid", "lv"]
    )
    right = spark.createDataFrame(
        [(1, 15.0), (2, 9.999999999), (3, 1e15 + 5.0)], ["rid", "rv"]
    )
    got = {
        (r.lid, r.rid)
        for r in numeric_band_join(left, right, "lv", "rv", 5.0).collect()
    }
    assert {(1, 1), (2, 2), (3, 3)} <= got
    with pytest.raises(ValueError):
        numeric_band_join(left, right, "lv", "rv", 5.0, slack=0)


def test_nearest_join_duplicate_left_keys(spark):
    """ADVICE r10: duplicate left keys with different values must each
    keep their own nearest match, not collapse to one row."""
    from nt_data_pipelines_spark.operators.interval import nearest_value_join

    left = spark.createDataFrame(
        [("k", 10.0), ("k", 20.0), ("solo", 15.0)], ["lk", "lv"]
    )
    right = spark.createDataFrame(
        [(1, 11.0), (2, 19.0), (3, 14.0)], ["rk", "rv"]
    )
    rows = nearest_value_join(left, right, "lk", "lv", "rk", "rv", 3.0).collect()
    got = {(r.lk, r.lv): r.rk for r in rows}
    assert got == {("k", 10.0): 1, ("k", 20.0): 2, ("solo", 15.0): 3}


def test_hll_skips_corpus_distinct(spark):
    """ADVICE r10: the register MAX is duplicate-insensitive, so the
    include_exact=False path must not plan a corpus-sized distinct —
    and duplicates must not change the estimate."""
    from nt_data_pipelines_spark.operators.sketches import deterministic_hll_distinct

    base = spark.range(500).select(
        (F.col("id") % 5).alias("g"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    duped = base.union(base).union(base)
    est_plain = deterministic_hll_distinct(base, "g", "v", p=8)
    est_duped = deterministic_hll_distinct(duped, "g", "v", p=8)
    a = {r.g: r.hll_estimate for r in est_plain.collect()}
    b = {r.g: r.hll_estimate for r in est_duped.collect()}
    assert a == b
    # plan shape: exactly two aggregates — (g, reg) max + per-group
    # rollup — and no Deduplicate/distinct over (g, v) anywhere (the
    # optimized logical plan is stable across AQE stage wrapping)
    plan = est_plain._jdf.queryExecution().optimizedPlan().toString()
    assert "__reg" in plan
    assert plan.count("Aggregate") == 2, plan
    assert "Deduplicate" not in plan, plan
    # calibration path still exact
    cal = deterministic_hll_distinct(duped, "g", "v", p=8, include_exact=True)
    for r in cal.collect():
        assert r.exact_distinct == 100
        assert r.rel_error < 0.25


def test_ks_drift_single_group_is_null(spark):
    """ADVICE r10: one group means no comparison population — ks_stat
    must be NULL, never a 0/0 NaN that reads as a drift score."""
    from nt_data_pipelines_spark.operators.drift import ks_drift_by_group

    one = spark.createDataFrame([("only", float(i)) for i in range(20)], ["g", "v"])
    rows = ks_drift_by_group(one, "g", "v").collect()
    assert len(rows) == 1
    assert rows[0].ks_stat is None
    # multi-group still produces finite stats
    two = one.union(
        spark.createDataFrame([("other", float(i) + 5.0) for i in range(20)], ["g", "v"])
    )
    for r in ks_drift_by_group(two, "g", "v").collect():
        assert r.ks_stat is not None and math.isfinite(r.ks_stat)


def test_pairwise_corr_underscore_names(spark):
    """ADVICE r10: column lists like ['a', 'b_c', 'a_b', 'c'] used to
    string-join into colliding internal aliases and fail with an
    ambiguous-reference error; positional aliases must handle them."""
    from nt_data_pipelines_spark.operators.stats import pairwise_corr

    pdf = pd.DataFrame(
        {
            "a": [1.0, 2.0, 3.0, 4.0],
            "b_c": [2.0, 4.0, 6.0, 8.0],
            "a_b": [4.0, 3.0, 2.0, 1.0],
            "c": [1.0, 3.0, 2.0, 4.0],
        }
    )
    out = pairwise_corr(spark.createDataFrame(pdf), ["a", "b_c", "a_b", "c"])
    got = {(r.col_x, r.col_y): r.corr for r in out.collect()}
    assert len(got) == 6
    assert got[("a", "b_c")] == pytest.approx(1.0)
    assert got[("a", "a_b")] == pytest.approx(-1.0)
    with pytest.raises(ValueError):
        pairwise_corr(spark.createDataFrame(pdf), ["a", "a"])
