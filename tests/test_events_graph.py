"""Hand-checked funnel/cohort/transition semantics and PageRank properties."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.events import (
    cohort_retention,
    event_transitions,
    funnel_conversion,
)
from nt_data_pipelines_spark.operators.graph import pagerank

B = dt.datetime(2024, 1, 1, 12)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, B + dt.timedelta(minutes=m), u, t, 0.0, "{}") for i, (m, u, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_funnel_requires_strict_order(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view"), (1, 1, "click"), (2, 1, "buy"),   # full path
            (0, 2, "click"), (1, 2, "view"),                  # click BEFORE view: no step 2
            (0, 3, "view"),                                   # stops at step 1
            (5, 2, "click"),                                  # 2's click after view: step 2
        ],
    )
    got = {r["step"]: (r["n_users"], r["conversion"]) for r in
           funnel_conversion(ev, ["view", "click", "buy"]).collect()}
    assert got[1] == (3, 1.0)
    assert got[2] == (2, pytest.approx(2 / 3, abs=1e-6))
    assert got[3] == (1, pytest.approx(1 / 3, abs=1e-6))
    with pytest.raises(ValueError, match="two steps"):
        funnel_conversion(ev, ["view"])


def test_cohort_retention_ages(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "view"),                   # user 1 first week
            (7 * 24 * 60, 1, "view"),         # user 1 active next week -> age 1
            (0, 2, "view"),                   # user 2 only week 0
            (7 * 24 * 60, 3, "view"),         # user 3 first seen week 1
        ],
    )
    got = {(r["cohort"].isoformat(), r["age"]): r["n_users"]
           for r in cohort_retention(ev).collect()}
    assert got == {
        ("2024-01-01", 0): 2,  # users 1,2 in the Jan-1 (Monday) cohort
        ("2024-01-01", 1): 1,  # user 1 retained
        ("2024-01-08", 0): 1,  # user 3's cohort
    }
    with pytest.raises(ValueError, match="period"):
        cohort_retention(ev, period="month")


def test_event_transitions_counts(spark):
    ev = _ev(spark, [(0, 1, "a"), (1, 1, "b"), (2, 1, "a"), (0, 2, "a"), (1, 2, "b")])
    got = {(r["from_type"], r["to_type"]): r["n"] for r in event_transitions(ev).collect()}
    assert got == {("a", "b"): 2, ("b", "a"): 1}


def test_pagerank_mass_and_known_graph(spark):
    # star: everyone points at 0; 0 is dangling
    edges = spark.createDataFrame([(i, 0) for i in (1, 2, 3)], "src long, dst long")
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert pr[0] == max(pr.values())
    assert pr[1] == pr[2] == pr[3]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-4)  # mass conserved
    # symmetric 2-cycle converges to equal ranks
    cyc = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    pr2 = {r["node"]: r["rank"] for r in pagerank(cyc, iterations=3).collect()}
    assert pr2[0] == pytest.approx(pr2[1], abs=1e-9) == pytest.approx(0.5, abs=1e-6)
    with pytest.raises(ValueError):
        pagerank(cyc, iterations=0)


def test_weighted_pagerank_splits_mass_by_weight(spark):
    """0 -> {1 (w=3), 2 (w=1)}: node 1 receives 3x node 2's share;
    the unweighted call equals weight=1."""
    e = spark.createDataFrame(
        [(0, 1, 3.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    pr = {r["node"]: r["rank"] for r in
          pagerank(e, weight="w", iterations=8).collect()}
    assert pr[1] > pr[2]
    assert sum(pr.values()) == pytest.approx(1.0, abs=1e-4)
    # weight=1 everywhere reproduces the unweighted ranks exactly
    ones = e.withColumn("w", F.lit(1.0))
    pw = {r["node"]: r["rank"] for r in pagerank(ones, weight="w", iterations=3).collect()}
    pu = {r["node"]: r["rank"] for r in pagerank(e, iterations=3).collect()}
    assert pw == pu
