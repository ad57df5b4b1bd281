"""Sketch tier: error bounds vs the exact tier, map-side partial plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.sketches import (
    approx_distinct,
    approx_quantiles,
    distinct_sketch_error,
)


def _events(spark):
    from nt_data_pipelines_spark.sources.testdata import load_table

    return load_table(spark, "/root/testdata/sf0.01", "events")


def test_approx_distinct_within_rsd(spark):
    ev = _events(spark)
    row = distinct_sketch_error(ev, "user_id", rsd=0.05).first()
    assert row["rel_error"] <= 3 * 0.05  # 3 sigma of the target rsd
    grouped = approx_distinct(ev, "event_type", "user_id").collect()
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for r in grouped:
        got, want = r["approx_distinct_user_id"], exact[r["event_type"]]
        assert abs(got - want) / want <= 0.15


def test_approx_quantiles_close_to_exact(spark):
    ev = _events(spark)
    approx = approx_quantiles(ev, None, "value", (0.5,), accuracy=10_000).first()[
        "quantiles"
    ][0]
    exact = ev.agg(F.percentile("value", F.lit(0.5)).alias("m")).first()["m"]
    spread = (
        ev.agg((F.max("value") - F.min("value")).alias("s")).first()["s"]
    )
    assert abs(approx - exact) <= 0.01 * spread  # tight at 1/accuracy rank error


def test_sketch_agg_is_partial(spark):
    # the plan must show a partial aggregate before the exchange —
    # registers shuffle, rows don't
    plan = (
        approx_distinct(_events(spark), "event_type", "user_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # tree prints top-down: final agg, then the exchange, then the
    # map-side partial agg underneath it
    assert plan.count("HashAggregate") >= 2
    assert plan.index("HashAggregate") < plan.index("Exchange") < plan.rindex("HashAggregate")


def test_heavy_hitters_exact_on_skewed_data(spark):
    """MG candidates + recount return the exact top-k on a Zipf-ish
    distribution, across partitionings."""
    from nt_data_pipelines_spark.operators.sketches import heavy_hitters

    rows = []
    for rank in range(1, 40):
        rows += [(f"w{rank:02d}",)] * (2000 // rank)
    df = spark.createDataFrame(rows, "token string")

    exact = [
        (r["token"], r["cnt"])
        for r in df.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(10)
        .collect()
    ]
    for parts in (2, 16):
        got = [
            (r["token"], r["count"])
            for r in heavy_hitters(df.repartition(parts), "token", k=10).collect()
        ]
        assert got == exact

    import pytest

    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "token", k=0)


def test_cms_counts_overestimates_within_bound(spark):
    """CMS never undercounts; overestimation is bounded by eps * n."""
    import pytest
    from nt_data_pipelines_spark.operators.sketches import cms_counts

    rows = [("hot",)] * 500 + [(f"v{i % 50}",) for i in range(1500)]
    df = spark.createDataFrame(rows, "w string")
    true = {"hot": 500, "v0": 30, "absent": 0}
    ests, _ = cms_counts(df, "w", list(true), eps=0.01, confidence=0.99)
    n = 2000
    for v, est in ests:
        assert est >= true[v], (v, est)
        assert est <= true[v] + 0.01 * n * 3, (v, est)  # slack over the bound
    # deterministic under a fixed seed
    ests2, _ = cms_counts(df, "w", list(true), eps=0.01, confidence=0.99)
    assert ests == ests2
    with pytest.raises(ValueError):
        cms_counts(df, "w", [])


def test_kll_quantiles_close_to_exact(spark):
    from nt_data_pipelines_spark.operators.sketches import kll_quantiles

    df = spark.createDataFrame([(float(i),) for i in range(1, 10001)], "x double")
    got = {r["p"]: r["q"] for r in kll_quantiles(df, "x", (0.1, 0.5, 0.9)).collect()}
    for p, q in got.items():
        assert abs(q - p * 10000) <= 0.02 * 10000, (p, q)  # ~1% rank error


def test_segment_overlap_theta_sketches(spark):
    """Known overlap: A = users 0..599, B = users 400..999 -> |A∩B|=200."""
    import pytest
    from nt_data_pipelines_spark.operators.sketches import segment_overlap

    rows = [("A", i) for i in range(600)] + [("B", i) for i in range(400, 1000)]
    df = spark.createDataFrame(rows, "seg string, user_id long")
    got = segment_overlap(df, "seg", "user_id", "A", "B")
    assert got["a"] == pytest.approx(600, rel=0.05)
    assert got["b"] == pytest.approx(600, rel=0.05)
    assert got["union"] == pytest.approx(1000, rel=0.05)
    assert got["intersection"] == pytest.approx(200, rel=0.15)
    with pytest.raises(ValueError, match="no rows"):
        segment_overlap(df, "seg", "user_id", "A", "Z")
