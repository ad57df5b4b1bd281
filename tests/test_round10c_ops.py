"""Crafted-input tests for the round-10 third-batch operators:
bounded-Levenshtein linkage and the two-phase per-group cap."""

from __future__ import annotations

import warnings

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators.linkage import edit_distance_pairs
from nt_data_pipelines_spark.operators.text import cap_per_group


def _names_df(spark, names):
    return spark.createDataFrame(list(enumerate(names)), "id long, name string")


def test_edit_distance_pairs_crafted(spark):
    df = _names_df(
        spark,
        [
            "cold widget",   # 0
            "gold widget",   # 1: dist 1 to 0
            "cold widgets",  # 2: dist 1 to 0, dist 2 to 1
            "blue rod",      # 3: far from all
            "blue rods",     # 4: dist 1 to 3
        ],
    )
    rows = edit_distance_pairs(df, "id", "name", max_dist=2, max_gram_df=None).collect()
    got = {(r["id_a"], r["id_b"]): r["edit_distance"] for r in rows}
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 1
    assert got[(1, 2)] == 2
    assert got[(3, 4)] == 1
    # cross-family pairs exceed the bound and never appear
    assert all(not (a <= 2 and b >= 3) for a, b in got)


def test_edit_distance_pairs_blocking_recall_contract(spark):
    # strings sharing no trigram are never compared, even at distance
    # within the bound — the documented blocking recall trade
    df = _names_df(spark, ["abc", "xyz"])
    assert edit_distance_pairs(df, "id", "name", max_dist=3, max_gram_df=None).count() == 0


def test_edit_distance_pairs_hot_gram_cap_bounds_candidates(spark):
    # every name shares the hot "aaa" grams; only the rare "zz" pair
    # survives a cap of 2
    names = [f"aaaaaa{i}" for i in range(10)] + ["zzq aaa", "zzq aab"]
    df = _names_df(spark, names)
    uncapped = edit_distance_pairs(df, "id", "name", max_dist=2, max_gram_df=None)
    capped = edit_distance_pairs(df, "id", "name", max_dist=2, max_gram_df=2)
    assert uncapped.count() > capped.count()
    kept = capped.collect()
    assert {(r["id_a"], r["id_b"]) for r in kept} == {(10, 11)}
    assert kept[0]["edit_distance"] == 1


def test_edit_distance_pairs_default_cap_warns_once(spark):
    df = _names_df(spark, ["abcd", "abce"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        edit_distance_pairs(df, "id", "name", max_dist=1)
        assert any("max_gram_df" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        edit_distance_pairs(df, "id", "name", max_dist=1, max_gram_df=100)
        assert not w


def test_edit_distance_pairs_rejects_negative_bound(spark):
    df = _names_df(spark, ["a"])
    with pytest.raises(ValueError):
        edit_distance_pairs(df, "id", "name", max_dist=-1, max_gram_df=None)


def test_cap_per_group_two_phase_matches_naive_window(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i) for i in range(200)], "source string, doc_id long"
    ).repartition(8)
    got = sorted(
        (r["source"], r["doc_id"])
        for r in cap_per_group(df, "source", "doc_id", max_rows=10).collect()
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    expect = sorted(
        (r["source"], r["doc_id"])
        for r in df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 10)
        .drop("__rn")
        .collect()
    )
    assert got == expect
    assert len(got) == 30


def test_pairwise_corr_matches_numpy(spark):
    import numpy as np

    from nt_data_pipelines_spark.operators.stats import pairwise_corr

    rng = np.random.RandomState(11)
    x = rng.uniform(1, 50, 300)
    y = 3.0 * x + rng.uniform(0, 10, 300)  # strongly correlated with x
    z = rng.uniform(0, 1, 300)             # independent
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)],
        "x double, y double, z double",
    )
    rows = pairwise_corr(df, ["x", "y", "z"]).collect()
    got = {(r["col_x"], r["col_y"]): r for r in rows}
    assert len(rows) == 3 and all(r["n"] == 300 for r in rows)
    m = np.corrcoef(np.vstack([x, y, z]))
    assert got[("x", "y")]["corr"] == pytest.approx(m[0, 1], abs=2e-6)
    assert got[("x", "z")]["corr"] == pytest.approx(m[0, 2], abs=2e-6)
    assert got[("y", "z")]["corr"] == pytest.approx(m[1, 2], abs=2e-6)
    assert got[("x", "y")]["corr"] > 0.99


def test_pairwise_corr_exact_extremes_and_errors(spark):
    from nt_data_pipelines_spark.operators.stats import pairwise_corr

    df = spark.createDataFrame(
        [(float(i), float(2 * i), float(-i)) for i in range(1, 50)],
        "a double, b double, c double",
    )
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in pairwise_corr(df, ["a", "b", "c"]).collect()
    }
    assert got[("a", "b")] == pytest.approx(1.0, abs=1e-6)
    assert got[("a", "c")] == pytest.approx(-1.0, abs=1e-6)
    with pytest.raises(ValueError):
        pairwise_corr(df, ["a"])


def test_time_weighted_mean_hand_checked(spark):
    from datetime import datetime

    from nt_data_pipelines_spark.operators.stats import time_weighted_mean

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: value 10 held 2s, then 20 held 1s, then a terminal obs
        (1, datetime(2024, 1, 1, 0, 0, 0), 10.0, 1),
        (1, datetime(2024, 1, 1, 0, 0, 2), 20.0, 2),
        (1, datetime(2024, 1, 1, 0, 0, 3), 99.0, 3),
        # user 2: single observation — no interval, dropped
        (2, t0, 5.0, 4),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double, event_id long")
    out = time_weighted_mean(df, "user_id", "ts", "value", "event_id").collect()
    assert len(out) == 1
    r = out[0]
    assert r["user_id"] == 1
    assert r["n_intervals"] == 2 and r["total_us"] == 3_000_000
    # (10*2 + 20*1) / 3 = 13.3333333... -> 13.333333 under half-up micro
    assert r["twa_value"] == pytest.approx(13.333333, abs=1e-12)


def test_time_weighted_mean_burst_invariance(spark):
    """Re-quoting the same value many times must not move the mean."""
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.operators.stats import time_weighted_mean

    t0 = datetime(2024, 1, 1)
    base = [(1, t0, 10.0, 0), (1, t0 + timedelta(seconds=60), 20.0, 100),
            (1, t0 + timedelta(seconds=90), 0.0, 200)]
    burst = base + [
        (1, t0 + timedelta(seconds=i), 10.0, i) for i in range(1, 60)
    ]
    df_a = spark.createDataFrame(base, "user_id long, ts timestamp, value double, event_id long")
    df_b = spark.createDataFrame(burst, "user_id long, ts timestamp, value double, event_id long")
    a = time_weighted_mean(df_a, "user_id", "ts", "value", "event_id").first()
    b = time_weighted_mean(df_b, "user_id", "ts", "value", "event_id").first()
    assert a["twa_value"] == b["twa_value"]
    assert a["total_us"] == b["total_us"]


def test_cap_per_group_plan_is_two_phase(spark):
    """The local prune keys on SPARK_PARTITION_ID so no window task
    ever holds a whole group (the zipf_slope bounded-key pattern)."""
    df = spark.createDataFrame([("g", i) for i in range(10)], "source string, doc_id long")
    plan = cap_per_group(df, "source", "doc_id", max_rows=3)._jdf.queryExecution().toString()
    assert "SPARK_PARTITION_ID" in plan
    assert plan.count("Window") >= 2


def _cms_reference(values, depth=4, width=512):
    """Straight-line Python CMS mirroring the md5 cell layout."""
    import hashlib
    from collections import Counter

    exact = Counter(values)
    cells = {}
    for v, c in exact.items():
        for r in range(depth):
            h = hashlib.md5(f"{r}:{v}".encode()).hexdigest()
            cell = int(h[:8], 16) % width
            cells[(r, cell)] = cells.get((r, cell), 0) + c
    est = {}
    for v in exact:
        est[v] = min(
            cells[(r, int(hashlib.md5(f"{r}:{v}".encode()).hexdigest()[:8], 16) % width)]
            for r in range(depth)
        )
    return exact, est


def test_deterministic_cms_matches_python_reference(spark):
    from nt_data_pipelines_spark.operators.sketches import deterministic_cms_estimates

    # narrow sketch (8 cells) over 40 distinct values forces collisions
    values = [f"v{i}" for i in range(40) for _ in range(i + 1)]
    df = spark.createDataFrame([(v,) for v in values], "w string")
    rows = deterministic_cms_estimates(df, "w", depth=3, width=8, k=10).collect()
    exact, est = _cms_reference(values, depth=3, width=8)
    assert len(rows) == 10
    for r in rows:
        assert r["exact_count"] == exact[r["value"]]
        assert r["cms_count"] == est[r["value"]]
        assert r["overestimate"] == est[r["value"]] - exact[r["value"]]
        # one-sided error: CMS never underestimates
        assert r["overestimate"] >= 0
    # top-k is exact and deterministically ordered: v39 is the heaviest
    assert {r["value"] for r in rows} == {f"v{i}" for i in range(30, 40)}


def test_deterministic_cms_wide_sketch_is_exact(spark):
    from nt_data_pipelines_spark.operators.sketches import deterministic_cms_estimates

    df = spark.createDataFrame([(f"x{i % 5}",) for i in range(100)], "w string")
    rows = deterministic_cms_estimates(df, "w", depth=4, width=4096, k=5).collect()
    # 5 distinct values in 4096 cells: collisions essentially impossible
    assert all(r["overestimate"] == 0 for r in rows)
    assert all(r["exact_count"] == 20 for r in rows)


def test_deterministic_cms_rejects_bad_params(spark):
    from nt_data_pipelines_spark.operators.sketches import deterministic_cms_estimates

    df = spark.createDataFrame([("a",)], "w string")
    with pytest.raises(ValueError):
        deterministic_cms_estimates(df, "w", depth=0)
    with pytest.raises(ValueError):
        deterministic_cms_estimates(df, "w", k=0)


def _gini_reference(xs):
    xs = sorted(xs)
    n = len(xs)
    s = sum(xs)
    t = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * t) / (n * s) - (n + 1) / n


def test_gini_by_group_crafted_and_random(spark):
    import random

    from nt_data_pipelines_spark.operators.stats import gini_by_group

    rng = random.Random(13)
    data = {
        "equal": [7] * 50,                       # gini = 0
        "onehog": [1] * 99 + [9901],             # extreme inequality
        "mixed": [rng.randint(1, 1000) for _ in range(200)],
    }
    rows = [(g, v) for g, vals in data.items() for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in gini_by_group(df, "g", "v").collect()}
    assert got["equal"]["gini"] == 0.0
    for g, vals in data.items():
        assert got[g]["n_rows"] == len(vals)
        assert got[g]["total_value"] == sum(vals)
        assert got[g]["gini"] == pytest.approx(_gini_reference(vals), abs=1e-6), g
    assert got["onehog"]["gini"] > 0.9


def test_gini_by_group_duplicate_heavy_value_domain(spark):
    """Many rows per distinct value — the folded rank-run arithmetic
    must agree with the naive sorted-rank formula."""
    from nt_data_pipelines_spark.operators.stats import gini_by_group

    vals = [10] * 30 + [20] * 30 + [40] * 40
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    r = gini_by_group(df, "g", "v").first()
    assert r["gini"] == pytest.approx(_gini_reference(vals), abs=1e-6)


def test_quantile_gate_crafted(spark):
    from nt_data_pipelines_spark.operators.stats import quantile_gate

    # group a: values 1..8 -> ceil(8/4)=2nd value (2) is the cutoff;
    # rows with v >= 2 survive (7 rows). group b: all equal — all kept.
    rows = [("a", v) for v in range(1, 9)] + [("b", 5)] * 6
    df = spark.createDataFrame(rows, "g string, v long")
    kept = quantile_gate(df, "g", "v", 1, 4).collect()
    got_a = sorted(r["v"] for r in kept if r["g"] == "a")
    assert got_a == list(range(2, 9))
    assert sum(1 for r in kept if r["g"] == "b") == 6


def test_quantile_gate_ties_at_cutoff_are_kept(spark):
    from nt_data_pipelines_spark.operators.stats import quantile_gate

    # 4 copies of 1 then 12 copies of 9: ceil(16/4)=4 -> cutoff is 1
    # (cum(1)=4 >= 4), so EVERYTHING survives — ties keep, never split
    df = spark.createDataFrame(
        [("g", 1)] * 4 + [("g", 9)] * 12, "g string, v long"
    )
    assert quantile_gate(df, "g", "v", 1, 4).count() == 16
    # at the median, cutoff moves to 9 and the four 1s drop
    assert quantile_gate(df, "g", "v", 1, 2).count() == 12


def test_quantile_gate_matches_sorted_rank_reference(spark):
    import random

    from nt_data_pipelines_spark.operators.stats import quantile_gate

    rng = random.Random(3)
    vals = [rng.randint(1, 40) for _ in range(137)]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v long")
    cutoff = sorted(vals)[-(-len(vals) // 4) - 1]  # value at rank ceil(n/4)
    expect = sorted(v for v in vals if v >= cutoff)
    got = sorted(r["v"] for r in quantile_gate(df, "g", "v", 1, 4).collect())
    assert got == expect
    with pytest.raises(ValueError):
        quantile_gate(df, "g", "v", 4, 4)


def test_vwap_daily_hand_checked(spark):
    import duckdb

    from nt_data_pipelines_spark.plans.extra13 import w_vwap_daily

    sf_dir = "/root/testdata/sf0.001"
    out = {r["ship_date"]: r for r in w_vwap_daily(spark, sf_dir).collect()}
    con = duckdb.connect()
    ref = con.execute(
        f"""SELECT CAST(l_shipdate AS DATE) d,
                   SUM(l_extendedprice * l_quantity) / SUM(l_quantity) v
            FROM '{sf_dir}/lineitem.parquet' GROUP BY 1"""
    ).fetchall()
    assert len(out) == len(ref)
    for d, v in ref:
        assert out[d]["vwap"] == pytest.approx(v, rel=1e-9), d
        # vwap sits inside the day's price range scaled by quantity — sanity
        assert out[d]["total_qty"] > 0


def _pps_reference(pairs, m):
    """Naive single-threaded mirror of the md5-ordered weight line."""
    import hashlib

    line = sorted(pairs, key=lambda p: (hashlib.md5(str(p[0]).encode()).hexdigest(), p[0]))
    total = sum(w for _, w in line)
    out = {}
    cum = 0
    for i, w in line:
        before, after = cum, cum + w
        picks = (after * m) // total - (before * m) // total
        if picks >= 1:
            out[i] = picks
        cum = after
    return out


def test_pps_sample_matches_reference_and_is_exact(spark):
    import random

    from nt_data_pipelines_spark.operators.sampling import pps_systematic_sample

    rng = random.Random(5)
    pairs = [(i, rng.randint(1, 500)) for i in range(400)]
    df = spark.createDataFrame(pairs, "doc_id long, w long").repartition(7)
    got = {r["doc_id"]: r["n_picks"] for r in
           pps_systematic_sample(df, "doc_id", "w", m=60).collect()}
    assert got == _pps_reference(pairs, 60)
    # systematic PPS has ZERO variance in realized sample size
    assert sum(got.values()) == 60


def test_pps_sample_heavy_row_picked_multiple_times(spark):
    from nt_data_pipelines_spark.operators.sampling import pps_systematic_sample

    # one row holds half the mass -> ~m/2 picks land inside it
    pairs = [(0, 1000)] + [(i, 10) for i in range(1, 101)]
    df = spark.createDataFrame(pairs, "doc_id long, w long")
    got = {r["doc_id"]: r["n_picks"] for r in
           pps_systematic_sample(df, "doc_id", "w", m=20).collect()}
    assert got[0] == 10
    assert sum(got.values()) == 20


def test_pps_sample_partitioning_invariance_and_guards(spark):
    import pytest as _pytest

    from nt_data_pipelines_spark.operators.sampling import pps_systematic_sample

    pairs = [(i, (i % 7) + 1) for i in range(200)] + [(999, 0)]  # zero weight dropped
    a = spark.createDataFrame(pairs, "doc_id long, w long").repartition(2)
    b = spark.createDataFrame(pairs, "doc_id long, w long").repartition(23)
    ra = sorted(map(tuple, pps_systematic_sample(a, "doc_id", "w", 31).collect()))
    rb = sorted(map(tuple, pps_systematic_sample(b, "doc_id", "w", 31).collect()))
    assert ra == rb
    assert all(i != 999 for i, _, _ in ra)
    with _pytest.raises(ValueError):
        pps_systematic_sample(a, "doc_id", "w", 0)


def test_numeric_band_join_crafted_including_negatives(spark):
    from nt_data_pipelines_spark.operators.interval import numeric_band_join

    left = spark.createDataFrame(
        [(1, -0.5), (2, 10.0), (3, 100.0)], "lid long, lv double"
    )
    right = spark.createDataFrame(
        [(10, -3.0), (11, 4.2), (12, 12.0), (13, 94.9), (14, 105.1)],
        "rid long, rv double",
    )
    rows = numeric_band_join(left, right, "lv", "rv", 5.0).collect()
    got = {(r["lid"], r["rid"]): r["band_gap"] for r in rows}
    # brute-force reference
    expect = {
        (l, r): abs(a - b)
        for l, a in [(1, -0.5), (2, 10.0), (3, 100.0)]
        for r, b in [(10, -3.0), (11, 4.2), (12, 12.0), (13, 94.9), (14, 105.1)]
        if abs(a - b) <= 5.0
    }
    assert got == expect
    assert (1, 10) in got and (1, 11) in got  # negative-value matches
    assert (3, 13) not in got  # gap 5.1 just over the band
    with pytest.raises(ValueError):
        numeric_band_join(left, right, "lv", "rv", 0)


def test_numeric_band_join_boundary_inclusive(spark):
    from nt_data_pipelines_spark.operators.interval import numeric_band_join

    left = spark.createDataFrame([(1, 0.0)], "lid long, lv double")
    right = spark.createDataFrame([(2, 5.0), (3, 5.5)], "rid long, rv double")
    got = {r["rid"] for r in numeric_band_join(left, right, "lv", "rv", 5.0).collect()}
    assert got == {2}  # exactly-delta kept, beyond dropped


def test_hopping_counts_window_assignment(spark):
    """Every event lands in exactly its two covering 5-min-aligned
    10-min windows; counts match a hand rollup."""
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    # build a tiny parquet dir mimicking the events table
    import tempfile

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, t0 + timedelta(minutes=1), 7, "a", 1.0, "{}"),
        (2, t0 + timedelta(minutes=6), 7, "a", 2.0, "{}"),
        (3, t0 + timedelta(minutes=11), 7, "b", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        for t in ["events"]:
            df.write.mode("overwrite").parquet(f"{d}/{t}.parquet")
        out = REGISTRY["w_hopping_counts"].fn(spark, d).collect()
    got = {(r["event_type"], r["window_start"].minute): r["n_events"] for r in out}
    # event@1min -> windows starting -5 and 0; @6min -> 0 and 5; @11min -> 5 and 10
    assert got[("a", 55)] == 1          # window [-5, 5) holds event@1
    assert got[("a", 0)] == 2           # [0, 10) holds events @1 and @6
    assert got[("a", 5)] == 1           # [5, 15) holds event @6
    assert got[("b", 5)] == 1 and got[("b", 10)] == 1
    assert sum(r["n_events"] for r in out) == 6  # 3 events x 2 windows


def test_quantile_table_matches_sorted_rank_reference(spark):
    import math
    import random
    import tempfile

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    rng = random.Random(21)
    rows = []
    data = {}
    for s in ("s1", "s2"):
        vals = [rng.randint(10, 5000) for _ in range(173)]
        data[s] = sorted(vals)
        rows += [(i, "x", "en", s, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = REGISTRY["a_quantile_table"].fn(spark, d).collect()
    got = {(r["source"], r["pct"]): r["value"] for r in out}
    for s, vals in data.items():
        n = len(vals)
        for pct in (25, 50, 75, 95):
            expect = vals[math.ceil(pct * n / 100) - 1]
            assert got[(s, pct)] == expect, (s, pct)


def test_nearest_value_join_picks_single_best_match(spark):
    from nt_data_pipelines_spark.operators.interval import nearest_value_join

    left = spark.createDataFrame([(1, 10.0), (2, 50.0)], "lk long, lv double")
    right = spark.createDataFrame(
        [(10, 8.0), (11, 11.0), (12, 9.0), (13, 100.0)], "rk long, rv double"
    )
    rows = nearest_value_join(left, right, "lk", "lv", "rk", "rv", 5.0).collect()
    got = {r["lk"]: (r["rk"], r["band_gap"]) for r in rows}
    # 10.0: gaps are 2.0 (rk=10), 1.0 (rk=11), 1.0 (rk=12) — tie at
    # gap 1.0 breaks to the smaller VALUE (9.0, rk=12)
    assert got[1] == (12, 1.0)
    # 50.0: nothing within radius — dropped
    assert 2 not in got and len(rows) == 1


def test_burstiness_poisson_vs_bursty(spark):
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.operators.stats import burstiness_by_group

    t0 = datetime(2024, 1, 1)
    rows = []
    # "steady": exactly 3 events every minute for 30 minutes -> var 0
    for m in range(30):
        rows += [("steady", t0 + timedelta(minutes=m, seconds=s)) for s in (1, 2, 3)]
    # "bursty": 30 minutes observed, alternating 1 and 9 events
    for m in range(30):
        k = 9 if m % 2 else 1
        rows += [("bursty", t0 + timedelta(minutes=m, seconds=s)) for s in range(k)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["event_type"]: r for r in burstiness_by_group(df, "event_type", "ts").collect()}
    assert got["steady"]["fano"] == 0.0
    assert got["steady"]["n_buckets"] == 30 and got["steady"]["total_events"] == 90
    # hand value: counts 15x{1,9}, mean 5, sample var = 16*30/29
    import statistics

    counts = [1, 9] * 15
    expect = statistics.variance(counts) / statistics.mean(counts)
    assert got["bursty"]["fano"] == pytest.approx(expect, abs=1e-6)
    assert got["bursty"]["fano"] > 3


def test_burstiness_drops_single_bucket_groups(spark):
    from datetime import datetime

    from nt_data_pipelines_spark.operators.stats import burstiness_by_group

    df = spark.createDataFrame(
        [("solo", datetime(2024, 1, 1, 0, 0, 1)), ("solo", datetime(2024, 1, 1, 0, 0, 2))],
        "event_type string, ts timestamp",
    )
    assert burstiness_by_group(df, "event_type", "ts").count() == 0


def test_prefix_filter_is_lossless_vs_uncapped_form(spark):
    """The PPJoin prefix principle: identical output to the full
    inverted-index join at the same threshold — on crafted near-dups
    AND random strings."""
    import random

    from nt_data_pipelines_spark.operators.linkage import (
        fuzzy_string_pairs,
        prefix_filtered_pairs,
    )

    rng = random.Random(17)
    words = ["alpha", "bravo", "china", "delta", "echos", "fanta"]
    names = [
        " ".join(rng.sample(words, 3)) + rng.choice(["", " x", " yz"])
        for _ in range(120)
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    got = sorted(
        map(tuple, prefix_filtered_pairs(df, "id", "name", 2, 5).collect())
    )
    expect = sorted(
        map(
            tuple,
            fuzzy_string_pairs(df, "id", "name", threshold=0.4, max_gram_df=None)
            .collect(),
        )
    )
    assert got == expect
    assert len(got) > 0  # the corpus genuinely has near-dups


def test_prefix_filter_rejects_bad_threshold(spark):
    from nt_data_pipelines_spark.operators.linkage import prefix_filtered_pairs

    df = spark.createDataFrame([(1, "abc")], "id long, name string")
    with pytest.raises(ValueError):
        prefix_filtered_pairs(df, "id", "name", 0, 5)
    with pytest.raises(ValueError):
        prefix_filtered_pairs(df, "id", "name", 6, 5)


def test_prefix_filter_prunes_hot_gram_candidates(spark):
    """Every string shares hot filler grams; the prefix (rarest grams)
    generates fewer candidate pairs than the full gram join while the
    verified output stays identical."""
    from nt_data_pipelines_spark.operators.linkage import (
        _char_ngrams,
        prefix_filtered_pairs,
    )

    # 30 strings all ending in the same hot suffix, distinct prefixes
    names = [f"uniq{i:02d} common shared tail" for i in range(30)]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")
    out = prefix_filtered_pairs(df, "id", "name", 4, 5)  # t = 0.8
    # at t=0.8 these differ too much in their unique prefix? verify
    # against the quadratic form
    from nt_data_pipelines_spark.operators.linkage import fuzzy_string_pairs

    expect = sorted(
        map(
            tuple,
            fuzzy_string_pairs(df, "id", "name", threshold=0.8, max_gram_df=None)
            .collect(),
        )
    )
    assert sorted(map(tuple, out.collect())) == expect


def test_overnight_gaps_hand_checked(spark):
    import tempfile
    from datetime import datetime

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    rows = [
        # type a, day 1: open 10 (earliest), close 12 (latest)
        (1, datetime(2024, 1, 1, 9, 0), 7, "a", 10.0, "{}"),
        (2, datetime(2024, 1, 1, 16, 0), 7, "a", 12.0, "{}"),
        # type a, day 2: open 15 -> gap = 15 - 12 = 3
        (3, datetime(2024, 1, 2, 9, 0), 7, "a", 15.0, "{}"),
        (4, datetime(2024, 1, 2, 16, 0), 7, "a", 9.0, "{}"),
        # type a, day 4 (day 3 missing): gap bridges to day 2's close
        (5, datetime(2024, 1, 4, 9, 0), 7, "a", 20.0, "{}"),
        # type b: single day — no gap rows
        (6, datetime(2024, 1, 1, 12, 0), 8, "b", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = REGISTRY["w_overnight_gaps"].fn(spark, d).collect()
    got = {(r["event_type"], str(r["bucket"])): r["gap"] for r in out}
    assert got[("a", "2024-01-02")] == 3.0
    assert got[("a", "2024-01-04")] == 20.0 - 9.0
    assert all(t != "b" for t, _ in got)
    assert len(out) == 2


def test_vocab_coverage_hand_checked(spark):
    import tempfile

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    # 3 distinct words: "a" x 60, "b" x 30, "c" x 10 -> top-10 covers all
    text_a = " ".join(["a"] * 6)
    rows = (
        [(i, text_a, "en", "s", 1) for i in range(10)]
        + [(100 + i, "b b b", "en", "s", 1) for i in range(10)]
        + [(200 + i, "c", "en", "s", 1) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r["k"]: r for r in REGISTRY["a_vocab_coverage"].fn(spark, d).collect()}
    assert out[10]["total_tokens"] == 100
    assert out[10]["covered_tokens"] == 100 and out[10]["coverage"] == 1.0
    assert out[100]["coverage"] == 1.0 and out[1000]["coverage"] == 1.0


def test_vocab_coverage_partial_topk(spark):
    import tempfile

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    # 20 distinct words, uniform counts: top-10 covers exactly half
    rows = [(i, " ".join(f"w{j:02d}" for j in range(20)), "en", "s", 1) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {r["k"]: r for r in REGISTRY["a_vocab_coverage"].fn(spark, d).collect()}
    assert out[10]["coverage"] == 0.5
    assert out[100]["coverage"] == 1.0


def test_diurnal_profile_shares_sum_to_one(spark):
    import tempfile
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    t0 = datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, n in [(9, 6), (12, 3), (18, 3)]:
        for i in range(n):
            eid += 1
            rows.append((eid, t0 + timedelta(hours=h, seconds=i), 1, "a", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["hour_of_day"]: r for r in REGISTRY["a_diurnal_profile"].fn(spark, d).collect()}
    assert out[9]["share"] == 0.5 and out[12]["share"] == 0.25
    assert sum(r["share"] for r in out.values()) == pytest.approx(1.0, abs=1e-6)


def test_interarrival_quantiles_hand_checked(spark):
    import tempfile
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    t0 = datetime(2024, 1, 1)
    # user 1, type a: gaps of 1s, 2s, 3s, 4s -> p50 = 2s, p99 = 4s
    rows, eid = [], 0
    t = t0
    for gap in [0, 1, 2, 3, 4]:
        t += timedelta(seconds=gap)
        eid += 1
        rows.append((eid, t, 1, "a", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {r["pct"]: r["dt_us"] for r in REGISTRY["a_interarrival_quantiles"].fn(spark, d).collect()}
    assert out[50] == 2_000_000
    assert out[90] == 4_000_000 and out[99] == 4_000_000


def test_parkinson_vol_hand_checked(spark):
    import math
    import tempfile
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    highs_lows = [(12.0, 10.0), (20.0, 16.0), (8.0, 8.0)]  # 3 days
    for d, (hi, lo) in enumerate(highs_lows):
        for v in (lo, hi):
            eid += 1
            rows.append((eid, t0 + timedelta(days=d, hours=eid % 5), 1, "a", v, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = REGISTRY["w_parkinson_vol"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bars"] == 3
    expect = math.sqrt(
        sum(math.log(h / l) ** 2 for h, l in highs_lows) / (4 * math.log(2) * 3)
    )
    assert r["parkinson_vol"] == pytest.approx(expect, abs=1e-6)


def test_pairwise_corr_complete_case_null_handling(spark):
    """A NULL in a third column must not bias the (a, b) pair: rows
    with any null drop entirely (n matches the sums)."""
    import numpy as np

    from nt_data_pipelines_spark.operators.stats import pairwise_corr

    rows = [(float(i), float(2 * i), float(i % 7)) for i in range(1, 40)]
    df_clean = spark.createDataFrame(rows, "a double, b double, c double")
    df_nulled = spark.createDataFrame(
        rows + [(100.0, 200.0, None), (None, 5.0, 1.0)],
        "a double, b double, c double",
    )
    clean = {(r["col_x"], r["col_y"]): r for r in pairwise_corr(df_clean, ["a", "b", "c"]).collect()}
    nulled = {(r["col_x"], r["col_y"]): r for r in pairwise_corr(df_nulled, ["a", "b", "c"]).collect()}
    # the two extra rows each carry a null -> dropped -> identical stats
    for k in clean:
        assert nulled[k]["n"] == clean[k]["n"] == 39
        assert nulled[k]["corr"] == clean[k]["corr"]


def test_lang_confusion_diagonal_dominates_and_shares_sum(spark):
    from nt_data_pipelines_spark.plans.registry import REGISTRY

    rows = REGISTRY["a_lang_confusion"].fn(spark, "/root/testdata/sf0.001").collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r["true_lang"], []).append(r)
    assert set(by_true) == {"en", "de", "es", "fr", "zh"}
    for lang, cells in by_true.items():
        # per-class shares sum to 1 (micro rounding tolerance)
        assert sum(c["row_share"] for c in cells) == pytest.approx(1.0, abs=5e-6)
    # the synthetic corpus draws English-ish vocabulary for EVERY lang
    # label — the confusion matrix is exactly the artifact that makes
    # that label/content mismatch visible: 'en' dominates every row
    for lang, cells in by_true.items():
        top = max(cells, key=lambda c: c["row_share"])
        assert top["pred_lang"] == "en", (lang, top)
    # and true-en documents are classified en with high recall
    en_diag = [c for c in by_true["en"] if c["pred_lang"] == "en"]
    assert en_diag and en_diag[0]["row_share"] > 0.8


def test_recall_at_k_bounds_and_brute_consistency(spark):
    from nt_data_pipelines_spark.plans.registry import REGISTRY
    from nt_data_pipelines_spark.plans.similarity import N_QUERIES, TOP_K

    rows = REGISTRY["s_recall_at_k"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == N_QUERIES
    for r in rows:
        assert 0 <= r["hits"] <= TOP_K
        assert r["recall_at_k"] == r["hits"] / TOP_K
    # this fixture's embeddings are near-orthogonal noise (within-
    # label cosine ~0.01), so the exact top-k is noise and bucketed
    # recall is ~0 BY CONSTRUCTION — the query is the instrument that
    # reports it; crafted-cluster recall tests elsewhere pin the
    # operator's real recall. Assert the measurement stays in the
    # noise regime rather than silently becoming meaningless.
    mean = sum(r["recall_at_k"] for r in rows) / len(rows)
    assert mean <= 0.3, mean


def test_keep_best_representative_crafted(spark):
    """Clusters keep their LONGEST member, not the min id."""
    import tempfile

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    # docs 1,2,3 near-identical (one cluster); 3 is longest but has the
    # highest id; doc 9 is unrelated (no cluster row)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base + " iota", "en", "s", len(base) + 5),
        (3, base + " iota kappa", "en", "s", len(base) + 11),
        (9, "totally different words nothing shared here at all", "en", "s", 50),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = REGISTRY["d_keep_best_representative"].fn(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r["canonical_id"] == 1          # min-id cluster label
    assert r["keep_id"] == 3               # but the LONGEST member is kept
    assert r["cluster_size"] == 3


def test_composition_turnover_hand_checked(spark):
    import tempfile
    from datetime import datetime, timedelta

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    t0 = datetime(2024, 1, 1)
    rows, eid = [], 0
    # day 0: 3 a + 1 b; day 1: identical mix -> turnover 0;
    # day 2: all b -> turnover = 0.5*(|0-3/4| + |4/4-1/4|) = 0.75
    plan = [("a", 3, 0), ("b", 1, 0), ("a", 3, 1), ("b", 1, 1), ("b", 4, 2)]
    for typ, n, day in plan:
        for i in range(n):
            eid += 1
            rows.append((eid, t0 + timedelta(days=day, minutes=eid), 1, typ, 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = {str(r["day"]): r["turnover"] for r in
               REGISTRY["a_composition_turnover"].fn(spark, d).collect()}
    assert out["2024-01-02"] == 0.0
    assert out["2024-01-03"] == 0.75
    assert len(out) == 2  # the first day has no predecessor


def test_join_key_skew_hand_checked(spark):
    import tempfile

    from nt_data_pipelines_spark.plans.registry import REGISTRY

    # 9 keys with multiplicity 1, one hot key with multiplicity 11
    rows = []
    ln = 0
    for key, mult in [(k, 1) for k in range(9)] + [(99, 11)]:
        for _ in range(mult):
            ln += 1
            rows.append((key, 1, 1, ln, 1.0, 10.0, 0.0, 0.0, "N", "O", "2024-01-01 00:00:00"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        r = REGISTRY["a_join_key_skew"].fn(spark, d).first()
    assert r["n_keys"] == 10 and r["n_rows"] == 20 and r["max_mult"] == 11
    assert r["p50_mult"] == 1 and r["p90_mult"] == 1 and r["p99_mult"] == 11
    assert r["max_key_share"] == 0.55
