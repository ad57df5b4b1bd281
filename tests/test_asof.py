"""Cross-table as-of join: backward match, ties, tolerance, per-key isolation."""

from __future__ import annotations

import datetime as dt

from nt_data_pipelines_spark.operators.asof import asof_join


def _ts(minute):
    return dt.datetime(2024, 1, 1, 9, minute)


def test_asof_backward_and_ties(spark):
    trades = spark.createDataFrame(
        [("A", _ts(1), 10.0), ("A", _ts(5), 11.0), ("A", _ts(9), 12.0), ("B", _ts(5), 50.0)],
        ["sym", "ts", "price"],
    )
    quotes = spark.createDataFrame(
        [("A", _ts(0), 9.9), ("A", _ts(5), 10.9), ("A", _ts(8), 11.9), ("B", _ts(6), 49.0)],
        ["sym", "ts", "quote"],
    )
    got = {
        (r["sym"], r["ts"]): r["right_quote"]
        for r in asof_join(trades, quotes, on="ts", by="sym").collect()
    }
    assert got[("A", _ts(1))] == 9.9  # latest quote before 9:01
    assert got[("A", _ts(5))] == 10.9  # exact-timestamp quote matches (tie)
    assert got[("A", _ts(9))] == 11.9
    assert got[("B", _ts(5))] is None  # B's only quote is later; keys isolated


def test_asof_tolerance(spark):
    left = spark.createDataFrame([("A", _ts(30), 1.0)], ["sym", "ts", "x"])
    right = spark.createDataFrame([("A", _ts(0), 7.0)], ["sym", "ts", "y"])
    fresh = asof_join(left, right, on="ts", by="sym", tolerance_seconds=3600).collect()[0]
    assert fresh["right_y"] == 7.0  # 30 min old, within 1h
    stale = asof_join(left, right, on="ts", by="sym", tolerance_seconds=600).collect()[0]
    assert stale["right_y"] is None  # older than 10 min -> nulled


def test_asof_matches_pandas_merge_asof(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(8)
    base = dt.datetime(2024, 1, 1)
    lrows = sorted(rng.choice(10_000, 300, replace=False))
    rrows = sorted(rng.choice(10_000, 200, replace=False))
    lpdf = pd.DataFrame({"k": "A", "ts": [base + dt.timedelta(seconds=int(s)) for s in lrows],
                         "x": rng.normal(size=300)})
    rpdf = pd.DataFrame({"k": "A", "ts": [base + dt.timedelta(seconds=int(s)) for s in rrows],
                         "y": rng.normal(size=200)})
    got = (
        asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="ts", by="k")
        .orderBy("ts")
        .toPandas()
    )
    want = pd.merge_asof(lpdf, rpdf, on="ts", by="k", direction="backward")
    lhs = got["right_y"].to_numpy()
    rhs = want["y"].to_numpy()
    assert ((lhs == rhs) | (pd.isna(lhs) & pd.isna(rhs))).all()
