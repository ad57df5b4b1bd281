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


def test_asof_matched_row_null_stays_null(spark):
    # The matched (latest) right row has a legit NULL in one value
    # column; an older right row has a value there. pd.merge_asof
    # returns the matched row's NULL — it must NOT be resurrected
    # from the older row. Tolerance must also key off the matched row.
    left = spark.createDataFrame([("A", _ts(30), 1.0)], ["sym", "ts", "x"])
    right = spark.createDataFrame(
        [("A", _ts(0), 7.0, 70.0), ("A", _ts(29), None, 71.0)],
        "sym string, ts timestamp, y double, z double",
    )
    row = asof_join(left, right, on="ts", by="sym").collect()[0]
    assert row["right_y"] is None and row["right_z"] == 71.0
    assert row["right_ts"] == _ts(29)
    # matched row is 1 min old: within a 2-min tolerance even though
    # the older row (which used to leak through per-column) is not
    tol = asof_join(left, right, on="ts", by="sym", tolerance_seconds=120).collect()[0]
    assert tol["right_z"] == 71.0 and tol["right_y"] is None


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("A", _ts(1), 1.0), ("A", _ts(5), 2.0), ("A", _ts(9), 3.0)],
        ["sym", "ts", "x"],
    )
    right = spark.createDataFrame(
        [("A", _ts(0), 9.9), ("A", _ts(5), 10.9), ("A", _ts(8), 11.9)],
        ["sym", "ts", "q"],
    )
    got = {
        r["ts"]: r["right_q"]
        for r in asof_join(left, right, on="ts", by="sym", direction="forward").collect()
    }
    assert got[_ts(1)] == 10.9  # earliest quote at/after 9:01
    assert got[_ts(5)] == 10.9  # exact tie matches forward too
    assert got[_ts(9)] is None  # nothing after 9:09
    # forward tolerance: next quote after 9:01 is 4 min ahead
    tol = {
        r["ts"]: r["right_q"]
        for r in asof_join(
            left, right, on="ts", by="sym", direction="forward", tolerance_seconds=120
        ).collect()
    }
    assert tol[_ts(1)] is None and tol[_ts(5)] == 10.9


def test_asof_forward_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(11)
    base = dt.datetime(2024, 1, 1)
    lrows = sorted(rng.choice(10_000, 250, replace=False))
    rrows = sorted(rng.choice(10_000, 180, replace=False))
    lpdf = pd.DataFrame({"k": "A", "ts": [base + dt.timedelta(seconds=int(s)) for s in lrows],
                         "x": rng.normal(size=250)})
    rpdf = pd.DataFrame({"k": "A", "ts": [base + dt.timedelta(seconds=int(s)) for s in rrows],
                         "y": rng.normal(size=180)})
    got = (
        asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                  on="ts", by="k", direction="forward")
        .orderBy("ts")
        .toPandas()
    )
    want = pd.merge_asof(lpdf, rpdf, on="ts", by="k", direction="forward")
    lhs = got["right_y"].to_numpy()
    rhs = want["y"].to_numpy()
    assert ((lhs == rhs) | (pd.isna(lhs) & pd.isna(rhs))).all()


def test_asof_multi_key_by_and_no_by_guard(spark):
    import pytest

    left = spark.createDataFrame(
        [("A", "x", _ts(5), 1.0), ("A", "y", _ts(5), 2.0)],
        ["sym", "venue", "ts", "px"],
    )
    right = spark.createDataFrame(
        [("A", "x", _ts(4), 10.0), ("A", "y", _ts(3), 20.0)],
        ["sym", "venue", "ts", "q"],
    )
    got = {
        (r["sym"], r["venue"]): r["right_q"]
        for r in asof_join(left, right, on="ts", by=["sym", "venue"]).collect()
    }
    assert got[("A", "x")] == 10.0 and got[("A", "y")] == 20.0

    with pytest.raises(ValueError, match="ONE task"):
        asof_join(left, right, on="ts")
    # explicit opt-in works (driver-sized global merge)
    rows = asof_join(
        left.drop("sym", "venue"), right.drop("sym", "venue"),
        on="ts", allow_single_partition=True,
    ).collect()
    assert {r["right_q"] for r in rows} == {10.0}


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
