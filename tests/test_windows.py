"""Window operator semantics on tiny hand-checked frames (W1-W3, A5, A6)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nt_data_pipelines_spark.operators import windows as W


@pytest.fixture(scope="module")
def series(spark):
    rows = [("a", i, float(10 + i)) for i in range(5)] + [("b", i, float(100 + 2 * i)) for i in range(3)]
    return spark.createDataFrame(rows, ["k", "t", "x"])


def test_pct_change_drops_null_head(series):
    got = W.pct_change(series, "k", "t", "x", out_col="r").orderBy("k", "t").collect()
    ks = [(r["k"], r["t"]) for r in got]
    assert ks == [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 1), ("b", 2)]
    assert got[0]["r"] == pytest.approx(11 / 10 - 1)
    assert got[4]["r"] == pytest.approx(102 / 100 - 1)


def test_pct_change_zero_base_null_mode(spark):
    df = spark.createDataFrame([("a", 0, 0.0), ("a", 1, 5.0)], ["k", "t", "x"])
    kept = W.pct_change(df, "k", "t", "x", out_col="r", drop_null=True, zero_base="null").collect()
    assert kept == []  # 5/0 -> NULL -> dropped, no ANSI error


def test_pct_change_zero_base_inf_mode(spark):
    """Default matches Polars float division: x/0 -> inf, 0/0 -> NaN, rows kept."""
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 1, 5.0), ("a", 2, 0.0), ("a", 3, 0.0), ("a", 4, -2.0)],
        ["k", "t", "x"],
    )
    got = {r["t"]: r["r"] for r in W.pct_change(df, "k", "t", "x", out_col="r").collect()}
    assert got[1] == float("inf")  # 5/0 - 1
    assert got[2] == -1.0  # 0/5 - 1
    assert math.isnan(got[3])  # 0/0
    assert got[4] == float("-inf")  # -2/0


def test_rolling_sum_full_window_gate(series):
    got = (
        W.rolling_sum(series, "k", "t", "x", 3, out_col="s")
        .filter(F.col("k") == "a")
        .orderBy("t")
        .collect()
    )
    assert [r["s"] for r in got] == [None, None, 33.0, 36.0, 39.0]


def test_rolling_std_matches_sample_std(series):
    got = (
        W.rolling_std(series, "k", "t", "x", 3, out_col="s")
        .filter((F.col("k") == "a") & F.col("s").isNotNull())
        .orderBy("t")
        .collect()
    )
    # consecutive integers: sample std = 1.0 for every full window
    assert all(r["s"] == pytest.approx(1.0) for r in got)
    assert len(got) == 3


def test_rolling_cov_gate_and_value(spark):
    rows = [("a", i, float(i), float(2 * i + 1)) for i in range(4)]
    df = spark.createDataFrame(rows, ["k", "t", "x", "y"])
    got = W.rolling_cov(df, "k", "t", "x", "y", 3, out_col="c").orderBy("t").collect()
    assert [r["c"] for r in got][:2] == [None, None]
    # cov([0,1,2],[1,3,5]) sample = 2.0; cov([1,2,3],[3,5,7]) = 2.0
    assert got[2]["c"] == pytest.approx(2.0)
    assert got[3]["c"] == pytest.approx(2.0)


def test_zscore_global_moments(series):
    out = W.zscore(series, "x", out_col="z").collect()
    zs = [r["z"] for r in out]
    n = len(zs)
    mean = sum(zs) / n
    var = sum((z - mean) ** 2 for z in zs) / (n - 1)
    assert mean == pytest.approx(0.0, abs=1e-12)
    assert math.sqrt(var) == pytest.approx(1.0, rel=1e-12)


def test_zscore_per_partition(series):
    out = W.zscore(series, "x", out_col="z", partition_by="k")
    for k in ("a", "b"):
        zs = [r["z"] for r in out.filter(F.col("k") == k).collect()]
        assert sum(zs) / len(zs) == pytest.approx(0.0, abs=1e-12)


def test_partition_count(series):
    got = W.partition_count(series, "k", out_col="n").select("k", "n").distinct().collect()
    assert {(r["k"], r["n"]) for r in got} == {("a", 5), ("b", 3)}


def test_rolling_median_grouped_matches_sort_and_pandas(spark):
    """The two physical strategies agree at small W; at large W the
    sort form refuses (O(W log W) per row) and the grouped kernel
    matches a driver-side pandas golden."""
    import pandas as pd
    import pytest

    from nt_data_pipelines_spark.operators.windows import rolling_median

    rows = []
    for k in ("a", "b", "c"):
        for i in range(120):
            # key 'a' carries sparse nulls (exercises the gate); b/c are
            # dense so large windows produce non-null medians too
            v = None if k == "a" and i in (30, 77) else float((i * 31 + ord(k)) % 97)
            rows.append((k, i, v))
    df = spark.createDataFrame(rows, "key string, seq int, value double")

    small_sort = rolling_median(df, "key", "seq", "value", 21, method="sort")
    small_grp = rolling_median(df, "key", "seq", "value", 21, method="grouped")
    want = {(r["key"], r["seq"]): r["med"] for r in small_sort.collect()}
    got = {(r["key"], r["seq"]): r["med"] for r in small_grp.collect()}
    assert set(got) == set(want)
    assert all(
        (got[k] is None and want[k] is None) or got[k] == pytest.approx(want[k])
        for k in want
    )
    assert any(v is not None for v in want.values())

    # large W: sort path refuses with guidance; auto picks grouped
    with pytest.raises(ValueError, match="grouped"):
        rolling_median(df, "key", "seq", "value", 101, method="sort")
    big = rolling_median(df, "key", "seq", "value", 101, method="auto")
    got_big = {(r["key"], r["seq"]): r["med"] for r in big.collect()}
    pdf = pd.DataFrame(rows, columns=["key", "seq", "value"]).sort_values(["key", "seq"])
    pdf["med"] = (
        pdf.groupby("key")["value"].transform(lambda s: s.rolling(101, min_periods=101).median())
    )
    n_real = 0
    for r in pdf.itertuples():
        g = got_big[(r.key, r.seq)]
        if pd.isna(r.med):
            assert g is None
        else:
            assert g == pytest.approx(r.med)
            n_real += 1
    assert n_real > 0  # the golden actually exercised full windows


def test_forward_returns_multi_horizon(series):
    got = {
        (r["k"], r["t"]): (r["fwd_ret_1"], r["fwd_ret_2"])
        for r in W.forward_returns(
            series, "k", "t", "x", horizons=(1, 2)
        ).collect()
    }
    # key a: x = 10,11,12,13,14
    assert got[("a", 0)][0] == pytest.approx(11 / 10 - 1)
    assert got[("a", 0)][1] == pytest.approx(12 / 10 - 1)
    assert got[("a", 4)] == (None, None)  # tail has no future rows
    assert got[("a", 3)][1] is None  # only 1 row ahead, horizon 2 null
    # key b never sees key a's rows
    assert got[("b", 0)][0] == pytest.approx(102 / 100 - 1)


def test_drawdown_running_peak(spark):
    rows = [("a", 0, 10.0), ("a", 1, 15.0), ("a", 2, 12.0), ("a", 3, 9.0), ("a", 4, 20.0)]
    got = {
        r["t"]: (r["running_peak"], r["drawdown"])
        for r in W.drawdown(
            spark.createDataFrame(rows, ["k", "t", "x"]), "k", "t", "x"
        ).collect()
    }
    assert got[0] == (10.0, 0.0)
    assert got[1] == (15.0, 0.0)
    assert got[2][0] == 15.0 and got[2][1] == pytest.approx(12 / 15 - 1)
    assert got[3][1] == pytest.approx(9 / 15 - 1)
    assert got[4] == (20.0, 0.0)  # new peak resets drawdown


def test_forward_fill_carries_last_observation(spark):
    rows = [("a", 0, None), ("a", 1, 5.0), ("a", 2, None), ("a", 3, None),
            ("a", 4, 7.0), ("b", 0, None)]
    got = {
        (r["k"], r["t"]): r["filled"]
        for r in W.forward_fill(
            spark.createDataFrame(rows, "k string, t long, x double"),
            "k", "t", "x", out_col="filled",
        ).collect()
    }
    assert got[("a", 0)] is None          # leading null stays null
    assert got[("a", 2)] == 5.0 and got[("a", 3)] == 5.0
    assert got[("a", 4)] == 7.0
    assert got[("b", 0)] is None          # fills never cross keys


def test_xsec_rank_and_buckets(spark):
    rows = [("d1", i, float(100 - i)) for i in range(6)]
    out = W.xsec_rank(
        spark.createDataFrame(rows, ["d", "i", "x"]), "d", ["x", "i"],
        rank_col="r", ntile_col="q", buckets=3,
    )
    got = {r["i"]: (r["r"], r["q"]) for r in out.collect()}
    # smallest x (i=5) ranks first; 6 rows into 3 buckets = 2 each
    assert got[5] == (1, 1) and got[4] == (2, 1)
    assert got[1] == (5, 3) and got[0] == (6, 3)


def test_winsorize_clips_to_group_percentiles(spark):
    import numpy as np

    vals = [float(v) for v in range(1, 101)]  # 1..100 in one group
    rows = [("g", i, v) for i, v in enumerate(vals)]
    out = W.winsorize(
        spark.createDataFrame(rows, ["g", "i", "x"]), "g", "x",
        lower=0.10, upper=0.90, out_col="w",
    )
    got = sorted(r["w"] for r in out.collect())
    lo, hi = np.percentile(vals, 10), np.percentile(vals, 90)
    assert got[0] == pytest.approx(lo) and got[-1] == pytest.approx(hi)
    assert min(vals) < lo  # the clip actually engaged
    inner = [v for v in vals if lo <= v <= hi]
    assert set(inner) <= set(got)  # untouched interior values survive


def test_rolling_median_even_window_matches_pandas(spark):
    """Even W: the sort form averages the two middle order statistics —
    exactly pandas rolling(W).median() (VERDICT r4 item 7)."""
    import pandas as pd
    import pytest as _pt

    from nt_data_pipelines_spark.operators.windows import rolling_median

    rows = [
        ("a", i, None if i == 9 else float((i * 37 + 11) % 53)) for i in range(40)
    ] + [("b", i, float((i * 13 + 5) % 29)) for i in range(40)]
    df = spark.createDataFrame(rows, "key string, seq int, value double")

    for w in (2, 4, 20):
        got = {
            (r["key"], r["seq"]): r["med"]
            for r in rolling_median(df, "key", "seq", "value", w, method="sort").collect()
        }
        pdf = pd.DataFrame(rows, columns=["key", "seq", "value"]).sort_values(
            ["key", "seq"]
        )
        pdf["med"] = pdf.groupby("key")["value"].transform(
            lambda s: s.rolling(w, min_periods=w).median()
        )
        for r in pdf.itertuples():
            g = got[(r.key, r.seq)]
            if pd.isna(r.med):
                assert g is None, (r.key, r.seq, g)
            else:
                assert g == _pt.approx(r.med), (r.key, r.seq, g, r.med)

    # even-window grouped path agrees with the sort path too
    gs = rolling_median(df, "key", "seq", "value", 4, method="grouped")
    got_g = {(r["key"], r["seq"]): r["med"] for r in gs.collect()}
    got_s = {
        (r["key"], r["seq"]): r["med"]
        for r in rolling_median(df, "key", "seq", "value", 4, method="sort").collect()
    }
    assert all(
        (got_g[k] is None and got_s[k] is None) or got_g[k] == _pt.approx(got_s[k])
        for k in got_s
    )


def test_rolling_skew_kurt_matches_pandas(spark):
    import pandas as pd
    import pytest as _pt

    from nt_data_pipelines_spark.operators.windows import rolling_skew_kurt

    rows = [
        (k, i, float(((i * 29 + ord(k) * 7) % 83) - 41) / 7.0)
        for k in ("a", "b")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "key string, seq int, value double")
    got = {
        (r["key"], r["seq"]): (r["skew"], r["kurt"])
        for r in rolling_skew_kurt(df, "key", "seq", "value", 12).collect()
    }
    pdf = pd.DataFrame(rows, columns=["key", "seq", "value"]).sort_values(["key", "seq"])
    pdf["skew"] = pdf.groupby("key")["value"].transform(
        lambda s: s.rolling(12, min_periods=12).skew()
    )
    pdf["kurt"] = pdf.groupby("key")["value"].transform(
        lambda s: s.rolling(12, min_periods=12).kurt()
    )
    n_checked = 0
    for r in pdf.itertuples():
        gs, gk = got[(r.key, r.seq)]
        if pd.isna(r.skew):
            assert gs is None
        else:
            # raw-power-sum algebra carries ~1e-9 cancellation noise
            # near zero — inside the engine round-6 parity contract
            assert gs == _pt.approx(r.skew, rel=1e-6, abs=1e-6)
            assert gk == _pt.approx(r.kurt, rel=1e-6, abs=1e-6)
            n_checked += 1
    assert n_checked > 80
    import pytest

    with pytest.raises(ValueError, match=">= 4"):
        rolling_skew_kurt(df, "key", "seq", "value", 3)


def test_rsi_bounds_and_golden(spark):
    import pandas as pd
    import pytest as _pt

    from nt_data_pipelines_spark.operators.windows import rsi

    # monotone up -> RSI 100; monotone down -> RSI 0; mixed matches a
    # driver-side SMA-RSI computation
    rows = (
        [("up", i, float(i)) for i in range(20)]
        + [("dn", i, float(-i)) for i in range(20)]
        + [("mx", i, float(((i * 17 + 3) % 23))) for i in range(30)]
    )
    df = spark.createDataFrame(rows, "key string, seq int, value double")
    out = rsi(df, "key", "seq", "value", period=6)
    got = {(r["key"], r["seq"]): r["rsi"] for r in out.collect()}
    assert got[("up", 19)] == _pt.approx(100.0)
    assert got[("dn", 19)] == _pt.approx(0.0)
    pdf = pd.DataFrame(
        [r for r in rows if r[0] == "mx"], columns=["key", "seq", "value"]
    ).sort_values("seq")
    d = pdf["value"].diff()
    ag = d.clip(lower=0).rolling(6, min_periods=6).mean()
    al = (-d).clip(lower=0).rolling(6, min_periods=6).mean()
    want = 100 - 100 / (1 + ag / al)
    for seq, w in zip(pdf["seq"], want):
        g = got.get(("mx", seq))
        if pd.isna(w):
            assert g is None or g in (0.0, 100.0)  # al==0 edge handled via formula limit
        else:
            assert g == _pt.approx(w, rel=1e-9)


def test_robust_zscore_immune_to_outliers(spark):
    import pytest as _pt

    from nt_data_pipelines_spark.operators.windows import robust_zscore

    # 19 well-behaved points + one gross outlier per group
    rows = [("g", float(i)) for i in range(1, 20)] + [("g", 1e9)]
    rows += [("const", 5.0)] * 6
    df = spark.createDataFrame(rows, "key string, value double")
    out = {
        (r["key"], r["value"]): r["robust_z"]
        for r in robust_zscore(df, "key", "value").collect()
    }
    # 20 values -> interpolated median 10.5, MAD 5: z(10) ~ -0.067
    assert out[("g", 10.0)] == _pt.approx(0.6744897501960817 * -0.5 / 5.0)
    # the outlier is FAR out but the center/scale stayed put
    assert out[("g", 1e9)] > 1e6
    # a normal point's z is O(1) — classic z-score would be ~0 because
    # sigma exploded; robust z keeps resolution
    assert 0.5 < abs(out[("g", 15.0)]) < 2.0
    # zero-MAD (constant) group -> null, not inf
    assert out[("const", 5.0)] is None
