"""Streaming EWMA: state carries across micro-batches and matches batch pandas."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from nt_data_pipelines_spark.streaming.incremental import EVENT_SCHEMA
from nt_data_pipelines_spark.streaming.stateful import streaming_ewma

HL = 10.0


def _mk_events(start_id, day, n, rng):
    base = dt.datetime(2024, 1, day)
    return [
        (
            start_id + i,
            base + dt.timedelta(minutes=i),
            i % 3,  # three keys
            "view",
            float(rng.uniform(1, 100)),
            "{}",
        )
        for i in range(n)
    ]


def test_streaming_ewma_matches_batch_across_batches(spark, tmp_path):
    rng = np.random.RandomState(31)
    src = str(tmp_path / "stream_src")
    # two files -> two micro-batches (maxFilesPerTrigger=1); file 1 is
    # strictly earlier than file 2, so per-key cross-batch order holds
    batch1 = _mk_events(0, 1, 60, rng)
    batch2 = _mk_events(1000, 2, 60, rng)
    spark.createDataFrame(batch1, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_ewma(stream, half_life=HL)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from ewma_out").toPandas()
    assert len(got) == 120
    assert spark.sql(
        "select count(distinct batch_n) from (select n_seen div 60 as batch_n from ewma_out)"
    ).first()[0] >= 1

    # golden: plain pandas ewm over the concatenated per-key series
    all_rows = pd.DataFrame(batch1 + batch2, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    for k in (0, 1, 2):
        series = all_rows[all_rows.user_id == k].sort_values("ts")["value"]
        want = series.ewm(halflife=HL, adjust=True).mean().to_numpy()
        got_k = got[got.user_id == k].sort_values("ts")["ewma"].to_numpy()
        np.testing.assert_allclose(got_k, want, rtol=1e-12)

    # n_seen is cumulative per key -> proves state crossed the batch boundary
    last_seen = got.groupby("user_id")["n_seen"].max()
    assert (last_seen == 40).all()  # 120 rows / 3 keys, carried across 2 batches


def test_streaming_ewma_resume_from_checkpoint(spark, tmp_path):
    rng = np.random.RandomState(32)
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    spark.createDataFrame(_mk_events(0, 1, 30, rng), EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    def drain(qname):
        # memory sink can't resume from a checkpoint; foreachBatch can
        collected: list = []
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
        q = (
            streaming_ewma(stream, half_life=HL)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, _epoch: collected.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return pd.DataFrame([r.asDict() for r in collected])

    first = drain("ewma_r1")
    assert len(first) == 30

    # new data arrives; a NEW query run resumes from the checkpointed state
    spark.createDataFrame(_mk_events(1000, 2, 30, rng), EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    second = drain("ewma_r2")
    assert len(second) == 30  # only the new rows (append mode)
    assert second["n_seen"].max() == 20  # 60 rows / 3 keys, cumulative

def test_streaming_drawdown_matches_batch_across_batches(spark, tmp_path):
    from nt_data_pipelines_spark.streaming.stateful import streaming_drawdown

    rng = np.random.RandomState(7)
    src = str(tmp_path / "dd_src")
    batch1 = _mk_events(0, 1, 60, rng)
    batch2 = _mk_events(1000, 2, 60, rng)
    spark.createDataFrame(batch1, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_drawdown(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dd_out")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from dd_out").toPandas()
    assert len(got) == 120

    all_rows = pd.DataFrame(
        batch1 + batch2,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )
    for k in (0, 1, 2):
        series = all_rows[all_rows.user_id == k].sort_values("ts")["value"]
        want_peak = series.cummax().to_numpy()
        want_dd = series.to_numpy() / want_peak - 1.0
        gk = got[got.user_id == k].sort_values("ts")
        np.testing.assert_allclose(gk["running_peak"].to_numpy(), want_peak, rtol=0)
        np.testing.assert_allclose(gk["drawdown"].to_numpy(), want_dd, rtol=1e-12)
    # the peak survives the batch boundary: batch-2 rows see batch-1 highs
    k0 = got[got.user_id == 0].sort_values("ts")
    assert k0["running_peak"].to_numpy()[60 // 3] >= k0["running_peak"].to_numpy()[0]


def test_streaming_rsi_matches_batch_wilder(spark, tmp_path):
    """Wilder RSI carried across micro-batches equals a driver-side
    batch Wilder computation over the concatenated series."""
    from nt_data_pipelines_spark.streaming.stateful import streaming_rsi

    rng = np.random.RandomState(7)
    src = str(tmp_path / "rsi_src")
    batch1 = _mk_events(0, 1, 45, rng)
    batch2 = _mk_events(1000, 2, 45, rng)
    spark.createDataFrame(batch1, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(batch2, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    period = 6
    out = streaming_rsi(stream, period=period)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("rsi_out")
        .option("checkpointLocation", str(tmp_path / "rsi_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from rsi_out").toPandas()
    assert len(got) == 90

    # driver-side Wilder golden over the full concatenated series
    full = pd.DataFrame(
        batch1 + batch2,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).sort_values(["user_id", "ts"])
    for key, grp in full.groupby("user_id"):
        vals = grp["value"].tolist()
        ag = al = 0.0
        n = 0
        want = [None]  # first row: no diff
        for prev, x in zip(vals, vals[1:]):
            d = x - prev
            g, lo = max(d, 0.0), max(-d, 0.0)
            n += 1
            if n < period:
                ag, al = ag + g, al + lo
                want.append(None)
            elif n == period:
                ag, al = (ag + g) / period, (al + lo) / period
                want.append(100.0 if al == 0 else 100 - 100 / (1 + ag / al))
            else:
                ag = (ag * (period - 1) + g) / period
                al = (al * (period - 1) + lo) / period
                want.append(100.0 if al == 0 else 100 - 100 / (1 + ag / al))
        series = (
            got[got["user_id"] == key].sort_values("ts")["rsi"].tolist()
        )
        assert len(series) == len(want)
        for g_, w_ in zip(series, want):
            if w_ is None:
                assert g_ is None or pd.isna(g_)
            else:
                assert g_ == pytest.approx(w_, rel=1e-12)


def _run_stateful(spark, tmp_path, rows, op, name):
    src = str(tmp_path / f"{name}_src")
    spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        op(stream).writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"select * from {name}").toPandas()


def test_streaming_ewma_null_value_does_not_poison_state(spark, tmp_path):
    """Regression (review finding): a single null tick made the
    CHECKPOINTED num/den NaN forever. It must instead decay the
    weights one step and re-emit the carried mean — pandas
    ewm(adjust=True, ignore_na=False) semantics."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 0, "view", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 0, "view", None, "{}"),
        (3, base + dt.timedelta(minutes=2), 0, "view", 3.0, "{}"),
    ]
    got = _run_stateful(
        spark, tmp_path, rows, lambda s: streaming_ewma(s, half_life=HL), "ewma_null"
    ).sort_values("ts")
    want = pd.Series([1.0, None, 3.0]).ewm(halflife=HL, adjust=True).mean()
    np.testing.assert_allclose(got["ewma"].to_numpy(), want.to_numpy(), rtol=1e-12)
    assert list(got["n_seen"]) == [1, 1, 2]  # the null row counts no observation


def test_streaming_rsi_null_value_skipped(spark, tmp_path):
    """Regression (review finding): a null tick must be skipped —
    max(NaN, 0) poisoned the smoothed averages permanently."""
    from nt_data_pipelines_spark.streaming.stateful import streaming_rsi

    base = dt.datetime(2024, 1, 1)
    vals = [10.0, 11.0, None, 12.0, 9.0, 13.0]
    rows = [
        (i, base + dt.timedelta(minutes=i), 0, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    got = _run_stateful(
        spark, tmp_path, rows, lambda s: streaming_rsi(s, period=3), "rsi_null"
    ).sort_values("ts")
    # same series with the null removed: identical diffs, shifted rows
    clean = [v for v in vals if v is not None]
    rows2 = [
        (i, base + dt.timedelta(minutes=i), 0, "view", v, "{}")
        for i, v in enumerate(clean)
    ]
    want = _run_stateful(
        spark, tmp_path, rows2, lambda s: streaming_rsi(s, period=3), "rsi_clean"
    ).sort_values("ts")
    got_vals = [r for r in got["rsi"] if not pd.isna(r)]
    want_vals = [r for r in want["rsi"] if not pd.isna(r)]
    np.testing.assert_allclose(got_vals, want_vals, rtol=1e-12)
    assert pd.isna(got.iloc[2]["rsi"])  # the null row emits null
