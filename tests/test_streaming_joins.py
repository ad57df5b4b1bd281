"""Stream-static enrich and watermarked stream-stream joins."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from nt_data_pipelines_spark.streaming import (
    streaming_enrich,
    streaming_stream_join,
)
from nt_data_pipelines_spark.streaming.incremental import EVENT_SCHEMA

DIM_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("weight", T.DoubleType()),
    ]
)


def _events(spark, path, n=20):
    base = dt.datetime(2024, 1, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, ["view", "click"][i % 2], float(i), "{}")
        for i in range(n)
    ]
    spark.createDataFrame(rows, EVENT_SCHEMA).write.mode("overwrite").parquet(path)


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    src = str(tmp_path / "ev")
    _events(spark, src)
    dim = spark.createDataFrame([("view", 1.0), ("click", 2.0)], DIM_SCHEMA)
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(src)
    q = (
        streaming_enrich(stream, dim, "event_type")
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["event_id"]: r["weight"] for r in spark.sql("select * from enriched").collect()}
    batch = {
        r["event_id"]: r["weight"]
        for r in streaming_enrich(
            spark.read.schema(EVENT_SCHEMA).parquet(src), dim, "event_type"
        ).collect()
    }
    assert got == batch and len(got) == 20


def test_stream_stream_join_within_range(spark, tmp_path):
    """Clicks join views on user within 10 minutes AFTER the view —
    the watermark+range combination that bounds both buffers."""
    base = dt.datetime(2024, 1, 1, 1)
    views, clicks = [], []
    for i in range(10):
        views.append((i, base + dt.timedelta(minutes=5 * i), i % 2, "view", 0.0, "{}"))
    # click 1: 6 min after view for the same user -> inside the window
    clicks.append((100, base + dt.timedelta(minutes=6), 0, "click", 1.0, "{}"))
    # click 2: for user 1, 200 minutes later -> outside every view's range
    clicks.append((101, base + dt.timedelta(minutes=200), 1, "click", 1.0, "{}"))
    vp, cp = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(views, EVENT_SCHEMA).write.parquet(vp)
    spark.createDataFrame(clicks, EVENT_SCHEMA).write.parquet(cp)
    vs = spark.readStream.schema(EVENT_SCHEMA).parquet(vp)
    cs = spark.readStream.schema(EVENT_SCHEMA).parquet(cp)
    joined = streaming_stream_join(
        cs, vs, on="user_id", watermark="4 hours", within="10 minutes"
    )
    # the output carries UNIQUE names (left columns bare, right's
    # clashing columns right_-prefixed) — composable with by-name sinks
    assert len(set(joined.columns)) == len(joined.columns)
    assert "right_event_id" in joined.columns and "right_ts" in joined.columns
    q = (
        joined.select("event_id", "right_event_id").toDF("click_id", "view_id")
        .writeStream.format("memory")
        .queryName("cv")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["click_id"], r["view_id"]) for r in spark.sql("select * from cv").collect()}
    # click 100 (t=6min, user 0) matches views at t=0 (v0) and t=5min... user 0
    # views are at minutes 0,10,20,30,40 (i even). Within [t-10, t]: minutes 0 and...
    # minute 0 (id 0) only — minute 10 is after the click (range is views BEFORE).
    assert got == {(100, 0)}
