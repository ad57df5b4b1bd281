"""Broker-state sources (S10/S11): positions, equity curve timestamps."""

from __future__ import annotations

import datetime as dt

from nt_data_pipelines_spark.sources.broker import (
    SyntheticBroker,
    load_portfolio_history,
    load_positions,
)


def test_positions_and_empty(spark):
    broker = SyntheticBroker(holdings=[("A", 100.0), ("B", 50.5)])
    got = {r["ticker"]: r["notional"] for r in load_positions(spark, broker).collect()}
    assert got == {"A": 100.0, "B": 50.5}
    empty = load_positions(spark, SyntheticBroker())
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["ticker", "notional"]


def test_portfolio_history_ingestion_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.catalog import Catalog
    from nt_data_pipelines_spark.pipelines.runner import ensure_tables, ingest_portfolio_history

    cat = Catalog(spark, str(tmp_path / "lake"))
    ensure_tables(cat)
    epoch = int(dt.datetime(2024, 1, 2, 14, 30, tzinfo=dt.timezone.utc).timestamp())
    broker = SyntheticBroker(history=[(epoch, 100.0), (epoch + 60, 101.0)])
    ingest_portfolio_history(spark, cat, broker)
    assert cat.table("portfolio_history").count() == 2
    # re-ingesting an overlapping curve upserts (PK = timestamp)
    broker.history = [(epoch + 60, 999.0), (epoch + 120, 102.0)]
    ingest_portfolio_history(spark, cat, broker)
    got = {r["timestamp"]: r["equity"] for r in cat.table("portfolio_history").collect()}
    assert len(got) == 3
    assert got[dt.datetime(2024, 1, 2, 14, 31)] == 999.0  # last write won


def test_portfolio_history_epoch_to_utc(spark):
    # 2024-01-02 14:30:00 UTC
    epoch = int(dt.datetime(2024, 1, 2, 14, 30, tzinfo=dt.timezone.utc).timestamp())
    broker = SyntheticBroker(history=[(epoch, 12345.5), (epoch + 60, 12346.0)])
    rows = load_portfolio_history(spark, broker).orderBy("timestamp").collect()
    # session timezone is UTC, so naive timestamps read back as UTC wall time
    assert rows[0]["timestamp"] == dt.datetime(2024, 1, 2, 14, 30)
    assert rows[1]["timestamp"] == dt.datetime(2024, 1, 2, 14, 31)
    assert rows[0]["equity"] == 12345.5
