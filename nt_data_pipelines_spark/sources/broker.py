"""Broker-state sources (SURVEY.md §2.1 S10/S11).

The reference pulls account equity, open positions, and a per-minute
equity curve from the broker REST API on the driver
(trading_flow.py:17-20,34-44; portfolio_history_flow.py:15-41). Both
are tiny driver-side fetches handed to the engine as DataFrames; the
client is a Protocol so tests run hermetically.

portfolio_history semantics: epoch seconds -> UTC timestamps
(portfolio_history_flow.py:40 ``from_epoch + convert_time_zone(UTC)``
-> ``F.timestamp_seconds`` with the session pinned to UTC).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POSITION_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("notional", T.DoubleType()),
    ]
)

HISTORY_SCHEMA = T.StructType(
    [
        T.StructField("epoch", T.LongType()),
        T.StructField("equity", T.DoubleType()),
    ]
)


class BrokerClient(Protocol):
    def account_equity(self) -> float: ...

    def positions(self) -> list[tuple[str, float]]: ...

    def portfolio_history(self) -> list[tuple[int, float]]: ...


@dataclass
class SyntheticBroker:
    """Deterministic in-memory broker for hermetic pipeline runs."""

    equity: float = 1_000_000.0
    holdings: list[tuple[str, float]] = field(default_factory=list)
    history: list[tuple[int, float]] = field(default_factory=list)

    def account_equity(self) -> float:
        return self.equity

    def positions(self) -> list[tuple[str, float]]:
        return list(self.holdings)

    def portfolio_history(self) -> list[tuple[int, float]]:
        return list(self.history)


FILL_SCHEMA = T.StructType(
    [
        T.StructField("order_id", T.StringType()),
        T.StructField("ticker", T.StringType()),
        T.StructField("side", T.StringType()),
        T.StructField("filled_qty", T.DoubleType()),
        T.StructField("filled_avg_price", T.DoubleType()),
        T.StructField("filled_at", T.TimestampType()),
    ]
)


def load_fills(spark: SparkSession, client) -> DataFrame:
    """Today's filled orders -> DataFrame with computed notional
    (reference trading_flow.py:173-221: closed orders since market
    open, kept when filled_at is set and filled_qty > 0, notional =
    qty x avg price). The broker returns a driver-sized list; the
    filter/derive runs engine-side."""
    rows = [
        (
            str(o["order_id"]),
            o["ticker"],
            o["side"],
            float(o["filled_qty"] or 0),
            float(o["filled_avg_price"] or 0),
            o["filled_at"],
        )
        for o in client.filled_orders()
    ]
    raw = spark.createDataFrame(rows or [], FILL_SCHEMA)
    return raw.filter(F.col("filled_at").isNotNull() & (F.col("filled_qty") > 0)).withColumn(
        "notional", F.round(F.col("filled_qty") * F.col("filled_avg_price"), 2)
    )


def load_positions(spark: SparkSession, client: BrokerClient) -> DataFrame:
    return spark.createDataFrame(client.positions() or [], POSITION_SCHEMA)


def load_portfolio_history(spark: SparkSession, client: BrokerClient) -> DataFrame:
    """-> (timestamp: UTC, equity) — the portfolio_history table shape
    (reference schema at portfolio_history_flow.py:74-83)."""
    raw = spark.createDataFrame(client.portfolio_history() or [], HISTORY_SCHEMA)
    return raw.select(
        F.timestamp_seconds("epoch").alias("timestamp"),
        "equity",
    )
