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
