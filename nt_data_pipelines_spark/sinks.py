"""Side-output sinks (SURVEY.md §2.1 S12/S13).

The reference's sinks are driver-side consumers of tiny collected
results: Slack Block-Kit summaries (utils/slack_daily_summary.py) and
broker market orders iterated from rows (trading_flow.py:108-135).
Engine-side that is exactly ``collect()`` on a final small DataFrame;
the transports are pluggable so pipelines stay hermetic — a webhook/
broker client implements the same Protocol in production.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Protocol

from pyspark.sql import DataFrame


class MessageSink(Protocol):
    def send(self, text: str) -> None: ...


class OrderSink(Protocol):
    def market_order(self, ticker: str, notional: float) -> None: ...

    def close_position(self, ticker: str) -> None: ...


@dataclass
class RecordingMessageSink:
    """In-memory sink (tests / dry runs)."""

    messages: list[str] = field(default_factory=list)

    def send(self, text: str) -> None:
        self.messages.append(text)


@dataclass
class RecordingBroker:
    orders: list[tuple[str, float]] = field(default_factory=list)
    closed: list[str] = field(default_factory=list)

    def market_order(self, ticker: str, notional: float) -> None:
        self.orders.append((ticker, notional))

    def close_position(self, ticker: str) -> None:
        self.closed.append(ticker)


def place_orders(deltas: DataFrame, broker: OrderSink) -> int:
    """Row-iterating order sink: buy positive deltas, sell negative
    (trading_flow.py:108-135). The input is the tiny final
    notional-delta frame — collect() then loop is the correct shape."""
    n = 0
    for row in deltas.collect():
        broker.market_order(row["ticker"], float(row["notional_delta"]))
        n += 1
    return n


def close_positions(to_close: DataFrame, broker: OrderSink) -> int:
    n = 0
    for row in to_close.collect():
        broker.close_position(row["ticker"])
        n += 1
    return n


def daily_summary(deltas: DataFrame, equity: float, sink: MessageSink, top_k: int = 3) -> str:
    """Top-k buys/sells + totals, formatted driver-side
    (utils/slack_daily_summary.py:27-44)."""
    rows = deltas.collect()
    buys = sorted((r for r in rows if r["notional_delta"] > 0), key=lambda r: -r["notional_delta"])
    sells = sorted((r for r in rows if r["notional_delta"] < 0), key=lambda r: r["notional_delta"])
    lines = [f"equity: {equity:,.2f}", f"trades: {len(rows)}"]
    lines += [f"buy {r['ticker']} {r['notional_delta']:,.2f}" for r in buys[:top_k]]
    lines += [f"sell {r['ticker']} {r['notional_delta']:,.2f}" for r in sells[:top_k]]
    text = "\n".join(lines)
    sink.send(text)
    return text
