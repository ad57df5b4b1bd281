"""Side-output sinks (SURVEY.md §2.1 S12/S13).

The reference's sinks are driver-side consumers of tiny collected
results: Slack Block-Kit summaries (utils/slack_daily_summary.py) and
broker market orders iterated from rows (trading_flow.py:108-135).
Engine-side that is exactly ``collect()`` on a final small DataFrame;
the transports are pluggable so pipelines stay hermetic — a webhook/
broker client implements the same Protocol in production.
"""

from __future__ import annotations

import datetime as dt
import time
from dataclasses import dataclass, field
from typing import Callable, Protocol

from pyspark.sql import DataFrame


class MessageSink(Protocol):
    def send(self, text: str) -> None: ...


class OrderSink(Protocol):
    def market_order(self, ticker: str, notional: float) -> None: ...

    def close_position(self, ticker: str) -> None: ...

    def cancel_all_orders(self) -> int:
        """Cancel every open order; returns how many were cancelled
        (reference trading_flow.py:101-104 cancel_all_orders). The
        daily flow calls this first so a stale unfilled order from a
        prior run can never double-execute against today's deltas;
        cancelling an empty book is a no-op, so the call is
        unconditional (the reference's len(open_orders)>0 pre-check
        only saves an API round-trip)."""
        ...


class OrderStatusSource(Protocol):
    """Order lifecycle queries (reference trading_flow.py:137-221).

    ``open_orders``: orders accepted but not yet fully filled.
    ``filled_orders``: today's closed orders that actually filled
    (filled_at set, filled_qty > 0), as driver-sized dicts with keys
    ticker/side/filled_qty/filled_avg_price/filled_at/order_id.
    """

    def open_orders(self) -> list[dict]: ...

    def filled_orders(self) -> list[dict]: ...


@dataclass
class RecordingMessageSink:
    """In-memory sink (tests / dry runs)."""

    messages: list[str] = field(default_factory=list)

    def send(self, text: str) -> None:
        self.messages.append(text)


@dataclass
class RecordingBroker:
    """Order sink + order-status double with a controllable fill clock.

    Placed market orders sit open until ``open_orders`` has been
    polled ``fill_after_polls`` times, then fill at ``fill_price`` —
    so tests can drive both the happy path (default: instant fill)
    and the poll-timeout path (set it above the poll budget).
    """

    orders: list[tuple[str, float]] = field(default_factory=list)
    closed: list[str] = field(default_factory=list)
    cancelled: list[dict] = field(default_factory=list)
    fill_after_polls: int = 0
    fill_price: float = 100.0
    _open: list[dict] = field(default_factory=list)
    _filled: list[dict] = field(default_factory=list)
    _polls: int = 0

    def market_order(self, ticker: str, notional: float) -> None:
        self.orders.append((ticker, notional))
        self._open.append(
            {
                "order_id": f"o{len(self.orders)}",
                "ticker": ticker,
                "side": "buy" if notional > 0 else "sell",
                "notional": notional,
            }
        )

    def close_position(self, ticker: str) -> None:
        self.closed.append(ticker)

    def cancel_all_orders(self) -> int:
        """Cancel whatever is still open — cancelled orders never fill
        (they leave the open book before any poll can fill them)."""
        n = len(self._open)
        self.cancelled.extend(self._open)
        self._open = []
        return n

    def _fill_all(self) -> None:
        base = dt.datetime(2024, 1, 2, 14, 30)  # deterministic fill stamps
        for o in self._open:
            qty = abs(o["notional"]) / self.fill_price
            self._filled.append(
                {
                    "order_id": o["order_id"],
                    "ticker": o["ticker"],
                    "side": o["side"],
                    "filled_qty": qty,
                    "filled_avg_price": self.fill_price,
                    "filled_at": base + dt.timedelta(minutes=len(self._filled)),
                }
            )
        self._open = []

    def open_orders(self) -> list[dict]:
        self._polls += 1
        if self._polls > self.fill_after_polls:
            self._fill_all()
        return list(self._open)

    def filled_orders(self) -> list[dict]:
        return list(self._filled)


def wait_for_orders_to_fill(
    broker: OrderStatusSource,
    max_wait_minutes: float = 10,
    check_interval_seconds: float = 60,
    sleep: Callable[[float], None] = time.sleep,
) -> bool:
    """Poll until no open orders remain or the wait budget runs out
    (reference trading_flow.py:137-170). True = all filled; False =
    timed out with orders still open. ``sleep`` is injectable so tests
    drive the clock without real waiting."""
    elapsed = 0.0
    while elapsed < max_wait_minutes * 60:
        if not broker.open_orders():
            return True
        sleep(check_interval_seconds)
        elapsed += check_interval_seconds
    return False


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


def fills_summary(fills: DataFrame, equity: float, sink: MessageSink, top_k: int = 3) -> str:
    """Reconciled end-of-day summary over ACTUAL fills, not intents
    (reference trading_flow.py:227-244: send_daily_trading_summary runs
    on get_todays_filled_orders output). Top-k buys/sells by filled
    notional + totals."""
    rows = fills.collect()
    buys = sorted((r for r in rows if r["side"] == "buy"), key=lambda r: -r["notional"])
    sells = sorted((r for r in rows if r["side"] == "sell"), key=lambda r: -r["notional"])
    lines = [f"equity: {equity:,.2f}", f"fills: {len(rows)}"]
    lines += [f"filled buy {r['ticker']} {r['notional']:,.2f}" for r in buys[:top_k]]
    lines += [f"filled sell {r['ticker']} {r['notional']:,.2f}" for r in sells[:top_k]]
    text = "\n".join(lines)
    # one delivery contract codebase-wide (send_blocks preferred,
    # well-formed mrkdwn section) — a blocks-only sink must not crash
    # with AttributeError AFTER orders are already live at the broker
    from nt_data_pipelines_spark.summary import deliver

    deliver(sink, text)
    return text


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
    # one delivery contract codebase-wide (send_blocks preferred,
    # well-formed mrkdwn section) — a blocks-only sink must not crash
    # with AttributeError AFTER orders are already live at the broker
    from nt_data_pipelines_spark.summary import deliver

    deliver(sink, text)
    return text
