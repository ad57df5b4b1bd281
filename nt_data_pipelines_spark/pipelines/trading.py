"""Trading-flow DataFrame stages (reference: pipelines/trading_flow.py).

The order-placement loop and broker polling are driver-side sinks
(S10/S13 — ``collect()`` then iterate); the *engine* stages are the
DataFrame computations reproduced here:

- target notionals: weight x equity, clipped at 0, rounded to cents
  (trading_flow.py:24-30)
- positions to close: currently-held tickers whose target is <= 0
  (trading_flow.py:75-86 — is_in + not idiom = semi/anti join)
- notional deltas: full-outer join of target vs current notionals,
  key coalesce, zero-fill, >= $1 magnitude filter, desc sort
  (trading_flow.py:47-72)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trading_daily_flow(
    catalog,
    broker,
    message_sink,
    today,
    max_wait_minutes: float = 10,
    check_interval_seconds: float = 60,
    sleep=None,
) -> dict:
    """The query->action loop (reference: trading_flow.py:268-304).

    Gate on market freshness, read the latest portfolio weights, diff
    against held positions, close dead positions, place the delta
    orders, poll until the orders fill (10-min budget, reference
    trading_flow.py:137-170), then reconcile: fetch today's ACTUAL
    fills and emit the fill summary alongside the intent summary
    (trading_flow.py:173-244). Brokers without order-status queries
    skip the polling tier. ``sleep`` is injectable for tests.

    Returns a small dict of what happened (for tests/logging).
    """
    import time as _time

    from pyspark.sql import functions as F

    from nt_data_pipelines_spark.pipelines.calendar import last_market_date, market_is_open
    from nt_data_pipelines_spark.sinks import (
        close_positions,
        daily_summary,
        fills_summary,
        place_orders,
        wait_for_orders_to_fill,
    )
    from nt_data_pipelines_spark.sources.broker import load_fills, load_positions

    cal = catalog.table("calendar")
    # Gate on today being a TRADING date, not on data freshness: the
    # reference trades every open market day, reading the weights of
    # the last market date strictly before today (Monday uses
    # Friday's; Saturday never runs). trading_flow.py:262-276.
    if not market_is_open(cal, today):
        return {"ran": False, "reason": "market closed"}
    # Cancel any open orders left over from a prior run FIRST
    # (trading_flow.py:283-286): a stale unfilled order would otherwise
    # survive into today and double-execute against the fresh deltas
    # computed below. Unconditional — cancelling an empty book is a
    # no-op (the reference's open-orders pre-check only saves an API
    # call). Brokers without order management skip the step.
    n_cancelled = broker.cancel_all_orders() if hasattr(broker, "cancel_all_orders") else 0
    end = last_market_date(cal, before=today)

    weights = (
        catalog.table("portfolio_weights")
        .filter(F.col("date") == F.lit(end))
        .select("ticker", "weight")
    )
    if weights.limit(1).count() == 0:
        raise ValueError("No values found: no portfolio weights for last market date")

    equity = broker.account_equity()
    positions = load_positions(catalog.spark, broker)
    targets = target_notionals(weights, equity)
    to_close = positions_to_close(targets, positions)
    deltas = notional_deltas(targets, positions, closing=to_close)

    n_closed = close_positions(to_close, broker)
    n_orders = place_orders(deltas, broker)
    summary = daily_summary(deltas, equity, message_sink)
    result = {
        "ran": True,
        "cancelled": n_cancelled,
        "closed": n_closed,
        "orders": n_orders,
        "summary": summary,
    }
    if hasattr(broker, "open_orders") and hasattr(broker, "filled_orders"):
        result["all_filled"] = wait_for_orders_to_fill(
            broker,
            max_wait_minutes=max_wait_minutes,
            check_interval_seconds=check_interval_seconds,
            sleep=sleep or _time.sleep,
        )
        fills = load_fills(catalog.spark, broker)
        result["fills"] = fills.count()
        if hasattr(message_sink, "send_blocks"):
            # rich Block-Kit-style summary with positions, for sinks
            # that support it (utils/slack_daily_summary.py:47-202)
            from nt_data_pipelines_spark.summary import send_daily_trading_summary

            # re-load AFTER fills: the pre-trade snapshot from above
            # would report yesterday's book (closed positions still
            # listed, new buys missing) in the reconciliation summary
            post_positions = load_positions(catalog.spark, broker)
            result["fill_summary"], _ = send_daily_trading_summary(
                fills, equity, message_sink, positions=post_positions
            )
        else:
            result["fill_summary"] = fills_summary(fills, equity, message_sink)
    return result


def target_notionals(weights: DataFrame, equity: float) -> DataFrame:
    """(ticker, weight) -> (ticker, target_notional>=0, cents)."""
    return weights.select(
        "ticker",
        F.round(F.greatest(F.col("weight") * F.lit(equity), F.lit(0.0)), 2).alias(
            "target_notional"
        ),
    )


def positions_to_close(targets: DataFrame, positions: DataFrame) -> DataFrame:
    """Held tickers with target <= 0 -> close list (left_semi on holdings)."""
    closeable = targets.filter(F.col("target_notional") <= 0).select("ticker")
    return positions.join(closeable, "ticker", "left_semi").select("ticker", "notional")


def notional_deltas(
    targets: DataFrame,
    positions: DataFrame,
    exclude_closing: bool = True,
    closing: DataFrame | None = None,
) -> DataFrame:
    """Full-outer target-vs-held diff -> per-ticker trade notionals.

    delta > 0: buy, delta < 0: sell; trades under $1 dropped.

    ``exclude_closing`` drops tickers that positions_to_close already
    handles (held with target <= 0) — the reference excludes them from
    the delta frame (trading_flow.py:67-70 ``is_in(...).not_()``) so
    the close and the market sell are never both submitted. Pass the
    already-computed ``closing`` frame to avoid re-deriving it.
    """
    if exclude_closing:
        if closing is None:
            closing = positions_to_close(targets, positions)
        closing = closing.select("ticker")
        positions = positions.join(closing, "ticker", "left_anti")
        targets = targets.join(closing, "ticker", "left_anti")
    t = targets.alias("t")
    p = positions.select("ticker", F.col("notional").alias("current_notional")).alias("p")
    j = t.join(p, F.col("t.ticker") == F.col("p.ticker"), "full_outer")
    target = F.coalesce(F.col("t.target_notional"), F.lit(0.0))
    current = F.coalesce(F.col("p.current_notional"), F.lit(0.0))
    return (
        j.select(
            F.coalesce(F.col("t.ticker"), F.col("p.ticker")).alias("ticker"),
            target.alias("target_notional"),
            current.alias("current_notional"),
            F.round(target - current, 2).alias("notional_delta"),
        )
        .filter(F.abs(F.col("notional_delta")) >= 1.0)
        .sort(F.desc("notional_delta"))
    )
