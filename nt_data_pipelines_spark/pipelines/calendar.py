"""Trading-calendar utilities (reference: utils/calendar.py, calendar_flow.py).

- ``last_market_date``: global max over the calendar table (A3,
  utils/calendar.py:8-12)
- ``trading_date_range``: trailing-N trading dates via desc sort +
  limit (O3, utils/calendar.py:15-19)
- ``freshness_gate``: the daily flows' T2 precondition — proceed only
  when the calendar's last market date equals "yesterday"
  (stock_prices_flow.py:135-144, repeated across every daily flow)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def last_market_date(calendar: DataFrame) -> dt.date:
    return calendar.agg(F.max("date").alias("d")).first()["d"]


def trading_date_range(calendar: DataFrame, window: int) -> DataFrame:
    """Last ``window`` trading dates (the incremental-slice lookback, T3)."""
    return calendar.select("date").distinct().orderBy(F.desc("date")).limit(window)


def freshness_gate(calendar: DataFrame, today: dt.date) -> bool:
    """True when yesterday was the most recent market date — the daily
    flows skip their run otherwise (T2)."""
    return last_market_date(calendar) == today - dt.timedelta(days=1)
