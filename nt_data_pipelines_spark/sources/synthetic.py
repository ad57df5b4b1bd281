"""Deterministic reference-domain fixtures (FIXTURES.md Family B).

Hermetic replacements for the reference's external sources (Alpaca
bars, Wikipedia constituents, NYSE calendar — SURVEY.md §2.1
S6/S7/S9): tiny, seeded, generated driver-side and handed to
``spark.createDataFrame`` exactly like the reference hands API
responses to Polars. Sizes follow FIXTURES.md: 20 tickers x ~600
consecutive trading days (> 2 x WINDOW), 5 factor ETFs.

Edge cases baked in (FIXTURES.md "edge cases"):
- ticker T19 has < WINDOW rows (rolling ops must skip it),
- ticker TXX appears in prices but never in the universe (J1 gate
  must drop it),
- T05 exits and T06 enters the universe mid-history,
- ``raw_prices_with_dup`` carries one duplicate (ticker, date) PK row
  for upsert-idempotence tests (S5).
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nt_data_pipelines_spark.config import FACTORS

SEED = 42
N_TICKERS = 20
N_DAYS = 600
START = dt.date(2021, 1, 4)

TICKERS = [f"T{i:02d}" for i in range(N_TICKERS)]
SHORT_TICKER = "T19"  # fewer than WINDOW rows
GHOST_TICKER = "TXX"  # priced but never in universe
EXIT_TICKER = "T05"
ENTER_TICKER = "T06"


def trading_calendar(n_days: int = N_DAYS, start: dt.date = START) -> list[dt.date]:
    """Consecutive weekdays — the hermetic stand-in for the NYSE calendar."""
    out, d = [], start
    while len(out) < n_days:
        if d.weekday() < 5:
            out.append(d)
        d += dt.timedelta(days=1)
    return out


def _walk(rng: np.random.RandomState, n: int, s0: float) -> np.ndarray:
    steps = rng.normal(loc=0.0002, scale=0.015, size=n)
    return s0 * np.exp(np.cumsum(steps))


def _bars(rng: np.random.RandomState, ticker: str, dates: list[dt.date]) -> pd.DataFrame:
    n = len(dates)
    close = _walk(rng, n, s0=float(rng.uniform(20, 200)))
    spread = np.abs(rng.normal(0.005, 0.002, n))
    return pd.DataFrame(
        {
            "ticker": ticker,
            "date": pd.to_datetime(dates).date,
            "open": close * (1 + rng.normal(0, 0.003, n)),
            "high": close * (1 + spread),
            "low": close * (1 - spread),
            "close": close,
            "volume": rng.randint(1e5, 5e6, n).astype(float),
            "trade_count": rng.randint(1e3, 5e4, n).astype(float),
            "vwap": close * (1 + rng.normal(0, 0.001, n)),
        }
    )


def stock_prices_pdf(
    n_days: int = N_DAYS, tickers: list[str] | None = None
) -> pd.DataFrame:
    """Price panel; ``tickers`` overrides the 20-name fixture list.

    The override exists for BENCH-SCALE runs (bench.py `_dag_block`:
    ~500 tickers x reference-depth history, the S&P-sized panel in
    BASELINE.md) — fixture edge cases (short history, ghost ticker)
    only apply to the default list."""
    rng = np.random.RandomState(SEED)
    dates = trading_calendar(n_days)
    frames = []
    if tickers is not None:
        for t in tickers:
            frames.append(_bars(rng, t, dates))
        return pd.concat(frames, ignore_index=True)
    for t in TICKERS:
        ds = dates[-100:] if t == SHORT_TICKER else dates
        frames.append(_bars(rng, t, ds))
    frames.append(_bars(rng, GHOST_TICKER, dates))
    return pd.concat(frames, ignore_index=True)


def etf_prices_pdf(n_days: int = N_DAYS) -> pd.DataFrame:
    rng = np.random.RandomState(SEED + 1)
    dates = trading_calendar(n_days)
    return pd.concat([_bars(rng, f, dates) for f in FACTORS], ignore_index=True)


def universe_pdf(
    n_days: int = N_DAYS, tickers: list[str] | None = None
) -> pd.DataFrame:
    """Per-date constituents; EXIT_TICKER leaves and ENTER_TICKER joins
    at the midpoint (tests the point-in-time join J1 / reconstruction U5).
    With an explicit ``tickers`` list (bench scale), membership is the
    full list on every date — the churn edge cases live in the fixture
    tier, the scaled panel measures throughput."""
    dates = trading_calendar(n_days)
    if tickers is not None:
        rows = [(d, d.year, t) for d in dates for t in tickers]
        return pd.DataFrame(rows, columns=["date", "year", "ticker"])
    half = len(dates) // 2
    rows = []
    members = [t for t in TICKERS if t != ENTER_TICKER]
    for i, d in enumerate(dates):
        if i == half:
            members = [t for t in TICKERS if t != EXIT_TICKER]
        for t in members:
            if t == SHORT_TICKER and i < len(dates) - 100:
                continue
            rows.append((d, d.year, t))
    return pd.DataFrame(rows, columns=["date", "year", "ticker"])


def constituent_changes_pdf(n_days: int = N_DAYS) -> pd.DataFrame:
    """The raw Wikipedia-style change log that reproduces universe_pdf
    when walked backwards from the final membership (universe_flow.py:82-134).
    Dates are strings in '%B %d, %Y' for the strptime path (P10/F1)."""
    dates = trading_calendar(n_days)
    half = len(dates) // 2
    eff = dates[half]
    return pd.DataFrame(
        [
            {
                "effective_date": eff.strftime("%B %d, %Y"),
                "ticker": ENTER_TICKER,
                "security": f"{ENTER_TICKER} Corp",
                "reason": "Market capitalization change",
                "action": "Added",
            },
            {
                "effective_date": eff.strftime("%B %d, %Y"),
                "ticker": EXIT_TICKER,
                "security": f"{EXIT_TICKER} Corp",
                "reason": "Market capitalization change",
                "action": "Removed",
            },
        ]
    )


# ---- Spark-side constructors ----

def load_calendar(spark: SparkSession, n_days: int = N_DAYS) -> DataFrame:
    pdf = pd.DataFrame({"date": pd.to_datetime(trading_calendar(n_days)).date})
    return spark.createDataFrame(pdf)


def load_stock_prices(
    spark: SparkSession, n_days: int = N_DAYS, tickers: list[str] | None = None
) -> DataFrame:
    # year derived on the write path (stock_prices_flow.py:112-113):
    # the prices tables partition by it, so ranged reads prune years
    return spark.createDataFrame(stock_prices_pdf(n_days, tickers)).withColumn(
        "year", F.year("date")
    )


def load_etf_prices(spark: SparkSession, n_days: int = N_DAYS) -> DataFrame:
    return spark.createDataFrame(etf_prices_pdf(n_days)).withColumn("year", F.year("date"))


def load_universe(
    spark: SparkSession, n_days: int = N_DAYS, tickers: list[str] | None = None
) -> DataFrame:
    return spark.createDataFrame(universe_pdf(n_days, tickers))


def load_constituent_changes(spark: SparkSession, n_days: int = N_DAYS) -> DataFrame:
    return spark.createDataFrame(constituent_changes_pdf(n_days))


def raw_prices_with_dup(spark: SparkSession, n_days: int = 40) -> DataFrame:
    pdf = stock_prices_pdf(n_days)
    dup = pdf.iloc[[0]].copy()
    dup["close"] = 999.0  # later duplicate must win after optimize()
    return spark.createDataFrame(pd.concat([pdf, dup], ignore_index=True))
