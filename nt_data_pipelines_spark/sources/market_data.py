"""Market-data source adapters (SURVEY.md §2.1 S7/S8/S10/S11).

The reference fetches daily OHLCV bars from a broker REST API on the
driver and hands the frame to the engine (stock_prices_flow.py:26-69),
chunking long ranges into per-year requests (:73-90). The engine-side
contract — explicit schema, empty-result preservation, per-chunk
union — is reproduced here against a pluggable client so pipelines
run hermetically; a real HTTP client drops in without touching the
Spark side.

At scale the driver-side fetch is the right shape for API sources
(rate-limited, credentialed); the parallel-fetch variant distributes
chunk requests with ``spark.range(n_chunks)`` + ``mapInPandas`` when
the API allows many concurrent readers.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable
from functools import reduce
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

BAR_SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("open", T.DoubleType()),
        T.StructField("high", T.DoubleType()),
        T.StructField("low", T.DoubleType()),
        T.StructField("close", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
        T.StructField("trade_count", T.DoubleType()),
        T.StructField("vwap", T.DoubleType()),
    ]
)


class BarClient(Protocol):
    """The reference's Alpaca client surface (clients/alpaca.py)."""

    def get_bars(
        self, symbols: list[str], start: dt.date, end: dt.date
    ) -> pd.DataFrame: ...


class SyntheticBarClient:
    """Deterministic in-process client backed by the Family-B fixture."""

    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def get_bars(self, symbols: list[str], start: dt.date, end: dt.date) -> pd.DataFrame:
        m = self._pdf
        out = m[(m.ticker.isin(symbols)) & (m.date >= start) & (m.date <= end)]
        return out.reset_index(drop=True)


def year_chunks(start: dt.date, end: dt.date) -> Iterable[tuple[dt.date, dt.date]]:
    """Split [start, end] into per-calendar-year requests
    (stock_prices_flow.py:73-90)."""
    y = start.year
    while y <= end.year:
        lo = max(start, dt.date(y, 1, 1))
        hi = min(end, dt.date(y, 12, 31))
        yield lo, hi
        y += 1


def fetch_bars(
    spark: SparkSession,
    client: BarClient,
    symbols: list[str],
    start: dt.date,
    end: dt.date,
) -> DataFrame:
    """Chunked fetch -> per-chunk DataFrames -> unionByName.

    Empty API responses keep the declared schema (the reference builds
    an explicitly-typed empty frame, stock_prices_flow.py:42-55) so
    downstream plans never see a schema-less frame.
    """
    chunks = []
    for lo, hi in year_chunks(start, end):
        pdf = client.get_bars(symbols, lo, hi)
        if len(pdf) == 0:
            chunks.append(spark.createDataFrame([], BAR_SCHEMA))
        else:
            chunks.append(spark.createDataFrame(pdf[[f.name for f in BAR_SCHEMA.fields]], BAR_SCHEMA))
    if not chunks:
        return spark.createDataFrame([], BAR_SCHEMA)
    return reduce(DataFrame.unionByName, chunks)
