"""Point-in-time universe reconstruction (reference: universe_flow.py:82-134).

Start from the *current* constituent set, walk the trading calendar
backwards, and invert each Added/Removed change to recover historical
membership; snapshot per date.

The input is tiny (~500 tickers, ~few hundred change rows), so like
the reference this runs the backward walk driver-side and hands the
snapshots to Spark as (date, [tickers]) rows that ``explode`` into
the (date, year, ticker) table (SURVEY.md §2.10 U5). The Spark-native
alternative — turning the change log into validity intervals and
range-joining the calendar — only pays off when membership data is
itself large.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_changes(changes: DataFrame) -> DataFrame:
    """Raw change log with '%B %d, %Y' string dates -> typed rows
    (universe_flow.py:76 strptime)."""
    return changes.select(
        F.to_date("effective_date", "MMMM d, yyyy").alias("effective_date"),
        "ticker",
        "action",
    ).filter(F.col("ticker").isNotNull())


def construct_universe(
    spark: SparkSession,
    current_tickers: list[str],
    changes: DataFrame,
    calendar: DataFrame,
) -> DataFrame:
    """-> (date, year, ticker) per-date membership snapshots."""
    change_rows = parse_changes(changes).collect()
    by_date: dict[dt.date, list[tuple[str, str]]] = defaultdict(list)
    for r in change_rows:
        by_date[r["effective_date"]].append((r["ticker"], r["action"]))

    dates = sorted((r["date"] for r in calendar.select("date").collect()), reverse=True)
    members = set(current_tickers)
    snapshots: list[tuple[dt.date, list[str]]] = []
    for d in dates:
        snapshots.append((d, sorted(members)))
        for ticker, action in by_date.get(d, ()):  # invert, walking backwards
            if action == "Added":
                members.discard(ticker)
            elif action == "Removed":
                members.add(ticker)

    schema = T.StructType(
        [
            T.StructField("date", T.DateType()),
            T.StructField("tickers", T.ArrayType(T.StringType())),
        ]
    )
    snaps = spark.createDataFrame(snapshots, schema)
    return (
        snaps.select("date", F.explode("tickers").alias("ticker"))
        .select("date", F.year("date").cast("int").alias("year"), "ticker")
        .sort("date", "ticker")
    )
