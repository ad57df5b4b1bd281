"""Readers for the driver-generated parquet testdata.

One parquet file per table under ``/root/testdata/sf*/``. These are
plain ``spark.read.parquet`` scans — Catalyst handles predicate
pushdown and column pruning, so callers should filter/select on the
returned DataFrame rather than pre-materializing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one testdata table.

    ``events.ts`` has shipped as both parquet TIMESTAMP(NANOS) (which
    Spark's reader rejects — read as a nanosecond long via the legacy
    conf and floor-divide to microseconds, exactly how DuckDB coerces
    nanos) and plain TIMESTAMP(MICROS); dispatch on the type the scan
    actually reports so either vintage of the testdata loads, and
    normalize to timestamp_ntz under the UTC session either way.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; known: {TESTDATA_TABLES}")
    # keyed on the JVM application id, not id(spark): Python can reuse
    # a garbage-collected session's memory address, which would hand a
    # fresh session a cached DataFrame bound to the dead one
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _SCAN_CACHE.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    # The driver may call with ITS OWN SparkSession; pin the session
    # timezone so date extraction and collected timestamps are stable
    # no matter the host configuration (DuckDB oracles are UTC-naive).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) vintage, surfaced as long by the conf.
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        elif isinstance(ts_type, T.TimestampType):
            # ltz -> ntz under the UTC session: ts becomes a timezone-
            # independent wall-clock value, like every other table's
            # parquet timestamps (which Spark reads as timestamp_ntz).
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        # TimestampNTZType needs no normalization.
    else:
        df = spark.read.parquet(path)
    _SCAN_CACHE[key] = df
    return df


# Memoized scan plans: a DataFrame is an immutable logical plan, so
# reusing one skips repeated footer/schema inference on every query.
_SCAN_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}
