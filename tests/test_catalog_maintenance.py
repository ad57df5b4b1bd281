"""Operational catalog tier: compaction, ANALYZE stats, z-order layout."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog

SCHEMA = T.StructType(
    [
        T.StructField("ticker", T.StringType()),
        T.StructField("date", T.DateType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("close", T.DoubleType()),
    ]
)

D1 = dt.date(2024, 1, 2)


def _rows(spark, data):
    return spark.createDataFrame([(t, d, d.year, c) for t, d, c in data], SCHEMA)


def test_compact_merges_small_files(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, None, ["ticker", "date"], mode="replace")
    for i in range(6):  # six appends -> many small files
        cat.insert("px", _rows(spark, [(f"T{i}", D1, float(i))]))
    before = len(cat.data_files("px"))
    assert before >= 6
    out = cat.compact("px", target_file_bytes=1 << 30)  # everything fits one file
    assert out["files_before"] == before and out["files_after"] == 1
    assert cat.table("px").count() == 6
    # already compact: no-op
    again = cat.compact("px", target_file_bytes=1 << 30)
    assert again["files_after"] == 1
    with pytest.raises(ValueError):
        cat.compact("px", target_file_bytes=0)


def test_compact_partitioned_keeps_layout(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"], mode="replace")
    for i in range(4):
        cat.insert("px", _rows(spark, [(f"A{i}", D1, 1.0), (f"B{i}", dt.date(2025, 1, 3), 2.0)]))
    cat.compact("px", target_file_bytes=1 << 30)
    files = cat.data_files("px")
    assert all("year=" in p for p, _ in files)  # hive layout preserved
    assert cat.table("px").filter(F.col("year") == 2024).count() == 4


def test_analyze_and_stats(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, None, ["ticker", "date"], mode="replace")
    cat.insert("px", _rows(spark, [("A", D1, 1.0), ("B", D1, 5.0)]))
    cat.insert("px", spark.createDataFrame([("C", D1, 2024, None)], SCHEMA))
    assert cat.stats("px") is None
    got = cat.analyze("px")
    assert got["rows"] == 3
    cl = got["columns"]["close"]
    assert cl["nulls"] == 1 and cl["min"] == "1.0" and cl["max"] == "5.0"
    assert cl["approx_ndv"] == 2
    assert got["columns"]["ticker"]["approx_ndv"] == 3
    # persisted: a fresh catalog instance reads the same stats
    fresh = Catalog(spark, str(tmp_path / "lake"))
    assert fresh.stats("px")["rows"] == 3
    with pytest.raises(ValueError, match="absent or complex"):
        cat.analyze("px", columns=["nope"])


def test_optimize_layout_zorders_table(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, None, ["ticker", "date"], mode="replace")
    rows = [(f"T{i}", D1, float((i * 37) % 101)) for i in range(2000)]
    cat.insert("px", _rows(spark, rows))
    cat.optimize_layout("px", ["close", "year"], num_files=4)
    assert cat.table("px").count() == 2000
    from nt_data_pipelines_spark.operators.layout import ZKEY, add_zorder_key

    keyed = add_zorder_key(
        cat.table("px").withColumn("f", F.input_file_name()), ["close", "year"]
    )
    ivals = sorted(
        (r["lo"], r["hi"])
        for r in keyed.groupBy("f").agg(F.min(ZKEY).alias("lo"), F.max(ZKEY).alias("hi")).collect()
    )
    for (l1, h1), (l2, _h2) in zip(ivals, ivals[1:]):
        assert h1 <= l2, ivals
    with pytest.raises(ValueError, match="numeric"):
        cat.optimize_layout("px", ["ticker"])
