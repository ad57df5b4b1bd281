"""CHECK constraints: insert-time quality gates (Delta semantics)."""

from __future__ import annotations

import datetime as dt

import pytest
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


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, str(tmp_path / "lake"))
    c.create("px", SCHEMA, None, ["ticker", "date"], mode="replace")
    return c


def test_constraint_blocks_bad_batch_whole(cat, spark):
    cat.add_constraint("px", "close_nonneg", "close >= 0")
    cat.add_constraint("px", "ticker_present", "ticker IS NOT NULL")
    cat.insert("px", _rows(spark, [("A", D1, 1.0)]))
    with pytest.raises(ValueError, match="close_nonneg"):
        cat.insert("px", _rows(spark, [("B", D1, 2.0), ("C", D1, -1.0)]))
    # the whole batch was rejected BEFORE any write: B is absent too
    assert [r["ticker"] for r in cat.table("px").collect()] == ["A"]
    # NULL evaluations violate (strict gate): close NULL fails close>=0
    with pytest.raises(ValueError, match="close_nonneg"):
        cat.insert("px", spark.createDataFrame([("D", D1, 2024, None)], SCHEMA))


def test_constraint_guards_merge_and_declaration(cat, spark):
    cat.insert("px", _rows(spark, [("A", D1, -5.0)]))
    # declaring a constraint the table already violates is refused
    with pytest.raises(ValueError, match="existing rows violate"):
        cat.add_constraint("px", "close_nonneg", "close >= 0")
    cat.delete_matching("px", spark.createDataFrame([("A",)], "ticker string"), on="ticker")
    cat.add_constraint("px", "close_nonneg", "close >= 0")
    with pytest.raises(ValueError, match="close_nonneg"):
        cat.merge("px", _rows(spark, [("B", D1, -2.0)]))
    # tombstones are exempt (they delete, they don't add data)
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("deleted", T.BooleanType())])
    cat.insert("px", _rows(spark, [("C", D1, 1.0)]))
    cat.merge(
        "px",
        spark.createDataFrame([("C", D1, 2024, -9.0, True)], wide),
        delete_col="deleted",
    )
    assert cat.table("px").count() == 0


def test_constraint_management(cat, spark):
    with pytest.raises(ValueError, match="does not analyze"):
        cat.add_constraint("px", "bad", "nonexistent_col > 0")
    cat.add_constraint("px", "c1", "close >= 0")
    with pytest.raises(ValueError, match="already exists"):
        cat.add_constraint("px", "c1", "close >= 0")
    assert cat.constraints("px") == {"c1": "close >= 0"}
    cat.drop_constraint("px", "c1")
    assert cat.constraints("px") == {}
    with pytest.raises(KeyError):
        cat.drop_constraint("px", "c1")
    # constraints persist across catalog instances
    cat.add_constraint("px", "c2", "year >= 2000")
    fresh = Catalog(cat.spark, cat.root)
    assert fresh.constraints("px") == {"c2": "year >= 2000"}
    with pytest.raises(ValueError, match="c2"):
        fresh.insert("px", _rows(spark, [("Z", dt.date(1999, 1, 1), 1.0)]))


def test_drop_column_refuses_while_constraint_references_it(cat, spark):
    cat.add_constraint("px", "close_nonneg", "close >= 0")
    with pytest.raises(ValueError, match="references it"):
        cat.drop_column("px", "close")
    cat.drop_constraint("px", "close_nonneg")
    cat.drop_column("px", "close")  # now fine
    assert "close" not in cat.table("px").columns
