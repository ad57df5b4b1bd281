"""Metadata-only schema evolution: add/drop columns across existing files."""

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
D2 = dt.date(2025, 1, 3)


def test_add_column_old_files_read_null(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"], mode="replace")
    cat.insert("px", spark.createDataFrame([("A", D1, 2024, 1.0)], SCHEMA))
    cat.add_column("px", T.StructField("volume", T.DoubleType()))
    wide = T.StructType(list(SCHEMA.fields) + [T.StructField("volume", T.DoubleType())])
    cat.insert("px", spark.createDataFrame([("B", D2, 2025, 2.0, 9.0)], wide))
    got = {r["ticker"]: r["volume"] for r in cat.table("px").collect()}
    assert got == {"A": None, "B": 9.0}
    # upsert path still works across the evolved schema
    cat.upsert("px", spark.createDataFrame([("A", D1, 2024, 1.5, 7.0)], wide))
    got = {r["ticker"]: (r["close"], r["volume"]) for r in cat.table("px").collect()}
    assert got == {"A": (1.5, 7.0), "B": (2.0, 9.0)}


def test_add_column_guards(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, None, ["ticker", "date"], mode="replace")
    with pytest.raises(ValueError, match="already exists"):
        cat.add_column("px", T.StructField("close", T.DoubleType()))
    with pytest.raises(ValueError, match="reserved"):
        cat.add_column("px", T.StructField("_ingest_seq", T.LongType()))
    with pytest.raises(ValueError, match="nullable"):
        cat.add_column("px", T.StructField("v", T.DoubleType(), nullable=False))
    # strict inserts: an old writer missing the new column fails loudly
    cat.add_column("px", T.StructField("volume", T.DoubleType()))
    with pytest.raises(Exception):
        cat.insert("px", spark.createDataFrame([("A", D1, 2024, 1.0)], SCHEMA))


def test_drop_column_and_guards(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"], mode="replace")
    cat.insert("px", spark.createDataFrame([("A", D1, 2024, 1.0)], SCHEMA))
    cat.drop_column("px", "close")
    assert cat.table("px").columns == ["ticker", "date", "year"]
    with pytest.raises(ValueError, match="partition column"):
        cat.drop_column("px", "year")
    with pytest.raises(ValueError, match="primary-key column"):
        cat.drop_column("px", "ticker")
    with pytest.raises(KeyError):
        cat.drop_column("px", "close")  # already gone
    # narrow inserts now conform to the narrowed schema
    narrow = T.StructType([f for f in SCHEMA.fields if f.name != "close"])
    cat.insert("px", spark.createDataFrame([("B", D2, 2025)], narrow))
    assert sorted(r["ticker"] for r in cat.table("px").collect()) == ["A", "B"]


def test_generated_columns_computed_and_validated(spark, tmp_path):
    from nt_data_pipelines_spark.catalog import Catalog as Cat

    cat = Cat(spark, str(tmp_path / "gen"))
    cat.create("px", SCHEMA, ["year"], ["ticker", "date"],
               mode="replace", generated={"year": "year(date)"})
    narrow = T.StructType([f for f in SCHEMA.fields if f.name != "year"])
    # omitted: computed
    cat.insert("px", spark.createDataFrame([("A", D1, 1.0)], narrow))
    got = cat.table("px").collect()
    assert got[0]["year"] == 2024
    # provided and consistent: accepted
    cat.insert("px", spark.createDataFrame([("B", D2, 2025, 2.0)], SCHEMA))
    # provided but divergent: whole batch rejected
    with pytest.raises(ValueError, match="disagrees"):
        cat.insert("px", spark.createDataFrame([("C", D2, 1999, 3.0)], SCHEMA))
    assert cat.table("px").count() == 2
    # merge computes generated columns too
    cat.merge("px", spark.createDataFrame([("A", D1, 9.0)], narrow))
    assert {r["ticker"]: (r["close"], r["year"]) for r in cat.table("px").collect()} == {
        "A": (9.0, 2024), "B": (2.0, 2025)
    }
    with pytest.raises(ValueError, match="not in schema"):
        cat.create("bad", SCHEMA, None, None, mode="replace", generated={"nope": "1"})
