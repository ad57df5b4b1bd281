"""Error-path guards added by the review passes: loud failures, not silent damage."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import types as T

from nt_data_pipelines_spark.catalog import Catalog
from nt_data_pipelines_spark.operators.dedup import minhash_lsh_candidates
from nt_data_pipelines_spark.operators.similarity import lsh_signatures

SCHEMA = T.StructType(
    [T.StructField("k", T.IntegerType()), T.StructField("v", T.DoubleType())]
)


def test_catalog_insert_rejects_unknown_mode(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake"))
    cat.create("t", SCHEMA, None, ["k"], mode="replace")
    df = spark.createDataFrame([(1, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="append\\|overwrite"):
        cat.insert("t", df, mode="Append")  # typo must not wipe the table
    cat.insert("t", df)  # exact mode works
    assert cat.table("t").count() == 1


def test_catalog_create_rejects_unknown_mode(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "lake2"))
    with pytest.raises(ValueError, match="replace\\|skip"):
        cat.create("t", SCHEMA, None, ["k"], mode="recreate")


def test_minhash_rejects_indivisible_bands(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=16, bands=5)


def test_lsh_asserts_embedding_dimension(spark):
    emb = spark.createDataFrame([(1, [1.0, 2.0])], ["vec_id", "embedding"])
    with pytest.raises(Exception, match="dim|assert"):
        lsh_signatures(emb, "vec_id", "embedding", num_planes=2, dim=64).collect()


def test_engine_empty_range_is_empty_not_error(spark, tmp_path):
    from nt_data_pipelines_spark.api import Engine
    from nt_data_pipelines_spark.pipelines.runner import ensure_tables

    cat = Catalog(spark, str(tmp_path / "lake3"))
    ensure_tables(cat)
    engine = Engine(cat)
    far_future = dt.date(2099, 1, 1)
    assert engine.get_universe(far_future, far_future).count() == 0
    assert engine.get_portfolio_weights(far_future, far_future).count() == 0


def test_salted_join_rejects_unsupported_how(spark):
    from nt_data_pipelines_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, "k", how="full_outer")
