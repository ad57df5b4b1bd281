"""nt_data_pipelines_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of the reference system
``Nameless-Trading/nt-data-pipelines`` (a Polars/Prefect quant
pipeline; see SURVEY.md), re-expressed as:

- a parquet lakehouse catalog with primary-key upsert semantics
  (:mod:`nt_data_pipelines_spark.catalog`),
- a library of pure DataFrame -> DataFrame operators
  (:mod:`nt_data_pipelines_spark.operators`),
- the reference's flow graph as composable pipelines
  (:mod:`nt_data_pipelines_spark.pipelines`),
- large-scale training-data operators (dedup, similarity search,
  text analysis, multimodal plumbing) that the reference lacks but a
  100 TB data pipeline needs,
- a driver-facing query registry with DuckDB oracle SQL for
  differential testing (:mod:`nt_data_pipelines_spark.plans`).

Everything is DataFrame/Catalyst-first: logical plans are declared
with the DataFrame API, Catalyst/Tungsten/AQE pick the physical
strategy, and Python touches data only through Arrow-batched
``applyInPandas``/``mapInPandas`` for the few operators Spark lacks
(EWMA, rolling OLS, QP optimization).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy top-level conveniences (avoid importing pyspark at package
    # import time for tools that only want __version__).
    if name == "Catalog":
        from nt_data_pipelines_spark.catalog import Catalog

        return Catalog
    if name == "Engine":
        from nt_data_pipelines_spark.api import Engine

        return Engine
    if name == "get_spark":
        from nt_data_pipelines_spark.session import get_spark

        return get_spark
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
