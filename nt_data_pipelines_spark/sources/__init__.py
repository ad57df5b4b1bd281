from nt_data_pipelines_spark.sources.testdata import TESTDATA_TABLES, load_table, load_tables

__all__ = ["TESTDATA_TABLES", "load_table", "load_tables"]
