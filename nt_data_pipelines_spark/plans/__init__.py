"""Driver-facing query registry (queries() / oracle_sql() pairs).

Importing this package registers every query module. The registry is
what ``__spark_entry__.py`` exposes to the verification driver.
"""

from nt_data_pipelines_spark.plans.registry import REGISTRY, oracle_sql, queries, register

# Import for side effects: each module registers its queries.
from nt_data_pipelines_spark.plans import relational  # noqa: E402,F401
from nt_data_pipelines_spark.plans import timeseries  # noqa: E402,F401
from nt_data_pipelines_spark.plans import textdedup  # noqa: E402,F401
from nt_data_pipelines_spark.plans import similarity  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra  # noqa: E402,F401
from nt_data_pipelines_spark.plans import multimodal_q  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra2  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra3  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra4  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra5  # noqa: E402,F401
from nt_data_pipelines_spark.plans import quant  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra6  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra7  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra8  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra9  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra10  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra11  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra12  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra13  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra14  # noqa: E402,F401
from nt_data_pipelines_spark.plans import extra15  # noqa: E402,F401

__all__ = ["REGISTRY", "register", "queries", "oracle_sql"]
