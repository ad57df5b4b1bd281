"""SparkSession factory with scale-appropriate defaults.

Local testing runs on ``local[N]``; the config choices below are the
ones that matter on a real multi-executor cluster at ~100 TB:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  broadcast demotion/promotion) so plans survive 1000x scale-ups,
- Arrow-batched Python UDF transport for the few pandas kernels,
- UTC session timezone so parquet timestamps compare bit-for-bit
  against external oracles (DuckDB timestamps are UTC-naive),
- shuffle partitions sized to the environment (SPARK_GRAFT_CPUS
  locally; on a cluster you'd size to ~2-3x total cores and let AQE
  coalesce down).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "nt_data_pipelines_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``cores=None`` uses ``$SPARK_GRAFT_CPUS`` (driver contract) or the
    machine's CPU count. On a real cluster, drop ``master`` and submit
    with spark-submit; every other conf below still applies.
    """
    n = cores or default_parallelism()
    shuffle = shuffle_partitions or n
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parquet scans: pushdown + vectorized reader are defaults, but
        # pin them so a misconfigured env never silently regresses.
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
