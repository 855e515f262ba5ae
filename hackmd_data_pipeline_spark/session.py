"""SparkSession factory.

The reference is UTC-everywhere (datetime.now(timezone.utc) at
reference src/extract/arxiv_collector.py:110,138,172 and
src/etl/arxiv_etl.py:81,93-94), so the session timezone is pinned to
UTC — this also keeps DuckDB oracle comparisons deterministic.

Scale posture: AQE on (runtime coalescing + skew-join splitting),
shuffle partitions sized for the local harness but overridable via
env for a real cluster, Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "hackmd_data_pipeline_spark",
              shuffle_partitions: str | int | None = None) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    local[N] on the test harness; on a real cluster the master and
    memory come from spark-submit — only the semantic configs here
    (timezone, AQE, Arrow) matter.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .appName(app_name)
        # correctness-critical: UTC like the reference; no silent ansi drift
        .config("spark.sql.session.timeZone", "UTC")
        # scale: adaptive execution re-plans shuffles at runtime
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        # slow-path UDFs go through Arrow batches, never per-row pickle
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
