"""SparkSession factory tuned for the engine.

Replaces the reference's hand-rolled dask/concurrent.futures fabric
(``multi_threading.py:5-113``) wholesale: parallelism, retries, spill and
memory control all come from Spark.

Scale notes (100 TB design): AQE handles skew-join splitting and partition
coalescing at runtime; shuffle partitions default to 2-3x core count locally
but should be sized so post-shuffle partitions land in the 64-256 MB range on
a real cluster (AQE advisoryPartitionSizeInBytes does this dynamically).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "xarray-dataaccessor-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    - AQE on (runtime re-plan, skew-join handling, partition coalescing)
    - Arrow on (vectorized pandas_udf / applyInPandas / toPandas)
    - UTC session timezone (grid timestamps are instants; the reference
      stores UTC and converts on request, ``utility_functions.py:53-74``)
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (e.g. the correctness driver's). Only touches confs that are
    safe to set after JVM start."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    return spark
