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


def _default_driver_mem() -> str:
    """12g on boxes that can afford it (the pre-touched heap below needs
    the physical pages up front), stepping down on small hosts so the
    library default never fails JVM launch on an 8-16 GB machine."""
    try:
        with open("/proc/meminfo") as f:
            kb = next(
                int(line.split()[1]) for line in f if line.startswith("MemAvailable")
            )
        avail_g = kb / 1024 / 1024
    except Exception:
        return "4g"
    for want in (12, 8, 4, 2):
        if avail_g >= want * 1.5:
            return f"{want}g"
    return "1g"


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
    driver_mem = os.environ.get("SPARK_DRIVER_MEM") or _default_driver_mem()
    # Shuffle/spill files on tmpfs when available: local[n] in a VM pays
    # heavy syscall + virtio overhead on /tmp, and shuffle-file I/O is
    # the dominant variance source for small-stage workloads. On a real
    # cluster spark.local.dir is provisioned (NVMe) by the platform;
    # this default only affects single-node runs.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/xda-spark-local"
        os.makedirs(local_dir, exist_ok=True)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python Data Source pushFilters (sources/pyds.py) is opt-in
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", driver_mem)
        # Commit and zero the whole heap at JVM start (-Xms via
        # AlwaysPreTouch): mid-query heap expansion commits gigabytes of
        # fresh pages, and in a virtualized guest the page-fault + TLB
        # storm lands as hundreds of CPU-seconds of kernel time on
        # whichever query triggers it (measured: a 3 s query stalling to
        # 43 s wall with ~990 s of sys time). A long-running cluster JVM
        # pays this once at executor launch — so should we.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_JVM_OPTS",
                f"-Xms{driver_mem} -XX:+AlwaysPreTouch -XX:+UseG1GC"
                " -XX:ReservedCodeCacheSize=512m"
                # JVM unified-logging warnings (e.g. gc,alloc GCLocker
                # retries under memory pressure) print to STDOUT and
                # would corrupt the one-line JSON contract bench.py and
                # the correctness driver parse — observed at sf1
                " -Xlog:disable",
            ),
        )
        # UI off by default (saves the listener-bus + jetty overhead in
        # bench/correctness runs); SPARK_GRAFT_UI=1 turns it on for
        # stage-level diagnosis via the REST API
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") else "false",
        )
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created
    session (e.g. the correctness driver's). Only touches confs that are
    safe to set after JVM start.

    Also the slot-boundary teardown hook: every query body calls this
    first, and by then the PREVIOUS body's plans are dead — so the RDD
    blocks its operators pinned via ``tracked_local_checkpoint`` are
    released here (``spark.catalog.clearCache()`` between slots cannot
    see them; VERDICT r13 #5)."""
    from xarray_dataaccessor_spark.operators.cachectl import (
        release_checkpoints,
    )

    release_checkpoints()
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # Python Data Source filter pushdown (sources/pyds.py readers
    # implement pushFilters for granule/record-range/block pruning)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark
