"""Bench-context repro of the token_count_by_source degradation.

Mimics bench.py: same session, runs every declared slot once (noop sink,
clearCache between), then repeats token_count_by_source 6 times with
per-repeat wall time and post-GC retained heap.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xarray_dataaccessor_spark.queries_ext  # noqa: F401
from xarray_dataaccessor_spark.queries import QUERIES
from xarray_dataaccessor_spark.session import get_spark


def retained_mb(spark):
    jvm = spark._jvm.java.lang.System
    jvm.gc()
    time.sleep(0.3)
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    return (rt.totalMemory() - rt.freeMemory()) / 1e6


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="xda-diag-ctx", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    import xarray_dataaccessor_spark.queries as Q

    grid_path = os.path.join(tempfile.mkdtemp(prefix="xda_diag_grid_"), "grid.parquet")
    Q._grid(spark, sf_dir).write.mode("overwrite").parquet(grid_path)
    Q.GRID_PARQUET = grid_path

    target = "token_count_by_source"
    for name in sorted(QUERIES):
        if name == target:
            continue
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"# error in {name}: {exc}", file=sys.stderr, flush=True)
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        print(f"warm {name:40s} {time.perf_counter()-t0:6.2f} s", flush=True)

    print(f"retained after inventory: {retained_mb(spark):8.0f} MB", flush=True)
    for i in range(6):
        t0 = time.perf_counter()
        QUERIES[target](spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        print(f"{target}[{i}]: {dt:7.2f} s  retained={retained_mb(spark):8.0f} MB", flush=True)


if __name__ == "__main__":
    main()
