"""Localize the intermittent token_count_by_source stall: per-repeat
build-time vs exec-time, JVM GC time delta, and per-variant repeats in
bench context (full inventory warm first)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import xarray_dataaccessor_spark.queries_ext  # noqa: F401
from xarray_dataaccessor_spark.queries import QUERIES
from xarray_dataaccessor_spark.session import get_spark


def gc_ms(spark):
    beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
    return sum(beans.get(i).getCollectionTime() for i in range(beans.size()))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="xda-diag-gc", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
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
        try:
            QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"# error in {name}: {exc}", file=sys.stderr, flush=True)
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
    print("inventory warmed", flush=True)

    for i in range(10):
        g0 = gc_ms(spark)
        t0 = time.perf_counter()
        df = QUERIES[target](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        spark.catalog.clearCache()
        print(
            f"[{i}] build={t1-t0:5.2f} s exec={t2-t1:6.2f} s gc_delta={gc_ms(spark)-g0:6d} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
