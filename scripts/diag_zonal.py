"""Adjudicate the r11 zonal_contour_stats driver-bench anomaly
(VERDICT r11 "What's wrong" #4): BENCH_r11.json recorded runs
[20.27, 18.34, 9.36] for the slot while exclusive same-HEAD runs gave
3.3-3.7 s with a clean plan.

Hypothesis under test: the anomaly is SESSION STATE, not the slot's
plan — zonal_contour_stats sorts LAST in the bench's alphabetical
order, so it runs after 50 slots x 3 repeats (including the streaming
family and every big documents/text scan) have churned the JVM heap,
the Python worker pool, and the OS page cache that holds the landed
GRID_PARQUET fixture.

Method (one process, the bench's own session + warm-up + cache
policy):
  phase A  - bench-identical warm-up, land GRID_PARQUET, then time the
             slot 3x ("exclusive-in-harness" baseline).
  phase B  - run the N slots that alphabetically precede it (the
             bench tail: streaming_*, text/token family, tpch,
             training pipeline, window_analytics), 3 repeats each,
             clearCache between runs — exactly the driver discipline.
  phase C  - time the slot 3x again.
A phase-C first-repeat blow-up reproduces the driver number and names
the cause (session churn); flat phase C would point at the slot.

Usage: python scripts/diag_zonal.py [--tail N]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # the real harness: same warm-up, same cache policy
import xarray_dataaccessor_spark.queries_ext  # noqa: F401
from xarray_dataaccessor_spark.queries import QUERIES
from xarray_dataaccessor_spark.session import get_spark

SLOT = "zonal_contour_stats"


def _run(spark, sf_dir, name, repeats=3):
    runs = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        runs.append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
    return runs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_tail = 10
    if "--tail" in sys.argv:
        n_tail = int(sys.argv[sys.argv.index("--tail") + 1])
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="xda-diag-zonal", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # bench prologue, verbatim pieces
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    B._warm_jvm(spark)
    for tbl in ("lineitem", "orders", "events", "documents", "embeddings"):
        p = f"{sf_dir}/{tbl}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    import tempfile

    import xarray_dataaccessor_spark.queries as Q

    grid_path = os.path.join(
        tempfile.mkdtemp(prefix="xda_diag_grid_"), "grid.parquet"
    )
    Q._grid(spark, sf_dir).write.mode("overwrite").parquet(grid_path)
    Q.GRID_PARQUET = grid_path
    Q._grid(spark, sf_dir).write.format("noop").mode("overwrite").save()
    B._warm_streaming(spark)

    a = _run(spark, sf_dir, SLOT)
    print(f"phase A (post-warmup, exclusive): {a}", flush=True)

    names = sorted(QUERIES)
    tail = [n for n in names if n < SLOT][-n_tail:]
    t0 = time.perf_counter()
    for n in tail:
        try:
            r = _run(spark, sf_dir, n)
            print(f"  tail {n}: {r}", flush=True)
        except Exception as exc:
            print(f"  tail {n}: ERROR {exc}", flush=True)
    print(f"phase B ({len(tail)} tail slots): {time.perf_counter()-t0:.1f}s")

    c = _run(spark, sf_dir, SLOT)
    print(f"phase C (after tail churn): {c}", flush=True)
    print(
        f"verdict: {'REPRODUCED session-churn cause' if c[0] > 2.5 * a[1] else 'NOT reproduced by tail churn'}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
