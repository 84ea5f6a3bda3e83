"""Benchmark harness: runs the declared query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {...}, "sf": ...}

Each query is forced through the `noop` sink (full execution, no driver
collect) after a warm-up of the session; time is wall-clock per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import xarray_dataaccessor_spark.queries_ext  # noqa: F401 (registers extension queries)
    from xarray_dataaccessor_spark.queries import QUERIES
    from xarray_dataaccessor_spark.session import get_spark

    spark = get_spark(app_name="xda-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # warm up the JVM + parquet footer caches with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        fn = QUERIES[name]
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the harness alive; flag the query
            timings[name] = -1.0
            print(f"# bench error in {name}: {exc}", file=sys.stderr)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "declared-query-inventory wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
