"""Ingest-path comparison: the Python Data Source (header-planned
record-range partitions + pushdown pruning) vs the existing
binaryFile + mapInPandas decode (`ingest.netcdf_glob_to_grid`) on the
same multi-granule NetCDF dataset.

Two shapes per path, median of N fresh-plan repeats in one session:

- FULL scan: aggregate every cell of every granule. Both paths decode
  everything; this measures pure decode + row-emission overhead (the
  DS must not be slower than the mapInPandas path it supersedes).
- TAIL query: last ~10% of the time range. The DS prunes record
  ranges BEFORE reading (assume_sorted_time); the binaryFile path must
  decode whole granules and filter after — the gap IS the pushdown.

Writes one JSON line; committed as BENCH_DS_INGEST_r11.txt.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from xarray_dataaccessor_spark.session import get_spark  # noqa: E402
from xarray_dataaccessor_spark.sources.netcdf3 import write_netcdf3  # noqa: E402


def main() -> None:
    n_granules = int(os.environ.get("DSB_GRANULES", "8"))
    nt = 720
    ny = int(os.environ.get("DSB_NY", "20"))
    nx = int(os.environ.get("DSB_NX", "30"))
    repeats = int(os.environ.get("DSB_REPEATS", "3"))

    spark = get_spark(app_name="ds-ingest-bench", cpus=os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark.sparkContext.setLogLevel("ERROR")

    d = tempfile.mkdtemp(prefix="dsb-")
    rng = np.random.RandomState(7)
    for g in range(n_granules):
        vals = rng.rand(nt, ny, nx)
        write_netcdf3(
            os.path.join(d, f"g{g:02d}.nc"),
            {"time": nt, "y": ny, "x": nx},
            {
                "time": (
                    ["time"],
                    np.arange(nt, dtype="f8"),
                    {"units": f"hours since 2024-0{g % 8 + 1}-01"},
                ),
                "y": (["y"], 40.0 + 0.25 * np.arange(ny), {}),
                "x": (["x"], -85.0 + 0.25 * np.arange(nx), {}),
                "t2m": (["time", "y", "x"], 250.0 + 40.0 * vals, {}),
                "d2m": (["time", "y", "x"], 240.0 + 40.0 * vals, {}),
            },
            record_dim="time",
        )
    total_mb = sum(
        os.path.getsize(os.path.join(d, f)) for f in os.listdir(d)
    ) / 1e6

    from xarray_dataaccessor_spark.sources.ingest import netcdf_glob_to_grid
    from xarray_dataaccessor_spark.sources.pyds import register_data_sources

    register_data_sources(spark)
    glob = os.path.join(d, "*.nc")
    rows_expect = n_granules * nt * ny * nx

    def ds_full():
        # default 128 MiB record-range target: granule-sized tasks, the
        # same parallelism the binaryFile path gets (one task per file)
        return (
            spark.read.format("netcdf")
            .option("variables", "t2m")
            .load(d)
            .agg({"t2m": "sum", "*": "count"})
        )

    def legacy_full():
        return netcdf_glob_to_grid(spark, glob, variable="t2m").agg(
            {"t2m": "sum", "*": "count"}
        )

    # tail: last 72 hours of each granule's 720 (cut chosen inside
    # every granule's range so both paths return the same rows)
    def ds_tail(cut):
        return (
            spark.read.format("netcdf")
            .option("variables", "t2m")
            .option("target_partition_bytes", 512 * 1024)
            .option("assume_sorted_time", "true")
            .load(d)
            .filter(f"time >= timestamp'{cut}'")
            .agg({"t2m": "sum", "*": "count"})
        )

    def legacy_tail(cut):
        return (
            netcdf_glob_to_grid(spark, glob, variable="t2m")
            .filter(f"time >= timestamp'{cut}'")
            .agg({"t2m": "sum", "*": "count"})
        )

    cut = "2024-08-27 00:00:00"  # tail of the latest granule only

    # warm-up both paths once (JVM + python workers)
    ds_full().collect()
    legacy_full().collect()

    def bench(fn, *args):
        times = []
        out = None
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = fn(*args).collect()[0]
            times.append(round(time.perf_counter() - t0, 3))
        return sorted(times)[len(times) // 2], times, out

    full_ds, full_ds_runs, r1 = bench(ds_full)
    full_legacy, full_legacy_runs, r2 = bench(legacy_full)
    assert r1["count(1)"] == r2["count(1)"] == rows_expect, (r1, r2)
    assert abs(r1["sum(t2m)"] - r2["sum(t2m)"]) < 1e-4 * abs(r1["sum(t2m)"])

    tail_ds, tail_ds_runs, t1 = bench(ds_tail, cut)
    tail_legacy, tail_legacy_runs, t2 = bench(legacy_tail, cut)
    assert t1["count(1)"] == t2["count(1)"] > 0, (t1, t2)

    print(
        json.dumps(
            {
                "granules": n_granules,
                "mb": round(total_mb, 1),
                "rows": rows_expect,
                "tail_rows": t1["count(1)"],
                "full_scan_sec": {"datasource": full_ds, "binaryfile_mapinpandas": full_legacy},
                "tail_query_sec": {"datasource": tail_ds, "binaryfile_mapinpandas": tail_legacy},
                "runs": {
                    "full_ds": full_ds_runs,
                    "full_legacy": full_legacy_runs,
                    "tail_ds": tail_ds_runs,
                    "tail_legacy": tail_legacy_runs,
                },
                "repeats": repeats,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
