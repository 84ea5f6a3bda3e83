"""Distributed Zarr sink: executor-written chunks round-trip through
the distributed reader across formats and compressors; sparse cells
become NaN; the exporter shuffles once, on the chunk key."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.sinks.zarr_sink import grid_to_zarr
from xarray_dataaccessor_spark.sources.ingest import zarr_to_grid
from xarray_dataaccessor_spark.sources.zarr import read_zarray


@pytest.fixture(scope="module")
def grid(spark):
    times = [dt.datetime(2020, 1, 1) + dt.timedelta(hours=h) for h in range(30)]
    ys = [45.0 - 0.25 * j for j in range(10)]
    xs = [-90.0 + 0.25 * i for i in range(14)]
    rows = [
        (t, y, x, float(ti * 1000 + yi * 14 + xi))
        for ti, t in enumerate(times)
        for yi, y in enumerate(ys)
        for xi, x in enumerate(xs)
    ]
    return spark.createDataFrame(
        rows, "time timestamp, y double, x double, t2m double"
    )


@pytest.mark.parametrize(
    "fmt,comp",
    [(2, "zlib"), (2, "zstd"), (2, "blosc-lz4"), (2, None),
     (3, "zlib"), (3, "zstd")],
)
def test_roundtrip(spark, grid, tmp_path, fmt, comp):
    store = str(tmp_path / f"st{fmt}{comp}")
    res = grid_to_zarr(grid, store, "t2m", chunks=(16, 8, 8),
                       compressor=comp, zarr_format=fmt)
    assert res["shape"] == (30, 10, 14) and res["n_chunks"] == 8
    meta = read_zarray(store, "t2m")
    assert meta["shape"] == [30, 10, 14] and meta["chunks"] == [16, 8, 8]
    back = zarr_to_grid(spark, store, "t2m").toPandas()
    src = grid.toPandas()
    mrg = src.merge(back, on=["time", "y", "x"], suffixes=("", "_rt"))
    assert len(mrg) == len(src)
    assert (mrg["t2m"] == mrg["t2m_rt"]).all()


def test_sparse_cells_are_nan(spark, grid, tmp_path):
    store = str(tmp_path / "sparse")
    sparse = grid.filter((F.col("t2m") % 7) != 0)
    grid_to_zarr(sparse, store, "t2m", chunks=(16, 8, 8))
    back = zarr_to_grid(spark, store, "t2m").toPandas()
    full = grid.toPandas().merge(back, on=["time", "y", "x"],
                                 suffixes=("", "_rt"))
    assert len(full) == 30 * 10 * 14
    gap = full[full["t2m"] % 7 == 0]
    assert gap["t2m_rt"].isna().all()
    kept = full[full["t2m"] % 7 != 0]
    assert (kept["t2m"] == kept["t2m_rt"]).all()


def test_single_shuffle_on_chunk_key(spark, grid, tmp_path):
    """The export plan's only exchange beyond the broadcast axis maps
    is the hash partitioning on the chunk key — count Exchange nodes
    in the chunk-writer plan."""
    from xarray_dataaccessor_spark.sinks import zarr_sink as zs

    store = str(tmp_path / "plan")
    # build the same `rows` pipeline as grid_to_zarr, stop before write
    times = sorted(r[0] for r in grid.select("time").distinct().collect())
    ys = sorted((r[0] for r in grid.select("y").distinct().collect()),
                reverse=True)
    xs = sorted(r[0] for r in grid.select("x").distinct().collect())
    t_map = spark.createDataFrame(
        [(t, i) for i, t in enumerate(times)], "time timestamp, __ti int"
    )
    y_map = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(ys)], "y double, __yi int"
    )
    x_map = spark.createDataFrame(
        [(float(v), i) for i, v in enumerate(xs)], "x double, __xi int"
    )
    rows = (
        grid.join(F.broadcast(t_map), "time")
        .join(F.broadcast(y_map), "y")
        .join(F.broadcast(x_map), "x")
        .select(
            (F.col("__ti") / 16).cast("int").alias("__c0"),
            (F.col("__yi") / 8).cast("int").alias("__c1"),
            (F.col("__xi") / 8).cast("int").alias("__c2"),
        )
        .groupBy("__c0", "__c1", "__c2")
        .count()
    )
    plan = rows._jdf.queryExecution().executedPlan().toString()
    import re

    n_exchanges = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_exchanges == 1, plan[:1500]
    assert plan.count("BroadcastExchange") >= 3


def test_unsupported_options_rejected(grid, tmp_path):
    with pytest.raises(ValueError, match="zarr_format"):
        grid_to_zarr(grid, str(tmp_path / "x"), "t2m", zarr_format=4)
    with pytest.raises(ValueError, match="compressor"):
        grid_to_zarr(grid, str(tmp_path / "y"), "t2m", compressor="lzma")


def test_roundtrip_property(spark, tmp_path_factory):
    """Random shapes x chunk grids x compressors round-trip exactly
    (ragged edge chunks, chunk sizes larger than the axis, v2 and v3)."""
    import itertools
    import random

    random.seed(4)
    cases = []
    for fmt, comp in [(2, "zlib"), (3, "zstd"), (2, "blosc-zlib")]:
        nt, ny, nx = random.randint(1, 7), random.randint(1, 6), random.randint(1, 6)
        ct, cy, cx = random.randint(1, 8), random.randint(1, 8), random.randint(1, 8)
        cases.append((fmt, comp, (nt, ny, nx), (ct, cy, cx)))
    for fmt, comp, (nt, ny, nx), chunks in cases:
        rows = [
            (dt.datetime(2021, 3, 1) + dt.timedelta(hours=h),
             50.0 - 0.5 * j, 10.0 + 0.5 * i,
             float(h * 10000 + j * 100 + i) * 0.125)
            for h in range(nt) for j in range(ny) for i in range(nx)
        ]
        grid = spark.createDataFrame(
            rows, "time timestamp, y double, x double, v double"
        )
        store = str(tmp_path_factory.mktemp("zp") / "s")
        grid_to_zarr(grid, store, "v", chunks=chunks, compressor=comp,
                     zarr_format=fmt)
        back = zarr_to_grid(spark, store, "v").toPandas()
        src = grid.toPandas().merge(back, on=["time", "y", "x"],
                                    suffixes=("", "_rt"))
        assert len(src) == nt * ny * nx, (fmt, comp, (nt, ny, nx), chunks)
        assert (src["v"] == src["v_rt"]).all(), (fmt, comp, chunks)
