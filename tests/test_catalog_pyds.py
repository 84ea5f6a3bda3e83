"""DatasetCatalog entries backed by the data sources: the reference's
`get_xarray_dataset(bbox, timeframe)` workflow served straight from a
granule archive, with the catalog's bbox/time filters reaching the
source's pushFilters (pruning in the planner, exactness via Spark's
re-applied predicates)."""

import datetime as dt
import os

import numpy as np

from xarray_dataaccessor_spark.catalog import DatasetCatalog
from xarray_dataaccessor_spark.meta import BoundingBox
from xarray_dataaccessor_spark.sources.netcdf3 import write_netcdf3
from xarray_dataaccessor_spark.sources.zarr import write_zarr


def _granules(d, n=2):
    for g in range(n):
        nt, ny, nx = 24, 4, 6
        vals = np.arange(nt * ny * nx, dtype="f8").reshape(nt, ny, nx) + 1000 * g
        write_netcdf3(
            os.path.join(d, f"g{g}.nc"),
            {"time": nt, "y": ny, "x": nx},
            {
                "time": (["time"], np.arange(nt, dtype="f8"),
                         {"units": f"hours since 2024-01-0{g+1}"}),
                "y": (["y"], 40.0 + np.arange(ny, dtype="f8"), {}),
                "x": (["x"], -80.0 + np.arange(nx, dtype="f8"), {}),
                "t2m": (["time", "y", "x"], vals, {}),
                "d2m": (["time", "y", "x"], vals * 0.5, {}),
            },
            record_dim="time",
        )


def test_catalog_netcdf_dataset_bbox_time(spark, tmp_path):
    d = str(tmp_path)
    _granules(d)
    cat = DatasetCatalog()
    cat.register(
        "era5_granules", d, ["t2m", "d2m"], format="netcdf",
        options={"assume_sorted_time": "true"},
    )
    gf = cat.load(
        spark, "era5_granules",
        variables=["t2m"],
        bbox=BoundingBox(west=-80.0, east=-78.0, south=40.0, north=41.0),
        start_time=dt.datetime(2024, 1, 2, 12),
        end_time=dt.datetime(2024, 1, 2, 23),
    )
    pdf = gf.df.toPandas()
    # granule 1 only (Jan 2), hours 12..23, y in {40,41}, x in {-80,-79,-78}
    assert len(pdf) == 12 * 2 * 3
    assert pdf["y"].max() <= 41.0 and pdf["x"].max() <= -78.0
    assert "d2m" not in pdf.columns  # variable selection reached the read


def test_catalog_zarr_dataset_merges_variables(spark, tmp_path):
    store = str(tmp_path / "store")
    nt, ny, nx = 6, 3, 4
    a = np.arange(nt * ny * nx, dtype="f8").reshape(nt, ny, nx)
    write_zarr(store, "t2m", a, ["time", "y", "x"], chunks=[3, 3, 4])
    write_zarr(store, "d2m", a * 2.0, ["time", "y", "x"], chunks=[3, 3, 4])
    write_zarr(store, "time", np.arange(nt, dtype="f8"), ["time"],
               attrs={"units": "hours since 2024-06-01"})
    write_zarr(store, "y", np.arange(ny, dtype="f8"), ["y"])
    write_zarr(store, "x", np.arange(nx, dtype="f8"), ["x"])
    cat = DatasetCatalog()
    cat.register("cloudy", store, ["t2m", "d2m"], format="zarr")
    gf = cat.load(spark, "cloudy")
    pdf = gf.df.orderBy("time", "y", "x").toPandas()
    assert len(pdf) == nt * ny * nx
    assert np.allclose(pdf["d2m"], 2.0 * pdf["t2m"])  # J1 merge aligned


def test_catalog_zarr_4d_level_joins_on_level(spark, tmp_path):
    """4-D stores emit a `level` column; the catalog merge must include
    it in the join keys or the outer join explodes many-to-many."""
    store = str(tmp_path / "store")
    nt, nl, ny, nx = 4, 3, 2, 3
    a = np.arange(nt * nl * ny * nx, dtype="f8").reshape(nt, nl, ny, nx)
    write_zarr(store, "t", a, ["time", "level", "y", "x"],
               chunks=[2, 3, 2, 3])
    write_zarr(store, "z", a * 10.0, ["time", "level", "y", "x"],
               chunks=[2, 3, 2, 3])
    write_zarr(store, "time", np.arange(nt, dtype="f8"), ["time"],
               attrs={"units": "hours since 2024-06-01"})
    write_zarr(store, "level", np.array([500.0, 700.0, 850.0]), ["level"])
    write_zarr(store, "y", np.arange(ny, dtype="f8"), ["y"])
    write_zarr(store, "x", np.arange(nx, dtype="f8"), ["x"])
    cat = DatasetCatalog()
    cat.register("plev", store, ["t", "z"], format="zarr")
    gf = cat.load(spark, "plev")
    pdf = gf.df.orderBy("time", "level", "y", "x").toPandas()
    assert len(pdf) == nt * nl * ny * nx  # no many-to-many explosion
    assert np.allclose(pdf["z"], 10.0 * pdf["t"])  # levels aligned
