"""End-to-end user stories mirroring the reference's e2e test flows
(test_2/test_3): catalog load with AOI -> transform chain -> extraction ->
export, all through the public GridFrame surface."""

from __future__ import annotations

import pytest

from xarray_dataaccessor_spark.catalog import DatasetCatalog, get_bounding_box, points_df
from xarray_dataaccessor_spark.sinks.tables import save_dataframe
from xarray_dataaccessor_spark.sources.ingest import land_grid_parquet

from tests.grid_fixture import grid_df


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("landed")
    path = land_grid_parquet(grid_df(spark, with_nulls=True), str(base), "era5_like")
    cat = DatasetCatalog()
    cat.register("era5_like", path, ["t2m", "u100"])
    return cat


def test_full_pipeline_load_resample_extract_export(spark, catalog, tmp_path):
    bbox = get_bounding_box(
        coords=[(41.5, -83.3), (42.8, -79.2)]
    )
    gf = catalog.load(
        spark, "era5_like", variables=["t2m"], bbox=bbox,
        start_time="2019-01-30", end_time="2019-02-02",
    )
    # temporal downsample to daily means (73 hourly -> 4 daily buckets)
    daily = gf.temporal_resample("D", agg_method="mean")
    assert daily.df.select("time").distinct().count() == 4

    # nearest-point extraction to a wide table (3 off-grid points)
    pts = points_df(
        spark, coords=[(41.63, -82.98), (42.88, -79.43), (41.85, -83.23)]
    )
    wide = gf.points_to_table(pts, "t2m")
    assert wide.columns == ["time", "0", "1", "2"]
    assert wide.count() == 73  # one row per timestep (test_3:160-163)

    # export round-trip
    out = save_dataframe(wide, tmp_path, "t2m", "parquet")
    back = spark.read.parquet(str(out))
    assert back.count() == 73


def test_timezone_subset_story(spark, catalog):
    # subset_time_by_timezone parity: local window -> fewer hours
    # (test_3_era5_manipulations.py:62-72 keeps 64 of 73 hours)
    gf = catalog.load(spark, "era5_like")
    sub = gf.subset_time_by_timezone(
        "2019-01-30 00:00:00", "2019-02-02 00:00:00", "America/New_York"
    )
    n = sub.df.select("time").distinct().count()
    # NY window shifts +5h (EST): 73 hourly steps -> 68 remain in-range
    assert n == 68


def test_csv_points_source(spark, tmp_path):
    # S7: coords CSV with an id column (utility_functions.py:312-362)
    csv = tmp_path / "pts.csv"
    csv.write_text("site,lon,lat\nA,-82.98,41.63\nB,-79.43,42.88\n")
    pts = points_df(spark, csv=str(csv), id_column="site")
    rows = {r["point_id"]: (r["lon"], r["lat"]) for r in pts.collect()}
    assert rows == {"A": (-82.98, 41.63), "B": (-79.43, 42.88)}
    # without id column: positional ids
    pts2 = points_df(spark, csv=str(csv))
    assert sorted(r["point_id"] for r in pts2.collect()) == ["0", "1"]


def test_rename_and_constant_time(spark):
    from xarray_dataaccessor_spark.gridframe import GridFrame

    df = spark.createDataFrame(
        [(42.0, -83.0, 7.0)], "latitude double, longitude double, LC double"
    )
    gf = GridFrame(df).rename_dims({"longitude": "x", "latitude": "y"})
    gf = gf.with_constant_time(2019)
    row = gf.df.first()
    assert row["time"].year == 2019 and row["x"] == -83.0
    assert gf.variables == ["LC"]

def test_load_with_resample_step(spark, catalog):
    # optional spatial_resample in the flagship read path
    # (core_functions.py:134-141)
    gf = catalog.load(
        spark, "era5_like", resolution_factor=2.0, resample_method="bilinear"
    )
    assert gf.df.select("x").distinct().count() == 38
    assert gf.df.select("y").distinct().count() == 14


def test_to_dense_arrays_export(spark):
    from tests.grid_fixture import XS, YS, grid_df
    from xarray_dataaccessor_spark.gridframe import GridFrame

    gf = GridFrame(grid_df(spark, with_nulls=True))
    times, ys, xs, arrs = gf.to_dense_arrays()
    assert len(times) == 73 and len(ys) == 7 and len(xs) == 19
    assert ys == sorted(YS) and xs == sorted(XS)
    assert set(arrs) == {"t2m", "u100"}
    assert arrs["t2m"].shape == (73, 7, 19)
    # values land at the right cell: cross-check one row
    row = grid_df(spark).limit(1).collect()[0]
    t_i, y_i, x_i = times.index(row["time"]), ys.index(row["y"]), xs.index(row["x"])
    assert arrs["t2m"][t_i, y_i, x_i] == row["t2m"]
    # nulls surface as NaN
    import numpy as np

    assert np.isnan(arrs["u100"]).sum() > 0

    with __import__("pytest").raises(ValueError, match="max_cells"):
        gf.to_dense_arrays(max_cells=10)

    # xarray gate (not installed in this container)
    try:
        import xarray  # noqa: F401

        has_xr = True
    except ImportError:
        has_xr = False
    if not has_xr:
        with __import__("pytest").raises(NotImplementedError, match="xarray"):
            gf.to_xarray()
