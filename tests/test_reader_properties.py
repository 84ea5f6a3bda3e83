"""Hypothesis round-trip properties for the pure-Python format readers
(NetCDF3 / GeoTIFF / Zarr): write arbitrary arrays with the fixture
writers, parse the bytes back, require bit-exact data and geometry.
These run entirely driver-side (no Spark session) so they are fast
enough for wide input sampling."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

dims2d = st.tuples(st.integers(2, 9), st.integers(2, 11))
float_grid = dims2d.flatmap(
    lambda hw: st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, width=32),
        min_size=hw[0] * hw[1], max_size=hw[0] * hw[1],
    ).map(lambda v: np.array(v, dtype="f4").reshape(hw))
)


@settings(max_examples=25, deadline=None)
@given(float_grid, st.booleans(), st.sampled_from([None, 4]), st.booleans())
def test_geotiff_roundtrip_property(tmp_path_factory, vals, compress, tile, big):
    from xarray_dataaccessor_spark.sources.geotiff import parse_geotiff, write_geotiff

    p = tmp_path_factory.mktemp("gt") / "g.tif"
    write_geotiff(str(p), vals, -83.5, 43.0, (0.25, 0.25), epsg=4326,
                  compress=compress, tile_size=tile, big=big)
    parsed = parse_geotiff(p.read_bytes())
    np.testing.assert_array_equal(parsed["data"], vals)
    assert parsed["epsg"] == 4326
    h, w = vals.shape
    assert len(parsed["y_axis"]) == h and len(parsed["x_axis"]) == w
    np.testing.assert_allclose(np.diff(parsed["x_axis"]), 0.25)


@settings(max_examples=25, deadline=None)
@given(
    dims2d,
    st.sampled_from(["f8", "f4", "i4", "i2"]),
    st.integers(0, 2**16 - 1),
)
def test_netcdf3_roundtrip_property(tmp_path_factory, hw, dtype, seed):
    from xarray_dataaccessor_spark.sources.netcdf3 import parse_netcdf3, write_netcdf3

    rng = np.random.RandomState(seed)
    h, w = hw
    vals = (rng.uniform(-1e4, 1e4, size=(h, w))).astype(dtype)
    ys = np.arange(h, dtype="f8") * 0.5
    xs = np.arange(w, dtype="f8") * 0.25
    p = tmp_path_factory.mktemp("nc") / "g.nc"
    write_netcdf3(
        str(p),
        dims={"y": h, "x": w},
        variables={
            "y": (["y"], ys, {}),
            "x": (["x"], xs, {}),
            "v": (["y", "x"], vals, {"units": "1"}),
        },
    )
    parsed = parse_netcdf3(p.read_bytes())
    assert parsed["dims"] == {"y": h, "x": w}
    got = parsed["variables"]["v"]["data"]
    # classic format has no 64-bit int: i8 fixtures narrow to i4
    np.testing.assert_array_equal(got, vals.astype(got.dtype))
    np.testing.assert_array_equal(parsed["variables"]["x"]["data"], xs)


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(st.integers(2, 7), st.integers(2, 7), st.integers(2, 9)),
    st.tuples(st.integers(1, 4), st.integers(1, 4), st.integers(1, 5)),
    st.booleans(),
    st.integers(0, 2**16 - 1),
)
def test_zarr_roundtrip_property(tmp_path_factory, shape, chunks, compress, seed):
    from xarray_dataaccessor_spark.sources.zarr import (
        decode_chunk,
        read_zarray,
        write_zarr,
    )

    rng = np.random.RandomState(seed)
    data = rng.standard_normal(shape)
    store = str(tmp_path_factory.mktemp("z") / "s.zarr")
    write_zarr(store, "v", data, ["t", "y", "x"], chunks=list(chunks),
               compress=compress)
    meta = read_zarray(store, "v")
    assert meta["shape"] == list(shape) and meta["chunks"] == list(chunks)
    # reassemble every chunk (with edge trimming) and compare bit-exact
    import os

    out = np.empty(shape, dtype=data.dtype)
    grid = [(s + c - 1) // c for s, c in zip(shape, chunks)]
    for idx in np.ndindex(*grid):
        with open(os.path.join(store, "v", ".".join(map(str, idx))), "rb") as f:
            block = decode_chunk(f.read(), meta)
        sel = tuple(
            slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, shape)
        )
        out[sel] = block[tuple(slice(0, sl.stop - sl.start) for sl in sel)]
    np.testing.assert_array_equal(out, data)


@settings(max_examples=25, deadline=None)
@given(
    st.tuples(st.integers(2, 7), st.integers(2, 7), st.integers(2, 9)),
    st.tuples(st.integers(1, 4), st.integers(1, 4), st.integers(1, 5)),
    st.booleans(),
    st.booleans(),
    st.sampled_from(["<f8", "<f4", "<i4", ">i2"]),
    st.integers(0, 2**16 - 1),
)
def test_hdf5_roundtrip_property(
    tmp_path_factory, shape, chunks, compress, shuffle, dtype, seed
):
    """Arbitrary arrays through the netCDF-4/HDF5 fixture writer and the
    pure reader: chunk-grid edge trimming, deflate, byte shuffle, and
    both endiannesses must all round-trip bit-exact, with dimension
    names recovered through DIMENSION_LIST object references."""
    from xarray_dataaccessor_spark.sources.hdf5 import parse_hdf5, write_hdf5

    rng = np.random.RandomState(seed)
    data = (rng.uniform(-1e4, 1e4, size=shape)).astype(dtype)
    dims = {"t": shape[0], "y": shape[1], "x": shape[2]}
    p = tmp_path_factory.mktemp("h5") / "g.nc"
    write_hdf5(
        str(p),
        dims=dims,
        variables={
            "t": (["t"], np.arange(shape[0], dtype="<f8"), {}),
            "y": (["y"], np.arange(shape[1], dtype="<f8") * 0.5, {}),
            "x": (["x"], np.arange(shape[2], dtype="<f8") * 0.25, {}),
            "v": (["t", "y", "x"], data, {"units": "1"}),
        },
        chunks={"v": list(chunks)},
        compress=compress,
        shuffle=shuffle,
    )
    parsed = parse_hdf5(p.read_bytes())
    assert parsed["dims"] == dims
    v = parsed["variables"]["v"]
    assert v["dims"] == ["t", "y", "x"]
    np.testing.assert_array_equal(v["data"], data)
    np.testing.assert_array_equal(
        parsed["variables"]["x"]["data"], np.arange(shape[2]) * 0.25
    )


def test_granule_reader_corruption_sweeps_terminate(tmp_path):
    """Seeded bit-flip sweeps over valid granules: every corruption must
    raise a normal error or parse — never hang. (Found and fixed: a
    corrupt TIFF IFD count built a multi-GB struct format string; a
    GRIB2 section length of 0 stalled the section walk; unbounded
    zlib inflates could balloon before any size check.)"""
    import datetime
    import os
    import random

    import numpy as np

    from xarray_dataaccessor_spark.sources.geotiff import (
        parse_geotiff,
        write_geotiff,
    )
    from xarray_dataaccessor_spark.sources.grib2 import parse_grib2, write_grib2
    from xarray_dataaccessor_spark.sources.netcdf3 import (
        parse_netcdf3,
        write_netcdf3,
    )

    rng0 = np.random.default_rng(0)
    data2d = (270 + rng0.standard_normal((6, 9))).astype("f4")
    base_tif = open(
        write_geotiff(str(tmp_path / "t.tif"), data2d, -83.0, 43.0,
                      (0.25, 0.25), compress=True), "rb",
    ).read()
    write_netcdf3(
        str(tmp_path / "t.nc"), {"time": 3, "lat": 6, "lon": 9},
        {"t2m": (["time", "lat", "lon"], np.tile(data2d, (3, 1, 1)), {}),
         "lat": (["lat"], np.arange(6.0), {}),
         "lon": (["lon"], np.arange(9.0), {})},
    )
    base_nc = open(str(tmp_path / "t.nc"), "rb").read()
    pg = write_grib2(str(tmp_path / "t.grib2"), [dict(
        ref_time=datetime.datetime(2024, 1, 1), forecast_hour=0, category=0,
        number=0, lats=43.0 - 0.25 * np.arange(6),
        lons=-83.0 + 0.25 * np.arange(9), data=data2d,
    )])
    base_grib = open(pg, "rb").read()
    for base, fn in ((base_tif, parse_geotiff), (base_nc, parse_netcdf3),
                     (base_grib, parse_grib2)):
        rng = random.Random(0)
        for _ in range(120):
            buf = bytearray(base)
            for _ in range(rng.randrange(1, 4)):
                buf[rng.randrange(len(buf))] ^= 1 << rng.randrange(8)
            try:
                fn(bytes(buf))
            except (ValueError, IndexError, KeyError, NotImplementedError,
                    OverflowError, MemoryError):
                pass
            except Exception as exc:  # struct.error and friends
                assert type(exc).__name__ in ("error",), exc
