"""Pure-Python GeoTIFF ingestion (S5), end-to-end: write reference-shaped
granules (LP-DAAC style: one band + GeoTIFF tags + GDAL nodata), read
the real bytes back, decode distributed, land as parquet, query through
the catalog — the ``_get_tiff_granule`` path (``nasa_from_LPDAAC.py:
491-516``) without rasterio."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.sources.geotiff import (
    geotiff_fragment_to_pandas,
    parse_geotiff,
    write_geotiff,
)
from xarray_dataaccessor_spark.sources.ingest import (
    geotiff_glob_to_grid,
    open_geotiff_fragment,
)

# LP-DAAC-ish granule: 0.25-degree cells, upper-left corner at
# (-83.476 - 0.125, 42.883 + 0.125) so pixel CENTERS land on the golden
# fixture axes (test_2_era5.py:131-156 uses the same envelope)
UL_X, UL_Y, STEP = -83.601, 43.008, 0.25


def _granule(rng=None, h=7, w=19):
    if rng is None:
        rng = np.random.RandomState(11)
    return rng.uniform(0.0, 90.0, size=(h, w)).astype("f4")


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("tile_size", [None, 8])
def test_roundtrip_layouts(tmp_path, compress, tile_size):
    vals = _granule()
    p = write_geotiff(
        str(tmp_path / "g.tif"), vals, UL_X, UL_Y, (STEP, STEP),
        epsg=4326, compress=compress, tile_size=tile_size,
    )
    parsed = parse_geotiff(open(p, "rb").read())
    assert (parsed["height"], parsed["width"]) == (7, 19)
    assert parsed["epsg"] == 4326
    np.testing.assert_array_equal(parsed["data"], vals)
    # pixel-center axes
    assert parsed["x_axis"][0] == pytest.approx(-83.476)
    assert parsed["y_axis"][0] == pytest.approx(42.883)
    assert parsed["y_axis"][-1] == pytest.approx(42.883 - 6 * STEP)


def test_big_endian_and_int_dtypes(tmp_path):
    # the reader honors the byte-order mark; exercise via a hand-built
    # MM file (the writer emits II only)
    import struct

    # NB: astype LAST — numpy ufuncs return native-endian, so *100 before
    # astype would silently drop the big-endian dtype
    vals = (np.arange(12).reshape(3, 4) * 100).astype(">i2")
    raw = vals.tobytes()
    entries = [
        (256, 3, 1, struct.pack(">H", 4) + b"\x00\x00"),
        (257, 3, 1, struct.pack(">H", 3) + b"\x00\x00"),
        (258, 3, 1, struct.pack(">H", 16) + b"\x00\x00"),
        (259, 3, 1, struct.pack(">H", 1) + b"\x00\x00"),
        (273, 4, 1, struct.pack(">I", 8 + 2 + 12 * 7 + 4)),
        (279, 4, 1, struct.pack(">I", len(raw))),
        (339, 3, 1, struct.pack(">H", 2) + b"\x00\x00"),
    ]
    out = b"MM" + struct.pack(">HI", 42, 8) + struct.pack(">H", len(entries))
    for tag, ftype, count, val in entries:
        out += struct.pack(">HHI", tag, ftype, count) + val
    out += struct.pack(">I", 0) + raw
    parsed = parse_geotiff(out)
    np.testing.assert_array_equal(parsed["data"], vals.astype("=i2"))
    assert parsed["x_axis"] is None  # no georeferencing tags


def test_nodata_becomes_nan(tmp_path):
    vals = _granule()
    vals[2, 3] = -9999.0
    p = write_geotiff(
        str(tmp_path / "g.tif"), vals, UL_X, UL_Y, (STEP, STEP), nodata=-9999.0
    )
    pdf = open_geotiff_fragment(p, "lai", year=2021)
    assert list(pdf.columns) == ["time", "y", "x", "lai"]
    assert len(pdf) == 7 * 19
    assert str(pdf["time"].iloc[0]).startswith("2021-01-01")
    cell = pdf[(pdf["y"].round(3) == round(42.883 - 2 * STEP, 3))
               & (pdf["x"].round(3) == round(-83.476 + 3 * STEP, 3))]
    assert np.isnan(cell["lai"].iloc[0])


def test_projected_granule_carries_epsg(tmp_path):
    p = write_geotiff(
        str(tmp_path / "utm.tif"), _granule(h=4, w=5),
        630000.0, 4834000.0, (250.0, 250.0), epsg=32617,
    )
    parsed = parse_geotiff(open(p, "rb").read())
    assert parsed["epsg"] == 32617
    assert parsed["x_axis"][0] == pytest.approx(630125.0)


def test_bigtiff_roundtrip(tmp_path):
    """BigTIFF (v43): 8-byte offsets, 20-byte IFD entries, LONG8 types —
    written and decoded by the pure reader, bit-identical to classic."""
    data = (np.arange(35, dtype=np.float32) * 1.5).reshape(5, 7)
    p = str(tmp_path / "big.tif")
    write_geotiff(p, data, -83.5, 42.0, (0.25, 0.25), epsg=4326, nodata=-9.0, big=True)
    buf = open(p, "rb").read()
    assert buf[2:4] == b"\x2b\x00"  # version 43
    parsed = parse_geotiff(buf)
    np.testing.assert_array_equal(parsed["data"], data)
    assert parsed["epsg"] == 4326 and parsed["nodata"] == -9.0
    assert parsed["x_axis"][0] == pytest.approx(-83.375)
    # compressed + tiled BigTIFF exercises the out-of-line LONG8 arrays
    ints = (np.arange(99, dtype=np.int32)).reshape(9, 11)
    p2 = str(tmp_path / "big_tiled.tif")
    write_geotiff(
        p2, ints, 0.0, 9.0, (1.0, 1.0), epsg=32617, compress=True,
        tile_size=4, predictor=2, big=True,
    )
    parsed2 = parse_geotiff(open(p2, "rb").read())
    np.testing.assert_array_equal(parsed2["data"], ints)
    assert parsed2["epsg"] == 32617


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        parse_geotiff(b"PK\x03\x04" + b"\x00" * 32)
    import struct

    with pytest.raises(ValueError, match="offset size"):
        parse_geotiff(b"II" + struct.pack("<H", 43) + b"\x00" * 32)


def test_distributed_glob_ingest_and_catalog_query(spark, tmp_path):
    """Two yearly granules -> binaryFile + mapInPandas decode ->
    partitioned parquet -> pruned catalog query (the full S5 path)."""
    rng = np.random.RandomState(3)
    write_geotiff(str(tmp_path / "lai_2020.tif"), _granule(rng), UL_X, UL_Y, (STEP, STEP))
    write_geotiff(
        str(tmp_path / "lai_2021.tif"), _granule(rng), UL_X, UL_Y, (STEP, STEP),
        compress=True,
    )
    grid = geotiff_glob_to_grid(spark, str(tmp_path / "*.tif"), "lai")
    assert grid.columns == ["time", "y", "x", "lai"]
    assert grid.count() == 2 * 7 * 19
    # both granules land on the same axes; epoch time (no year passed)
    assert grid.select("x").distinct().count() == 19

    from xarray_dataaccessor_spark.sources.ingest import land_grid_parquet

    landed = land_grid_parquet(grid, str(tmp_path), "lai_like")
    back = spark.read.parquet(landed)
    assert back.count() == 2 * 7 * 19

    from xarray_dataaccessor_spark.catalog import DatasetCatalog
    from xarray_dataaccessor_spark.meta import BoundingBox

    cat = DatasetCatalog()
    cat.register("lai_like", landed, ["lai"])
    gf = cat.load(
        spark, "lai_like",
        bbox=BoundingBox(west=-83.0, south=41.5, east=-80.0, north=42.9),
    )
    out = gf.df.groupBy("y").agg(F.count("lai").alias("n"))
    assert out.count() == 6  # 42.883 .. 41.633 within the AOI


def test_int_predictor2_roundtrip(tmp_path):
    """Integer horizontal differencing (predictor 2) round-trips."""
    vals = (np.arange(7 * 19).reshape(7, 19) * 3).astype("i4")
    p = write_geotiff(
        str(tmp_path / "p2.tif"), vals, UL_X, UL_Y, (STEP, STEP),
        epsg=4326, compress=True, predictor=2,
    )
    parsed = parse_geotiff(open(p, "rb").read())
    np.testing.assert_array_equal(parsed["data"], vals)


def test_float_predictor2_rejected(tmp_path):
    """Predictor 2 is integer differencing; on float samples the int64
    cumsum would truncate deltas and decode garbage — reject loudly
    (ADVICE r2). Float TIFFs use predictor 3, now supported."""
    vals = _granule()
    p = write_geotiff(
        str(tmp_path / "pf.tif"), vals, UL_X, UL_Y, (STEP, STEP),
        epsg=4326, predictor=2,
    )
    with pytest.raises(NotImplementedError, match="floating-point"):
        parse_geotiff(open(p, "rb").read())


def test_lzw_compressed_geotiff_roundtrip(tmp_path):
    """TIFF-variant LZW (MSB-first, early change): strips with the
    horizontal predictor, tiles with float samples, and a hypothesis
    property over the raw codec."""
    import numpy as np

    from xarray_dataaccessor_spark.sources.geotiff import (
        _lzw_decode_tiff,
        _lzw_encode_tiff,
        parse_geotiff,
        write_geotiff,
    )

    rng = np.random.default_rng(8)
    data = (rng.standard_normal((50, 60)) * 100).astype("int16")
    p = write_geotiff(
        str(tmp_path / "lzw.tif"), data, -83.0, 43.0, (0.1, 0.1),
        compress="lzw", predictor=2,
    )
    got = parse_geotiff(open(p, "rb").read())
    assert np.array_equal(got["data"], data)

    fl = rng.standard_normal((40, 30)).astype("float32")
    p2 = write_geotiff(
        str(tmp_path / "lzwf.tif"), fl, -83.0, 43.0, (0.1, 0.1),
        compress="lzw", tile_size=16,
    )
    assert np.array_equal(parse_geotiff(open(p2, "rb").read())["data"], fl)

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(blob=st.binary(min_size=0, max_size=3000))
    def rt(blob):
        assert _lzw_decode_tiff(_lzw_encode_tiff(blob)) == blob

    rt()


def test_packbits_compressed_geotiff_roundtrip(tmp_path):
    import numpy as np

    from xarray_dataaccessor_spark.sources.geotiff import (
        _packbits_decode,
        _packbits_encode,
        parse_geotiff,
        write_geotiff,
    )

    rng = np.random.default_rng(1)
    data = rng.integers(0, 5, (30, 40)).astype("uint8")  # runs to compress
    p = write_geotiff(
        str(tmp_path / "pb.tif"), data, -83.0, 43.0, (0.1, 0.1),
        compress="packbits",
    )
    assert np.array_equal(parse_geotiff(open(p, "rb").read())["data"], data)

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=80, deadline=None)
    @given(blob=st.binary(min_size=0, max_size=2000))
    def rt(blob):
        assert _packbits_decode(_packbits_encode(blob)) == blob

    rt()

    # regression: a 2-byte pair landing at literal offset 127 used to
    # produce a 129-byte literal whose header 0x80 decodes as a no-op
    tricky = bytes(range(127)) + b"\xaa\xaa" + bytes(range(50))
    assert _packbits_decode(_packbits_encode(tricky)) == tricky
    tricky2 = bytes(range(126)) + b"\xbb\xbb" + b"\x01\x02\x03"
    assert _packbits_decode(_packbits_encode(tricky2)) == tricky2


def test_float_predictor3_roundtrip(tmp_path):
    """TIFF TechNote 3 floating-point horizontal differencing
    (predictor 3) — what GDAL writes for compressed float rasters:
    plane-separated big-endian bytes, byte-wise differenced per row."""
    import numpy as np

    from xarray_dataaccessor_spark.sources.geotiff import (
        parse_geotiff,
        write_geotiff,
    )

    rng = np.random.default_rng(0)
    data = (270.0 + rng.standard_normal((23, 31))).astype("float32")
    for kwargs in (dict(), dict(tile_size=16)):
        p = write_geotiff(
            str(tmp_path / f"p3_{len(kwargs)}.tif"), data, -83.0, 43.0,
            (0.1, 0.1), compress="deflate", predictor=3, **kwargs,
        )
        got = parse_geotiff(open(p, "rb").read())["data"]
        assert np.array_equal(got, data)
    # float64 path (8 byte planes)
    d64 = (1.5 + rng.standard_normal((9, 140))).astype("float64")  # long rows
    p = write_geotiff(str(tmp_path / "p3_64.tif"), d64, -83.0, 43.0,
                      (0.1, 0.1), compress="deflate", predictor=3)
    assert np.array_equal(parse_geotiff(open(p, "rb").read())["data"], d64)


def test_cog_layout_and_roundtrip(tmp_path):
    """write_cog: the full-resolution image round-trips through
    parse_geotiff (first IFD), the overview chain parses with halved
    dimensions and doubled pixel scale, and the COG property holds —
    every IFD byte precedes every tile byte, and overview tiles
    precede full-resolution tiles."""
    import struct

    from xarray_dataaccessor_spark.sources.geotiff import (
        parse_geotiff_overviews,
        write_cog,
    )

    rng = np.random.RandomState(3)
    data = rng.randint(0, 1000, size=(137, 211)).astype("i4")
    p = str(tmp_path / "c.tif")
    write_cog(p, data, x_origin=-80.0, y_origin=45.0, pixel_size=(0.01, 0.01),
              epsg=4326, nodata=-9, tile_size=64, overview_levels=(2, 4))
    buf = open(p, "rb").read()
    main = parse_geotiff(buf)
    np.testing.assert_array_equal(main["data"], data)
    assert main["epsg"] == 4326 and main["nodata"] == -9.0
    ovs = parse_geotiff_overviews(buf)
    assert [(o["width"], o["height"], o["subfile_type"]) for o in ovs] == [
        (211, 137, 0), (106, 69, 1), (53, 35, 1)
    ]
    # overview pixels are 2x2 block means of the level above
    lvl1 = ovs[1]["data"]
    assert lvl1[0, 0] == np.round(data[0:2, 0:2].mean()).astype("i4")
    assert abs((ovs[1]["x_axis"][1] - ovs[1]["x_axis"][0]) - 0.02) < 1e-12
    # structural COG checks: walk the IFD chain offsets and collect the
    # minimum tile offset per level
    def ifd_info(off):
        (n,) = struct.unpack("<H", buf[off:off + 2])
        tags = {}
        for i in range(n):
            e = buf[off + 2 + 12 * i: off + 2 + 12 * (i + 1)]
            tag, ftype, count = struct.unpack("<HHI", e[:8])
            tags[tag] = (ftype, count, e[8:12])
        (nxt,) = struct.unpack("<I", buf[off + 2 + 12 * n: off + 6 + 12 * n])
        return tags, nxt, off + 6 + 12 * n
    (first,) = struct.unpack("<I", buf[4:8])
    offs, ifd_ends = [], []
    off = first
    while off:
        tags, off, end = ifd_info(off)
        ifd_ends.append(end)
        ftype, count, vf = tags[324]  # tile offsets
        (ptr,) = struct.unpack("<I", vf)
        vals = struct.unpack("<" + "I" * count, buf[ptr:ptr + 4 * count]) \
            if count > 1 else (ptr,)
        offs.append(min(vals))
    assert len(offs) == 3
    assert max(ifd_ends) < min(offs), "IFDs must precede all tile data"
    assert offs[1] < offs[0] and offs[2] < offs[0], \
        "overview tiles must precede full-resolution tiles"


def test_overview_walk_on_plain_tiff(tmp_path):
    """A single-IFD TIFF walks as a one-element chain."""
    from xarray_dataaccessor_spark.sources.geotiff import parse_geotiff_overviews

    p = str(tmp_path / "p.tif")
    write_geotiff(p, np.arange(12, dtype="u2").reshape(3, 4), -80.0, 45.0,
                  (0.5, 0.5))
    ovs = parse_geotiff_overviews(open(p, "rb").read())
    assert len(ovs) == 1 and ovs[0]["subfile_type"] == 0
