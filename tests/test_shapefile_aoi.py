"""Pure-Python shapefile AOI (S6): the bbox comes from the 100-byte
``.shp`` header (ESRI spec), the CRS from the ``.prj`` WKT, projected
envelopes reproject through the closed-form registry — mirroring
``_bbox_from_shp`` (``utility_functions.py:125-159``: read ->
``to_crs(4326)`` -> ``total_bounds``) without geopandas."""

from __future__ import annotations

import struct

import pytest

from xarray_dataaccessor_spark.catalog import (
    bbox_from_shapefile,
    get_bounding_box,
)
from xarray_dataaccessor_spark.operators.crs import utm_crs


def write_shp(path, xmin, ymin, xmax, ymax):
    """Minimal valid .shp: file code 9994 BE, length, version + shape
    type LE, the 4-double envelope, zero Z/M ranges, no records."""
    header = struct.pack(">i", 9994) + b"\x00" * 20 + struct.pack(">i", 50)
    header += struct.pack("<ii", 1000, 5)  # version, polygon
    header += struct.pack("<4d", xmin, ymin, xmax, ymax)
    header += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)
    path.write_bytes(header)
    return path


WGS84_WKT = (
    'GEOGCS["GCS_WGS_1984",DATUM["D_WGS_1984",SPHEROID["WGS_1984",'
    "6378137.0,298.257223563]],PRIMEM[\"Greenwich\",0.0],"
    'UNIT["Degree",0.0174532925199433]]'
)
UTM17N_ESRI_WKT = (
    'PROJCS["WGS_1984_UTM_Zone_17N",GEOGCS["GCS_WGS_1984",'
    'DATUM["D_WGS_1984",SPHEROID["WGS_1984",6378137.0,298.257223563]],'
    'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
    'PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],'
    'PARAMETER["Central_Meridian",-81.0],PARAMETER["Scale_Factor",0.9996],'
    'UNIT["Meter",1.0]]'
)
UTM17N_AUTHORITY_WKT = UTM17N_ESRI_WKT[:-1] + ',AUTHORITY["EPSG","32617"]]'


def test_wgs84_shapefile_bbox(tmp_path):
    write_shp(tmp_path / "aoi.shp", -83.476, 41.383, -78.976, 42.883)
    (tmp_path / "aoi.prj").write_text(WGS84_WKT)
    bb = bbox_from_shapefile(tmp_path / "aoi.shp")
    assert (bb.west, bb.south, bb.east, bb.north) == (-83.476, 41.383, -78.976, 42.883)


def test_missing_prj_assumes_geographic(tmp_path):
    write_shp(tmp_path / "aoi.shp", 1.0, 2.0, 3.0, 4.0)
    bb = bbox_from_shapefile(tmp_path / "aoi.shp")
    assert (bb.west, bb.south, bb.east, bb.north) == (1.0, 2.0, 3.0, 4.0)


@pytest.mark.parametrize("wkt", [UTM17N_ESRI_WKT, UTM17N_AUTHORITY_WKT])
def test_projected_shapefile_reprojects_to_4326(tmp_path, wkt):
    tm = utm_crs(32617)
    w, s = tm.forward(-83.476, 41.383)
    e, n = tm.forward(-78.976, 42.883)
    write_shp(tmp_path / "aoi.shp", min(w, e), min(s, n), max(w, e), max(s, n))
    (tmp_path / "aoi.prj").write_text(wkt)
    bb = bbox_from_shapefile(tmp_path / "aoi.shp")
    assert bb.west == pytest.approx(-83.476, abs=1e-8)
    assert bb.south == pytest.approx(41.383, abs=1e-8)
    assert bb.east == pytest.approx(-78.976, abs=1e-8)
    assert bb.north == pytest.approx(42.883, abs=1e-8)


def test_web_mercator_prj(tmp_path):
    from xarray_dataaccessor_spark.meta import BoundingBox
    from xarray_dataaccessor_spark.operators.spatial import bbox_to_crs

    src = BoundingBox(west=-83.476, south=41.383, east=-78.976, north=42.883)
    merc = bbox_to_crs(src, 4326, 3857)
    write_shp(tmp_path / "aoi.shp", merc.west, merc.south, merc.east, merc.north)
    (tmp_path / "aoi.prj").write_text(
        'PROJCS["WGS_1984_Web_Mercator_Auxiliary_Sphere",'
        + WGS84_WKT + "]"
    )
    bb = bbox_from_shapefile(tmp_path / "aoi.shp")
    assert bb.west == pytest.approx(-83.476, abs=1e-9)
    assert bb.north == pytest.approx(42.883, abs=1e-9)


def test_bad_magic_rejected(tmp_path):
    (tmp_path / "not.shp").write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError, match="Not an ESRI shapefile"):
        bbox_from_shapefile(tmp_path / "not.shp")


def test_unknown_crs_gated(tmp_path):
    write_shp(tmp_path / "aoi.shp", 0.0, 0.0, 1.0, 1.0)
    (tmp_path / "aoi.prj").write_text(
        'PROJCS["OSGB_1936_British_National_Grid",GEOGCS["GCS_OSGB_1936"]]'
    )
    with pytest.raises(NotImplementedError):
        bbox_from_shapefile(tmp_path / "aoi.shp")


def test_get_bounding_box_union_with_shapefile(tmp_path):
    # the reference unions multi-source AOIs (core_functions.py:147-202)
    write_shp(tmp_path / "aoi.shp", -83.0, 41.5, -80.0, 42.0)
    bb = get_bounding_box(
        coords=[(42.5, -79.5)], shapefile=tmp_path / "aoi.shp", union_bbox=True
    )
    assert (bb.west, bb.south) == (-83.0, 41.5)
    assert bb.east == pytest.approx(-79.45)  # degenerate coord padded
    assert bb.north == pytest.approx(42.55)


def test_non_wgs84_utm_prj_gated(tmp_path):
    """A UTM zone name without a WGS84 datum token (NAD27/NAD83/ETRS89
    ESRI .prj) must NOT be silently mapped to the 326xx WGS84 codes
    (~200 m bbox error for NAD27) — it falls to the geo-extras gate
    (ADVICE r2)."""
    nad83 = (
        'PROJCS["NAD_1983_UTM_Zone_17N",GEOGCS["GCS_North_American_1983",'
        'DATUM["D_North_American_1983",SPHEROID["GRS_1980",6378137.0,298.257222101]],'
        'PRIMEM["Greenwich",0.0],UNIT["Degree",0.0174532925199433]],'
        'PROJECTION["Transverse_Mercator"],PARAMETER["False_Easting",500000.0],'
        'PARAMETER["Central_Meridian",-81.0],PARAMETER["Scale_Factor",0.9996],'
        'UNIT["Meter",1.0]]'
    )
    write_shp(tmp_path / "aoi.shp", 200000.0, 4500000.0, 700000.0, 4800000.0)
    (tmp_path / "aoi.prj").write_text(nad83)
    with pytest.raises(NotImplementedError, match="datum"):
        bbox_from_shapefile(tmp_path / "aoi.shp")
