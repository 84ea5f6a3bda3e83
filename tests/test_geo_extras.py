"""Optional geo-extras paths (``pip install .[geo]``): exercised only
when pyproj is importable, skipped otherwise — so `pytest -m geo` in an
extras-installed environment proves the gated fallbacks, and the
minimal container still runs a fully green suite.

The closed-form registry (Mercator + UTM) is the primary path and is
tested unconditionally in test_crs.py; these tests pin the pyproj
pandas-UDF fallback to the same answers."""

from __future__ import annotations

import pytest

pyproj = pytest.importorskip("pyproj")

from xarray_dataaccessor_spark.operators.crs import utm_crs  # noqa: E402
from xarray_dataaccessor_spark.operators.spatial import (  # noqa: E402
    transform_crs_udf,
)

pytestmark = pytest.mark.geo


def test_closed_form_utm_matches_pyproj():
    t = pyproj.Transformer.from_crs(4326, 32617, always_xy=True)
    tm = utm_crs(32617)
    for lon, lat in [(-79.3871635, 43.6425966), (-81.0, 0.0), (-84.3, -33.7)]:
        px, py = t.transform(lon, lat)
        ke, kn = tm.forward(lon, lat)
        assert ke == pytest.approx(px, abs=1e-3)
        assert kn == pytest.approx(py, abs=1e-3)


def test_pyproj_agrees_with_closed_form_osgb(spark):
    """27700 resolves closed-form since round 9 (Helmert +
    Airy/Krüger); pyproj must land within the OSTN15-vs-Helmert band
    (PROJ uses the grid file when its data directory carries it, the
    same towgs84 Helmert otherwise — metres apart, never tens)."""
    from xarray_dataaccessor_spark.operators.crs import transform_point

    cx, cy = transform_point(-0.1276, 51.5074, 4326, 27700)
    t = pyproj.Transformer.from_crs(4326, 27700, always_xy=True)
    px, py = t.transform(-0.1276, 51.5074)
    assert cx == pytest.approx(px, abs=10.0)
    assert cy == pytest.approx(py, abs=10.0)


def test_pyproj_fallback_pair_runs(spark):
    # a pair with no closed form here (Swiss LV95, oblique mercator)
    # goes through the Arrow-batched pyproj pandas UDF; round-trip
    # closure avoids baking in memory-derived control values
    df = spark.createDataFrame([(7.4386, 46.9510)], "x double, y double")
    out = transform_crs_udf(df, 4326, 2056).collect()[0]
    back = transform_crs_udf(
        spark.createDataFrame([(out["x"], out["y"])], "x double, y double"),
        2056, 4326,
    ).collect()[0]
    assert back["x"] == pytest.approx(7.4386, abs=1e-6)
    assert back["y"] == pytest.approx(46.9510, abs=1e-6)
