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


def test_pyproj_fallback_pair_runs(spark):
    # a pair with no closed form here (British National Grid) goes
    # through the Arrow-batched pyproj pandas UDF
    df = spark.createDataFrame([(-0.1276, 51.5074)], "x double, y double")
    out = transform_crs_udf(df, 4326, 27700).collect()[0]
    # published: Charing Cross ~ (530047, 180422) +- a few metres
    assert out["x"] == pytest.approx(530_047, abs=10.0)
    assert out["y"] == pytest.approx(180_422, abs=10.0)
