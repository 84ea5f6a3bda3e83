"""NTv2 grid-shift reader + transforms (sources/ntv2.py, crs.NTv2Grid).

The fixture grid's shift field is LINEAR in (row, col), so bilinear
interpolation reproduces it exactly at every interior point — the same
analytic-oracle trick the contour/terrain tests use. Values are chosen
exactly representable in the file's float32 storage.
"""

from __future__ import annotations

import pytest

from xarray_dataaccessor_spark.operators.crs import NTv2Grid
from xarray_dataaccessor_spark.sources.ntv2 import read_ntv2, write_ntv2

# lon [-1, 3]E (positive-west E_LONG=-3*3600 ... careful: E_LONG is the
# EASTERNMOST edge in positive-west seconds = -3deg*3600), lat [50, 54]N
E_LONG, W_LONG = -3.0 * 3600, 1.0 * 3600      # covers lonE in [-1, 3]
S_LAT, N_LAT = 50.0 * 3600, 54.0 * 3600
INC = 1800.0                                   # 0.5 degree
NCOLS = int((W_LONG - E_LONG) / INC) + 1       # 9
NROWS = int((N_LAT - S_LAT) / INC) + 1         # 9


def _sub():
    lat_shift = [
        2.0 + 0.25 * r + 0.5 * c for r in range(NROWS) for c in range(NCOLS)
    ]
    lon_shift = [
        -1.0 + 0.125 * r - 0.25 * c for r in range(NROWS) for c in range(NCOLS)
    ]
    return {
        "S_LAT": S_LAT, "N_LAT": N_LAT, "E_LONG": E_LONG, "W_LONG": W_LONG,
        "LAT_INC": INC, "LONG_INC": INC,
        "lat_shift": lat_shift, "lon_shift": lon_shift,
    }


def _grid():
    return NTv2Grid.from_bytes(write_ntv2([_sub()], "OSGB36", "WGS84"))


def _expected_shift(lon_e: float, lat: float):
    ci = (-lon_e * 3600 - E_LONG) / INC
    ri = (lat * 3600 - S_LAT) / INC
    return 2.0 + 0.25 * ri + 0.5 * ci, -1.0 + 0.125 * ri - 0.25 * ci


def test_roundtrip_header_and_values():
    data = write_ntv2([_sub()], "OSGB36", "WGS84")
    parsed = read_ntv2(data)
    over = parsed["overview"]
    assert over["NUM_FILE"] == 1 and over["GS_TYPE"] == "SECONDS"
    assert over["SYSTEM_F"] == "OSGB36" and over["SYSTEM_T"] == "WGS84"
    sub = parsed["subgrids"][0]
    assert (sub["nrows"], sub["ncols"]) == (NROWS, NCOLS)
    assert sub["GS_COUNT"] == NROWS * NCOLS
    assert sub["lat_shift"] == _sub()["lat_shift"]  # float32-exact values
    assert sub["lon_shift"] == _sub()["lon_shift"]


def test_reader_gates():
    with pytest.raises(ValueError, match="NUM_OREC"):
        read_ntv2(b"GARBAGE!" * 30)
    data = write_ntv2([_sub()])
    with pytest.raises(ValueError, match="truncated"):
        read_ntv2(data[:100])


def test_bilinear_matches_linear_field_exactly():
    g = _grid()
    for lon, lat in [(0.3, 51.7), (-0.9, 50.1), (2.95, 53.9), (1.0, 52.0)]:
        dlat, dlon = g._interp_scalar(lon, lat)
        elat, elon = _expected_shift(lon, lat)
        assert dlat == pytest.approx(elat, abs=1e-9)
        assert dlon == pytest.approx(elon, abs=1e-9)
    with pytest.raises(ValueError, match="outside"):
        g._interp_scalar(10.0, 51.0)


def test_shift_direction_and_roundtrip():
    g = _grid()
    lon, lat = 0.5, 51.5
    tlon, tlat = g.to_target(lon, lat)
    elat, elon_w = _expected_shift(lon, lat)
    # positive-west lon shift subtracts from positive-east longitude
    assert tlat == pytest.approx(lat + elat / 3600.0, abs=1e-12)
    assert tlon == pytest.approx(lon - elon_w / 3600.0, abs=1e-12)
    blon, blat = g.from_target(tlon, tlat)
    assert blon == pytest.approx(lon, abs=1e-10)
    assert blat == pytest.approx(lat, abs=1e-10)
    # projection-object contract: forward(WGS84) = into the legacy datum
    assert g.forward(*g.inverse(lon, lat)) == pytest.approx((lon, lat), abs=1e-10)


def test_column_paths_match_scalar(spark):
    from pyspark.sql import functions as F

    g = _grid()
    pts = [(0.3, 51.7), (-0.5, 50.4), (2.5, 53.2)]
    df = spark.createDataFrame(pts, "x double, y double")
    # literal-array column path
    nx, ny = g.inverse_cols(F.col("x"), F.col("y"))
    got = sorted(
        (r["nx"], r["ny"])
        for r in df.select(nx.alias("nx"), ny.alias("ny")).collect()
    )
    want = sorted(g.to_target(lon, lat) for lon, lat in pts)
    for (gx, gy), (wx, wy) in zip(got, want):
        assert gx == pytest.approx(wx, abs=1e-12)
        assert gy == pytest.approx(wy, abs=1e-12)
    # broadcast-join path (forward = direct shift)
    out = {
        round(r["x0"], 6): (r["x"], r["y"])
        for r in g.apply_to_grid(
            df.withColumn("x0", F.col("x")), "x", "y"
        ).collect()
    }
    for lon, lat in pts:
        wx, wy = g.to_target(lon, lat)
        gx, gy = out[round(lon, 6)]
        assert gx == pytest.approx(wx, abs=1e-12)
        assert gy == pytest.approx(wy, abs=1e-12)
    # broadcast-join inverse round-trips through the forward output
    back = {
        round(r["x0"], 6): (r["x"], r["y"])
        for r in g.apply_to_grid(
            g.apply_to_grid(df.withColumn("x0", F.col("x")), "x", "y"),
            "x", "y", inverse=True,
        ).collect()
    }
    for lon, lat in pts:
        gx, gy = back[round(lon, 6)]
        assert gx == pytest.approx(lon, abs=1e-9)
        assert gy == pytest.approx(lat, abs=1e-9)


def test_out_of_grid_column_contract(spark):
    """Column paths match the scalar ValueError contract: 'error'
    raises on out-of-grid rows (west/south of the subgrid included —
    previously negative indices silently read shifts from the END of
    the literal arrays), 'null' emits NULL shifts."""
    from pyspark.sql import functions as F

    g = _grid()
    bad = spark.createDataFrame(
        [(-2.5, 51.0), (0.5, 49.0)], "x double, y double"  # west / south
    )
    nx, ny = g.inverse_cols(F.col("x"), F.col("y"))
    with pytest.raises(Exception, match="outside NTv2"):
        bad.select(nx.alias("nx"), ny.alias("ny")).collect()
    nx, ny = g.inverse_cols(F.col("x"), F.col("y"), out_of_grid="null")
    rows = bad.select(nx.alias("nx"), ny.alias("ny")).collect()
    assert all(r["nx"] is None and r["ny"] is None for r in rows)
    # broadcast-join path: same contract (was: silent NULLs via missed join)
    with pytest.raises(Exception, match="outside NTv2"):
        g.apply_to_grid(bad, "x", "y").collect()
    out = g.apply_to_grid(bad, "x", "y", out_of_grid="null").collect()
    assert all(r["x"] is None and r["y"] is None for r in out)
    # in-grid rows are untouched by the guard machinery
    good = spark.createDataFrame([(0.5, 51.5)], "x double, y double")
    nx, ny = g.inverse_cols(F.col("x"), F.col("y"))
    r = good.select(nx.alias("nx"), ny.alias("ny")).collect()[0]
    wx, wy = g.to_target(0.5, 51.5)
    assert r["nx"] == pytest.approx(wx, abs=1e-12)
    assert r["ny"] == pytest.approx(wy, abs=1e-12)
    with pytest.raises(ValueError, match="out_of_grid"):
        g.inverse_cols(F.col("x"), F.col("y"), out_of_grid="bogus")


def test_iterated_literal_limit_gate():
    """forward_cols (4 unrolled lookups) trips the tighter iterated
    limit while the single-lookup path still fits."""
    from pyspark.sql import functions as F

    g = _grid()
    g._LITERAL_NODE_LIMIT_ITER = 10
    g.inverse_cols(F.lit(0.5), F.lit(51.5))  # single lookup: fine
    with pytest.raises(NotImplementedError, match="apply_to_grid"):
        g.forward_cols(F.lit(0.5), F.lit(51.5))


def test_literal_node_limit_gate():
    g = _grid()
    g._LITERAL_NODE_LIMIT = 10  # force the gate
    from pyspark.sql import functions as F

    with pytest.raises(NotImplementedError, match="apply_to_grid"):
        g._shift_exprs(F.lit(0.5), F.lit(51.5))
