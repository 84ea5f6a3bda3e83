"""Zonal statistics: point-in-polygon fold, polygon shapefile I/O, and
per-zone aggregation (operators/spatial.py, catalog.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.catalog import (
    polygons_from_shapefile,
    write_shapefile_polygons,
)
from xarray_dataaccessor_spark.operators.spatial import (
    point_in_polygon_expr,
    zonal_stats,
)

# unit right triangle (0,0)-(4,0)-(0,4) and a square with a hole
TRIANGLE = [[(0.0, 0.0), (4.0, 0.0), (0.0, 4.0), (0.0, 0.0)]]
SQUARE_HOLED = [
    [(10.0, 0.0), (14.0, 0.0), (14.0, 4.0), (10.0, 4.0), (10.0, 0.0)],
    [(11.0, 1.0), (13.0, 1.0), (13.0, 3.0), (11.0, 3.0), (11.0, 1.0)],
]


def _py_pip(px, py, rings):
    inside = False
    for ring in rings:
        closed = list(ring)
        if closed[0] != closed[-1]:
            closed.append(closed[0])
        for (x1, y1), (x2, y2) in zip(closed, closed[1:]):
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                inside = not inside
    return inside


@pytest.fixture(scope="module")
def points(spark):
    pts = [
        (i, x / 2.0, y / 2.0)
        for i, (x, y) in enumerate(
            (x, y) for x in range(-2, 31) for y in range(-2, 11)
        )
    ]
    return spark.createDataFrame(pts, "pid bigint, x double, y double")


def test_point_in_polygon_matches_python(spark, points):
    for rings in (TRIANGLE, SQUARE_HOLED):
        got = points.select(
            "pid", "x", "y", point_in_polygon_expr("x", "y", rings).alias("inp")
        ).collect()
        for r in got:
            assert r["inp"] == _py_pip(r["x"], r["y"], rings), (
                r["x"], r["y"], rings is TRIANGLE
            )


def test_hole_is_excluded(spark):
    df = spark.createDataFrame(
        [(12.0, 2.0), (10.5, 0.5)], "x double, y double"
    )
    got = [
        r["inp"]
        for r in df.select(
            point_in_polygon_expr("x", "y", SQUARE_HOLED).alias("inp")
        ).collect()
    ]
    assert got == [False, True]  # hole centre out, rim in


def test_zonal_stats_hand_computed(spark, points):
    vals = points.withColumn("v", F.col("x") + 10.0 * F.col("y"))
    out = zonal_stats(
        vals.select("x", "y", "v"),
        [TRIANGLE, SQUARE_HOLED],
        value_cols=["v"],
        how="mean",
    ).collect()
    rows = {r["zone_id"]: r for r in out}
    expected = {0: [], 1: []}
    for r in vals.collect():
        for zid, rings in ((0, TRIANGLE), (1, SQUARE_HOLED)):
            if _py_pip(r["x"], r["y"], rings):
                expected[zid].append(r["v"])
    for zid in (0, 1):
        assert rows[zid]["n_cells"] == len(expected[zid])
        assert rows[zid]["v"] == pytest.approx(
            sum(expected[zid]) / len(expected[zid])
        )


def test_zonal_stats_overlapping_zones_and_groups(spark):
    # two overlapping unit squares: the shared cell lands in both zones
    z0 = [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]
    z1 = [[(1.0, 0.0), (3.0, 0.0), (3.0, 2.0), (1.0, 2.0), (1.0, 0.0)]]
    df = spark.createDataFrame(
        [("a", 0.5, 1.0, 1.0), ("a", 1.5, 1.0, 2.0), ("a", 2.5, 1.0, 4.0)],
        "t string, x double, y double, v double",
    )
    out = zonal_stats(df, [z0, z1], value_cols=["v"], how="sum",
                      group_cols=("t",), zone_ids=(7, 9))
    rows = {r["zone_id"]: (r["n_cells"], r["v"]) for r in out.collect()}
    assert rows == {7: (2, 3.0), 9: (2, 6.0)}


def test_shapefile_polygon_round_trip(tmp_path):
    path = str(tmp_path / "zones.shp")
    write_shapefile_polygons(path, [TRIANGLE, SQUARE_HOLED])
    got = polygons_from_shapefile(path)
    assert got == [TRIANGLE, SQUARE_HOLED]


def test_shapefile_rejects_non_polygon(tmp_path):
    import struct

    path = str(tmp_path / "pts.shp")
    content = struct.pack("<i", 1) + struct.pack("<2d", 1.0, 2.0)
    body = struct.pack(">2i", 1, len(content) // 2) + content
    header = struct.pack(">i", 9994) + b"\x00" * 20
    header += struct.pack(">i", (100 + len(body)) // 2)
    header += struct.pack("<2i", 1000, 1) + struct.pack("<4d", 0, 0, 0, 0)
    header += struct.pack("<4d", 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header + body)
    with pytest.raises(NotImplementedError, match="shape type 1"):
        polygons_from_shapefile(path)


def test_zonal_from_shapefile_end_to_end(spark, tmp_path, points):
    path = str(tmp_path / "aoi.shp")
    write_shapefile_polygons(path, [TRIANGLE])
    polys = polygons_from_shapefile(path)
    direct = zonal_stats(
        points.select("x", "y", F.lit(1.0).alias("v")), [TRIANGLE],
        value_cols=["v"], how="sum",
    ).collect()
    via_shp = zonal_stats(
        points.select("x", "y", F.lit(1.0).alias("v")), polys,
        value_cols=["v"], how="sum",
    ).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, via_shp))


def test_zonal_duckdb_replay(spark, points):
    """The fold replays exactly in SQL — same doubles, same crossings."""
    import duckdb

    pdf = points.toPandas()
    got = (
        zonal_stats(points.select("x", "y", (F.col("x") * F.col("y")).alias("v")),
                    [TRIANGLE, SQUARE_HOLED], value_cols=["v"], how="sum")
        .orderBy("zone_id").toPandas()
    )
    con = duckdb.connect()
    con.register("pts", pdf)

    def edges_sql(rings):
        es = []
        for ring in rings:
            closed = list(ring) + ([ring[0]] if ring[0] != ring[-1] else [])
            es += list(zip(closed, closed[1:]))
        return ", ".join(
            "{'x1': %r, 'y1': %r, 'x2': %r, 'y2': %r}" % (x1, y1, x2, y2)
            for (x1, y1), (x2, y2) in es if (x1, y1) != (x2, y2)
        )

    frags = []
    for zid, rings in ((0, TRIANGLE), (1, SQUARE_HOLED)):
        frags.append(f"""
        SELECT {zid} AS zone_id, COUNT(*) AS n_cells, SUM(x * y) AS v
        FROM pts
        WHERE list_sum(list_transform([{edges_sql(rings)}],
              e -> CASE WHEN (e.y1 > y) != (e.y2 > y)
                        THEN (CASE WHEN x < (e.x2 - e.x1) * (y - e.y1)
                                        / (e.y2 - e.y1) + e.x1
                                   THEN 1 ELSE 0 END)
                        ELSE 0 END)) % 2 = 1
        """)
    oracle = con.execute(
        " UNION ALL ".join(frags) + " ORDER BY zone_id"
    ).fetchdf()
    assert list(got["n_cells"]) == list(oracle["n_cells"])
    assert list(got["v"]) == list(oracle["v"])


def test_zonal_plan_single_shuffle(spark, points):
    """Assignment is map-side: exactly one exchange (the final zone
    aggregation), no join, no cartesian product."""
    plan = (
        zonal_stats(points.select("x", "y", F.lit(1.0).alias("v")),
                    [TRIANGLE], value_cols=["v"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "Join" not in plan
    assert plan.count("Exchange") <= 2  # shuffle + AQE read


def test_gridframe_zonal_stats_shapefile(spark, tmp_path, sf_dir):
    """The reference-style entry point: GridFrame.zonal_stats(shapefile=...)
    aggregates per (zone, time) over the real derived grid."""
    from pyspark.sql import functions as F

    from xarray_dataaccessor_spark.gridframe import GridFrame
    from xarray_dataaccessor_spark.sources.tables import grid_view

    gv = grid_view(spark, sf_dir)
    b = gv.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).first()
    tri = [[(b[0], b[2]), (b[1], b[2]), (b[0], b[3]), (b[0], b[2])]]
    path = str(tmp_path / "aoi.shp")
    write_shapefile_polygons(path, [tri])
    out = GridFrame(gv).zonal_stats(shapefile=path, how="mean")
    rows = out.collect()
    assert rows and all(r["zone_id"] == 0 for r in rows)
    assert {"time", "n_cells", "t2m"} <= set(out.columns)
    # per_time=False collapses time away
    tot = GridFrame(gv).zonal_stats(shapefile=path, per_time=False).collect()
    assert len(tot) == 1
    assert tot[0]["n_cells"] == sum(r["n_cells"] for r in rows)
    import pytest as _pt

    with _pt.raises(ValueError, match="polygons"):
        GridFrame(gv).zonal_stats()


def test_zonal_bucketed_matches_brute(spark, points):
    """100-polygon coarse-grid pre-bucket path: identical results to the
    literal-expression brute path, candidate pruning via a broadcast
    hash join on the coarse cell key (no cartesian, no |P|-sized
    expression)."""
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_bucketed

    # 10x10 lattice of 1.2-unit squares with 1.5-unit pitch (gaps +
    # varied offsets so some points fall outside every polygon)
    polys = [
        [[(cx, cy), (cx + 1.2, cy), (cx + 1.2, cy + 1.2), (cx, cy + 1.2)]]
        for i in range(10)
        for j in range(10)
        for cx, cy in [(-2.0 + i * 1.5, -2.0 + j * 0.7)]
    ]
    src = points.select("x", "y", (F.col("x") + F.col("y")).alias("v"))
    brute = zonal_stats(src, polys, value_cols=["v"], how="sum").collect()
    fast_df = zonal_stats_bucketed(
        src, polys, cell_size=2.0, value_cols=["v"], how="sum"
    )
    fast = fast_df.collect()
    key = lambda r: (r["zone_id"], r["n_cells"], r["v"])
    assert sorted(map(key, brute)) == sorted(map(key, fast))
    assert len(fast) > 20  # the lattice genuinely intersects the points
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # candidate pruning on cell keys


def test_zonal_bucketed_holes_and_empty_cells(spark, points):
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_bucketed

    got = zonal_stats_bucketed(
        points.select("x", "y", F.lit(1.0).alias("v")),
        [TRIANGLE, SQUARE_HOLED], cell_size=3.0, value_cols=["v"], how="sum",
    ).collect()
    brute = zonal_stats(
        points.select("x", "y", F.lit(1.0).alias("v")),
        [TRIANGLE, SQUARE_HOLED], value_cols=["v"], how="sum",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, brute))


# ---------------------------------------------------------------------------
# Area-weighted zonal statistics (exactextract semantics)
# ---------------------------------------------------------------------------
def _unit_grid(spark, nx, ny, v=None):
    rows = [
        (float(i), float(j), float(v(i, j) if v else 1.0))
        for i in range(nx) for j in range(ny)
    ]
    return spark.createDataFrame(rows, "x double, y double, val double")


def test_weighted_fractions_analytic(spark):
    """A rectangle covering exactly half of two unit cells: weights are
    exactly 0.5 and the weighted mean equals the plain mean of the two
    touched cells."""
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_weighted

    grid = _unit_grid(spark, 4, 1, v=lambda i, j: 10.0 * i)
    # cells are centred on integer x with dx=1: cell i spans [i-.5, i+.5]
    # rect [0.0, 1.0] x [-0.5, 0.5] covers the right half of cell 0 and
    # the left half of cell 1
    rect = [[(0.0, -0.5), (1.0, -0.5), (1.0, 0.5), (0.0, 0.5)]]
    out = zonal_stats_weighted(
        grid, [rect], dx=1.0, dy=1.0, value_cols=["val"], how="mean"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["covered_cells"] - 1.0) < 1e-12   # 0.5 + 0.5
    assert r["n_cells"] == 2
    assert abs(r["val"] - 5.0) < 1e-12             # (0.5*0 + 0.5*10) / 1.0


def test_weighted_area_conservation(spark):
    """sum of weights x cell_area == polygon area for a polygon fully
    inside the grid (triangle area 8)."""
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_weighted

    grid = _unit_grid(spark, 12, 12)
    tri = [[(2.0, 2.0), (6.0, 2.0), (2.0, 6.0)]]
    r = zonal_stats_weighted(
        grid, [tri], dx=1.0, dy=1.0, value_cols=["val"], how="sum"
    ).first()
    assert abs(r["covered_cells"] - 8.0) < 1e-9
    assert abs(r["val"] - 8.0) < 1e-9  # val==1 -> sum(w*v) = area


def test_weighted_hole_subtracts(spark):
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_weighted

    grid = _unit_grid(spark, 12, 12)
    sq = [
        [(2.0, 2.0), (8.0, 2.0), (8.0, 8.0), (2.0, 8.0)],   # area 36
        [(4.0, 4.0), (6.0, 4.0), (6.0, 6.0), (4.0, 6.0)],   # hole area 4
    ]
    r = zonal_stats_weighted(
        grid, [sq], dx=1.0, dy=1.0, value_cols=["val"], how="sum"
    ).first()
    assert abs(r["covered_cells"] - 32.0) < 1e-9


def test_weighted_matches_unweighted_on_aligned_polygon(spark):
    """A polygon whose edges lie exactly on cell boundaries gives every
    interior cell weight 1 -> weighted mean == centre-rule mean."""
    from xarray_dataaccessor_spark.operators.spatial import (
        zonal_stats,
        zonal_stats_weighted,
    )

    grid = _unit_grid(spark, 10, 10, v=lambda i, j: i + 10.0 * j)
    # cell-aligned rect covering cells x in 2..4, y in 3..5 entirely
    rect = [[(1.5, 2.5), (4.5, 2.5), (4.5, 5.5), (1.5, 5.5)]]
    w = zonal_stats_weighted(
        grid, [rect], dx=1.0, dy=1.0, value_cols=["val"], how="mean"
    ).first()
    u = zonal_stats(
        grid, [rect], value_cols=["val"], how="mean"
    ).first()
    assert abs(w["covered_cells"] - 9.0) < 1e-9
    assert abs(w["val"] - u["val"]) < 1e-9


def test_weighted_plan_is_broadcast_and_batched(spark):
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_weighted

    grid = _unit_grid(spark, 8, 8)
    tri = [[(1.0, 1.0), (5.0, 1.0), (1.0, 5.0)]]
    df = zonal_stats_weighted(grid, [tri], dx=1.0, dy=1.0,
                              value_cols=["val"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "ArrowEvalPython" in plan  # the pandas UDF, Arrow-batched


def test_weighted_rejects_bad_how(spark):
    from xarray_dataaccessor_spark.operators.spatial import zonal_stats_weighted

    with pytest.raises(ValueError, match="mean"):
        zonal_stats_weighted(_unit_grid(spark, 2, 2), [TRIANGLE],
                             dx=1.0, dy=1.0, how="median")


def test_gridframe_weighted_zonal(spark, sf_dir):
    from xarray_dataaccessor_spark.gridframe import GridFrame
    from xarray_dataaccessor_spark.sources.tables import grid_view

    gv = grid_view(spark, sf_dir)
    b = gv.agg(F.min("x"), F.max("x"), F.min("y"), F.max("y")).first()
    tri = [[(b[0], b[2]), (b[1], b[2]), (b[0], b[3]), (b[0], b[2])]]
    out = GridFrame(gv).zonal_stats(
        polygons=[tri], weighted=True, per_time=False
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert 0 < r["covered_cells"] <= r["n_cells"]
    assert {"t2m", "u100", "covered_cells"} <= set(out[0].asDict())
