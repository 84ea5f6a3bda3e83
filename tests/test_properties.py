"""Property-based tests (hypothesis) for the engine's pure logic: bbox
algebra, fragment enumeration, frequency parsing, interval/axis math,
spline knots. These run hundreds of cases without a Spark roundtrip."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from xarray_dataaccessor_spark.catalog import bbox_from_coords
from xarray_dataaccessor_spark.meta import BoundingBox
from xarray_dataaccessor_spark.operators.resample import (
    _natural_cubic_second_derivs,
    freq_to_interval,
)
from xarray_dataaccessor_spark.operators.spatial import (
    _target_axis,
    axis_step,
    interval_rows,
)
from xarray_dataaccessor_spark.sources.ingest import month_range

coords = st.tuples(
    st.floats(min_value=-89, max_value=89, allow_nan=False),
    st.floats(min_value=-179, max_value=179, allow_nan=False),
)


@given(st.lists(coords, min_size=1, max_size=20))
def test_bbox_contains_all_input_points(points):
    box = bbox_from_coords(points)
    for lat, lon in points:
        assert box.contains(lon, lat)


@given(st.lists(coords, min_size=2, max_size=10), st.lists(coords, min_size=2, max_size=10))
def test_bbox_union_is_commutative_and_covering(a, b):
    ba, bb = bbox_from_coords(a), bbox_from_coords(b)
    u1, u2 = ba.union(bb), bb.union(ba)
    assert u1 == u2
    for lat, lon in a + b:
        assert u1.contains(lon, lat)


@given(
    st.datetimes(min_value=dt.datetime(1950, 1, 1), max_value=dt.datetime(2025, 1, 1)),
    st.integers(min_value=0, max_value=1000),
)
def test_month_range_is_contiguous_and_inclusive(start, n_days):
    end = start + dt.timedelta(days=n_days)
    months = month_range(start, end)
    assert months[0] == (start.year, start.month)
    assert months[-1] == (end.year, end.month)
    for (y1, m1), (y2, m2) in zip(months, months[1:]):
        assert (y2, m2) == ((y1 + 1, 1) if m1 == 12 else (y1, m1 + 1))


@given(st.integers(min_value=1, max_value=999), st.sampled_from(["T", "min", "H", "D", "S", "W"]))
def test_freq_to_interval_parses_any_multiple(n, unit):
    out = freq_to_interval(f"{n}{unit}")
    amount, spark_unit = out.split(" ", 1)
    assert int(amount) == n
    assert spark_unit.rstrip("s") in ("second", "minute", "hour", "day", "week")


@given(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False),
    st.floats(min_value=0.01, max_value=10, allow_nan=False),
    st.integers(min_value=2, max_value=50),
    st.sampled_from([0.5, 1.0, 2.0, 3.0]),
)
@settings(max_examples=200)
def test_target_axis_count_and_envelope(x0, step, n, factor):
    axis = [x0 + i * step for i in range(n)]
    out = _target_axis(axis, factor)
    assert len(out) == max(1, round(n * factor))
    # same outer envelope: first new center >= lower edge, last <= upper edge
    lo_edge, hi_edge = axis[0] - step / 2, axis[-1] + step / 2
    assert out[0] >= lo_edge - 1e-9 and out[-1] <= hi_edge + 1e-9


@given(
    st.integers(min_value=2, max_value=30),
    st.sampled_from([2.0, 3.0]),
)
def test_interval_rows_weights_bounded_and_unique_target(n, factor):
    axis = [float(i) for i in range(n)]
    rows = interval_rows(_target_axis(axis, factor), axis, "bilinear")
    targets = [r[1] for r in rows]
    assert len(targets) == len(set(targets))  # one row per target coord
    for src, new, w, hi in rows:
        assert 0.0 <= w <= 1.0
        assert src in axis
        if hi is not None:
            assert src < hi and src <= new <= hi


@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=3, max_size=12))
@settings(max_examples=100)
def test_cubic_spline_interpolates_knots(ys):
    import numpy as np

    xs = np.arange(len(ys), dtype=float)
    m = _natural_cubic_second_derivs(xs, np.array(ys))
    # evaluating the spline at each knot returns the knot value
    for i in range(len(ys) - 1):
        h = xs[i + 1] - xs[i]
        at_left = (
            m[i] * h**3 / (6 * h)
            + (ys[i] / h - m[i] * h / 6) * h
        )
        assert abs(at_left - ys[i]) < 1e-6


def test_axis_step_rounds_float_noise():
    axis = [-83.476 + 0.25 * i for i in range(19)]
    assert axis_step(axis) == 0.25


def test_bbox_golden_values():
    # golden from the reference corpus (test_4_nasa_lpdaac.py:98-111 via
    # FIXTURES.md §4): 4 corner tuples -> exact bbox
    corners = [
        (15.06368, -90.01794),
        (15.06368, -89.93884),
        (14.96706, -90.01794),
        (14.96706, -89.93884),
    ]
    box = bbox_from_coords(corners)
    assert box == BoundingBox(
        west=-90.01794, south=14.96706, east=-89.93884, north=15.06368
    )


# ---------------------------------------------------------------------------
# Sketch laws (round 8) — property-tested against the DuckDB twins of
# the Spark sketches (the SQL spellings are pinned bit-exact to Spark
# in test_sketch.py, so laws proven here hold for both engines) without
# a Spark roundtrip per example.
# ---------------------------------------------------------------------------
_token = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=1,
    max_size=12,
)


@settings(max_examples=25, deadline=None)
@given(
    members=st.lists(_token, min_size=1, max_size=80, unique=True),
    strangers=st.lists(_token, min_size=0, max_size=40),
)
def test_bloom_never_false_negative_law(members, strangers):
    import duckdb
    import pandas as pd

    from xarray_dataaccessor_spark.operators.sketch import (
        bloom_build_sql,
        bloom_contains_sql,
    )

    con = duckdb.connect()
    con.register("mem", pd.DataFrame({"v": members}))
    words = [0] * (1024 // 32)
    for w, bits in con.execute(
        bloom_build_sql("mem", "v", m_bits=1024, k=3)
    ).fetchall():
        words[w] = int(bits)
    con.register("probes", pd.DataFrame({"v": members + strangers}))
    h1 = "('0x' || substr(md5('b1:' || v), 1, 8))::BIGINT"
    h2 = "('0x' || substr(md5('b2:' || v), 1, 8))::BIGINT"
    got = dict(con.execute(
        "SELECT v, " + bloom_contains_sql(h1, h2, words, k=3,
                                          dialect="duckdb")
        + " FROM probes"
    ).fetchall())
    for m in members:
        assert got[m] is True  # membership can never be missed


@settings(max_examples=25, deadline=None)
@given(values=st.lists(_token, min_size=1, max_size=200))
def test_cms_never_undercounts_law(values):
    import duckdb
    import pandas as pd
    from collections import Counter

    from xarray_dataaccessor_spark.operators.sketch import cms_estimate_sql

    true = Counter(values)
    con = duckdb.connect()
    con.register("src", pd.DataFrame({"v": values}))
    counters = [[0] * 64 for _ in range(3)]
    rows = con.execute("""
        SELECT i, ('0x' || substr(md5('c' || CAST(i AS VARCHAR) || ':' || v),
                   1, 8))::BIGINT % 64 AS b, COUNT(*) AS c
        FROM src, (VALUES (0), (1), (2)) ks(i) GROUP BY 1, 2
    """).fetchall()
    for i, b, c in rows:
        counters[i][b] = int(c)
    con.register("probes", pd.DataFrame({"v": sorted(true)}))
    est = dict(con.execute(
        "SELECT v, " + cms_estimate_sql("v", counters, dialect="duckdb")
        + " FROM probes"
    ).fetchall())
    n = len(values)
    for v, t in true.items():
        assert t <= est[v] <= n  # CM law: overcount only, bounded by N
