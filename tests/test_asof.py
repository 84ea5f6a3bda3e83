"""As-of and range join operator tests: inclusivity, direction, no-match
nulls, bin boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.asof import asof_join, range_join_binned


def _t(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_backward_inclusive_and_null_before_first(spark):
    left = spark.createDataFrame(
        [(1, _t(9)), (1, _t(10)), (1, _t(12)), (2, _t(10))],
        "user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _t(10), 100.0), (1, _t(11), 200.0)],
        "user_id bigint, ts timestamp, v double",
    )
    out = {
        (r["user_id"], r["ts"].hour): r["v"]
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    assert out[(1, 9)] is None  # before first right row
    assert out[(1, 10)] == 100.0  # exact timestamp match is inclusive
    assert out[(1, 12)] == 200.0  # latest prior
    assert out[(2, 10)] is None  # other key never matches


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, _t(9))], "user_id bigint, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(8), 1.0), (1, _t(11), 2.0)], "user_id bigint, ts timestamp, v double"
    )
    out = asof_join(left, right, on="ts", by="user_id", direction="forward").first()
    assert out["v"] == 2.0  # next value at-or-after 9:00


def test_range_join_bin_boundaries(spark):
    probes = spark.createDataFrame(
        [(_t(5, 59),), (_t(6, 0),), (_t(18, 0),), (_t(18, 1),)], "ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("d1", _t(6), _t(18))], "interval_id string, win_start timestamp, win_end timestamp"
    )
    out = range_join_binned(
        probes, intervals, "ts", "win_start", "win_end", bin_width_seconds=3600
    )
    hits = sorted((r["ts"].hour, r["ts"].minute) for r in out.collect())
    # inclusive both ends; outside rows dropped
    assert hits == [(6, 0), (18, 0)]


def test_range_join_overlapping_intervals(spark):
    probes = spark.createDataFrame([(_t(7),)], "ts timestamp")
    intervals = spark.createDataFrame(
        [("a", _t(6), _t(8)), ("b", _t(7), _t(9)), ("c", _t(8), _t(10))],
        "interval_id string, win_start timestamp, win_end timestamp",
    )
    out = range_join_binned(
        probes, intervals, "ts", "win_start", "win_end", bin_width_seconds=3600
    )
    assert sorted(r["interval_id"] for r in out.collect()) == ["a", "b"]

def test_keyless_asof_matches_bruteforce(spark):
    """The keyless path (range buckets + boundary carry) must equal the
    brute-force as-of; data spans many buckets and includes buckets with
    no right rows (carry across empty buckets)."""
    import bisect

    lrows = [(_t(9) + dt.timedelta(minutes=7 * i),) for i in range(200)]
    rrows = [
        (_t(9) + dt.timedelta(minutes=53 * j), float(j)) for j in range(20)
    ]
    left = spark.createDataFrame(lrows, "ts timestamp")
    right = spark.createDataFrame(rrows, "ts timestamp, v double")

    out = {r["ts"]: r["v"] for r in asof_join(left, right, on="ts").collect()}
    rts = [t for t, _ in rrows]
    for (lt,) in lrows:
        i = bisect.bisect_right(rts, lt) - 1
        expected = float(i) if i >= 0 else None
        assert out[lt] == expected, (lt, out[lt], expected)

    fwd = {
        r["ts"]: r["v"]
        for r in asof_join(left, right, on="ts", direction="forward").collect()
    }
    for (lt,) in lrows:
        i = bisect.bisect_left(rts, lt)
        expected = float(i) if i < len(rts) else None
        assert fwd[lt] == expected, (lt, fwd[lt], expected)


def test_keyless_asof_is_not_single_partition(spark):
    """The fact-table window must hash-partition on the time bucket —
    never one global single-partition sort."""
    left = spark.createDataFrame(
        [(_t(9) + dt.timedelta(minutes=i),) for i in range(100)], "ts timestamp"
    )
    right = spark.createDataFrame(
        [(_t(9) + dt.timedelta(minutes=10 * j), float(j)) for j in range(10)],
        "ts timestamp, v double",
    )
    plan = asof_join(left, right, on="ts")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bucket" in plan


def test_range_join_left_outer_keeps_unmatched_probes(spark):
    probes = spark.createDataFrame(
        [(1, _t(9, 30)), (2, _t(15))], "pid bigint, ts timestamp"
    )
    intervals = spark.createDataFrame(
        [("a", _t(9), _t(10))], "name string, lo timestamp, hi timestamp"
    )
    out = range_join_binned(
        probes, intervals, "ts", "lo", "hi", how="left"
    ).collect()
    by_pid = {r["pid"]: r["name"] for r in out}
    assert by_pid == {1: "a", 2: None}  # probe 2 kept with nulls
    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner"):
        range_join_binned(probes, intervals, "ts", "lo", "hi", how="full")


# ---------------------------------------------------------------------------
# nearest / tolerance — pandas merge_asof is the semantic oracle (same
# inclusive bounds, same backward-preferred tie on equidistant nearest)
# ---------------------------------------------------------------------------
def _pd_oracle(lrows, rrows, direction, tolerance=None, by=None):
    import pandas as pd

    lcols = ["k", "t"] if by else ["t"]
    l = pd.DataFrame(lrows, columns=lcols + ["lid"]).sort_values("t", kind="stable")
    r = pd.DataFrame(rrows, columns=lcols + ["v"]).sort_values("t", kind="stable")
    kw = dict(on="t", direction=direction)
    if by:
        kw["by"] = "k"
    if tolerance is not None:
        kw["tolerance"] = tolerance
    m = pd.merge_asof(l, r, **kw)
    return {int(row.lid): (None if pd.isna(row.v) else float(row.v)) for row in m.itertuples()}


def _lcg_rows(seed, n, key_mod=None, t_mod=1000):
    s, rows = seed, []
    for i in range(n):
        s = (s * 1103515245 + 12345) % (2**31)
        t = float(s % t_mod)
        if key_mod:
            s = (s * 1103515245 + 12345) % (2**31)
            rows.append((s % key_mod, t))
        else:
            rows.append((t,))
    return rows


def test_asof_nearest_and_tolerance_vs_pandas_keyed(spark):
    lraw = _lcg_rows(3, 60, key_mod=4)
    rraw = _lcg_rows(17, 40, key_mod=4)
    lrows = [(k, t, i) for i, (k, t) in enumerate(lraw)]
    rrows = []
    seen = set()
    for k, t in rraw:
        if (k, t) not in seen:  # dedupe right instants per key
            seen.add((k, t))
            rrows.append((k, t, float(len(rrows))))
    ldf = spark.createDataFrame(lrows, "k bigint, t double, lid bigint")
    rdf = spark.createDataFrame(rrows, "k bigint, t double, v double")
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 50.0):
            got = {
                int(r["lid"]): (None if r["v"] is None else float(r["v"]))
                for r in asof_join(
                    ldf, rdf, on="t", by="k", value_cols=["v"],
                    direction=direction, tolerance=tol,
                ).collect()
            }
            want = _pd_oracle(lrows, rrows, direction, tol, by="k")
            assert got == want, (direction, tol)


def test_asof_nearest_and_tolerance_vs_pandas_keyless(spark):
    lraw = _lcg_rows(5, 50)
    rraw = _lcg_rows(23, 30)
    lrows = [(t, i) for i, (t,) in enumerate(lraw)]
    rrows = []
    seen = set()
    for (t,) in rraw:
        if t not in seen:
            seen.add(t)
            rrows.append((t, float(len(rrows))))
    ldf = spark.createDataFrame(lrows, "t double, lid bigint")
    rdf = spark.createDataFrame(rrows, "t double, v double")
    for direction in ("backward", "forward", "nearest"):
        for tol in (None, 80.0):
            got = {
                int(r["lid"]): (None if r["v"] is None else float(r["v"]))
                for r in asof_join(
                    ldf, rdf, on="t", value_cols=["v"],
                    direction=direction, tolerance=tol,
                ).collect()
            }
            want = _pd_oracle(lrows, rrows, direction, tol)
            assert got == want, (direction, tol)


def test_asof_nearest_tie_prefers_backward(spark):
    ldf = spark.createDataFrame([(10.0, 0)], "t double, lid bigint")
    rdf = spark.createDataFrame(
        [(8.0, 1.0), (12.0, 2.0)], "t double, v double"
    )
    [row] = asof_join(ldf, rdf, on="t", value_cols=["v"], direction="nearest").collect()
    assert row["v"] == 1.0


def test_asof_tolerance_timestamps_seconds(spark):
    ldf = spark.createDataFrame([(_t(10), 0)], "ts timestamp, lid bigint")
    rdf = spark.createDataFrame([(_t(9), 7.0)], "ts timestamp, v double")
    [hit] = asof_join(
        ldf, rdf, on="ts", value_cols=["v"], tolerance=3600.0
    ).collect()
    assert hit["v"] == 7.0
    [miss] = asof_join(
        ldf, rdf, on="ts", value_cols=["v"], tolerance=3599.0
    ).collect()
    assert miss["v"] is None
