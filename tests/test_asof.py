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