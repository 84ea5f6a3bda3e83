"""Watermarked stream-stream interval join: both sides are real file
streams, the joined output is checked against the equivalent batch join
(same predicate, same data) — the Structured Streaming guarantee that a
bounded replay produces the batch answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.sources.tables import load
from xarray_dataaccessor_spark.streaming.events import (
    interval_join,
    run_available_now,
    stream_events,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def joined(spark):
    left = stream_events(spark, SF_DIR)
    right = stream_events(spark, SF_DIR)
    out = interval_join(left, right, within="1 hour", watermark="2 hours")
    return run_available_now(out, output_mode="append", shuffle_partitions=8)


def test_interval_join_matches_batch(spark, joined):
    ev = load(spark, SF_DIR, "events").select("user_id", "ts", "value")
    l = ev.select(
        F.col("user_id").alias("l_key"), F.col("ts").alias("l_ts"), F.col("value").alias("l_value")
    )
    r = ev.select(
        F.col("user_id").alias("r_key"), F.col("ts").alias("r_ts"), F.col("value").alias("r_value")
    )
    batch = l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 hour")),
    )
    assert joined.count() == batch.count() > 0


def test_interval_join_respects_bounds(joined):
    bad = joined.filter(
        (F.col("r_ts") <= F.col("l_ts"))
        | (F.col("r_ts") > F.col("l_ts") + F.expr("INTERVAL 1 hour"))
    )
    assert bad.count() == 0
