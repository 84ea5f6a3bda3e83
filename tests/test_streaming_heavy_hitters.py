"""Streaming heavy hitters (sharded Misra-Gries group state): the
emitted summaries honor the sketch's order-free guarantees against the
exact batch counts over the same input."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.streaming.events import (
    run_available_now,
    stream_events,
    stream_heavy_hitters,
)

SF = "/root/testdata/sf0.001"
K, SHARDS = 4, 4


@pytest.fixture(scope="module")
def summary(spark):
    stream = stream_events(spark, SF)
    out = stream_heavy_hitters(stream, item_col="event_type", k=K,
                               n_shards=SHARDS)
    res = run_available_now(out, output_mode="update", shuffle_partitions=4)
    return _final_emission(res)


def _final_emission(res):
    """update mode can emit one row per (shard, item) per trigger —
    keep the final (largest-n) emission per shard."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard")
    return (
        res.withColumn("__mx", F.max("n_items").over(w))
        .filter(F.col("n_items") == F.col("__mx"))
        .drop("__mx")
    )


def _exact(spark):
    from xarray_dataaccessor_spark.sources.tables import load

    batch = load(spark, SF, "events").select(
        F.pmod(F.xxhash64(F.col("event_type")), F.lit(SHARDS))
        .cast("int").alias("shard"),
        F.col("event_type").alias("item"),
    )
    return {
        (r["shard"], r["item"]): r["cnt"]
        for r in batch.groupBy("shard", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }, {
        r["shard"]: r["n"]
        for r in batch.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_sketch_bounds_hold(spark, summary):
    exact, shard_n = _exact(spark)
    rows = summary.collect()
    assert rows, "no summaries emitted"
    for r in rows:
        true = exact.get((r["shard"], r["item"]), 0)
        # weighted MG: true - decrements <= est <= true
        assert r["est_count"] <= true, (r, true)
        assert r["est_count"] >= true - r["n_decrements"], (r, true)
        assert r["n_items"] == shard_n[r["shard"]]


def test_guaranteed_heavy_items_present(spark, summary):
    exact, shard_n = _exact(spark)
    emitted = {(r["shard"], r["item"]) for r in summary.collect()}
    for (shard, item), cnt in exact.items():
        if cnt > shard_n[shard] / (K + 1):
            assert (shard, item) in emitted, (shard, item, cnt)


def test_state_is_bounded(spark, summary):
    per_shard = {
        r["shard"]: r["cnt"]
        for r in summary.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert all(v <= K for v in per_shard.values()), per_shard


def test_planted_heavy_item_dominates(spark, tmp_path):
    """A planted 60%-frequency item must survive with a near-true
    estimate regardless of arrival order."""
    rows = []
    for i in range(200):
        item = "HOT" if i % 5 < 3 else f"cold{i % 17}"
        rows.append(
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), i % 7,
             item, 1.0, "p")
        )
    schema = (
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string"
    )
    path = str(tmp_path / "ev")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(path)
    stream = (
        spark.readStream.schema(spark.read.parquet(path).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = stream_heavy_hitters(stream, item_col="event_type", k=3, n_shards=2)
    res = run_available_now(out, output_mode="update", shuffle_partitions=2)
    final = _final_emission(res)
    hot = [r for r in final.collect() if r["item"] == "HOT"]
    assert hot, "planted heavy item evicted"
    true_hot = sum(1 for i in range(200) if i % 5 < 3)
    assert hot[0]["est_count"] <= true_hot
    assert hot[0]["est_count"] >= true_hot - hot[0]["n_decrements"]
    # and it is the top item of its shard
    top = max(
        (r for r in final.collect() if r["shard"] == hot[0]["shard"]),
        key=lambda r: r["est_count"],
    )
    assert top["item"] == "HOT"
