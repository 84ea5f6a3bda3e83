"""Streaming bottom-k quantile sample: after an availableNow drain the
final emission per group equals the batch bottom-k sketch over the same
rows — the MIN-k merge law makes the streaming fold exact, not
approximate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.streaming.events import (
    run_available_now,
    stream_bottomk_quantiles,
    stream_events,
)

SF = "/root/testdata/sf0.001"
# value joins the tie key: (user_id, ts) is not guaranteed unique, and
# an ambiguous k-th cut would make batch and stream legitimately differ
KEYS = ("user_id", "ts", "value")


@pytest.fixture(scope="module")
def final(spark):
    out = stream_bottomk_quantiles(
        stream_events(spark, SF), value_col="value", key_cols=KEYS,
        group_col="event_type", k=32,
    )
    res = run_available_now(out, output_mode="update", shuffle_partitions=4)
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type")
    return (
        res.withColumn("__mx", F.max("n_seen").over(w))
        .filter(F.col("n_seen") == F.col("__mx"))
        .drop("__mx")
    ).toPandas().set_index("event_type").sort_index()


def test_stream_equals_batch_sketch(spark, final):
    from xarray_dataaccessor_spark.operators.sketch import (
        bottomk_quantiles,
        bottomk_sample,
    )
    from xarray_dataaccessor_spark.sources.tables import load

    ev = load(spark, SF, "events").select(
        "event_type", "user_id", "ts", F.col("value").cast("double").alias("value")
    )
    samp = bottomk_sample(
        ev.withColumn("value2", F.col("value")), "value2", list(KEYS),
        group_cols=("event_type",), k=32,
    )
    bq = (
        bottomk_quantiles(samp, "value2", group_cols=("event_type",))
        .toPandas().set_index("event_type").sort_index()
    )
    assert list(final.index) == list(bq.index)
    assert final["k_used"].tolist() == bq["k_used"].tolist()
    assert final["h_k"].tolist() == bq["h_k"].tolist()
    assert final["q5"].tolist() == bq["q5"].tolist()
    assert final["q95"].tolist() == bq["q95"].tolist()
    # totals absorbed = full table row counts per group
    cnt = ev.groupBy("event_type").count().toPandas().set_index(
        "event_type").sort_index()
    assert final["n_seen"].tolist() == cnt["count"].tolist()


def test_state_is_bounded(final):
    assert (final["k_used"] <= 32).all()
    assert (final["k_used"] > 0).all()
