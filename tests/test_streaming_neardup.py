"""Streaming MinHash+LSH near-dup (stream_neardup_minhash):
availableNow batch-parity vs dedup.lsh_candidate_pairs, and the exact
pair-horizon semantics."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from xarray_dataaccessor_spark.streaming.events import (
    run_available_now,
    stream_neardup_minhash,
)

SF = "/root/testdata/sf0.001"


def _docs_with_ts(spark):
    """documents + synthetic event time: all docs within one hour, so a
    '2 hours' horizon admits every batch candidate pair."""
    from xarray_dataaccessor_spark.sources.tables import load

    return load(spark, SF, "documents").select(
        "doc_id",
        "text",
        F.timestamp_micros(
            (F.lit(1_600_000_000) + F.col("doc_id") % 3600) * 1_000_000
        ).alias("ts"),
    )


@pytest.fixture(scope="module")
def stream_pairs(spark):
    docs = _docs_with_ts(spark)
    d = tempfile.mkdtemp(prefix="xda_neardup_src_")
    docs.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)
    out = stream_neardup_minhash(stream, watermark="2 hours")
    return run_available_now(out, output_mode="append", shuffle_partitions=8)


def test_stream_pairs_match_batch_candidates(spark, stream_pairs):
    docs = _docs_with_ts(spark)
    sig = minhash_signatures(word_shingles(docs), 16)
    batch = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sig, 16, 2).collect()
    }
    got = {(r["id_a"], r["id_b"]) for r in stream_pairs.select("id_a", "id_b").distinct().collect()}
    assert got == batch
    assert len(batch) > 0  # the corpus has planted near-dups


def test_stream_pair_band_keys_match_batch_bands(spark, stream_pairs):
    # every emitted pair carries the band/bucket it collided in; buckets
    # are the batch band keys (bit-identical map-side pipeline)
    from xarray_dataaccessor_spark.operators.dedup import minhash_band_structs

    docs = _docs_with_ts(spark)
    valid = {
        (r["band"], r["bucket"])
        for r in docs.select(F.explode(minhash_band_structs()).alias("bb"))
        .select(F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .collect()
    }
    for r in stream_pairs.select("band", "bucket").distinct().collect():
        assert (r["band"], r["bucket"]) in valid


def test_pair_horizon_enforced_exactly(spark):
    """Identical docs 10 days apart must NOT pair under a 1-hour horizon;
    identical docs 1 minute apart must."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta", 0),
        (2, "alpha beta gamma delta epsilon zeta", 60),  # +1 min -> pairs with 1
        (3, "alpha beta gamma delta epsilon zeta", 864000),  # +10 days -> no pair
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, off bigint").select(
        "doc_id",
        "text",
        F.timestamp_micros((F.lit(1_600_000_000) + F.col("off")) * 1_000_000).alias("ts"),
    )
    d = tempfile.mkdtemp(prefix="xda_horizon_src_")
    df.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    out = stream_neardup_minhash(stream, watermark="1 hour")
    got = {
        (r["id_a"], r["id_b"])
        for r in run_available_now(out, output_mode="append", shuffle_partitions=4)
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    assert got == {(1, 2)}


def test_hot_bucket_cap_batch_and_stream(spark):
    """20 identical docs form a degenerate bucket (190 pairs uncapped);
    with a member cap both the batch and streaming paths suppress the
    quadratic bucket while an ordinary pair elsewhere survives."""
    rows = [(i, "lorem ipsum dolor sit amet consectetur", i) for i in range(20)]
    rows += [(100, "totally different words here entirely now", 100),
             (101, "totally different words here entirely now", 101)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, off bigint").select(
        "doc_id", "text",
        F.timestamp_micros((F.lit(1_600_000_000) + F.col("off")) * 1_000_000).alias("ts"),
    )
    # batch
    sig = minhash_signatures(word_shingles(df), 16)
    uncapped = lsh_candidate_pairs(sig, 16, 2).count()
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sig, 16, 2, max_bucket=5).collect()
    }
    assert uncapped >= 190
    assert capped == {(100, 101)}
    # streaming
    d = tempfile.mkdtemp(prefix="xda_hotbucket_src_")
    df.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    out = stream_neardup_minhash(stream, watermark="1 hour", max_bucket=5)
    got = run_available_now(out, output_mode="append", shuffle_partitions=4)
    pairs = {(r["id_a"], r["id_b"]) for r in got.select("id_a", "id_b").distinct().collect()}
    # the bucket saturates within this single micro-batch, so the
    # streaming path drops it ENTIRELY — exact parity with the batch
    # twin's bucket-drop semantics; the ordinary pair is untouched
    assert (100, 101) in pairs
    hot = [p for p in pairs if p[0] < 100]
    assert hot == []
