"""SimHash pair operators: the exact-duplicate path must be the
hamming=0 subset of the banded hamming search (the subsumption the fused
`dedup_simhash_hamming` oracle slot relies on)."""

from __future__ import annotations

from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.dedup import (
    simhash_duplicate_pairs,
    simhash_hamming_pairs,
)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "completely different text with other words entirely"),
        (5, "completely different text with other words entirely"),
        (6, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_pairs_equal_hamming_zero_subset(spark):
    df = _docs(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in simhash_duplicate_pairs(df).select("id_a", "id_b").collect()
    }
    hamm = simhash_hamming_pairs(df, max_hamming=2)
    zero = {
        (r["id_a"], r["id_b"])
        for r in hamm.filter(F.col("hamming") == 0).select("id_a", "id_b").collect()
    }
    assert exact == zero
    assert (1, 2) in exact and (4, 5) in exact


def test_hamming_pairs_monotone_in_threshold(spark):
    df = _docs(spark)
    p1 = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs(df, max_hamming=1).select("id_a", "id_b").collect()
    }
    p3 = {
        (r["id_a"], r["id_b"])
        for r in simhash_hamming_pairs(df, max_hamming=3).select("id_a", "id_b").collect()
    }
    assert p1 <= p3
