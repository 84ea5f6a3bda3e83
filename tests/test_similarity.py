"""Banded embedding near-dup LSH: recall vs the brute-force answer on a
synthetic corpus with planted near-duplicates (the sf* embeddings tables
have no pairs above 0.95, so recall needs planted ones), mirroring the
IVF recall@5 check's structure."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.similarity import (
    cosine,
    embedding_near_duplicates,
)


@pytest.fixture(scope="module")
def planted(spark):
    """60 random 64-dim vectors + a tiny-noise near-duplicate of each
    (cos > 0.99): 60 true pairs, deterministic."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 64))
    noisy = base + 0.02 * rng.standard_normal((60, 64))
    rows = [(i, [float(v) for v in base[i]]) for i in range(60)] + [
        (1000 + i, [float(v) for v in noisy[i]]) for i in range(60)
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def _brute_pairs(df, threshold):
    a = df.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = df.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return {
        (r["id_a"], r["id_b"])
        for r in (
            a.join(b, F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("ea"), F.col("eb")))
            .filter(F.col("cos") > threshold)
            .collect()
        )
    }


def test_banded_neardup_recall_vs_bruteforce(planted):
    truth = _brute_pairs(planted, 0.95)
    assert len(truth) >= 55  # the 60 planted pairs minus chance collisions
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_duplicates(
            planted, threshold=0.95, n_bands=4, planes_per_band=8
        ).collect()
    }
    # no false positives (exact-cosine refine) and banded recall
    assert got <= truth
    recall = len(got) / len(truth)
    assert recall >= 0.8, f"banded LSH recall {recall:.2f} below 0.8"


def test_more_bands_more_recall(planted):
    truth = _brute_pairs(planted, 0.95)
    few = embedding_near_duplicates(
        planted, threshold=0.95, n_bands=1, planes_per_band=8
    ).count()
    many = embedding_near_duplicates(
        planted, threshold=0.95, n_bands=8, planes_per_band=8
    ).count()
    assert many >= few
    assert many / len(truth) >= 0.95  # b=8 pushes recall near 1
