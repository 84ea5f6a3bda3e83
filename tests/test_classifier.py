"""In-engine trained quality classifier (DCLM-style distillation):
learning on separable data, determinism under repartitioning, lazy
plan construction, and teacher-feature distillation accuracy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.classifier import (
    distill_quality_classifier,
    hashed_text_features,
    score_logreg,
    train_logreg,
)


@pytest.fixture(scope="module")
def separable(spark):
    rng = np.random.default_rng(3)
    gv = ["clear", "insight", "method", "result", "evidence", "study"]
    bv = ["spam", "click", "buy", "cheap", "offer", "winner"]
    rows = []
    for i in range(200):
        y = i % 2
        voc = gv if y else bv
        rows.append((i, " ".join(voc[rng.integers(0, 6)] for _ in range(30)),
                     float(y)))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, y in rows], "doc_id long, y double"
    )
    return docs, labels


def test_learns_separable_vocabulary(separable):
    docs, labels = separable
    scored = distill_quality_classifier(docs, labels, n_buckets=32)
    j = scored.join(labels, "doc_id")
    acc = j.select(
        F.avg((F.col("clf_keep").cast("double") == F.col("y")).cast("double"))
    ).collect()[0][0]
    assert acc > 0.95, f"accuracy {acc}"


def test_scores_partition_invariant(separable):
    docs, labels = separable
    a = {r["doc_id"]: r["clf_score"] for r in
         distill_quality_classifier(docs, labels, n_buckets=32).collect()}
    b = {r["doc_id"]: r["clf_score"] for r in
         distill_quality_classifier(
             docs.repartition(7), labels, n_buckets=32).collect()}
    assert a == b


def test_training_is_lazy(spark, separable):
    """No Spark job fires while the training/inference plan is built
    (the same contract as pq_encode/kmeans_centroids)."""
    docs, labels = separable
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    feats = hashed_text_features(docs, n_buckets=32)
    w = train_logreg(feats, labels)
    out = score_logreg(feats, w)
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before
    assert out.columns == ["doc_id", "clf_score", "clf_keep"]


def test_teacher_feature_distillation(spark):
    """With the teacher's own signal as a feature, distillation must
    recover a threshold rule the hashed words alone cannot express."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(300):
        sig = float(rng.uniform(0, 1))
        rows.append((i, " ".join(f"w{rng.integers(0, 50)}" for _ in range(20)),
                     sig, 1.0 if sig >= 0.5 else 0.0))
    docs = spark.createDataFrame(
        [(i, t) for i, t, _, _ in rows], "doc_id long, text string"
    )
    labels = spark.createDataFrame(
        [(i, y) for i, _, _, y in rows], "doc_id long, y double"
    )
    extra = spark.createDataFrame(
        [(i, -2, s) for i, _, s, _ in rows], "doc_id long, bucket int, x double"
    )
    with_sig = distill_quality_classifier(
        docs, labels, n_buckets=16, epochs=2, lr=8.0, extra_features=extra
    ).join(labels, "doc_id")
    acc = with_sig.select(
        F.avg((F.col("clf_keep").cast("double") == F.col("y")).cast("double"))
    ).collect()[0][0]
    without = distill_quality_classifier(
        docs, labels, n_buckets=16, epochs=2, lr=8.0
    ).join(labels, "doc_id")
    acc0 = without.select(
        F.avg((F.col("clf_keep").cast("double") == F.col("y")).cast("double"))
    ).collect()[0][0]
    assert acc > acc0, (acc, acc0)
    assert acc > 0.8, acc
