"""Z-order spatial clustering (operators/layout.py): key locality and
actual row-group/file pruning measured from parquet min/max stats."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.layout import (
    cluster_spatially,
    morton_key,
)


def _overlapping_fragments(path, bbox):
    """Count parquet row groups whose x/y min-max stats intersect bbox —
    exactly the statistic any reader (Spark's parquet scan included)
    uses to skip row groups on pushed x/y predicates."""
    import pyarrow.dataset as ds

    w, s, e, n = bbox
    total = hit = 0
    for frag in ds.dataset(path, format="parquet").get_fragments():
        for rg in frag.row_groups:
            st = rg.statistics
            total += 1
            if not (st["x"]["max"] < w or st["x"]["min"] > e
                    or st["y"]["max"] < s or st["y"]["min"] > n):
                hit += 1
    return hit, total


def test_morton_key_locality(spark):
    df = spark.range(0, 1024).select(
        (F.col("id") % 32).cast("double").alias("x"),
        (F.col("id") / 32).cast("bigint").cast("double").alias("y"),
    )
    keys = {
        (r["x"], r["y"]): r["k"]
        for r in df.withColumn(
            "k", morton_key(F.col("x"), F.col("y"), 0, 31, 0, 31, bits=5)
        ).collect()
    }
    # corner cells map to the curve's corners; neighbors differ in low bits
    assert keys[(0.0, 0.0)] == 0
    assert keys[(31.0, 31.0)] == 1023
    assert keys[(1.0, 0.0)] == 1
    assert keys[(0.0, 1.0)] == 2
    # every key distinct (bijective quantization on an exact lattice)
    assert len(set(keys.values())) == 1024


def test_clustered_write_prunes_row_groups(spark, tmp_path):
    # 64x64 grid x 16 "timesteps", written two ways
    base = spark.range(0, 65536).select(
        (F.col("id") % 64).cast("double").alias("x"),
        ((F.col("id") / 64).cast("bigint") % 64).cast("double").alias("y"),
        (F.col("id") % 16).alias("t"),
        F.rand(7).alias("v"),
    )
    scattered = str(tmp_path / "scattered")
    clustered = str(tmp_path / "clustered")
    # round-robin layout: every file spans the whole spatial domain
    base.repartition(16).write.mode("overwrite").parquet(scattered)
    cluster_spatially(base, n_files=16).write.mode("overwrite").parquet(clustered)

    bbox = (4.0, 4.0, 11.0, 11.0)  # ~1.5% of the domain
    hit_s, total_s = _overlapping_fragments(scattered, bbox)
    hit_c, total_c = _overlapping_fragments(clustered, bbox)
    assert total_s >= 16 and total_c >= 16
    assert hit_s == total_s  # scattered: zero pruning possible
    assert hit_c <= total_c // 4, (hit_c, total_c)  # clustered: >=75% skipped

    # layout change must not change the data
    a = spark.read.parquet(scattered).agg(F.sum("v"), F.count("*")).first()
    b = spark.read.parquet(clustered).agg(F.sum("v"), F.count("*")).first()
    assert a[1] == b[1] and abs(a[0] - b[0]) < 1e-6


def test_cluster_spatially_empty_and_all_null(spark):
    """No envelope (empty input or all-null coords) returns the frame
    unchanged instead of raising TypeError on a None bound."""
    empty = spark.createDataFrame([], "x double, y double, v bigint")
    assert cluster_spatially(empty).count() == 0
    nulls = spark.createDataFrame(
        [(None, None, 1), (None, None, 2)], "x double, y double, v bigint"
    )
    assert cluster_spatially(nulls).count() == 2
