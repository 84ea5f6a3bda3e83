"""WebDataset tar shard sink/source (sinks/webdataset.py)."""

from __future__ import annotations

import hashlib
import json
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.sinks.webdataset import (
    read_tar_shards,
    write_tar_shards,
)


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text of document "), F.col("id").cast("string"),
                 F.lit(" with some words")).alias("text"),
        (F.col("id") % 3).cast("int").alias("lang_id"),
    )


def test_write_read_round_trip(spark, tmp_path):
    path = str(tmp_path / "wds")
    m = write_tar_shards(_docs(spark), path, n_shards=4,
                         meta_cols=("lang_id",))
    assert sum(s["n_samples"] for s in m["shards"]) == 60
    assert os.path.exists(os.path.join(path, "_index.json"))
    back = read_tar_shards(spark, path)
    rows = {r["key"]: (r["text"], r["meta_json"]) for r in back.collect()}
    assert len(rows) == 60
    assert rows["7"][0] == "text of document 7 with some words"
    assert json.loads(rows["7"][1]) == {"lang_id": 1}


def test_shard_placement_is_key_deterministic(spark, tmp_path):
    """shard = md5-hash(key) % n — computable from the key alone."""
    path = str(tmp_path / "wds")
    write_tar_shards(_docs(spark), path, n_shards=4)
    for sh in range(4):
        p = os.path.join(path, f"shard-{sh:05d}.tar")
        if not os.path.exists(p):
            continue
        with tarfile.open(p) as tf:
            for m in tf.getmembers():
                key = m.name.rsplit(".", 1)[0]
                h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                assert h % 4 == sh, key


def test_rerun_produces_identical_bytes(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_tar_shards(_docs(spark), a, n_shards=3, meta_cols=("lang_id",))
    write_tar_shards(_docs(spark).repartition(7), b, n_shards=3,
                     meta_cols=("lang_id",))
    for name in sorted(os.listdir(a)):
        if name.endswith(".tar"):
            with open(os.path.join(a, name), "rb") as fa, \
                 open(os.path.join(b, name), "rb") as fb:
                assert fa.read() == fb.read(), name


def test_manifest_matches_tars(spark, tmp_path):
    path = str(tmp_path / "wds")
    m = write_tar_shards(_docs(spark, 30), path, n_shards=2)
    for s in m["shards"]:
        p = os.path.join(path, f"shard-{s['shard']:05d}.tar")
        assert os.path.getsize(p) == s["bytes"]
        with tarfile.open(p) as tf:
            assert len(tf.getmembers()) == s["n_samples"]
