"""Streaming grid ingestion (grid_stream + stream_collapse_spatial):
availableNow batch parity against the batch collapse_spatial on the
same landed dataset."""

from __future__ import annotations

import pytest

from tests.grid_fixture import grid_df
from xarray_dataaccessor_spark.operators.aggregate import collapse_spatial
from xarray_dataaccessor_spark.sources.ingest import land_grid_parquet
from xarray_dataaccessor_spark.streaming.events import (
    grid_stream,
    run_available_now,
    stream_collapse_spatial,
)


def test_stream_collapse_matches_batch(spark, tmp_path):
    path = land_grid_parquet(
        grid_df(spark, with_nulls=True), str(tmp_path), "era5_like"
    )
    batch = {
        r["time"]: (r["t2m"], r["u100"])
        for r in collapse_spatial(
            spark.read.parquet(path).select("time", "y", "x", "t2m", "u100")
        ).collect()
    }
    # complete mode emits every group; append would withhold timesteps
    # inside the trailing watermark horizon (nothing ever finalizes them
    # in a bounded replay) — the documented append-mode caveat
    out = stream_collapse_spatial(grid_stream(spark, path), watermark="1 hour")
    got = {
        r["time"]: (r["t2m"], r["u100"])
        for r in run_available_now(
            out, output_mode="complete", shuffle_partitions=8
        ).collect()
    }
    assert set(got) == set(batch)
    for t, (a, b) in batch.items():
        ga, gb = got[t]
        assert ga == pytest.approx(a, rel=1e-12)
        if b is None:
            assert gb is None
        else:
            assert gb == pytest.approx(b, rel=1e-12)


def test_stream_collapse_rejects_nondecomposable(spark, tmp_path):
    path = land_grid_parquet(
        grid_df(spark, with_nulls=False), str(tmp_path), "era5_like"
    )
    with pytest.raises(ValueError, match="decomposable"):
        stream_collapse_spatial(grid_stream(spark, path), how="median")
