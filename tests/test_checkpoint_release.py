"""Round 14 (VERDICT r13 #5/#6): tracked localCheckpoint blocks are
released at slot boundaries, and every streaming await is bounded by a
named TimeoutError instead of wedging the driver."""

from __future__ import annotations

import pytest

from xarray_dataaccessor_spark.operators.cachectl import (
    release_checkpoints,
    tracked_checkpoint_count,
    tracked_local_checkpoint,
)


def _persisted_rdd_ids(spark):
    return [
        info.id()
        for info in spark._jsc.sc().getRDDStorageInfo()
    ]


def test_tracked_checkpoint_blocks_released(spark):
    release_checkpoints()  # clean slate
    before = set(_persisted_rdd_ids(spark))
    df = tracked_local_checkpoint(spark.range(0, 1000, 1, 4))
    assert df.count() == 1000  # materialize the checkpoint blocks
    assert tracked_checkpoint_count() == 1
    new_ids = set(_persisted_rdd_ids(spark)) - before
    assert new_ids, "materialized localCheckpoint left no storage trace"
    released = release_checkpoints(blocking=True)
    assert released == 1
    assert tracked_checkpoint_count() == 0
    assert not (set(_persisted_rdd_ids(spark)) & new_ids), (
        "checkpoint RDD blocks survived release_checkpoints — "
        "clearCache cannot see them, so this is a slot-to-slot leak"
    )


def test_release_is_safe_on_lazy_unmaterialized_checkpoint(spark):
    release_checkpoints()
    tracked_local_checkpoint(spark.range(10))  # never executed
    assert release_checkpoints() == 1
    assert tracked_checkpoint_count() == 0


def test_configure_session_drains_the_registry(spark):
    from xarray_dataaccessor_spark.session import configure_session

    release_checkpoints()
    tracked_local_checkpoint(spark.range(10))
    assert tracked_checkpoint_count() == 1
    configure_session(spark)  # the first statement of every query body
    assert tracked_checkpoint_count() == 0


class _WedgedQuery:
    """Duck-typed StreamingQuery that never terminates."""

    def __init__(self):
        self.stopped = False

    def awaitTermination(self, timeout=None):
        return False  # expired without termination

    def stop(self):
        self.stopped = True


def test_finish_available_now_raises_named_timeout(spark):
    from xarray_dataaccessor_spark.streaming.events import (
        finish_available_now,
    )

    q = _WedgedQuery()
    with pytest.raises(TimeoutError, match="did not finish within"):
        finish_available_now(spark, (q, "wedged_sink"), timeout_sec=0.05)
    assert q.stopped, "a timed-out query must be stopped, not leaked"
