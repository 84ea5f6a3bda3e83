"""Cache-lifecycle control for plan-builder operators.

Several operators (``incremental_dedup_frames``, ``train_logreg`` /
``distill_quality_classifier``, the gopher quality slot) cache small
intermediate frames that the RETURNED plan references — the cache is what
keeps a multi-consumer or per-epoch lineage linear. Unpersisting inside
the builder would defeat that, so the contract is: **the caller owns the
cache lifecycle**. Builders tag the returned DataFrame with its
intermediates; call :func:`unpersist_intermediates` after the consuming
action (or ``spark.catalog.clearCache()`` between unrelated workloads,
as ``bench.py`` does) to release the executor-memory blocks in
long-lived sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_ATTR = "_xda_intermediate_caches"


def tag_caches(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Attach ``cached`` (already ``.cache()``-ed) frames to ``result``
    so the caller can release them once the result is consumed."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(cached))
    return result


def unpersist_intermediates(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate cache tagged on ``df`` (no-op for
    untagged frames). Returns the number of frames released. Call only
    AFTER the consuming action — the result plan reads these caches."""
    cached = getattr(df, _ATTR, ())
    for c in cached:
        c.unpersist(blocking=blocking)
    n = len(cached)
    if cached:
        setattr(df, _ATTR, [])
    return n
