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
    so the caller can release them once the result is consumed.

    Limitation: the tag is a Python attribute on THIS DataFrame object —
    any further transformation (``result.filter(...)``, ``select``,
    checkpoint) returns a NEW object without the tag, and
    :func:`unpersist_intermediates` on that derived frame is a no-op.
    Callers must either unpersist via the originally returned frame, or
    re-tag the derived frame with ``tag_caches(derived,
    *get_tagged_caches(result))`` before discarding the original."""
    existing = list(getattr(result, _ATTR, ()))
    setattr(result, _ATTR, existing + list(cached))
    return result


def get_tagged_caches(df: DataFrame) -> tuple[DataFrame, ...]:
    """The intermediate caches tagged on ``df`` (empty for untagged
    frames). Public accessor for builders that compose other builders'
    results — merge with ``tag_caches(outer, *get_tagged_caches(inner))``
    instead of reaching into the private attribute."""
    return tuple(getattr(df, _ATTR, ()))


def unpersist_intermediates(df: DataFrame, blocking: bool = False) -> int:
    """Unpersist every intermediate cache tagged on ``df`` (no-op for
    untagged frames — including frames DERIVED from a tagged frame, see
    :func:`tag_caches`). Returns the number of frames released. Call
    only AFTER the consuming action — the result plan reads these
    caches."""
    cached = getattr(df, _ATTR, ())
    for c in cached:
        c.unpersist(blocking=blocking)
    n = len(cached)
    if cached:
        setattr(df, _ATTR, [])
    return n
