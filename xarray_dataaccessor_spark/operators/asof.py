"""As-of and range joins — time-series operators Spark's built-in join
strategies don't provide natively (SURVEY §2.3 lists the reference's
nearest-match as a 1-D as-of; these are the general forms a time-series
engine needs).

Both are expressed as compositions of existing DataFrame ops, chosen for
scale:

- :func:`asof_join` uses the union + as-of-window pattern: both inputs
  are shuffled ONCE on the key, a single ordered window carries the most
  recent right-side values onto left rows. No per-row Python and no
  range-condition nested-loop join (which Spark would otherwise plan for
  a ``l.ts >= r.ts`` predicate).
- :func:`range_join_binned` implements interval containment via bin
  bucketing: intervals explode to the buckets they span, probes map to
  one bucket, the join is an equi-join on the bucket + an exact refine
  filter. Replaces BroadcastNestedLoopJoin with a shuffle join whose
  fan-out is interval_span/bin_width per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right-side values with
    ``right.on <= left.on`` (backward; ``forward`` mirrors), optionally
    per ``by`` key. Right-side duplicates at the same instant must be
    pre-deduplicated for determinism (as any as-of semantics requires).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"Unsupported direction {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    keys = [by] if by else []
    l_tag = left.withColumn("__is_left", F.lit(1))
    r_tag = right.select(
        *keys, on, *[F.col(v).alias(f"__r_{v}") for v in value_cols]
    ).withColumn("__is_left", F.lit(0))
    combined = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # order right rows before left rows at the same instant so an exact
    # timestamp match is visible to the left row (inclusive as-of)
    if direction == "backward":
        w = (
            Window.partitionBy(*keys).orderBy(F.col(on).asc(), F.col("__is_left").asc())
            if keys
            else Window.orderBy(F.col(on).asc(), F.col("__is_left").asc())
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = {v: F.last(f"__r_{v}", ignorenulls=True).over(w) for v in value_cols}
    else:
        w = (
            Window.partitionBy(*keys).orderBy(F.col(on).asc(), F.col("__is_left").desc())
            if keys
            else Window.orderBy(F.col(on).asc(), F.col("__is_left").desc())
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = {v: F.first(f"__r_{v}", ignorenulls=True).over(w) for v in value_cols}

    out = combined
    for v, expr in carried.items():
        out = out.withColumn(v, expr)
    return out.filter(F.col("__is_left") == 1).select(*left.columns, *value_cols)


def range_join_binned(
    probes: DataFrame,
    intervals: DataFrame,
    probe_col: str,
    start_col: str,
    end_col: str,
    bin_width_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each probe row to every interval containing it
    (``start <= probe <= end``), via bin bucketing.

    Intervals are exploded to the ``bin_width_seconds`` buckets they
    span; probes map to exactly one bucket; an equi-join on the bucket
    plus the exact containment refine replaces the nested-loop plan a
    raw inequality join produces. Pick ``bin_width_seconds`` near the
    typical interval length: fan-out per interval is span/width + 1.
    """
    pb = F.floor(F.unix_micros(F.col(probe_col)) / F.lit(bin_width_seconds * 1_000_000))
    s = F.unix_micros(F.col(start_col))
    e = F.unix_micros(F.col(end_col))
    span = F.sequence(
        F.floor(s / F.lit(bin_width_seconds * 1_000_000)),
        F.floor(e / F.lit(bin_width_seconds * 1_000_000)),
    )
    iv = intervals.withColumn("__bin", F.explode(span))
    pr = probes.withColumn("__bin", pb)
    joined = pr.join(iv, on="__bin", how=how).filter(
        (F.col(probe_col) >= F.col(start_col)) & (F.col(probe_col) <= F.col(end_col))
    )
    return joined.drop("__bin")
