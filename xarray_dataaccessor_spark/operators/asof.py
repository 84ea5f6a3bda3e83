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

from xarray_dataaccessor_spark.functions.datetime_fns import epoch_micros


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

    if not keys:
        # a global Window.orderBy would serialize everything through ONE
        # task; the keyless path instead range-buckets on time and
        # carries boundary values across buckets (see _keyless_asof)
        return _keyless_asof(combined, on, value_cols, direction, left.columns)

    # order right rows before left rows at the same instant so an exact
    # timestamp match is visible to the left row (inclusive as-of)
    if direction == "backward":
        w = Window.partitionBy(*keys).orderBy(
            F.col(on).asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carried = {v: F.last(f"__r_{v}", ignorenulls=True).over(w) for v in value_cols}
    else:
        w = Window.partitionBy(*keys).orderBy(
            F.col(on).asc(), F.col("__is_left").desc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carried = {v: F.first(f"__r_{v}", ignorenulls=True).over(w) for v in value_cols}

    out = combined
    for v, expr in carried.items():
        out = out.withColumn(v, expr)
    return out.filter(F.col("__is_left") == 1).select(*left.columns, *value_cols)


def _keyless_asof(combined, on, value_cols, direction, left_cols, n_buckets=64):
    """Scalable keyless as-of: time-range buckets + boundary carry.

    1. Bucket boundaries from ``approxQuantile`` on the time column
       (driver receives ~``n_buckets`` values — dimension-sized).
    2. The as-of window runs PER BUCKET (hash-partitioned on the bucket
       id — parallel, no single global sort).
    3. The carry across bucket boundaries comes from a per-bucket
       last/first-right-value aggregate (``n_buckets`` rows) prefix-
       scanned with a tiny single-partition window, broadcast back, and
       coalesced under the within-bucket value.

    Equivalent to the repartitionByRange + boundary-carry merge, built
    from declarative ops only.
    """
    is_ts = dict(combined.dtypes)[on].startswith("timestamp")
    tnum = epoch_micros(F.col(on)) if is_ts else F.col(on).cast("double")
    probe = combined.select(tnum.cast("double").alias("__t"))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(probe.approxQuantile("__t", qs, 0.001)))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(tnum.cast("double") >= F.lit(b), 1).otherwise(0)
    df = combined.withColumn("__bucket", bucket)

    backward = direction == "backward"
    # a null ordering key makes max_by/min_by skip the row, matching the
    # window carry's ignorenulls semantics for null right-side values
    def _ord(v):
        return F.when(F.col(f"__r_{v}").isNotNull(), F.col(on))

    if backward:
        w_in = Window.partitionBy("__bucket").orderBy(
            F.col(on).asc(), F.col("__is_left").asc()
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        in_carry = {v: F.last(f"__r_{v}", ignorenulls=True).over(w_in) for v in value_cols}
        edge_agg = [
            F.max_by(F.col(f"__r_{v}"), _ord(v)).alias(f"__edge_{v}")
            for v in value_cols
        ]
        w_carry = Window.orderBy("__bucket").rowsBetween(
            Window.unboundedPreceding, -1
        )
    else:
        w_in = Window.partitionBy("__bucket").orderBy(
            F.col(on).asc(), F.col("__is_left").desc()
        ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
        in_carry = {v: F.first(f"__r_{v}", ignorenulls=True).over(w_in) for v in value_cols}
        edge_agg = [
            F.min_by(F.col(f"__r_{v}"), _ord(v)).alias(f"__edge_{v}")
            for v in value_cols
        ]
        w_carry = Window.orderBy(F.col("__bucket").desc()).rowsBetween(
            Window.unboundedPreceding, -1
        )

    # per-bucket boundary values over a DENSE bucket spine (buckets with
    # no right rows still need the carry from earlier buckets); the
    # single-partition prefix window below runs over <= n_buckets rows
    spine = (
        combined.sparkSession.range(len(bounds) + 1)
        .select(F.col("id").cast("int").alias("__bucket"))
    )
    edges = spine.join(
        df.filter(F.col("__is_left") == 0).groupBy("__bucket").agg(*edge_agg),
        "__bucket",
        "left",
    )
    carry_cols = [
        F.last(f"__edge_{v}", ignorenulls=True).over(w_carry).alias(f"__carry_{v}")
        for v in value_cols
    ]
    carries = edges.select("__bucket", *carry_cols)

    out = df
    for v in value_cols:
        out = out.withColumn(f"__in_{v}", in_carry[v])
    out = out.join(F.broadcast(carries), "__bucket", "left")
    projected = [
        F.coalesce(F.col(f"__in_{v}"), F.col(f"__carry_{v}")).alias(v)
        for v in value_cols
    ]
    return (
        out.filter(F.col("__is_left") == 1).select(*left_cols, *projected)
    )


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

    ``how`` may be ``inner`` or ``left`` (unmatched probes kept with
    nulls). The containment refine is part of the JOIN CONDITION, not a
    post-filter — a post-filter would evaluate false on null-padded rows
    and silently turn the outer join back into an inner one. ``right``/
    ``full`` are rejected: the interval side is bin-exploded, so
    unmatched intervals would surface once per spanned bin.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"range_join_binned supports how='inner' or 'left', got {how!r}"
        )
    pb = F.floor(epoch_micros(F.col(probe_col)) / F.lit(bin_width_seconds * 1_000_000))
    s = epoch_micros(F.col(start_col))
    e = epoch_micros(F.col(end_col))
    span = F.sequence(
        F.floor(s / F.lit(bin_width_seconds * 1_000_000)),
        F.floor(e / F.lit(bin_width_seconds * 1_000_000)),
    )
    iv = intervals.withColumn("__bin_i", F.explode(span))
    pr = probes.withColumn("__bin_p", pb)
    cond = (
        (pr["__bin_p"] == iv["__bin_i"])
        & (F.col(probe_col) >= F.col(start_col))
        & (F.col(probe_col) <= F.col(end_col))
    )
    return pr.join(iv, on=cond, how=how).drop("__bin_p", "__bin_i")
