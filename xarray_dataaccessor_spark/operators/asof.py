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


def _on_num(on: str, dtypes: dict[str, str]):
    """Numeric view of the ordering column (epoch micros for timestamps)
    for distance/tolerance arithmetic."""
    if dtypes[on].startswith("timestamp"):
        return epoch_micros(F.col(on)).cast("double")
    return F.col(on).cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """For each left row, attach the right-side values of the closest
    match per ``direction`` (pandas ``merge_asof`` semantics, inclusive):

    - ``backward``: most recent right row with ``right.on <= left.on``
    - ``forward``: earliest right row with ``right.on >= left.on``
    - ``nearest``: whichever of the two is closer in ``on``; an
      equidistant tie prefers the backward match (deterministic)

    ``tolerance`` (same units as ``on``; SECONDS for timestamp columns)
    drops matches farther than the bound — the attached values become
    null, the left row survives. Right-side duplicates at the same
    instant must be pre-deduplicated for determinism (as any as-of
    semantics requires).

    One shuffle on the key either way: both directional carries run over
    the same hash partitioning (two sorts of the same exchange for
    ``nearest``).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"Unsupported direction {direction!r}")
    value_cols = value_cols or [
        c for c in right.columns if c not in (on, by)
    ]
    keys = [by] if by else []
    l_tag = left.withColumn("__is_left", F.lit(1))
    # carry the right-side ordering value alongside the payload: the
    # nearest/tolerance decisions need the matched row's distance
    r_tag = right.select(
        *keys,
        on,
        F.col(on).alias("__r_on"),
        *[F.col(v).alias(f"__r_{v}") for v in value_cols],
    ).withColumn("__is_left", F.lit(0))
    combined = l_tag.unionByName(r_tag, allowMissingColumns=True)
    dtypes = dict(combined.dtypes)
    carry_cols = ["__r_on", *[f"__r_{v}" for v in value_cols]]

    if not keys:
        # a global Window.orderBy would serialize everything through ONE
        # task; the keyless path instead range-buckets on time and
        # carries boundary values across buckets (see _keyless_asof)
        out = _keyless_asof_raw(combined, on, carry_cols, direction)
    else:
        out = combined
        if direction in ("backward", "nearest"):
            # right rows sort before left rows at the same instant so an
            # exact timestamp match is visible to the left row
            wb = Window.partitionBy(*keys).orderBy(
                F.col(on).asc(), F.col("__is_left").asc()
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            for c in carry_cols:
                out = out.withColumn(
                    f"__b_{c}", F.last(c, ignorenulls=True).over(wb)
                )
        if direction in ("forward", "nearest"):
            wf = Window.partitionBy(*keys).orderBy(
                F.col(on).asc(), F.col("__is_left").desc()
            ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
            for c in carry_cols:
                out = out.withColumn(
                    f"__f_{c}", F.first(c, ignorenulls=True).over(wf)
                )
    return _asof_project(out, on, value_cols, direction, tolerance,
                         dtypes, left.columns)


def _asof_project(
    out: DataFrame,
    on: str,
    value_cols: list[str],
    direction: str,
    tolerance: float | None,
    dtypes: dict[str, str],
    left_cols: list[str],
) -> DataFrame:
    """Pick the directional carry per left row, apply the tolerance
    bound, and project the left schema + matched values."""
    tnum = _on_num(on, dtypes)
    is_ts = dtypes[on].startswith("timestamp")
    tol = None
    if tolerance is not None:
        tol = float(tolerance) * (1_000_000.0 if is_ts else 1.0)

    def carried_num(pfx: str):
        c = F.col(f"{pfx}__r_on")
        return epoch_micros(c).cast("double") if is_ts else c.cast("double")

    if direction == "nearest":
        d_b = tnum - carried_num("__b_")
        d_f = carried_num("__f_") - tnum
        use_b = F.when(
            F.col("__b___r_on").isNotNull()
            & (F.col("__f___r_on").isNull() | (d_b <= d_f)),
            F.lit(True),
        ).otherwise(F.lit(False))
        dist = F.when(use_b, d_b).otherwise(d_f)
        sel = {
            v: F.when(use_b, F.col(f"__b___r_{v}")).otherwise(
                F.col(f"__f___r_{v}")
            )
            for v in value_cols
        }
    else:
        pfx = "__b_" if direction == "backward" else "__f_"
        dist = (
            (tnum - carried_num(pfx))
            if direction == "backward"
            else (carried_num(pfx) - tnum)
        )
        sel = {v: F.col(f"{pfx}__r_{v}") for v in value_cols}
    if tol is not None:
        sel = {
            v: F.when(dist <= F.lit(tol), e) for v, e in sel.items()
        }
    projected = [sel[v].alias(v) for v in value_cols]
    return out.filter(F.col("__is_left") == 1).select(*left_cols, *projected)


def _keyless_asof_raw(combined, on, carry_cols, direction, n_buckets=64):
    """Scalable keyless as-of: time-range buckets + boundary carry.

    1. Bucket boundaries from ``approxQuantile`` on the time column
       (driver receives ~``n_buckets`` values — dimension-sized).
    2. The as-of window runs PER BUCKET (hash-partitioned on the bucket
       id — parallel, no single global sort).
    3. The carry across bucket boundaries comes from a per-bucket
       last/first-right-value aggregate (``n_buckets`` rows) prefix-
       scanned with a tiny single-partition window, broadcast back, and
       coalesced under the within-bucket value.

    Attaches ``__b_<c>`` (and/or ``__f_<c>`` — both for ``nearest``)
    columns for every carried right-side column ``c`` and returns the
    combined frame unprojected; :func:`_asof_project` finishes the job.
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
    out = combined.withColumn("__bucket", bucket)
    spine = (
        combined.sparkSession.range(len(bounds) + 1)
        .select(F.col("id").cast("int").alias("__bucket"))
    )
    rights = out.filter(F.col("__is_left") == 0)

    # a null ordering key makes max_by/min_by skip the row, matching the
    # window carry's ignorenulls semantics for null right-side values
    def _ord(c):
        return F.when(F.col(c).isNotNull(), F.col(on))

    dirs = {"backward": ["__b_"], "forward": ["__f_"], "nearest": ["__b_", "__f_"]}
    for pfx in dirs[direction]:
        if pfx == "__b_":
            w_in = Window.partitionBy("__bucket").orderBy(
                F.col(on).asc(), F.col("__is_left").asc()
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            in_carry = {
                c: F.last(c, ignorenulls=True).over(w_in) for c in carry_cols
            }
            edge_agg = [
                F.max_by(F.col(c), _ord(c)).alias(f"__edge_{c}")
                for c in carry_cols
            ]
            w_carry = Window.orderBy("__bucket").rowsBetween(
                Window.unboundedPreceding, -1
            )
        else:
            w_in = Window.partitionBy("__bucket").orderBy(
                F.col(on).asc(), F.col("__is_left").desc()
            ).rowsBetween(Window.currentRow, Window.unboundedFollowing)
            in_carry = {
                c: F.first(c, ignorenulls=True).over(w_in) for c in carry_cols
            }
            edge_agg = [
                F.min_by(F.col(c), _ord(c)).alias(f"__edge_{c}")
                for c in carry_cols
            ]
            w_carry = Window.orderBy(F.col("__bucket").desc()).rowsBetween(
                Window.unboundedPreceding, -1
            )

        # per-bucket boundary values over a DENSE bucket spine (buckets
        # with no right rows still need the carry from earlier buckets);
        # the single-partition prefix window runs over <= n_buckets rows
        edges = spine.join(
            rights.groupBy("__bucket").agg(*edge_agg), "__bucket", "left"
        )
        carries = edges.select(
            "__bucket",
            *[
                F.last(f"__edge_{c}", ignorenulls=True)
                .over(w_carry)
                .alias(f"__carry_{pfx}{c}")
                for c in carry_cols
            ],
        )
        for c in carry_cols:
            out = out.withColumn(f"__in_{pfx}{c}", in_carry[c])
        out = out.join(F.broadcast(carries), "__bucket", "left")
        for c in carry_cols:
            out = out.withColumn(
                f"{pfx}{c}",
                F.coalesce(F.col(f"__in_{pfx}{c}"), F.col(f"__carry_{pfx}{c}")),
            )
    return out


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
