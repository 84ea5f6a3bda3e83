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


def _grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(GRID_SQL_BODY)


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
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_quantity BETWEEN 5 AND 25
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_quantity").between(5, 25)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")


# ---------------------------------------------------------------------------
# J2 — time-concat union (xr.concat, era5_from_aws.py:244-261)
# ---------------------------------------------------------------------------
@query(
    "union_concat_time",
    oracle="""
    WITH u AS (
        SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                                 AND l_shipdate < TIMESTAMP '1996-01-01'
        UNION ALL
        SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                                 AND l_shipdate < TIMESTAMP '1997-01-01'
    )
    SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM u GROUP BY 1
    """,
)
def union_concat_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    li = load(spark, sf_dir, "lineitem")
    y95 = li.filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    y96 = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    from xarray_dataaccessor_spark.operators.joins import concat_time

    u = concat_time([y95, y96])
    return u.groupBy(F.year("l_shipdate").cast("int").alias("ship_year")).agg(
        F.count(F.lit(1)).alias("n_rows"), _dec_sum("l_quantity", 2, "sum_qty")
    )


# ---------------------------------------------------------------------------
# C1/C3 — datetime scalar functions (utility_functions.py:31-50,
# to_gssha.py:341,462)
# ---------------------------------------------------------------------------
@query(
    "datetime_scalars",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y %m %d %H %M') AS wes_ts,
           strftime(o_orderdate, '%Y%m%d%H')       AS grass_ts,
           CAST(EXTRACT(year FROM o_orderdate) AS INT)  AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    """,
)
def datetime_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    configure_session(spark)
    from xarray_dataaccessor_spark.functions.datetime_fns import format_time

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1997-01-01")
    return o.select(
        "o_orderkey",
        format_time(F.col("o_orderdate"), "wes").alias("wes_ts"),
        format_time(F.col("o_orderdate"), "grass").alias("grass_ts"),
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
    )


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
