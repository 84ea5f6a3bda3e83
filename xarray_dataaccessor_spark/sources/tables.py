"""Table sources over the driver's synthetic parquet (TESTDATA.md).

``load`` is the engine's scan path: one ``spark.read.parquet`` per table,
everything downstream is lazy so Catalyst pushes filters/projections into
the scan. ``grid_view`` derives a deterministic gridded table from
``lineitem`` — the §2 grid operators are declared against it so the
DuckDB oracle can run the *same* derivation on the same parquet (FIXTURES
§5 mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"Unknown table {name!r}")
    if name == "events":
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanosecond
        # timestamp type, so read the raw int64 and truncate to micros
        # (integer division — a double round-trip would lose precision on
        # 1.7e18-scale nanos). DuckDB's TIMESTAMP cast truncates the same
        # way, so both engines see identical microsecond instants.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# Deterministic grid derived from lineitem: 19x7 axes like the reference's
# golden fixture (test_2_era5.py:138,149). Sums go through DECIMAL so the
# Spark and DuckDB derivations agree bit-for-bit (no float summation-order
# nondeterminism at the source).
GRID_SQL_BODY = """
    SELECT
        l_shipdate                                                        AS time,
        CAST(41.383 AS DOUBLE) + CAST(l_suppkey % 7 AS DOUBLE) * CAST(0.25 AS DOUBLE)   AS y,
        CAST(-83.476 AS DOUBLE) + CAST(l_partkey % 19 AS DOUBLE) * CAST(0.25 AS DOUBLE) AS x,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)            AS t2m,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / CAST(1000 AS DOUBLE) AS u100
    FROM lineitem
    GROUP BY 1, 2, 3
"""


def grid_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grid table as a DataFrame (same rows as GRID_SQL_BODY)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(GRID_SQL_BODY)
