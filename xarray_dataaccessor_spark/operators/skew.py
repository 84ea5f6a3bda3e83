"""Skew- and layout-aware join strategies for 100 TB operation.

Two tools beyond AQE's runtime skew-join splitting:

- :func:`salted_join` — explicit key salting for aggregations/joins where
  one hot key would otherwise serialize a single reducer. The build side
  is exploded over the salt domain (it is the small side), the probe side
  gets a random-but-deterministic salt from a row fingerprint, so the hot
  key's rows spread over ``salt_buckets`` reducers.
- :func:`bucketed_layout` / co-located joins — persist both fact tables
  bucketed by the join key so repeated joins skip the shuffle entirely
  (SortMergeJoin with no Exchange). This is the Spark-native analogue of
  the reference's "one file per variable/month" co-location.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the key salted ``salt_buckets`` ways.

    ``probe`` (large, possibly skewed) rows get a deterministic salt from
    a row hash; ``build`` (smaller) is replicated once per salt value via
    an exploded literal array — no extra shuffle of the probe side beyond
    the salted key.
    """
    salt = F.pmod(F.xxhash64(*probe.columns), F.lit(salt_buckets)).cast("int")
    p = probe.withColumn("__salt", salt)
    b = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = p.join(b, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def bucketed_layout(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist ``df`` as a bucketed (and optionally sorted) table so
    joins/aggregations on ``bucket_col`` are co-located: Catalyst plans
    them without an Exchange on either side."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name, format="parquet")
    return table_name


def colocated_join(
    spark, left_table: str, right_table: str, on: str | Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two tables persisted via :func:`bucketed_layout` on their
    bucket key — shuffle-free when bucket counts match."""
    return spark.table(left_table).join(
        spark.table(right_table), on=on, how=how
    )
