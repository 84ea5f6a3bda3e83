"""Scale-strategy tests: salted joins spread hot keys, bucketed layouts
join without a shuffle (plan-level proof)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.skew import (
    bucketed_layout,
    colocated_join,
    salted_join,
)
from xarray_dataaccessor_spark.plans.explain import count_exchanges, plan_string


def test_salted_join_matches_plain_join(spark):
    # skewed probe: 90% of rows share key 1
    probe = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(1)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    build = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("dim")
    )
    plain = probe.join(build, "k").groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    ).first()
    salted = salted_join(probe, build, "k", salt_buckets=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("dim").alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])
    # the salt spreads the hot key across buckets
    salt = F.pmod(F.xxhash64(*probe.columns), F.lit(8)).cast("int")
    n_buckets = probe.filter(F.col("k") == 1).select(salt.alias("s")).distinct().count()
    assert n_buckets > 1


@pytest.mark.usefixtures("spark")
def test_bucketed_join_has_no_shuffle(spark):
    # tables land in the session's default warehouse (spark-warehouse/,
    # gitignored); warehouse.dir is a static conf we can't set per-test.
    # The in-memory catalog forgets tables between sessions but leaves
    # the directories behind — clear both.
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    for t in ("li_b", "o_b"):
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    bucketed_layout(
        li.select("l_orderkey", "l_quantity"), "li_b", "l_orderkey", num_buckets=8,
        sort_col="l_orderkey",
    )
    bucketed_layout(
        o.withColumnRenamed("o_orderkey", "l_orderkey").select(
            "l_orderkey", "o_totalprice"
        ),
        "o_b",
        "l_orderkey",
        num_buckets=8,
        sort_col="l_orderkey",
    )
    joined = colocated_join(spark, "li_b", "o_b", on="l_orderkey")
    # co-located: SortMergeJoin with zero shuffle exchanges
    assert count_exchanges(joined) == 0, plan_string(joined)[:800]
    # and it still returns the right row count
    expected = li.join(
        o, li["l_orderkey"] == o["o_orderkey"]
    ).count()
    assert joined.count() == expected