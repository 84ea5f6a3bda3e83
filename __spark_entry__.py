"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full declared inventory from
``xarray_dataaccessor_spark.queries`` (one entry per implemented SURVEY §2
operator, each with a DuckDB oracle unless genuinely non-SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import xarray_dataaccessor_spark.queries_ext  # noqa: E402,F401 (registers extension queries)
from xarray_dataaccessor_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_grid_mean"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Oracle-backed queries are listed FIRST (registration order) and the
    rows-only (``*_noracle``) entries last, so a driver that caps how many
    entries it verifies always covers every query that has an oracle."""
    ordered = {n: f for n, f in QUERIES.items() if n in ORACLES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ORACLES})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (same aliases, same tables)."""
    return dict(ORACLES)
