"""Plan-audit helpers: make Catalyst behavior (predicate pushdown, column
pruning, broadcast joins, exchange counts) assertable in tests.

The reference hand-implements these optimizations at fetch time (SURVEY
§4); here they must come out of Catalyst for free — these helpers are how
the test suite proves they actually do.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (captures ``df.explain``)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reach a Parquet scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan_string(df))


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every file scan (column-pruning evidence)."""
    return re.findall(r"ReadSchema: ([^\n]*)", plan_string(df))


def has_pushed_filter(df: DataFrame, column: str) -> bool:
    return any(column in f for f in pushed_filters(df))


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (lower is better; broadcast
    exchanges are not counted)."""
    plan = plan_string(df)
    return len(re.findall(r"\bExchange (?:hash|range|Single)", plan))


def codegen_stage_count(df: DataFrame) -> int:
    """WholeStageCodegen spans — wider/fewer means more of the plan runs
    as generated JVM code. (Formatted mode labels them '[codegen id : N]',
    simple mode 'WholeStageCodegen (N)'.)"""
    plan = plan_string(df)
    ids = re.findall(r"codegen id : (\d+)", plan)
    ids += re.findall(r"WholeStageCodegen \((\d+)\)", plan)
    return len(set(ids))
