"""Grouped/spatial aggregations (A3-A5, SURVEY §2.4).

The reference's spatial collapse (``to_gssha.py:552-571``) reduces the
grid dims away per timestep with one of ``mean median min max sum std``
(``HMETAggregationMethods``, ``info/gssha.py:16-23``). In Spark that is a
plain ``groupBy(time).agg(...)`` — partial aggregation map-side, single
shuffle on the time key.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPATIAL_AGG_METHODS = ("mean", "median", "min", "max", "sum", "std")


def spatial_agg_expr(method: str, col_name: str) -> Column:
    c = F.col(col_name)
    if method == "mean":
        return F.avg(c)
    if method == "median":
        return F.median(c)
    if method == "min":
        return F.min(c)
    if method == "max":
        return F.max(c)
    if method == "sum":
        return F.sum(c)
    if method == "std":
        return F.stddev(c)
    raise ValueError(f"Unsupported spatial aggregation: {method!r}")


def collapse_spatial(
    df: DataFrame,
    how: str = "mean",
    value_cols: Sequence[str] | None = None,
    time_col: str = "time",
    group_cols: Sequence[str] = ("y", "x"),
) -> DataFrame:
    """A3: one value per timestep, spatial dims aggregated away
    (``ds[var].{mean,...}(dim=[lat,lon])``, ``to_gssha.py:552-571``)."""
    value_cols = value_cols or [
        c for c in df.columns if c != time_col and c not in group_cols
    ]
    aggs = [spatial_agg_expr(how, v).alias(v) for v in value_cols]
    return df.groupBy(time_col).agg(*aggs)


def bbox_of(df: DataFrame, x_col: str = "x", y_col: str = "y"):
    """A4: envelope of the data's coordinates (``_bbox_from_coords``
    min/max running agg, ``utility_functions.py:90-114``). Returns a
    BoundingBox driver-side (4 scalars — not a hot path)."""
    from xarray_dataaccessor_spark.meta import BoundingBox

    row = df.agg(
        F.min(x_col).alias("west"),
        F.min(y_col).alias("south"),
        F.max(x_col).alias("east"),
        F.max(y_col).alias("north"),
    ).first()
    return BoundingBox(
        west=row["west"], south=row["south"], east=row["east"], north=row["north"]
    ).pad_if_degenerate()
