"""Point extraction to wide time-series tables (entry point 2 parity).

Reference: ``ConvertToTable.points_to_tables`` (``to_tables.py:24-130``) +
``_get_data_table_vectorized`` (``utility_functions.py:365-474``): nearest
cell per point, then a (time x point_id) pivot, batched 100 timesteps at a
time to bound memory.

Spark design — one lazy plan, no batching:
    broadcast(points) -> J3 nearest-cell match
    -> equi-join the fact table on (y, x)   [broadcast hash join]
    -> groupBy(time).pivot(point_id).agg(first(var))

The pivot fans out only the <=N requested points (J3 pre-filters the fact
rows to the matched cells), so the wide side stays small no matter the
grid size. Pivot columns are pinned with an explicit sorted id list, like
the reference's lexicographic ``sort_index(axis=1)``
(``utility_functions.py:447``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.joins import nearest_cell_match


def points_to_table(
    grid: DataFrame,
    points: DataFrame,
    variable: str,
    time_col: str = "time",
    x_col: str = "x",
    y_col: str = "y",
    point_ids: Sequence[str] | None = None,
) -> DataFrame:
    """Wide table: one row per timestep, one column per point id, values
    from the point's nearest grid cell.

    ``points`` is a small DataFrame ``(point_id, lon, lat)``
    (see ``catalog.points_df``); it is broadcast on both joins.
    """
    # the grid feeds the two axis-distinct scans AND the fact join; the
    # nearest-match side is tiny, so collect it once and let the fact scan
    # be the only pass over the grid
    matched = nearest_cell_match(points, grid, x_col=x_col, y_col=y_col)
    cell_rows = matched.select("point_id", x_col, y_col).collect()
    if point_ids is None:
        point_ids = sorted({r["point_id"] for r in cell_rows})
    cells = grid.sparkSession.createDataFrame(
        [(r["point_id"], r[x_col], r[y_col]) for r in cell_rows],
        f"point_id string, {x_col} double, {y_col} double",
    )
    fact = grid.select(time_col, x_col, y_col, variable)
    joined = fact.join(F.broadcast(cells), on=[x_col, y_col], how="inner")
    return (
        joined.groupBy(time_col)
        .pivot("point_id", list(point_ids))
        .agg(F.first(variable))
        .orderBy(time_col)
    )
