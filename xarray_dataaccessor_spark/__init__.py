"""xarray_dataaccessor_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of LimnoTech/Xarray-DataAccessor.

The reference (an eager xarray/dask library) models gridded climate data as
``xarray.Dataset`` objects; this engine models the same data as **long-form
Spark DataFrames** ``(time, y, x, var1, var2, ...)`` wrapped in a thin
:class:`GridFrame` that carries the dataset-level metadata contract
(``AttrsDict``, reference ``data_accessors/base.py:14-21``).

Every operator is a lazy DataFrame transformation so Catalyst provides the
predicate pushdown / partition pruning / column pruning the reference
hand-rolls at fetch time (see SURVEY.md §4).

Public surface (mirrors reference ``__init__.py:9-25``):
    get_dataset            <- get_xarray_dataset (core_functions.py:35-144)
    get_bounding_box       <- get_bounding_box   (core_functions.py:147-202)
    temporal_resample      <- temporal_resample  (core_functions.py:350-406)
    spatial_resample       <- spatial_resample   (core_functions.py:258-347)
    subset_time_by_timezone<- core_functions.py:205-255
    GridFrame / GridMeta / BoundingBox
    DatasetCatalog         <- info/ + data_accessors/factory.py
    points_to_table        <- ConvertToTable.points_to_tables (to_tables.py:24-130)
"""

from xarray_dataaccessor_spark.meta import BoundingBox, GridMeta
from xarray_dataaccessor_spark.gridframe import GridFrame
from xarray_dataaccessor_spark.catalog import (
    DEFAULT_CATALOG,
    DatasetCatalog,
    get_bounding_box,
    get_dataset,
    points_df,
)
from xarray_dataaccessor_spark.session import get_spark
from xarray_dataaccessor_spark.operators.resample import temporal_resample
from xarray_dataaccessor_spark.operators.spatial import spatial_resample
from xarray_dataaccessor_spark.operators.filters import subset_time_by_timezone
from xarray_dataaccessor_spark.operators.extraction import points_to_table

__all__ = [
    "BoundingBox",
    "GridMeta",
    "GridFrame",
    "DatasetCatalog",
    "DEFAULT_CATALOG",
    "get_bounding_box",
    "get_dataset",
    "get_spark",
    "points_df",
    "temporal_resample",
    "spatial_resample",
    "subset_time_by_timezone",
    "points_to_table",
]

__version__ = "0.1.0"
