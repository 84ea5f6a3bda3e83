from xarray_dataaccessor_spark.functions.datetime_fns import (
    to_datetime,
    convert_timezone,
    format_time,
)
from xarray_dataaccessor_spark.functions.hashing import (
    portable_hash32,
    portable_hash64,
)

__all__ = [
    "to_datetime",
    "convert_timezone",
    "format_time",
    "portable_hash32",
    "portable_hash64",
]
