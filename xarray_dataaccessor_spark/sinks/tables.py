"""S8 table sink: parquet (default) / csv / xlsx.

Reference: ``_save_dataframe`` (``utility_functions.py:477-522``) — writes
the extracted wide table with an optional prefix/suffix naming scheme.
Parquet/CSV go through the distributed writers; xlsx is driver-side (the
reference uses pandas/openpyxl; here a pure-stdlib SpreadsheetML writer,
``sinks/xlsx.py``) and only valid for the small extracted tables.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame


def save_dataframe(
    df: DataFrame,
    file_dir: str | Path,
    variable: str,
    file_format: str = "parquet",
    file_prefix: str | None = None,
    mode: str = "overwrite",
) -> Path:
    """Write ``df`` as ``<prefix><variable>.<format>`` under ``file_dir``.

    parquet/csv are distributed writes (a directory of part files, Spark's
    native layout); xlsx collects to the driver — bounded output only.
    """
    file_dir = Path(file_dir)
    name = f"{file_prefix or ''}{variable}"
    if file_format == "parquet":
        path = file_dir / f"{name}.parquet"
        df.write.mode(mode).parquet(str(path))
    elif file_format == "csv":
        path = file_dir / f"{name}.csv"
        df.write.mode(mode).option("header", "true").csv(str(path))
    elif file_format == "xlsx":
        path = file_dir / f"{name}.xlsx"
        from xarray_dataaccessor_spark.sinks.xlsx import write_xlsx

        write_xlsx(df.toPandas(), path)
    else:
        raise ValueError(f"Unsupported format {file_format!r}")
    return path
