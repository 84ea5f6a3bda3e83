"""Ingestion connectors (S1-S5, SURVEY §2.1) — the reference's remote
accessors re-framed as an ingest-then-query layer.

The reference fetches NetCDF/GeoTIFF fragments per (variable, month)
request dict and assembles them eagerly; here the same enumeration logic
produces *file lists / API parameter sets* (pure, unit-testable), the
landers turn fragments into partitioned Parquet
(``dataset/variable/year=/month=``), and everything downstream is plain
``spark.read.parquet`` where Catalyst partition pruning replaces every
hand-rolled month/bbox crop (SURVEY §4).

Network/codec-dependent pieces (fsspec+h5netcdf NetCDF open, rasterio
GeoTIFF open, live CMR/CDS calls) are gated behind import-tries, with the
enumeration and layout logic fully real.
"""

from __future__ import annotations

import datetime as _dt
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.functions.datetime_fns import to_datetime
from xarray_dataaccessor_spark.meta import BoundingBox

ERA5_S3_BUCKET = "era5-pds"


def month_range(start, end) -> list[tuple[int, int]]:
    """All (year, month) pairs intersecting [start, end] — the fragment
    enumeration of ``_get_requests_dicts`` (``era5_from_aws.py:327-346``),
    i.e. partition pruning done at request time."""
    start, end = to_datetime(start), to_datetime(end)
    out = []
    y, m = start.year, start.month
    while (y, m) <= (end.year, end.month):
        out.append((y, m))
        y, m = (y + 1, 1) if m == 12 else (y, m + 1)
    return out


def era5_s3_paths(
    variables: Sequence[str], start, end, bucket: str = ERA5_S3_BUCKET
) -> list[str]:
    """S1: one S3 NetCDF object per (month, variable)
    (``s3://era5-pds/{year}/{month}/data/{var}.nc``,
    ``era5_from_aws.py:302-347``)."""
    return [
        f"s3://{bucket}/{y}/{m:02d}/data/{var}.nc"
        for (y, m) in month_range(start, end)
        for var in variables
    ]


def cds_request_dicts(
    variables: Sequence[str],
    bbox: BoundingBox,
    start,
    end,
    hours: Sequence[int] = tuple(range(24)),
) -> list[dict]:
    """S2: one CDS API request per (variable, week) with the bbox pushed
    into the request's ``area`` parameter — predicate pushdown into the
    source (``era5_from_cds.py:215-233, 406-474``)."""
    start, end = to_datetime(start), to_datetime(end)
    out = []
    for var in variables:
        cursor = start
        while cursor <= end:
            week_end = min(cursor + _dt.timedelta(days=6), end)
            days = [
                (cursor + _dt.timedelta(days=i)).day
                for i in range((week_end - cursor).days + 1)
            ]
            out.append(
                {
                    "variable": var,
                    "year": cursor.year,
                    "month": f"{cursor.month:02d}",
                    "day": [f"{d:02d}" for d in days],
                    "time": [f"{h:02d}:00" for h in hours],
                    # area = [north, west, south, east] per CDS convention
                    "area": [bbox.north, bbox.west, bbox.south, bbox.east],
                }
            )
            cursor = week_end + _dt.timedelta(days=1)
    return out


def cmr_granule_query(
    short_name: str, bbox: BoundingBox, start, end, page_size: int = 2000
) -> dict:
    """S3: NASA CMR granule-search parameters (REST ``granules.json``
    with ``bounding_box`` + ``temporal``, ``nasa_from_LPDAAC.py:398-457``)
    — catalog-level partition pruning."""
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    return {
        "url": "https://cmr.earthdata.nasa.gov/search/granules.json",
        "params": {
            "short_name": short_name,
            "bounding_box[]": f"{bbox.west},{bbox.south},{bbox.east},{bbox.north}",
            "temporal": f"{to_datetime(start).strftime(fmt)},{to_datetime(end).strftime(fmt)}",
            "page_size": page_size,
        },
    }


def land_grid_parquet(
    df: DataFrame,
    base_dir: str,
    dataset_name: str,
    time_col: str = "time",
    mode: str = "overwrite",
    sort_spatial: bool = True,
    y_col: str = "y",
    x_col: str = "x",
) -> str:
    """Land a long-form grid DataFrame as year=/month=-partitioned
    Parquet — the layout every downstream time filter prunes on
    (Catalyst ``PartitionFilters``). This is the distributed half of every
    connector; the fragment openers below feed it.

    ``sort_spatial`` sorts rows within each file by (y, x) so Parquet
    row-group min/max stats form tight spatial zone maps — a bbox filter
    then skips whole row groups, the engine-level equivalent of the
    reference's per-fragment bbox crop."""
    path = f"{base_dir}/{dataset_name}"
    out = df.withColumn("year", F.year(time_col)).withColumn(
        "month", F.month(time_col)
    )
    if sort_spatial and y_col in df.columns and x_col in df.columns:
        out = out.sortWithinPartitions("year", "month", y_col, x_col)
    out.write.mode(mode).partitionBy("year", "month").parquet(path)
    return path


def open_netcdf_fragment(path: str, variable: str):  # pragma: no cover
    """S1/S4 NetCDF fragment opener (fsspec + h5netcdf,
    ``era5_from_aws.py:349-376``, ``nasa_from_LPDAAC.py:480-489``) —
    gated: the NetCDF stack is not installed in this container."""
    try:
        import h5netcdf  # noqa: F401
        import xarray  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "NetCDF ingestion requires xarray+h5netcdf (not installed). "
            "Land fragments as Parquet externally and register the path "
            "in the DatasetCatalog."
        ) from exc


def open_geotiff_fragment(path: str, variable: str, year: int | None = None):  # pragma: no cover
    """S5 GeoTIFF fragment opener (rasterio engine + constant time dim,
    ``nasa_from_LPDAAC.py:491-516``) — gated on rasterio."""
    try:
        import rasterio  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "GeoTIFF ingestion requires rasterio (not installed)."
        ) from exc


def fetch_cds(requests: Sequence[Mapping], api_key: str | None = None):  # pragma: no cover
    """S2 live CDS fetch — gated on cdsapi + credentials."""
    try:
        import cdsapi  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Live CDS retrieval requires the cdsapi package (not installed); "
            "cds_request_dicts() still produces the full request batch."
        ) from exc


def register_landed_dataset(
    catalog,
    spark: SparkSession,
    name: str,
    path: str,
    variables: Sequence[str],
):
    """Register landed Parquet in the catalog so ``catalog.load`` gives
    the pruned scan (bbox/time/variable pushdown all Catalyst-side)."""
    return catalog.register(name, path, variables)
