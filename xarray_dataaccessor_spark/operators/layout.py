"""Physical-layout operators: space-filling-curve clustering for grid
tables (SURVEY §6 scale design; no reference counterpart — the reference
holds one in-memory xarray Dataset, ``core_functions.py``, so layout
never arises. At 100 TB layout IS the query plan).

A bbox query over a grid table prunes at two levels: partition pruning
(directory keys: year/month — ``sources/ingest.py`` landing) and parquet
row-group skipping on the pushed ``x``/``y`` predicates. Row-group
min/max stats only help if rows that are CLOSE IN SPACE are close in the
file: a time-ordered write scatters every bbox across every row group
(every group's x/y min/max spans the whole domain -> zero skipping).
Sorting by a Morton (Z-order) key interleaves the x/y bits so each row
group covers a compact spatial tile — the same technique Delta/Iceberg
expose as ``ZORDER BY`` / ``sort_order``, here as plain Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per axis in the Morton key (21 bits x 2 < 63 — fits a bigint)
MORTON_BITS = 21


def _spread_bits(v: Column, bits: int) -> Column:
    """Interleave zeros between the bits of ``v`` (bit i -> bit 2i),
    building the expression as a balanced OR tree of shifted masks —
    pure codegen, no UDF."""
    terms = [
        F.shiftleft(F.shiftright(v, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def morton_key(
    x: Column,
    y: Column,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    bits: int = MORTON_BITS,
) -> Column:
    """Z-order key from two coordinate columns: quantize each axis to
    ``bits`` bits over its [min, max] envelope, then interleave. Equal
    keys = same spatial cell; nearby keys = nearby cells (with the usual
    Z-curve seams). The envelope comes from the caller (catalog metadata
    or one min/max aggregation) — never hard-coded."""
    def q(col: Column, lo: float, hi: float) -> Column:
        span = (hi - lo) or 1.0
        scaled = (col - F.lit(float(lo))) / F.lit(float(span)) * F.lit(
            float((1 << bits) - 1)
        )
        return F.least(
            F.greatest(F.round(scaled).cast("bigint"), F.lit(0)),
            F.lit((1 << bits) - 1),
        )

    return _spread_bits(q(x, x_min, x_max), bits).bitwiseOR(
        F.shiftleft(_spread_bits(q(y, y_min, y_max), bits), 1)
    )


def cluster_spatially(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    n_files: int | None = None,
    bits: int = MORTON_BITS,
) -> DataFrame:
    """Return ``df`` ordered for a spatially-clustered write: range
    partition + sort by the Morton key (envelope from one min/max
    aggregation), so each output file / row group covers a compact
    spatial tile and bbox scans skip everything else.

    ``repartitionByRange`` samples the key distribution, so file sizes
    stay balanced even when data density is spatially skewed (the reason
    plain ``repartition(morton % n)`` is wrong: a city-sized hot tile
    would land in one file). Use as
    ``cluster_spatially(df).write.parquet(...)``."""
    lo_hi = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).first()
    if lo_hi is None or any(v is None for v in lo_hi):
        # empty input or all-null coordinates: no envelope to quantize
        # against — the identity ordering is the only sensible answer
        return df
    key = morton_key(
        F.col(x_col), F.col(y_col), lo_hi[0], lo_hi[1], lo_hi[2], lo_hi[3], bits
    )
    out = df.withColumn("__z", key)
    if n_files:
        out = out.repartitionByRange(n_files, "__z")
    return out.sortWithinPartitions("__z").drop("__z")
