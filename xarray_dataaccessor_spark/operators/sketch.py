"""Cardinality sketches: an engine-portable HyperLogLog.

At 100 TB, ``count_distinct`` pays an expand + full shuffle of the
distinct keys; the corpus-health numbers a curation pipeline watches
(distinct fingerprints, distinct URLs/domains per source) only need
~2% accuracy. Spark ships ``approx_count_distinct`` (HLL++), but its
register hashing is JVM-private — an oracle cannot replay it. This
HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) is built from the
repo's portable md5 hash and integer register arithmetic, so DuckDB
reproduces every register and the final estimate from the same SQL
spelling:

- register  = top ``p`` bits of the 32-bit md5 prefix hash,
- rho       = leading-zero count of the remaining ``32 - p`` bits + 1
  (pure integer: ``(32 - p) + 1 - length(bin(rest))``),
- registers combine with MAX (one register-sized shuffle with map-side
  combine; merging sketches of disjoint batches is the same MAX, so
  the sketch is decomposable and incremental-append friendly),
- the harmonic sum folds ``pow(2, -rho)`` through DECIMAL(38,28) —
  powers of two up to 2^-27 are exact there, so the sum is
  order-independent and engine-exact,
- the small-range (linear-counting) correction applies below 2.5 m
  with zero registers present; the final estimate rounds to 6 decimals
  (the repo's float-portability discipline for the one ``ln`` call).

The 32-bit hash caps honest use around ~100 M distincts per group
(hash-collision bias beyond); the large-range correction is therefore
deliberately omitted — at bigger cardinalities swap the hash width,
not the correction.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Flajolet et al. 2007 bias constants (alpha_m) for the register
#: counts this module supports.
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_ndv(
    df: DataFrame,
    col: str,
    p: int = 6,
    group_cols: Sequence[str] = (),
    out_col: str = "approx_ndv",
) -> DataFrame:
    """Approximate number of distinct ``col`` values per ``group_cols``
    (one row per group; one total row when no groups). Standard error
    ~= 1.04 / sqrt(2^p) — p=6 (64 registers) gives ~13%, p=10 ~3%.

    Returns ``(*group_cols, out_col double)``. See module docstring for
    the portability contract; the SQL replay lives in the
    ``token_count_by_source`` oracle's 'report' variant."""
    if not 4 <= p <= 12:
        raise ValueError("p must be in [4, 12] for the 32-bit hash")
    from xarray_dataaccessor_spark.functions.hashing import portable_hash32

    m = 1 << p
    rest_bits = 32 - p
    h = portable_hash32(F.col(col).cast("string"))
    reg = F.shiftright(h, rest_bits)
    rest = h % F.lit(1 << rest_bits)
    rho = (
        F.when(rest == 0, F.lit(rest_bits + 1))
        .otherwise(F.lit(rest_bits + 1) - F.length(F.bin(rest)))
        .cast("int")
    )
    keys = list(group_cols)
    regs = (
        df.select(*keys, reg.alias("__reg"), rho.alias("__rho"))
        .groupBy(*keys, "__reg")
        .agg(F.max("__rho").alias("__rho"))
    )
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__hit"),
        F.sum(
            F.expr("CAST(pow(2.0, -__rho) AS DECIMAL(38,28))")
        ).alias("__s_hit"),
    )
    s = (
        (F.lit(m) - F.col("__hit")).cast("double")
        + F.col("__s_hit").cast("double")
    )
    e_raw = F.lit(_alpha(m) * m * m) / s
    v = F.lit(m) - F.col("__hit")  # never-hit registers are the zeros
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(*keys, F.round(est, 6).alias(out_col))


def hll_ndv_sql(expr: str, p: int = 6) -> str:
    """The DuckDB spelling of :func:`hll_ndv` over value expression
    ``expr`` — emitted as a correlated-free aggregate body the caller
    wraps with its own GROUP BY keys (see the token_count_by_source
    oracle). Kept NEXT to the Spark implementation so the two cannot
    drift silently."""
    m = 1 << p
    rest_bits = 32 - p
    a = _alpha(m)
    h = f"('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 8))::BIGINT"
    return f"""
        SELECT grp,
            round(CASE WHEN {a!r} * {m} * {m} /
                       (CAST({m} - COUNT(*) AS DOUBLE)
                        + CAST(SUM(CAST(pow(2.0, -rho) AS DECIMAL(38,28)))
                               AS DOUBLE)) <= {2.5 * m!r}
                       AND {m} - COUNT(*) > 0
                  THEN {float(m)!r} * ln({float(m)!r} /
                       CAST({m} - COUNT(*) AS DOUBLE))
                  ELSE {a!r} * {m} * {m} /
                       (CAST({m} - COUNT(*) AS DOUBLE)
                        + CAST(SUM(CAST(pow(2.0, -rho) AS DECIMAL(38,28)))
                               AS DOUBLE))
                  END, 6) AS approx_ndv
        FROM (
            SELECT grp, reg,
                   MAX(CASE WHEN rest = 0 THEN {rest_bits + 1}
                        ELSE {rest_bits + 1} - length(bin(rest)) END) AS rho
            FROM (
                SELECT grp, {h} // {1 << rest_bits} AS reg,
                       {h} % {1 << rest_bits} AS rest
                FROM __hll_src
            ) GROUP BY grp, reg
        ) GROUP BY grp
    """
