"""Engine-portable hashing helpers.

The dedup/similarity extension operators (SURVEY §7.8) must be verifiable
against a DuckDB SQL oracle, so they cannot use Spark's Murmur3 ``hash()``
(DuckDB's ``hash()`` is a different function). Instead we derive integer
hashes from ``md5`` hex digests, which both engines compute identically:

    Spark :  conv(substring(md5(s), 1, 8), 16, 10)::bigint
    DuckDB:  ('0x' || substr(md5(s), 1, 8))::BIGINT   (or equivalent)

8 hex chars = 32 bits keeps subsequent ``(a*h + b) % p`` permutation
arithmetic inside int64 for a < 2**20, so Spark and the oracle agree bit
for bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime just above 2**32; (a*h + b) % MERSENNE stays < 2**53 for a < 2**20.
HASH_PRIME = 4_294_967_311


def portable_hash32(col: Column) -> Column:
    """32-bit non-negative hash of a string column via md5 (portable to
    DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def portable_hash64(col: Column) -> Column:
    """60-bit non-negative hash (15 hex chars < 2**63) for fingerprints."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def minhash_permutation(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation ``(a*h + b) % p`` of a 32-bit hash."""
    return (hash_col * F.lit(a) + F.lit(b)) % F.lit(HASH_PRIME)
