"""Portable 32-bit hashing — bit-identical between Spark and DuckDB.

Spark's native hashes (murmur3 ``hash``, ``xxhash64``) have no DuckDB
equivalent, so anything built on them is untestable against a SQL oracle
and irreproducible outside Spark. ``md5_hash32`` reconstructs the lower
32 bits of the little-endian md5 digest — exactly DuckDB's
``md5_number_lower(x) & 4294967295`` — from Spark's ``md5`` hex string
(digest bytes 11..8 as MSB..LSB; pinned against hashlib in
tests/test_dedup.py). Used by the portable simhash mode
(dedup/simhash.py) and deterministic sampling (operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 2**32 — md5_hash32's value range is [0, MOD32)
MOD32 = 1 << 32


def md5_hash32(col: Column) -> Column:
    """Lower 32 bits of the LE md5 digest as a non-negative long."""
    m = F.md5(col)
    le = F.concat(
        F.substring(m, 23, 2),
        F.substring(m, 21, 2),
        F.substring(m, 19, 2),
        F.substring(m, 17, 2),
    )
    return F.conv(le, 16, 10).cast("long")


def md5_hash32_sql(expr: str) -> str:
    """The DuckDB rendering of ``md5_hash32`` for oracle SQL."""
    return f"(md5_number_lower({expr}) & 4294967295)"


def _le32_from_hex(m: Column) -> Column:
    le = F.concat(
        F.substring(m, 23, 2),
        F.substring(m, 21, 2),
        F.substring(m, 19, 2),
        F.substring(m, 17, 2),
    )
    return F.conv(le, 16, 10).cast("long")


def md5_hash32_hof(arr_col: Column) -> Column:
    """``md5_hash32`` mapped over an ``array<string>`` column.

    Interpreted lambda eval has no common-subexpression elimination, so
    inlining ``md5_hash32`` in a single ``transform`` evaluates ``md5``
    four times per element (once per substring of the hex digest). Two
    chained transforms — hash pass, then hex→int pass — run it once.
    """
    return F.transform(F.transform(arr_col, lambda s: F.md5(s)), _le32_from_hex)
