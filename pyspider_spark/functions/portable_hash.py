"""Engine-portable 56-bit hashing: the SAME value computable by Spark and
by ANSI-ish SQL engines that expose md5 (DuckDB, Trino, ...).

Why: xxhash64 is Spark-private, so any operator keyed on it (minhash /
simhash / LSH band hashes) can only be verified rows-only. Taking the
first 14 hex chars of md5 yields a 56-bit non-negative integer that fits
a signed BIGINT in every engine:

    Spark : conv(substring(md5(x), 1, 14), 16, 10) :: long
    DuckDB: CAST(('0x' || substr(md5(x), 1, 14)) AS BIGINT)

md5 is ~2x slower than xxhash64 per call but both are JVM-side,
whole-stage-codegen expressions — the dedup pipelines stay shuffle-bound,
not hash-bound (measured: < 5% of dedup_minhash wall time).

Each helper has a ``*_sql`` twin generating the DuckDB fragment so the
oracle SQL is derived from the same salt/arity, never transcribed by hand.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 56  # 14 hex chars


def md5_hash56(col: Column, salt: str = "") -> Column:
    """56-bit integer hash of a string column (portable across engines)."""
    x = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(x), 1, 14), 16, 10).cast("long")


def md5_hash56_sql(expr: str, salt: str = "") -> str:
    """DuckDB fragment computing the same value as :func:`md5_hash56`."""
    x = f"('{salt}' || {expr})" if salt else expr
    return f"CAST(('0x' || substr(md5({x}), 1, 14)) AS BIGINT)"
