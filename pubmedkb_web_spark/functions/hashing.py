"""Portable deterministic hashing.

Everything that needs a stable 60-bit integer hash uses the md5-prefix
construction below because it is bit-identical across three runtimes:

- Spark:   ``conv(substr(md5(x), 1, 15), 16, 10)`` cast to bigint
- DuckDB:  ``('0x' || substr(md5(x), 1, 15))::BIGINT``
- Python:  ``int(hashlib.md5(x).hexdigest()[:15], 16)``

That portability is what lets the DuckDB oracle and the pure-Python test
oracle verify hash-derived columns (ann_id, minhash signatures, simhash,
CRE confidence) value-for-value. 15 hex digits = 60 bits, always fits a
signed int64. xxhash64 would be faster JVM-side but is not reproducible in
the oracles, so it is reserved for purely internal salts.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator — cannot occur in generated tokens


def md5_int60(col: Column) -> Column:
    """60-bit integer hash of a string column (portable, see module doc)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_int60_py(s: str) -> int:
    """Python mirror of :func:`md5_int60` for the test oracle."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_int60_sql(expr: str) -> str:
    """DuckDB mirror of :func:`md5_int60` for the SQL oracle."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def key_of(*cols: Column) -> Column:
    """Stable composite key: SEP-joined string of the columns."""
    return F.concat_ws(SEP, *[c.cast("string") for c in cols])


def stable_id(*cols: Column) -> Column:
    """Deterministic 60-bit id from component columns.

    Replaces ``monotonically_increasing_id`` (which depends on partitioning
    and would break checkpoint-resume determinism): unique within its scope
    as long as the component tuple is unique; collision probability for n
    ids within one scope is ~n²/2⁶¹ (negligible at per-doc scope).
    """
    return md5_int60(key_of(*cols))


# Affine rehash family for minhash signatures: h_i(x) = (a_i·x̃ + b_i) mod M31
# where x̃ = x mod M31. Both operands stay < 2³¹ so the product stays < 2⁶²:
# no silent wraparound in Spark longs and no overflow error in DuckDB — the
# same expression evaluates identically in all three runtimes.
MERSENNE31 = (1 << 31) - 1


def affine_params(i: int) -> tuple[int, int]:
    a = ((2 * i + 1) * 0x9E3779B9 + 1) % MERSENNE31
    b = (i * 0x85EBCA6B + 0x7FEE) % MERSENNE31
    return (a or 1), b
