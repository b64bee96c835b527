"""Engine-portable pseudo-random hashing (md5-derived).

Spark's native hash functions (``xxhash64``, ``hash``) have no DuckDB
equivalent, so every operator whose VALUES must be reproducible by the
ANSI-SQL oracle harness derives pseudo-randomness from md5 hex digests:

    Spark:  conv(substr(md5(x), 1, 15), 16, 10)  cast bigint
    DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT

Both parse the same 60-bit prefix of the same digest into the same bigint.

MinHash gets its ``n_perm`` permutations from ONE digest per shingle via the
standard linear-combination trick (Indyk; used by datasketch):

    perm_j(s) = h1(s) + j * h2(s),   h1/h2 = two 52-bit digest halves

which keeps every value below 65 * 2^52 < 2^59 (no bigint overflow under
ANSI mode in either engine) and makes the portable path also the FAST path:
one md5 per shingle instead of 64 hash calls.

The ``sql_*`` twins build the DuckDB-side expression strings so the Spark
expression and its oracle live next to each other and cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: digest-prefix widths: 15 hex = 60 bits (fits bigint), 13 hex = 52 bits
#: (so h1 + 64*h2 stays < 2^59 — no ANSI overflow in Spark or DuckDB)
HEX60 = 15
HEX52 = 13


def hex_to_long(hex_col: Column) -> Column:
    """Parse a (≤15 char) lowercase hex string into a non-negative bigint."""
    return F.conv(hex_col, 16, 10).cast("long")


def phash60(col: Column) -> Column:
    """Portable 60-bit hash of a string column."""
    return hex_to_long(F.substring(F.md5(col), 1, HEX60))


def md5_pair52(col: Column) -> Column:
    """struct<h1:bigint, h2:bigint> — two 52-bit halves of one md5 digest."""
    h = F.md5(col)
    return F.struct(
        hex_to_long(F.substring(h, 1, HEX52)).alias("h1"),
        hex_to_long(F.substring(h, HEX52 + 1, HEX52)).alias("h2"))


def pair52_from_hex(hex_col: Column) -> Column:
    """Same as md5_pair52 but over an already-computed md5 hex column
    (lets callers stage the md5 once per element)."""
    return F.struct(
        hex_to_long(F.substring(hex_col, 1, HEX52)).alias("h1"),
        hex_to_long(F.substring(hex_col, HEX52 + 1, HEX52)).alias("h2"))


def perm_value(pair: Column, j: int) -> Column:
    """j-th MinHash permutation value from a (h1, h2) pair, j ≥ 1."""
    return pair["h1"] + F.lit(j) * pair["h2"]


# --- DuckDB twins (oracle SQL fragments) -----------------------------------

def sql_phash60(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, {HEX60}))::BIGINT"


def sql_h1(hex_expr: str) -> str:
    return f"('0x' || substr({hex_expr}, 1, {HEX52}))::BIGINT"


def sql_h2(hex_expr: str) -> str:
    return f"('0x' || substr({hex_expr}, {HEX52 + 1}, {HEX52}))::BIGINT"
