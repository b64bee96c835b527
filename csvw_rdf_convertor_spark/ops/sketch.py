"""Deterministic distinct-count sketching (theta/adaptive-sampling style).

Exact COUNT(DISTINCT term) over 100 TB shuffles every distinct value; the
sketch answer is a fixed-rate HASH THRESHOLD: keep values whose uniform
60-bit hash falls below ``2^(60−b)`` (a deterministic 2^−b sample of the
VALUE SPACE — every duplicate of a value is kept or dropped together),
count the survivors' distinct hashes exactly, multiply back by ``2^b``:

    est = count_distinct(h | h < 2^(60−b)) · 2^b

This is the fixed-theta special case of the theta sketch (Dasgupta et al.,
"Theta-Sketch Framework"), chosen over KMV/HLL because it is DETERMINISTIC
and engine-portable: the survivor set is a pure function of the hash, so
the DuckDB oracle reproduces the estimate BIT-FOR-BIT (gate
``sketch_theta_distinct``) — no RNG, no float harmonic means. Standard
error ≈ 1/√(n·2^−b), tunable by ``b``.

Scale shape: one narrow filter pass (survivor fraction 2^−b of rows), then
a distinct over the tiny survivor set — the only shuffle is 2^−b-sized.
Mergeable across shards by construction (union of survivor sets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column

from ..functions import phash

#: 60-bit hash domain (functions/phash.py HEX60)
DOMAIN_BITS = 60
MASK60 = (1 << DOMAIN_BITS) - 1


def uniform_h60(value: Column, hash_family: str = "xxhash64") -> Column:
    """Uniform non-negative 60-bit hash in either family."""
    if hash_family == "md5":
        return phash.phash60(value)
    if hash_family == "xxhash64":
        return F.xxhash64(value).bitwiseAND(F.lit(MASK60))
    raise ValueError(f"unknown hash family {hash_family!r}")


def theta_distinct(values: DataFrame, value_col: str, *, b: int = 4,
                   hash_family: str = "xxhash64") -> DataFrame:
    """One-row DataFrame ``(n_sampled, est_distinct)`` — see module doc.
    ``b`` trades accuracy for survivor-set size (rate 2^−b)."""
    if not 0 <= b < DOMAIN_BITS:
        raise ValueError(f"need 0 <= b < {DOMAIN_BITS}, got {b}")
    threshold = 1 << (DOMAIN_BITS - b)
    survivors = (values
                 .select(uniform_h60(F.col(value_col), hash_family)
                         .alias("h"))
                 .where(F.col("h") < threshold))
    return (survivors
            .agg(F.count_distinct(F.col("h")).alias("n_sampled"))
            .select("n_sampled",
                    (F.col("n_sampled") * (1 << b)).alias("est_distinct")))


def sql_theta_distinct(rel: str, value_expr: str, *, b: int = 4) -> str:
    """DuckDB oracle twin (md5 family)."""
    threshold = 1 << (DOMAIN_BITS - b)
    return rf"""
SELECT n_sampled, n_sampled * {1 << b} AS est_distinct
FROM (
  SELECT COUNT(DISTINCT h) AS n_sampled
  FROM (SELECT ('0x' || substr(md5({value_expr}), 1, 15))::BIGINT AS h
        FROM {rel})
  WHERE h < {threshold})
"""
