"""MinHash + LSH banding as pure column expressions.

Signature = per-permutation min of ``xxhash64(shingle, perm_seed)`` over the
shingle set — entirely JVM-side (no Python, no UDF), deterministic across
retries. LSH bands hash signature slices; candidate pairs come from an
equi-join on (band_idx, band_hash), which Catalyst executes as a shuffle
hash join on a key that is uniform by construction (hash values) — no skew.

Used for near-dup detection over ``documents`` and for entity-link blocking
in the KG pipeline (north rule: "broadcast alias dictionary + MinHash-LSH
blocking").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-character shingles of a (lowercased) string."""
    s = F.lower(col)
    n = F.length(s)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, k)))


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (for document-level near-dup)."""
    words = F.split(F.lower(F.trim(col)), r"\s+")
    cnt = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(cnt - n, F.lit(0)))
    return F.array_distinct(F.transform(
        idx, lambda i: F.array_join(F.slice(words, i + 1, n), " ")))


def minhash_signature(shingles: Column, n_perm: int = 64) -> Column:
    """array<bigint> of length n_perm; empty shingle set → nulls."""
    return F.array(*[
        F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(j))))
        for j in range(n_perm)
    ])


def lsh_bands(df: DataFrame, sig_col: str, n_bands: int, rows_per_band: int,
              id_cols: list[str]) -> DataFrame:
    """Explode a signature column into (id_cols..., band, band_key) rows."""
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.concat_ws(
                ",", *[F.element_at(F.col(sig_col), b * rows_per_band + r + 1).cast("string")
                       for r in range(rows_per_band)])).alias("band_key"))
        for b in range(n_bands)
    ])
    return (df.select(*id_cols, F.explode(bands).alias("b"))
            .select(*id_cols, F.col("b.band").alias("band"),
                    F.col("b.band_key").alias("band_key")))


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two array<string> columns (for candidate rescoring)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))


def estimated_jaccard(sig_a: Column, sig_b: Column) -> Column:
    """MinHash estimate: fraction of agreeing signature slots."""
    agree = F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y),
                            lambda v: v))
    return agree.cast("double") / F.size(sig_a)
