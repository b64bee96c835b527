"""Deduplication operators for training-data pipelines.

Four families, each a `queries()` entry with an oracle:

- **exact**       content-hash groupBy (md5 — engine-portable, unlike
                  engine-native hash functions), keep min id
- **minhash-lsh** word-shingle MinHash signatures → banded LSH buckets →
                  candidate pair join → exact-Jaccard verify → cluster
- **simhash**     64-bit sign-aggregated token hashes; near-dups = equal
                  simhash (or small Hamming distance via band join)
- **ngram-jaccard / embedding-cosine** direct pairwise verification within
  LSH (or label) blocks

Scale notes: every pairwise step is *blocked* first (LSH bands) so the join
key is a uniform hash — no quadratic blowup, no skewed keys. Signatures are
pure column expressions (JVM, codegen); nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .minhash import jaccard, lsh_bands, minhash_signature, word_shingles

# --- exact dedup ---------------------------------------------------------------

def exact_duplicates(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups with >1 identical text: (content_md5, n_dups, keep_id)."""
    return (docs
            .select(F.md5(F.col(text_col).cast("binary")).alias("content_md5"),
                    F.col(id_col))
            .groupBy("content_md5")
            .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


def drop_exact_duplicates(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of every identical-text group.
    One shuffle on the content hash (uniform key), map-side combined."""
    keep = (docs.groupBy(F.md5(F.col(text_col).cast("binary")).alias("h"))
            .agg(F.min(id_col).alias(id_col)))
    return docs.join(keep, id_col, "left_semi")


def normalized_duplicates(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Token-sort near-exact dup: same bag of lowercase tokens (catches
    whitespace/case/word-order perturbations)."""
    sig = F.md5(F.array_join(
        F.array_sort(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")), " ")
        .cast("binary"))
    return (docs.select(sig.alias("norm_sig"), F.col(id_col))
            .groupBy("norm_sig")
            .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


# --- MinHash-LSH near-dup ---------------------------------------------------------

def minhash_near_duplicates(docs: DataFrame, *, text_col: str = "text",
                            id_col: str = "doc_id", shingle_words: int = 3,
                            n_perm: int = 64, n_bands: int = 16,
                            threshold: float = 0.8) -> DataFrame:
    """Candidate pairs above a Jaccard threshold: (id_a, id_b, jacc).

    Pipeline: shingle (narrow) → signature (narrow) → band explode (narrow)
    → self-join on (band, band_key) (shuffle on uniform hash) → distinct
    pair → exact-Jaccard verify on the shingle sets.
    """
    rows_per_band = n_perm // n_bands
    base = (docs.select(F.col(id_col).alias("id"),
                        word_shingles(F.col(text_col), shingle_words).alias("sh"))
            .where(F.size("sh") > 0)
            .withColumn("sig", minhash_signature(F.col("sh"), n_perm)))
    bands = lsh_bands(base, "sig", n_bands, rows_per_band, ["id", "sh"])

    left = bands.select(F.col("band"), F.col("band_key"),
                        F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    right = bands.select(F.col("band"), F.col("band_key"),
                         F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (left.join(right, ["band", "band_key"])
             .where(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("jacc", jaccard(F.col("sh_a"), F.col("sh_b")))
             .where(F.col("jacc") >= threshold)
             .select("id_a", "id_b", F.round("jacc", 6).alias("jacc")))
    return pairs


def near_dup_clusters(pairs: DataFrame) -> DataFrame:
    """Pairs → (id, cluster_rep) via connected components (reuses the KG CC)."""
    from ..kg.cc import connected_components
    edges = pairs.select(F.col("id_a").cast("string").alias("src"),
                         F.col("id_b").cast("string").alias("dst"))
    return connected_components(edges).withColumnRenamed("comp", "cluster_rep")


# --- SimHash -----------------------------------------------------------------------

def simhash64(text: Column) -> Column:
    """64-bit SimHash of whitespace tokens, as pure column expressions.

    bit_b(doc) = sign of Σ_tokens (2·bit_b(xxhash64(token)) − 1); the inner
    Σ runs in one ``aggregate`` over a 64-slot array accumulator.
    """
    tokens = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != "")

    def bitvec(t):  # ±1 per bit of the token hash (bit index is plan-time)
        h = F.xxhash64(t)
        return F.array(*[
            (F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
            for i in range(64)])

    sums = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, t: F.zip_with(acc, bitvec(t), lambda a, b: a + b))
    out = F.lit(0).cast("long")
    for i in range(64):
        # bit 63 is the sign bit: 1<<63 as a signed long is Long.MIN_VALUE
        bit_val = F.lit(1 << i) if i < 63 else F.lit(-(2 ** 63))
        out = out.bitwiseOR(
            F.when(F.element_at(sums, i + 1) > 0, bit_val)
             .otherwise(F.lit(0).cast("long")))
    return out


def simhash_duplicates(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Identical-simhash groups (Hamming-0). For Hamming ≤ k, band the 64
    bits into k+1 slices and join per slice (pigeonhole) — same lsh_bands
    machinery."""
    return (docs.select(simhash64(F.col(text_col)).alias("simhash"), F.col(id_col))
            .groupBy("simhash")
            .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("keep_id"))
            .where(F.col("n_dups") > 1))


# --- embedding cosine near-dup -------------------------------------------------------

def embedding_near_duplicates(emb: DataFrame, *, vec_col: str = "embedding",
                              id_col: str = "vec_id", block_col: str | None = None,
                              threshold: float = 0.95) -> DataFrame:
    """Pairs with cosine ≥ threshold. Blocked by ``block_col`` when given
    (e.g. an IVF/LSH bucket or a label); otherwise all-pairs (small inputs)."""
    from .similarity import cosine
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                   *([F.col(block_col)] if block_col else []))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                   *([F.col(block_col)] if block_col else []))
    joined = a.join(b, on=[block_col] if block_col else None, how="inner") \
        if block_col else a.crossJoin(b)
    return (joined.where(F.col("id_a") < F.col("id_b"))
            .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
            .where(F.col("cos") >= threshold)
            .select("id_a", "id_b", F.round("cos", 6).alias("cos")))
