"""with_min_signature (explode + compiled min aggregates) must compute
BIT-IDENTICAL signatures to the narrow signature_from_pairs fold, in both
hash families — minhash_near_duplicates switched to the aggregate form in
r6 (guide §4: the fold is an interpreted HOF), and the md5 oracle gates
replay the signature values, so equality here is load-bearing.
"""

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops.minhash import (
    shingle_pairs, signature_from_pairs, with_min_signature,
    with_word_shingles)


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with other words entirely here"),
        (4, "short"),
        (5, ""),           # trims to one empty-string shingle, not zero
        (6, "a b"),        # fewer words than the shingle width
        (7, "x " * 50),    # repeated token → array_distinct collapses
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _compare(spark, family, n_perm):
    prs = (with_word_shingles(
               _docs(spark).select(F.col("doc_id").alias("id"), "text"),
               ["id"])
           .withColumn("pr", shingle_pairs(F.col("sh"), family)))
    fold = prs.select(
        "id", signature_from_pairs(F.col("pr"), n_perm).alias("sig"))
    agg = with_min_signature(prs, ["id"], "pr", n_perm)
    a = {r["id"]: r["sig"] for r in fold.collect()}
    b = {r["id"]: r["sig"] for r in agg.collect()}
    assert a == b


def test_sig_agg_equals_fold_xxhash64(spark):
    _compare(spark, "xxhash64", 64)


def test_sig_agg_equals_fold_md5(spark):
    _compare(spark, "md5", 32)


def test_sig_agg_drops_empty_pair_rows(spark):
    df = spark.createDataFrame(
        [(1, [(5, 7)]), (2, [])],
        "id long, pr array<struct<h1:long,h2:long>>")
    out = with_min_signature(df, ["id"], "pr", 4).collect()
    assert {r["id"] for r in out} == {1}
    assert out[0]["sig"] == [5 + 7, 5 + 14, 5 + 21, 5 + 28]
