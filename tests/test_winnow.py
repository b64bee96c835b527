"""ops/winnow.py: the winnowing guarantee and fold equivalences."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops.text import ngrams_fold, tokens_ws, word_ngrams
from csvw_rdf_convertor_spark.ops.winnow import winnow_fingerprints


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_guarantee_shared_substring(spark):
    """Two documents sharing a substring of length >= k + w - 1 (k=8, w=4
    → 11 chars) must share at least one fingerprint."""
    shared = "abcdefghijklmnop"  # 16 chars, well over the guarantee
    docs = _docs(spark, [(1, "xxx " + shared + " yyy"),
                         (2, "zz2 " + shared + " qq2"),
                         (3, "totally unrelated content here")])
    fps = winnow_fingerprints(docs, k=8, w=4)
    sets = {i: {r.fp for r in rows} for i, rows in
            ((i, fps.where(F.col("doc_id") == i).collect()) for i in (1, 2, 3))}
    assert sets[1] & sets[2], "guaranteed shared fingerprint missing"
    assert not (sets[1] & sets[3] and sets[2] & sets[3]) or True  # 3 may
    # collide by chance on tiny alphabets, but must have SOME fingerprints
    assert sets[3]


def test_winnow_short_doc_no_rows(spark):
    # normalized length 9 < k + w - 1 = 11 → k-grams exist but no full
    # window of 4 hashes (9 - 8 + 1 = 2 hashes)
    docs = _docs(spark, [(1, "abcdefghi")])
    assert winnow_fingerprints(docs, k=8, w=4).count() == 0
    # exactly 11 chars → exactly one window → exactly one fingerprint
    docs2 = _docs(spark, [(2, "abcdefghijk")])
    assert winnow_fingerprints(docs2, k=8, w=4).count() == 1


def test_winnow_normalization_folds_case_and_ws(spark):
    a = winnow_fingerprints(
        _docs(spark, [(1, "Hello   World Example")]), k=6, w=3).collect()
    b = winnow_fingerprints(
        _docs(spark, [(1, "hello world    example")]), k=6, w=3).collect()
    assert {r.fp for r in a} == {r.fp for r in b}


def test_winnow_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(spark, [(1, "x")]), k=1, w=4)


def test_winnow_near_duplicates_pairs(spark):
    from csvw_rdf_convertor_spark.ops.winnow import winnow_near_duplicates
    shared = "the common boilerplate passage that both documents contain"
    docs = _docs(spark, [
        (1, shared + " plus extra tail one two three"),
        (2, shared + " with different ending here now"),
        (3, "completely unrelated text about other topics entirely"),
    ])
    out = winnow_near_duplicates(docs, k=8, w=4, min_shared=2, max_df=10)
    rows = {(r.id_a, r.id_b): r for r in out.collect()}
    assert (1, 2) in rows
    r = rows[(1, 2)]
    assert r.n_shared >= 2 and 0 < r.overlap_ppm <= 1_000_000
    assert not any(3 in p for p in rows)


def test_winnow_near_duplicates_hub_cap(spark):
    """A fingerprint present in EVERY doc must not create pairs when
    max_df is below the corpus size."""
    from csvw_rdf_convertor_spark.ops.winnow import winnow_near_duplicates
    boiler = "identical boilerplate appears everywhere in this corpus"
    docs = _docs(spark, [(i, boiler + f" unique tail {i} " +
                          " ".join(f"t{i}{j}" for j in range(10)))
                         for i in range(6)])
    capped = winnow_near_duplicates(docs, k=8, w=4, min_shared=1, max_df=2)
    uncapped = winnow_near_duplicates(docs, k=8, w=4, min_shared=1,
                                      max_df=100)
    assert capped.count() == 0
    assert uncapped.count() == 15  # all C(6,2) pairs share the boilerplate


def test_winnow_barrier_equals_fold(spark):
    """The Generate-barrier plan and the single-fold reference compute the
    same fingerprint sets (incl. short-doc edges where sequence(1,0)
    would descend without the seq1 guard)."""
    from csvw_rdf_convertor_spark.ops.winnow import winnow_fingerprints_fold
    docs = _docs(spark, [
        (1, "The quick brown Fox   jumps over the lazy dog repeatedly"),
        (2, "short"),                    # < k: no kgrams at all
        (3, "abcdefgh"),                 # exactly k, < k+w-1: no window
        (4, "x y " * 30),
    ])
    a = sorted(map(tuple, winnow_fingerprints(docs, k=8, w=4).collect()))
    b = sorted(map(tuple, winnow_fingerprints_fold(docs, k=8, w=4).collect()))
    assert a == b and a


def test_winnow_and_cdc_plans_are_narrow(spark):
    """Both folds must stay scan→project→generate: zero Exchanges."""
    from csvw_rdf_convertor_spark.ops.chunk import cdc_chunks
    docs = _docs(spark, [(1, "some text for the plan test here")])
    for df in (winnow_fingerprints(docs, k=6, w=3),
               cdc_chunks(docs, k=6, boundary_bits=4, min_size=4)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_ngrams_fold_equals_word_ngrams(spark):
    """The fold form and the positional-get form are the same function."""
    df = spark.createDataFrame(
        [("a b c d e",), ("one two",), ("single",), ("",)], "text string")
    staged = df.withColumn("_t", tokens_ws(F.col("text")))
    for n in (2, 3):
        got = staged.select(
            ngrams_fold(F.col("_t"), n).alias("f"),
            word_ngrams(F.col("_t"), n).alias("w")).collect()
        for r in got:
            assert r.f == r.w, (n, r)
