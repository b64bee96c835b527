"""Unit tests for ops/chunk.py, ops/decontam.py and text.tf_idf_top_terms.

Edge cases the sf0.01 oracle gates can't isolate: empty documents, exact
window boundaries, hash-family equivalence, transitive cluster merge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops import dedup
from csvw_rdf_convertor_spark.ops.chunk import chunk_documents
from csvw_rdf_convertor_spark.ops.decontam import ngram_contamination
from csvw_rdf_convertor_spark.ops.text import tf_idf_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_boundaries(spark):
    words = " ".join(f"w{i}" for i in range(10))  # 10 tokens
    docs = _docs(spark, [
        (1, words),          # size 4 stride 3 -> starts 0,3,6,9
        (2, "a b"),          # shorter than size -> one chunk
        (3, "   "),          # zero tokens -> no chunks
        (4, "x y z q"),      # exactly size -> starts 0,3 (tail len 1)
    ])
    out = chunk_documents(docs, size=4, overlap=1)
    rows = {(r.doc_id, r.chunk_idx): (r.n_tokens, r.chunk_text)
            for r in out.collect()}
    assert rows[(1, 0)] == (4, "w0 w1 w2 w3")
    assert rows[(1, 1)] == (4, "w3 w4 w5 w6")   # overlap of 1 token
    assert rows[(1, 3)] == (1, "w9")            # ragged tail
    assert rows[(2, 0)] == (2, "a b")
    assert (3, 0) not in rows
    assert rows[(4, 1)] == (1, "q")
    assert len(rows) == 4 + 1 + 0 + 2


def test_chunk_rejects_bad_overlap():
    with pytest.raises(ValueError):
        chunk_documents(None, size=4, overlap=4)


def test_chunk_plan_is_narrow(spark):
    """Chunking must be scan→project→generate: zero shuffle Exchanges."""
    docs = _docs(spark, [(1, "a b c")])
    plan = (chunk_documents(docs, size=2, overlap=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_pack_sequences_layout(spark):
    """3 docs of 5 tokens + 1 EOS each into context 8 (one shard):
    stream positions doc1=[0,5) doc2=[6,11) doc3=[12,17) — doc2 straddles
    the pack-0/pack-1 boundary, doc3 straddles pack-1/pack-2."""
    from csvw_rdf_convertor_spark.ops.chunk import pack_sequences
    docs = _docs(spark, [(i, "t1 t2 t3 t4 t5") for i in (1, 2, 3)])
    out = sorted(map(tuple, pack_sequences(
        docs, context_len=8, shard_size=100, sep_tokens=1).collect()))
    assert out == [
        (1, 0, 0, 0, 5),   # doc1 fully in pack 0 at pos 0
        (2, 0, 0, 6, 2),   # doc2 tokens 0-1 end pack 0
        (2, 0, 1, 0, 3),   # doc2 tokens 2-4 start pack 1
        (3, 0, 1, 4, 4),   # doc3 tokens 0-3 in pack 1
        (3, 0, 2, 0, 1),   # doc3 last token starts pack 2
    ]


def test_pack_sequences_shards_are_independent(spark):
    """Same docs, ids offset into another shard → identical local layout;
    token totals are preserved exactly."""
    from csvw_rdf_convertor_spark.ops.chunk import pack_sequences
    docs = _docs(spark, [(i, "a b c") for i in range(4)]
                 + [(100 + i, "a b c") for i in range(4)])
    out = pack_sequences(docs, context_len=4, shard_size=10, sep_tokens=0)
    rows = out.collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(
            (r.doc_id % 100, r.pack_id, r.pack_pos, r.n_tokens_in_pack))
    assert sorted(by_shard[0]) == sorted(by_shard[10])
    total = sum(r.n_tokens_in_pack for r in rows)
    assert total == 8 * 3  # every token lands in exactly one pack


def test_cdc_shift_resilience(spark):
    """THE content-defined-chunking property: prepending text to a
    document leaves most downstream chunk digests unchanged (fixed-size
    windows would shift every chunk). Also: chunks concatenate back to
    the original text (conservation)."""
    import hashlib
    from csvw_rdf_convertor_spark.ops.chunk import cdc_chunks
    base = " ".join(f"tok{i * 37 % 101}" for i in range(160))  # ~1.1k chars
    docs = _docs(spark, [(1, base), (2, "INSERTED PREFIX " + base)])
    out = cdc_chunks(docs, k=8, boundary_bits=5, min_size=8)
    rows = out.collect()
    a = [r.chunk_md5 for r in sorted(
        (r for r in rows if r.doc_id == 1), key=lambda r: r.chunk_idx)]
    b = [r.chunk_md5 for r in sorted(
        (r for r in rows if r.doc_id == 2), key=lambda r: r.chunk_idx)]
    shared = set(a) & set(b)
    # min-size coupling delays re-sync after a cut-chain divergence, so
    # not every chunk realigns — but a solid majority must (a fixed-size
    # chunker shares ~zero: every window shifts by the prefix length)
    assert len(shared) >= max(len(a) // 2, 5), (len(a), len(b), len(shared))
    assert a[-1] == b[-1]  # tails realign
    # conservation: n_chars sums to the document length
    n1 = sum(r.n_chars for r in rows if r.doc_id == 1)
    assert n1 == len(base)
    # chunk digests are digests OF THE TEXT (spot-check the first chunk
    # by recomputing the boundary-free short doc)
    short = _docs(spark, [(9, "tiny")])
    r9 = cdc_chunks(short, k=8, boundary_bits=5, min_size=8).collect()
    assert len(r9) == 1 and r9[0].chunk_md5 == hashlib.md5(b"tiny").hexdigest()


def test_cdc_min_size_respected(spark):
    from csvw_rdf_convertor_spark.ops.chunk import cdc_chunks
    base = " ".join(f"w{i}" for i in range(300))
    docs = _docs(spark, [(1, base)])
    rows = cdc_chunks(docs, k=4, boundary_bits=3, min_size=20).collect()
    # every chunk except possibly the tail respects the minimum
    sizes = [r.n_chars for r in sorted(rows, key=lambda r: r.chunk_idx)]
    assert all(s >= 20 for s in sizes[:-1]) and len(sizes) > 3


def test_decontam_counts(spark):
    train = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog")])
    ev = _docs(spark, [
        # shares exactly one trigram window set: "quick brown fox"
        (10, "quick brown fox sleeps all day here"),
        (11, "completely different words only nothing shared"),
        (12, "The QUICK Brown fox jumps far away"),  # case-folded hits
        (13, "ab"),                                  # < n tokens -> no grams
    ])
    out = {r.doc_id: (r.n_grams, r.n_hits, r.contam_ppm)
           for r in ngram_contamination(train, ev, n=3).collect()}
    assert out[10] == (5, 1, 200000)
    assert 11 not in out            # clean docs are not reported
    # "the quick brown", "quick brown fox", "brown fox jumps"
    assert out[12][1] == 3
    assert 13 not in out


def test_decontam_hash_families_agree(spark):
    train = _docs(spark, [(i, f"alpha beta gamma delta epsilon v{i}")
                          for i in range(6)])
    ev = _docs(spark, [(100, "alpha beta gamma delta epsilon v3"),
                       (101, "zeta eta theta iota kappa here")])
    a = sorted(map(tuple, ngram_contamination(
        train, ev, n=4, hash_family="xxhash64").collect()))
    b = sorted(map(tuple, ngram_contamination(
        train, ev, n=4, hash_family="md5").collect()))
    assert a == b and len(a) == 1


def test_gopher_filter_rules_and_order(spark):
    from csvw_rdf_convertor_spark.ops.text import gopher_filter
    good = ("the cat sat on a mat and it was that kind of day for "
            "everyone in town while many other people walked past the "
            "old market buying bread cheese fruit and wine before noon "
            "because that is what a quiet town does on market day")
    docs = _docs(spark, [
        (1, good),                                   # kept
        (2, "too short"),                            # n_tokens
        (3, "the of " + "a " * 40),                  # word_len (mean < 3)
        (4, ("the!!! of??? and... " + "it#$% is&*( that)(* " * 8)),  # punct
        (5, "the of 99 111 222 333 444 555 666 777 888 999 000 111 "
            "222 333 444 555 666 777"),              # digit
        (6, " ".join(f"zz{chr(97 + i)} yy{chr(97 + i)} xx{chr(97 + i)}"
                     for i in range(10))),           # stopwords
        (7, "the big cat and the big cat and " * 10),  # repetition
    ])
    got = {r.doc_id: r.reject_reason for r in gopher_filter(docs).collect()}
    assert got[1] is None
    assert got[2] == "n_tokens"
    assert got[3] == "word_len"
    assert got[4] == "punct"
    assert got[5] == "digit"
    assert got[6] == "stopwords"
    assert got[7] == "repetition"


def test_tfidf_ranks_rare_terms_first(spark):
    docs = _docs(spark, [
        (1, "common rare1 common"),
        (2, "common rare2"),
        (3, "common"),
    ])
    out = tf_idf_top_terms(docs, 1)
    top = {r.doc_id: (r.term, r.tf, r.df, r.score_ppm)
           for r in out.collect()}
    # rare terms (df=1) beat 'common' (df=3) even at higher tf
    assert top[1] == ("rare1", 1, 1, 1_000_000)
    assert top[2] == ("rare2", 1, 1, 1_000_000)
    assert top[3] == ("common", 1, 3, 333_333)


def test_near_dup_clusters_transitive(spark):
    """a~b and b~c (but never a~c) must land in ONE cluster."""
    pairs = spark.createDataFrame([(1, 2), (2, 3), (8, 9)],
                                  "id_a long, id_b long")
    out = {r.node: r.cluster_rep
           for r in dedup.near_dup_clusters(pairs).collect()}
    assert out == {"1": "1", "2": "1", "3": "1", "8": "8", "9": "8"}
