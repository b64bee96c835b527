"""Training-data operator tests: text analysis, dedup families, similarity
search, multimodal plumbing — over the driver testdata where possible."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count(spark):
    df = spark.createDataFrame([("a b  c",), ("",), ("  x ",)], "t string")
    out = [r.n for r in df.select(text.token_count(F.col("t")).alias("n")).collect()]
    assert out == [3, 0, 1]


def test_quality_and_langid(spark):
    df = spark.createDataFrame(
        [("The cat sat on the mat and it is happy.",),
         ("der hund und die katze das ist gut",),
         ("@@@@ 1234 %%%%",)], "t string")
    rows = df.select(text.quality_score(F.col("t")).alias("q"),
                     text.lang_id(F.col("t")).alias("l")).collect()
    assert rows[0].l == "en" and rows[0].q > 0.5
    assert rows[1].l == "de"
    assert rows[2].l == "und" and rows[2].q < rows[0].q


def test_fingerprint_deterministic(spark, docs):
    a = docs.select(text.fingerprint(F.col("text")).alias("fp")).collect()
    b = docs.select(text.fingerprint(F.col("text")).alias("fp")).collect()
    assert [r.fp for r in a] == [r.fp for r in b]
    assert len({r.fp for r in a}) > 1


def test_document_profile_runs_on_testdata(docs):
    prof = text.document_profile(docs)
    row = prof.first()
    assert row.n_tokens > 0 and 0 <= row.quality <= 1


def test_repetition_features(spark):
    df = spark.createDataFrame(
        [(0, "a b a b c"),       # 5 toks/3 distinct; 2grams {ab,ba,ab,bc}
         (1, "hello"),           # single token: no n-grams
         (2, "x x x x")],        # total repetition
        "doc_id long, t string")
    staged = df.select("doc_id", text.tokens_ws(F.col("t")).alias("toks"))
    r = text.repetition_features(F.col("toks"))
    rows = {row.doc_id: row for row in staged.select(
        "doc_id",
        r["dup_token_frac"].alias("tf"),
        r["dup_token_char_frac"].alias("cf"),
        r["dup_2gram_frac"].alias("g2"),
        r["dup_3gram_frac"].alias("g3")).collect()}
    assert rows[0].tf == pytest.approx(2 / 5)
    assert rows[0].cf == pytest.approx(2 / 5)   # chars ababc=5, distinct abc=3
    assert rows[0].g2 == pytest.approx(1 / 4)   # 'a b' twice
    assert rows[0].g3 == pytest.approx(0.0)     # aba/bab/abc all distinct
    assert rows[1].tf == rows[1].g2 == rows[1].g3 == 0.0
    assert rows[2].tf == pytest.approx(3 / 4) and rows[2].g2 == pytest.approx(2 / 3)


def test_scrub_pii_order_and_counts(spark):
    df = spark.createDataFrame(
        [(0, "mail a@b.co or https://x.io/u?e=c@d.org now"),
         (1, "server 10.0.0.1 and 192.168.1.255 up"),
         (2, "no pii here, just text and punctuation!")],
        "doc_id long, t string")
    c = text.pii_counts(F.col("t"))
    rows = {r.doc_id: r for r in df.select(
        "doc_id", c["n_url"].alias("u"), c["n_email"].alias("e"),
        c["n_ipv4"].alias("i"),
        text.scrub_pii(F.col("t")).alias("s")).collect()}
    # the email inside the URL belongs to the URL (sequential contract)
    assert (rows[0].u, rows[0].e) == (1, 1)
    assert rows[0].s == "mail <EMAIL> or <URL> now"
    assert rows[1].i == 2 and rows[1].s == "server <IP> and <IP> up"
    assert (rows[2].u, rows[2].e, rows[2].i) == (0, 0, 0)
    assert rows[2].s == "no pii here, just text and punctuation!"


def test_term_counts_and_top_terms(spark):
    df = spark.createDataFrame(
        [(0, "b a a"), (1, "  c b "), (2, "")], "doc_id long, t string")
    counts = {r.term: r.n for r in text.term_counts(df, "t").collect()}
    assert counts == {"a": 2, "b": 2, "c": 1}  # empty-doc token dropped
    top = [(r.term, r.n) for r in text.top_terms(df, 2, "t").collect()]
    assert top == [("a", 2), ("b", 2)]  # tie broken by term ASC


def test_repetition_line_features(spark):
    df = spark.createDataFrame([(0, "x\n x \ny\n\n"), (1, "")],
                               "doc_id long, t string")
    staged = df.select(
        "doc_id",
        text.tokens_ws(F.col("t")).alias("toks"),
        text.split_lines(F.col("t")).alias("lines"))
    r = text.repetition_features(F.col("toks"), F.col("lines"))
    rows = {row.doc_id: row for row in staged.select(
        "doc_id",
        r["dup_line_frac"].alias("lf"),
        r["dup_line_char_frac"].alias("lcf"),
        r["dup_token_frac"].alias("tf")).collect()}
    assert rows[0].lf == pytest.approx(1 / 3)   # lines x,x,y
    assert rows[0].lcf == pytest.approx(1 / 3)
    assert rows[1].lf == 0.0 and rows[1].tf == 0.0  # empty-text guards


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "unique")],
        "doc_id long, text string")
    dups = dedup.exact_duplicates(df).collect()
    assert len(dups) == 1 and dups[0].n_dups == 2 and dups[0].keep_id == 1
    kept = dedup.drop_exact_duplicates(df)
    assert kept.count() == 2
    assert {r.doc_id for r in kept.collect()} == {1, 3}


def test_normalized_dedup(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "world hello"), (3, "different text")],
        "doc_id long, text string")
    dups = dedup.normalized_duplicates(df).collect()
    assert len(dups) == 1 and dups[0].n_dups == 2


def test_minhash_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different content about spark partitions and shuffles ok"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], "doc_id long, text string")
    pairs = dedup.minhash_near_duplicates(df, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in found            # identical
    assert (1, 2) in found or (2, 4) in found  # near-dup
    assert not any(3 in p for p in found)


def test_simhash_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha  BETA gamma"), (3, "zzz yyy xxx")],
        "doc_id long, text string")
    dups = dedup.simhash_duplicates(df).collect()
    assert len(dups) == 1 and dups[0].n_dups == 2


def test_cosine_and_brute_force_topk(spark, emb):
    v = emb.select("vec_id", "embedding")
    queries = v.limit(3).withColumnRenamed("vec_id", "query_id")
    out = similarity.brute_force_topk(v, queries, k=5).cache()
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        best = sorted(rs, key=lambda r: r.rank)[0]
        assert best.vec_id == qid and best.cos == pytest.approx(1.0, abs=1e-4)


def test_lsh_topk_recall(spark, emb):
    v = emb.select("vec_id", "embedding")
    queries = v.limit(5).withColumnRenamed("vec_id", "query_id")
    exact = similarity.brute_force_topk(v, queries, k=3)
    approx = similarity.lsh_topk(v, queries, k=3, n_planes=6, dim=64)
    # self-match must always survive LSH (same bucket by construction)
    self_hits = approx.where(F.col("vec_id") == F.col("query_id")).count()
    assert self_hits == 5
    # recall@3 sanity: at least a third of exact hits found
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    assert len(e & a) >= len(e) // 3


def test_embedding_near_duplicates(spark, emb):
    pairs = dedup.embedding_near_duplicates(
        emb.limit(200), block_col="label", threshold=0.99)
    for r in pairs.take(5):
        assert r.cos >= 0.99


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, 32)
    feats = multimodal.extract_features(media, deterministic_fake=True).cache()
    assert feats.count() == 32
    row = feats.first()
    assert len(row.feature) == multimodal.FEATURE_DIM
    assert row.n_bytes > 0
    # stub contract: real decode raises
    with pytest.raises(Exception):
        multimodal.extract_features(media).collect()
    # frame sampling plan
    frames = multimodal.frame_sample_plan(media, every_ms=10000)
    assert frames.count() > 0


def test_ivf_topk_matches_bruteforce_when_probing_all_cells(spark, emb):
    """With n_probe == n_cells IVF degenerates to exact search — results
    must equal brute force. With fewer probes it stays a subset per query."""
    corpus = emb.limit(200).cache()
    queries = (corpus.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = {(r.query_id, r.rank): r.vec_id
             for r in similarity.brute_force_topk(corpus, queries, k=5).collect()}
    full = {(r.query_id, r.rank): r.vec_id
            for r in similarity.ivf_topk(corpus, queries, k=5,
                                         n_cells=8, n_probe=8).collect()}
    assert full == exact
    approx = similarity.ivf_topk(corpus, queries, k=5, n_cells=8, n_probe=2)
    got = {(r.query_id, r.vec_id) for r in approx.collect()}
    # approximate results are genuine corpus hits with sane ranks
    assert got and all(q < 5 for q, _ in got)


def test_ivf_assign_deterministic_centroids(spark, emb):
    c1 = [r.cent_id for r in similarity.ivf_assign(emb.limit(100), 4)[0].collect()]
    c2 = [r.cent_id for r in similarity.ivf_assign(emb.limit(100), 4)[0].collect()]
    assert c1 == c2 and len(c1) == 4


def test_embedding_near_dup_unblocked_guard(spark, monkeypatch):
    """The unblocked all-pairs branch must REFUSE large inputs (VERDICT r4
    watch-list → task 7): same two-sided bound as plans/rdf2csvw's
    cartesian guard."""
    import pytest

    from csvw_rdf_convertor_spark.ops import dedup
    from csvw_rdf_convertor_spark.plans import rdf2csvw

    emb = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    monkeypatch.setattr(rdf2csvw, "CARTESIAN_GUARD_ROWS", 10)
    with pytest.raises(ValueError, match="block_col"):
        dedup.embedding_near_duplicates(emb)
    # a blocked call is never guarded, whatever the size
    blocked = emb.withColumn("b", F.col("vec_id") % 5)
    dedup.embedding_near_duplicates(blocked, block_col="b").collect()
