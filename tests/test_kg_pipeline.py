"""Transcripts→KG pipeline tests (north rule): per-turn text equality under
stable (conv_id, turn_idx) ordering, mention detection/linking correctness,
connected-components canonicalization, and kill/resume exactly-once."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.kg import cc, linking, pipeline
from csvw_rdf_convertor_spark.kg import mentions as mentions_mod
from csvw_rdf_convertor_spark.kg.synth import alias_dictionary, synth_transcripts


@pytest.fixture(scope="module")
def transcripts(spark):
    return synth_transcripts(spark, n_convs=40, max_len=60).cache()


def test_synth_deterministic_and_skewed(spark, transcripts):
    again = synth_transcripts(spark, n_convs=40, max_len=60)
    assert transcripts.exceptAll(again).count() == 0
    assert again.exceptAll(transcripts).count() == 0
    per_conv = transcripts.groupBy("conv_id").count().collect()
    sizes = {r.conv_id: r["count"] for r in per_conv}
    assert sizes["conv-0"] == 60          # hot conversation
    assert min(sizes.values()) >= 2


def test_per_turn_text_equality_invariant(spark, transcripts):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering — kg:text triples must reproduce the input
    text exactly, keyed by the turn IRI."""
    triples = pipeline.turn_triples(transcripts)
    texts = (triples.where(F.col("pred") == pipeline.KG + "text")
             .select(
                 F.regexp_extract("subj", r"urn:conv:([^#]+)#turn-(\d+)", 1).alias("conv_id"),
                 F.regexp_extract("subj", r"urn:conv:([^#]+)#turn-(\d+)", 2)
                  .cast("int").alias("turn_idx"),
                 F.col("obj_lex").alias("text_out")))
    joined = transcripts.join(texts, ["conv_id", "turn_idx"], "full")
    mismatches = joined.where(
        F.col("text").isNull() | F.col("text_out").isNull()
        | (F.col("text") != F.col("text_out"))).count()
    assert mismatches == 0


def test_turn_triples_shapes(spark, transcripts):
    triples = pipeline.turn_triples(transcripts).cache()
    n_turns = transcripts.count()
    # every turn: role, text, ts, turnIndex, inConversation, rdf:type Turn
    for pred, expected in [
        (pipeline.KG + "role", n_turns),
        (pipeline.KG + "text", n_turns),
        (pipeline.KG + "ts", n_turns),
        (pipeline.KG + "turnIndex", n_turns),
        (pipeline.KG + "inConversation", n_turns),
    ]:
        assert triples.where(F.col("pred") == pred).count() == expected, pred
    # tool triples only for tool turns (null-suppressed otherwise, P3)
    n_tool = transcripts.where(F.col("tool").isNotNull()).count()
    assert triples.where(F.col("pred") == pipeline.KG + "tool").count() == n_tool
    # conversation typing: one distinct triple per conversation
    n_convs = transcripts.select("conv_id").distinct().count()
    conv_types = (triples.where((F.col("pred").endswith("type"))
                                & (F.col("obj_lex") == pipeline.KG + "Conversation"))
                  .distinct().count())
    assert conv_types == n_convs


def test_mention_detection_finds_planted_aliases(spark, transcripts):
    ments = mentions_mod.detect_mentions(transcripts, alias_dictionary()).cache()
    assert ments.count() >= transcripts.count()  # ≥1 mention planted per turn
    # every mention has ≥1 candidate (all surface forms come from the dict)
    assert ments.where(F.size("candidates") == 0).count() == 0
    # spot-check one row
    row = transcripts.where(F.col("text").contains("Paris")).first()
    if row:
        hit = ments.where((F.col("conv_id") == row.conv_id)
                          & (F.col("turn_idx") == row.turn_idx)
                          & F.col("mention_norm").contains("paris")).count()
        assert hit >= 1


def test_linking_resolves_every_mention(spark, transcripts):
    d = alias_dictionary()
    ments = mentions_mod.detect_mentions(transcripts, d)
    linked = linking.link(ments, linking.alias_table(spark, d)).cache()
    assert linked.count() == ments.count()
    assert linked.where(F.col("entity_id").isNull()).count() == 0
    assert linked.where((F.col("link_score") <= 0) | (F.col("link_score") > 1)).count() == 0


def test_fuzzy_linking_matches_typos(spark):
    d = alias_dictionary()
    unmatched = spark.createDataFrame(
        [("c1", 0, "Jupitre", "jupitre", 0, []),
         ("c1", 1, "zzzzqqq", "zzzzqqq", 0, [])],
        "conv_id string, turn_idx int, mention string, mention_norm string, "
        "match_i int, candidates array<string>")
    out = linking.link_fuzzy(unmatched, linking.alias_table(spark, d), threshold=0.35)
    rows = {r.mention_norm: r.entity_id for r in out.collect()}
    assert any("jupiter" in v for v in rows.get("jupitre", "x").split()) or \
        "jupiter" in rows.get("jupitre", "")
    assert "zzzzqqq" not in rows  # garbage stays unlinked


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p2"), ("p2", "p3"), ("p3", "p4")],
        "src string, dst string")
    labels = cc.connected_components(edges)
    comp = {r.node: r.comp for r in labels.collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["p"] == comp["p2"] == comp["p3"] == comp["p4"] == "p"


def test_run_and_resume_exactly_once(spark, transcripts, tmp_path):
    out = str(tmp_path / "kg")
    m1 = pipeline.run(transcripts, out, n_buckets=4)
    assert m1.buckets_done == 4 and m1.buckets_skipped == 0
    assert m1.turns == transcripts.count()
    assert m1.triples > m1.turns * 5
    total_before = spark.read.parquet(f"{out}/triples").count()

    # rerun: everything is checkpointed → no new triples, all buckets skipped
    m2 = pipeline.run(transcripts, out, n_buckets=4)
    assert m2.buckets_done == 0 and m2.buckets_skipped == 4
    assert spark.read.parquet(f"{out}/triples").count() == total_before

    # simulate a killed run: drop one bucket's manifest rows → only that
    # bucket is recomputed
    man = spark.read.parquet(f"{out}/manifest")
    keep = man.where(F.col("bucket") != 0)
    keep.write.mode("overwrite").parquet(f"{out}/manifest2")
    spark.read.parquet(f"{out}/manifest2").write.mode("overwrite") \
        .parquet(f"{out}/manifest")
    m3 = pipeline.run(transcripts, out, n_buckets=4)
    assert m3.buckets_done == 1 and m3.buckets_skipped == 3


def test_nt_sink_is_exactly_once_on_rerun(spark, tmp_path):
    """The optional N-Triples sink must follow the same dynamic-partition-
    overwrite contract as the parquet sink: re-running a bucket replaces its
    NT lines instead of appending duplicates."""
    from csvw_rdf_convertor_spark.kg import pipeline
    from csvw_rdf_convertor_spark.kg.synth import synth_transcripts
    out = str(tmp_path / "kg")
    tr = synth_transcripts(spark, n_convs=10, max_len=10)
    pipeline.run(tr, out, n_buckets=2, write_nt=True)
    first = sorted(r.value for r in spark.read.text(f"{out}/ntriples").collect())
    # force a rerun of everything (fresh manifest → all buckets redone)
    import shutil
    shutil.rmtree(f"{out}/manifest")
    pipeline.run(tr, out, n_buckets=2, write_nt=True)
    second = sorted(r.value for r in spark.read.text(f"{out}/ntriples").collect())
    assert first == second  # no duplicated lines, byte-identical sink


def test_cc_fast_path_equals_distributed(spark):
    """Driver union-find (small-graph fast path) must produce exactly the
    distributed min-label fixpoint's labels."""
    import random
    rng = random.Random(7)
    edges_py = [(f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
                for _ in range(120)]
    edges = spark.createDataFrame(edges_py, "src string, dst string")
    fast = {(r.node, r.comp)
            for r in cc.connected_components(edges).collect()}
    slow = {(r.node, r.comp)
            for r in cc.connected_components(
                edges, small_graph_edges=0).collect()}
    assert fast == slow and len(fast) > 0
