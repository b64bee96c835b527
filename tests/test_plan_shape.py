"""Plan-shape regression guards: the properties .explain() must keep showing
(docs/SCALE.md). If one of these fails, a change regressed the physical plan
even if results are still correct."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mapping_plan_is_shuffle_free(spark):
    """The CSVW mapping (no row numbering needed) must stay a pure narrow
    projection: zero Exchange operators."""
    import __spark_entry__ as e
    from csvw_rdf_convertor_spark.kg.pipeline import turn_triples
    tr = e._transcripts_from_events(spark, SF)
    # turn_triples over a frame that already has turn_idx: only the
    # row_number window of the events derivation may shuffle — the mapping
    # itself adds nothing on top
    plan = _plan(turn_triples(tr))
    assert plan.count("Exchange") <= 1  # the events->transcripts window only


def test_q1_pushdown_and_pruning(spark):
    import __spark_entry__ as e
    plan = _plan(e.queries()["q1_pricing_summary"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: no l_orderkey/l_partkey in the scan schema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read_schema and "l_orderkey" not in read_schema


def test_q3_broadcasts_dimension(spark):
    import __spark_entry__ as e
    plan = _plan(e.queries()["q3_top_orders"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_anti_join_shape(spark):
    import __spark_entry__ as e
    plan = _plan(e.queries()["j5_fk_anti_join"](spark, SF))
    assert "LeftAnti" in plan


def test_minhash_pairs_join_is_on_band_keys(spark):
    from csvw_rdf_convertor_spark.ops import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.minhash_near_duplicates(docs))
    # the only join key is the uniform (band, band_key) pair
    assert "band_key" in plan and "CartesianProduct" not in plan


def test_ivf_assign_has_no_corpus_exchange(spark):
    """Cell assignment must be a narrow fold over the broadcast centroid
    array — no per-vector window, no Exchange partitioned by vec_id
    (VERDICT r02 fix #5)."""
    from csvw_rdf_convertor_spark.ops import similarity
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    _cents, assigned = similarity.ivf_assign(emb, n_cells=8)
    plan = _plan(assigned)
    assert "Window" not in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "vec_id" not in ln, f"corpus shuffled by vec_id: {ln}"
    # the centroid side reaches the corpus via a broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_bench_mapping_fingerprint_is_narrow(spark):
    """bench.py's headline mapping plans must keep exactly one shuffle (the
    deliberate input-model repartition), stay inside whole-stage codegen,
    and never go cartesian — the fingerprint bench.py also emits per round
    (ROADMAP #10)."""
    import bench
    fps = bench.plan_fingerprints(spark, SF, 4)
    assert fps["regression"] is False, fps
    for name in ("csvw2rdf_lineitem", "ntriples_serialize"):
        assert fps[name]["shuffle_exchanges"] == 1, (name, fps[name])
        assert fps[name]["wholestage_codegen"], (name, fps[name])
        assert not fps[name]["cartesian"], (name, fps[name])


def test_mapping_stage_actually_compiles(spark):
    """The fused mapping stage must COMPILE — a janino 64 KB/method overflow
    makes Spark silently run the whole stage interpreted (measured 5-10×
    slower; the only symptom is a WARN). fallback=false turns that silent
    demotion into a loud failure. Guards the stage-1a2 parse-intermediate
    staging in plans/csvw2rdf.py."""
    import bench
    from csvw_rdf_convertor_spark.functions.ntriples import to_ntriples_lines
    from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
    from csvw_rdf_convertor_spark.spec import parse_descriptor
    li = bench._lineitem_mapping_input(spark, SF, 4)
    df = table_to_triples(li, parse_descriptor(bench.LINEITEM_DESC).tables[0])
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert df.count() > 0
        assert to_ntriples_lines(df).count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_turn_mapping_stage_actually_compiles(spark):
    """Same loud-compile guard for the transcripts turn mapping (the KG
    pipeline's hot path)."""
    from csvw_rdf_convertor_spark.kg.pipeline import turn_triples
    from csvw_rdf_convertor_spark.kg.synth import synth_transcripts
    tr = synth_transcripts(spark, n_convs=10, max_len=10)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert turn_triples(tr).count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")


def test_minhash_band_exchange_carries_ids_only(spark):
    """The 16× band fan-out must not duplicate shingle/signature arrays
    through the shuffle (VERDICT r01 'what's wrong' #3): every Exchange that
    partitions on band keys ships only (id, band, band_key)."""
    from csvw_rdf_convertor_spark.ops import dedup
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.minhash_near_duplicates(docs))
    band_rows = [ln for ln in plan.splitlines()
                 if "band_key#" in ln and ("Project" in ln or "Generate" in ln)]
    assert band_rows, "expected band projections in the plan"
    for ln in band_rows:
        assert "sh#" not in ln and " sig#" not in ln, f"array leaked into band row: {ln}"
    # shingles still flow into the exact-Jaccard verify via the join-back
    assert "array_intersect" in plan


def test_single_valued_pivot_reconstruction_one_exchange(spark):
    """match_patterns(assume_single_valued=True) on a 10-column table is ONE
    conditional aggregation — exactly one shuffle Exchange (on subj), not K
    join shuffles (VERDICT r4 #5)."""
    from pyspark.sql import functions as F

    from csvw_rdf_convertor_spark.plans.rdf2csvw import (TriplePattern,
                                                         match_patterns)
    rows = [(f"urn:s#{i}", f"urn:p#{j}", f"v{i}{j}", "literal")
            for i in range(4) for j in range(10)]
    t = (spark.createDataFrame(
        rows, "subj string, pred string, obj_lex string, obj_kind string")
        .withColumn("obj_dtype", F.lit("")).withColumn("obj_lang", F.lit(""))
        .withColumn("graph", F.lit("")))
    pats = [TriplePattern(f"c{j}", f"urn:p#{j}") for j in range(10)]
    out = match_patterns(t, pats, assume_single_valued=True)
    plan = _plan(out)
    assert plan.count("Exchange") == 1, plan
    # values identical to the join-chain path on single-valued data
    chain = match_patterns(t, pats)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, chain.collect()))
