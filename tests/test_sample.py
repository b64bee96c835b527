"""Deterministic sampling / split assignment (ops/sample.py).

The contract under test: the decision is a pure function of (salt, id) —
stable under repartitioning and re-execution, disjoint+exhaustive splits,
per-stratum rates honored, zero Exchange in the plan, and the two hash
families agree on proportions (not on individual assignments)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops import sample

N = 4000


def _docs(spark, n=N):
    return (spark.range(n).withColumnRenamed("id", "doc_id")
            .withColumn("lang", F.element_at(
                F.array(F.lit("en"), F.lit("en"), F.lit("en"),
                        F.lit("de"), F.lit("fr")),
                (F.col("doc_id") % 5 + 1).cast("int"))))


SPLITS = (("train", 0.8), ("val", 0.1), ("test", 0.1))


def test_thresholds_exact_and_validated():
    ths = sample.split_thresholds(SPLITS)
    assert [n for n, _ in ths] == ["train", "val", "test"]
    assert ths[-1][1] == sample.U60          # exhaustive by construction
    assert ths[0][1] < ths[1][1] < ths[2][1]
    with pytest.raises(ValueError, match="sum to 1"):
        sample.split_thresholds((("a", 0.5), ("b", 0.4)))
    with pytest.raises(ValueError, match="positive"):
        sample.split_thresholds((("a", 1.2), ("b", -0.2)))
    with pytest.raises(ValueError, match="duplicate"):
        sample.split_thresholds((("a", 0.5), ("a", 0.5)))


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_hash_split_partitions_and_proportions(spark, family):
    out = sample.hash_split(_docs(spark), "doc_id", SPLITS, family=family)
    counts = dict(out.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == N        # exhaustive, one split per row
    assert abs(counts["train"] / N - 0.8) < 0.04
    assert abs(counts["val"] / N - 0.1) < 0.03
    assert abs(counts["test"] / N - 0.1) < 0.03


def test_hash_split_stable_under_repartition(spark):
    base = sample.hash_split(_docs(spark), "doc_id", SPLITS)
    shuffled = sample.hash_split(_docs(spark).repartition(13, "lang"),
                                 "doc_id", SPLITS)
    a = {r["doc_id"]: r["split"] for r in base.collect()}
    b = {r["doc_id"]: r["split"] for r in shuffled.collect()}
    assert a == b


def test_hash_split_salt_changes_assignment(spark):
    a = sample.hash_split(_docs(spark), "doc_id", SPLITS, salt="s1")
    b = sample.hash_split(_docs(spark), "doc_id", SPLITS, salt="s2")
    j = (a.alias("a").join(b.alias("b"), "doc_id")
         .where(F.col("a.split") != F.col("b.split")).count())
    assert j > 0                            # salt actually re-keys the draw


def test_hash_split_plan_is_narrow(spark):
    out = sample.hash_split(_docs(spark), "doc_id", SPLITS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_stratified_rates_honored(spark, family):
    kept = sample.stratified_sample(_docs(spark), "doc_id", "lang",
                                    {"en": 0.25}, family=family)
    counts = dict(kept.groupBy("lang").count().collect())
    # tail strata untouched (default_rate=1.0), dominant one downsampled
    assert counts["de"] == N // 5 and counts["fr"] == N // 5
    assert abs(counts["en"] / (3 * N / 5) - 0.25) < 0.05


def test_stratified_rate_edges(spark):
    none = sample.stratified_sample(_docs(spark), "doc_id", "lang",
                                    {"en": 0.0})
    assert none.where(F.col("lang") == "en").count() == 0
    all_ = sample.stratified_sample(_docs(spark), "doc_id", "lang", {},
                                    default_rate=1.0)
    assert all_.count() == N
    with pytest.raises(ValueError, match=r"in \[0, 1\]"):
        sample.stratified_sample(_docs(spark), "doc_id", "lang", {"en": 1.5})


def test_stratified_deterministic_subset_of_corpus(spark):
    """Re-running the same stratified filter yields the identical id set
    (the resume property: a partially-written sample can be reproduced)."""
    ids1 = {r["doc_id"] for r in sample.stratified_sample(
        _docs(spark), "doc_id", "lang", {"en": 0.3}).select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in sample.stratified_sample(
        _docs(spark).repartition(7), "doc_id", "lang",
        {"en": 0.3}).select("doc_id").collect()}
    assert ids1 == ids2


def test_md5_family_matches_duckdb_replay(spark):
    """The sql_* twins replay the md5-family decision bit-for-bit."""
    import duckdb
    pdf = _docs(spark, 500).toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    spark_out = sorted(
        (r["doc_id"], r["split"])
        for r in sample.hash_split(_docs(spark, 500), "doc_id", SPLITS,
                                   family="md5").collect())
    case = sample.sql_split_case("doc_id", "split", SPLITS)
    duck_out = sorted(map(tuple, con.execute(
        f"SELECT doc_id, {case} AS split FROM documents").fetchall()))
    assert spark_out == duck_out
    where = sample.sql_stratified_where("doc_id", "lang", "strat",
                                        {"en": 0.3}, 1.0)
    duck_ids = {r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE {where}").fetchall()}
    spark_ids = {r["doc_id"] for r in sample.stratified_sample(
        _docs(spark, 500), "doc_id", "lang", {"en": 0.3},
        family="md5").select("doc_id").collect()}
    assert spark_ids == duck_ids
