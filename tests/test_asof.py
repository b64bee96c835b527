"""As-of join (ops/asof.py): inclusive/strict semantics, per-key isolation,
no-match nulls, and the one-shuffle plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 10, "p1"), ("u1", 20, "p2"), ("u1", 5, "p0"),
         ("u2", 15, "p3"), ("u3", 99, "p4")],
        "k string, t long, pid string")
    right = spark.createDataFrame(
        [("u1", 8, "c1", 1.0), ("u1", 10, "c2", 2.0), ("u1", 19, "c3", 3.0),
         ("u2", 30, "c4", 4.0)],
        "k string, t long, cid string, v double")
    return left, right


def test_asof_inclusive(spark):
    left, right = _frames(spark)
    out = {r.pid: (r.asof_cid, r.asof_t) for r in asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["cid", "v"]).collect()}
    assert out["p0"] == (None, None)          # before any click
    assert out["p1"] == ("c2", 10)            # equal timestamp matches
    assert out["p2"] == ("c3", 19)            # latest prior
    assert out["p3"] == (None, None)          # u2's only click is later
    assert out["p4"] == (None, None)          # key with no right rows


def test_asof_strict(spark):
    left, right = _frames(spark)
    out = {r.pid: r.asof_cid for r in asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_cols=["cid"], strict=True).collect()}
    assert out["p1"] == "c1"                  # equal timestamp excluded
    assert out["p2"] == "c3"


def test_asof_preserves_left_rows_and_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["cid"])
    assert out.count() == left.count()
    assert out.columns == ["k", "t", "pid", "asof_t", "asof_cid"]


def test_asof_single_shuffle(spark):
    """The union+running-last composition must cost exactly one Exchange —
    the same lower bound as a plain equi-join (no range explosion)."""
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", left_time="t", right_time="t",
                    right_cols=["cid"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
