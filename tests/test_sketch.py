"""ops/sketch.py theta_distinct + ops/sample.bottom_k_sample properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops.sample import bottom_k_sample
from csvw_rdf_convertor_spark.ops.sketch import theta_distinct


def _vals(spark, xs):
    return spark.createDataFrame([(x,) for x in xs], "v string")


def test_theta_b0_is_exact(spark):
    """b=0 keeps everything → the estimate IS the exact distinct count."""
    df = _vals(spark, [f"t{i % 7}" for i in range(50)])
    row = theta_distinct(df, "v", b=0).first()
    assert row.est_distinct == 7 and row.n_sampled == 7


def test_theta_estimate_within_error(spark):
    """1000 distinct values at b=3 (rate 1/8): expect est within ~3 std
    errors (σ ≈ √(1000·1/8)·8 ≈ 90)."""
    df = _vals(spark, [f"value-{i}" for i in range(1000)])
    row = theta_distinct(df, "v", b=3).first()
    assert abs(row.est_distinct - 1000) < 300
    # duplicates must not change the estimate (value-space sampling)
    df3 = df.union(df).union(df)
    assert theta_distinct(df3, "v", b=3).first().est_distinct \
        == row.est_distinct


def test_theta_families_both_run(spark):
    df = _vals(spark, [f"x{i}" for i in range(100)])
    for fam in ("md5", "xxhash64"):
        assert theta_distinct(df, "v", b=2, hash_family=fam).count() == 1
    with pytest.raises(ValueError):
        theta_distinct(df, "v", b=60)


def _ids(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_bottom_k_fixed_size_and_stable(spark):
    df = _ids(spark, range(100))
    a = sorted(r.doc_id for r in bottom_k_sample(df, 10, "s").collect())
    b = sorted(r.doc_id for r in
               bottom_k_sample(df.repartition(7), 10, "s").collect())
    assert a == b and len(a) == 10


def test_bottom_k_is_mergeable(spark):
    """bottom-k(A ∪ B) == bottom-k(bottom-k(A) ∪ bottom-k(B)) — the shard
    merge property that makes the sample distributable."""
    a, b = _ids(spark, range(0, 50)), _ids(spark, range(50, 100))
    direct = sorted(r.doc_id for r in
                    bottom_k_sample(a.union(b), 8, "m").collect())
    merged = sorted(r.doc_id for r in bottom_k_sample(
        bottom_k_sample(a, 8, "m").union(bottom_k_sample(b, 8, "m")),
        8, "m").collect())
    assert direct == merged


def test_bottom_k_k_exceeds_n(spark):
    assert bottom_k_sample(_ids(spark, range(5)), 10, "s").count() == 5
    with pytest.raises(ValueError):
        bottom_k_sample(_ids(spark, range(5)), 0, "s")
