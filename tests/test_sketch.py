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


def test_mixture_rates_uniform_target(spark):
    """80 en / 10 de / 10 fr toward uniform: de/fr are binding (rate 1.0),
    en is cut to ~10 rows."""
    from csvw_rdf_convertor_spark.ops.sample import mixture_rates
    rows = ([("en",)] * 80) + ([("de",)] * 10) + ([("fr",)] * 10)
    df = spark.createDataFrame(rows, "lang string")
    got = {r.lang: (r.n_rows, r.rate_ppm, r.n_keep)
           for r in mixture_rates(df, "lang").collect()}
    assert got["de"] == (10, 1_000_000, 10)
    assert got["fr"] == (10, 1_000_000, 10)
    n_rows, rate, keep = got["en"]
    assert n_rows == 80 and keep == 10 and rate == 125_000


def test_mixture_rates_explicit_target(spark):
    from csvw_rdf_convertor_spark.ops.sample import mixture_rates
    rows = ([("a",)] * 90) + ([("b",)] * 10)
    df = spark.createDataFrame(rows, "src string")
    # want 50/50: b binds (10/0.5 < 90/0.5) → keep 10 of each
    got = {r.src: r.n_keep for r in mixture_rates(
        df, "src", {"a": 500_000, "b": 500_000}).collect()}
    assert got == {"a": 10, "b": 10}
    with pytest.raises(ValueError):
        mixture_rates(df, "src", {"a": 900_000, "b": 200_000})


def test_bottom_k_k_exceeds_n(spark):
    assert bottom_k_sample(_ids(spark, range(5)), 10, "s").count() == 5
    with pytest.raises(ValueError):
        bottom_k_sample(_ids(spark, range(5)), 0, "s")
