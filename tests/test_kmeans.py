"""ops/kmeans.py: quantized Lloyd's — exactness and invariance properties
the sf0.01 oracle gate can't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.ops.kmeans import (_trunc_div, kmeans_quantized,
                                                 quantize_vec)


def test_trunc_div_matches_sql_semantics():
    # Spark `div` and DuckDB `//` both truncate toward zero
    assert _trunc_div(7, 2) == 3
    assert _trunc_div(-7, 2) == -3
    assert _trunc_div(0, 5) == 0


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_separates_obvious_clusters(spark):
    left = [(i, [-1.0 + 0.001 * i, 0.0]) for i in range(6)]
    right = [(10 + i, [1.0 + 0.001 * i, 0.0]) for i in range(6)]
    out = kmeans_quantized(_emb(spark, left + right), k=2, n_iter=3)
    rows = out.collect()
    by_side = {}
    for r in rows:
        by_side.setdefault(r.vec_id < 10, set()).add(r.cluster)
    # each side is pure, and the two sides land in different clusters
    assert len(by_side[True]) == 1 and len(by_side[False]) == 1
    assert by_side[True] != by_side[False]


def test_kmeans_stable_under_repartition(spark):
    rows = [(i, [float((i * 7) % 5) - 2.0, float((i * 3) % 4)])
            for i in range(40)]
    a = sorted(map(tuple, kmeans_quantized(
        _emb(spark, rows), k=3, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_quantized(
        _emb(spark, rows).repartition(7), k=3, n_iter=2).collect()))
    assert a == b  # integer arithmetic: no summation-order sensitivity


def test_kmeans_refuses_k_above_n(spark):
    with pytest.raises(ValueError):
        kmeans_quantized(_emb(spark, [(1, [0.0, 0.0])]), k=2, n_iter=1)


def test_group_quantiles_integer_rank_exactness(spark):
    """n=10, p90 must pick rank 9 (ceil(0.9*10)=9) — float 0.9*10 rounds to
    9.000000000000002 and would pick rank 10."""
    from csvw_rdf_convertor_spark.ops.text import group_quantiles
    df = spark.createDataFrame([("g", i, i * 100) for i in range(1, 11)],
                               "grp string, id long, v long")
    got = {r.q: r.v for r in group_quantiles(df, "v", "grp", "id").collect()}
    assert got == {"p50": 500, "p90": 900, "p99": 1000}


def test_quantize_vec_rounds_half_away_from_zero(spark):
    df = spark.createDataFrame([([0.0000005, -0.0000005, 0.25],)],
                               "embedding array<float>")
    got = df.select(quantize_vec(F.col("embedding"), 1_000_000)
                    .alias("q")).first().q
    # float32 0.0000005 is not exactly .5 after widening, but 0.25*1e6 is
    # exact; the signs stay symmetric
    assert got[2] == 250000
    assert got[0] == -got[1]
