"""Large-star/small-star connected components: output must equal the
union-find contract (comp = lexicographic min of component) on topologies
that stress it — long chains (the case plain label propagation handles in
O(diameter) rounds), hubs, and hash-random graphs."""

from __future__ import annotations

from csvw_rdf_convertor_spark.kg.cc import (_driver_union_find,
                                            connected_components,
                                            connected_components_star)


def _check(spark, pairs):
    edges = spark.createDataFrame(pairs, "src string, dst string")
    want = dict(_driver_union_find(pairs))
    got = {r.node: r.comp for r in connected_components_star(edges).collect()}
    assert got == want
    return got


def test_star_long_chain(spark):
    # n000-n499 in one chain: diameter 499, must still converge (O(log n))
    pairs = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(499)]
    got = _check(spark, pairs)
    assert set(got.values()) == {"n000"}


def test_star_hub_and_islands(spark):
    pairs = ([("hub", f"x{i:02d}") for i in range(40)]
             + [("a1", "a2"), ("a2", "a3"), ("b9", "b8")])
    got = _check(spark, pairs)
    assert got["x07"] == "hub" and got["a3"] == "a1" and got["b9"] == "b8"


def test_star_random_matches_min_label(spark):
    # deterministic pseudo-random graph; also cross-check the fixpoint impl
    pairs = [(f"v{(i * 7919) % 97:02d}", f"v{(i * 104729) % 97:02d}")
             for i in range(150)
             if (i * 7919) % 97 != (i * 104729) % 97]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    want = dict(_driver_union_find(pairs))
    star = {r.node: r.comp
            for r in connected_components_star(edges).collect()}
    # this sparse tree-like graph has diameter > 20: the fixpoint variant
    # needs a matching iteration budget (one hop per iteration)
    fix = {r.node: r.comp
           for r in connected_components(edges, small_graph_edges=0,
                                         max_iter=100).collect()}
    assert star == want and fix == want


def test_fixpoint_raises_rather_than_undermerging(spark):
    # a 60-node chain cannot converge in 5 hops — silent wrong labels are
    # worse than an error pointing at the star variant
    import pytest as _pytest
    pairs = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(59)]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=5, small_graph_edges=0).collect()
