"""Turtle-equivalent prefixed serialization (S5) + namespace candidates (A7)."""

from __future__ import annotations

from csvw_rdf_convertor_spark.sources import turtle
from csvw_rdf_convertor_spark.spec import RDF, XSD

SCHEMA = ("subj string, pred string, obj_lex string, obj_kind string, "
          "obj_dtype string, obj_lang string, graph string")
SKOS = "http://www.w3.org/2004/02/skos/core#"


def _df(spark):
    rows = [
        ("http://ex.org/a/s1", RDF + "type", SKOS + "Concept", "iri", "", "", ""),
        ("http://ex.org/a/s1", SKOS + "prefLabel", "Hi", "literal", "", "en", ""),
        ("http://ex.org/a/s2", SKOS + "notation", "42", "literal",
         XSD + "integer", "", ""),
        ("http://ex.org/a/s2", SKOS + "broader", "http://ex.org/a/s1", "iri", "", "", ""),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_namespace_candidates(spark):
    ns = {r.ns: r.n_uses for r in turtle.namespace_candidates(_df(spark)).collect()}
    assert SKOS in ns and "http://ex.org/a/" in ns


def test_prefix_map_prefers_known_prefixes(spark):
    pm = turtle.build_prefix_map(_df(spark))
    assert pm.get("skos") == SKOS
    assert any(v == "http://ex.org/a/" for v in pm.values())


def test_turtle_lines(spark):
    header, lines = turtle.to_turtle_lines(
        _df(spark), {"skos": SKOS, "ex": "http://ex.org/a/", "xsd": XSD})
    assert "@prefix skos: <http://www.w3.org/2004/02/skos/core#> ." in header
    got = {r.line for r in lines.collect()}
    assert "ex:s1 a skos:Concept ." in got
    assert 'ex:s1 skos:prefLabel "Hi"@en .' in got
    assert 'ex:s2 skos:notation "42"^^xsd:integer .' in got
    assert "ex:s2 skos:broader ex:s1 ." in got
