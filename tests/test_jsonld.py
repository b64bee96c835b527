"""JSON-LD-subset reader (sources/jsonld.py) — reference parse.ts:23-41
routes .jsonld inputs through jsonld.js; this is the no-new-libs subset."""

import json

import pytest

from csvw_rdf_convertor_spark.sources.jsonld import (jsonld_to_triples,
                                                     read_jsonld)
from csvw_rdf_convertor_spark.spec import RDF, XSD

SKOS = "http://www.w3.org/2004/02/skos/core#"

# shaped like the reference's NKOD číselník fixtures (compact form, remote
# context + inline term definitions incl. @reverse)
REMOTE_CTX = {
    "@context": {
        "iri": "@id",
        "typ": "@type",
        "Číselník": SKOS + "ConceptScheme",
        "Položka": SKOS + "Concept",
        "kód": "http://ex.org/ns#code",
        "název": {"@id": SKOS + "prefLabel", "@container": "@language"},
    }
}

DOC = {
    "@context": [
        "https://ofn.example.org/kontexty/číselník.jsonld",
        {
            "skos": SKOS,
            "Kolekce": {"@id": "skos:Collection"},
            "kolekce": {"@reverse": "skos:member"},
        },
    ],
    "iri": "http://ex.org/scheme",
    "typ": "Číselník",
    "název": {"cs": "Organizační struktura", "en": "Org structure"},
    "položky": [
        {
            "typ": "Položka",
            "iri": "http://ex.org/item/116",
            "kód": "116",
            "kolekce": {"typ": "Kolekce", "iri": "http://ex.org/col/fakulty"},
            "skos:broader": {"iri": "http://ex.org/item/1"},
        }
    ],
}


def _resolver(url):
    assert url == "https://ofn.example.org/kontexty/číselník.jsonld"
    return json.dumps(REMOTE_CTX)


def test_nkod_style_document():
    triples = jsonld_to_triples(DOC, resolver=_resolver)
    t = {(s, p, o, k, d, lg) for s, p, o, k, d, lg, _g in triples}
    assert ("http://ex.org/scheme", RDF + "type", SKOS + "ConceptScheme",
            "iri", "", "") in t
    # language map container
    assert ("http://ex.org/scheme", SKOS + "prefLabel",
            "Organizační struktura", "literal", "", "cs") in t
    assert ("http://ex.org/scheme", SKOS + "prefLabel",
            "Org structure", "literal", "", "en") in t
    # nested node object -> its own node + edge
    assert ("http://ex.org/item/116", RDF + "type", SKOS + "Concept",
            "iri", "", "") in t
    assert ("http://ex.org/item/116", "http://ex.org/ns#code", "116",
            "literal", "", "") in t
    # @reverse term: kolekce inverts skos:member
    assert ("http://ex.org/col/fakulty", SKOS + "member",
            "http://ex.org/item/116", "iri", "", "") in t
    # prefixed property on a nested node
    assert ("http://ex.org/item/116", SKOS + "broader", "http://ex.org/item/1",
            "iri", "", "") in t
    # NOTE: 'položky' has no term definition -> with no @vocab it stays as-is
    assert any(p == "položky" for _s, p, *_ in t)


def test_remote_context_without_resolver_raises():
    with pytest.raises(NotImplementedError):
        jsonld_to_triples(DOC)


def test_typed_and_scalar_literals_and_vocab():
    doc = {
        "@context": {"@vocab": "http://v/", "@base": "http://b/",
                     "age": {"@id": "http://v/age",
                             "@type": XSD + "integer"},
                     "link": {"@id": "http://v/link", "@type": "@id"}},
        "@id": "n1",
        "flag": True, "n": 3, "x": 1.5, "age": "42", "link": "n2",
        "skip": None,
    }
    t = {(s, p, o, k, d) for s, p, o, k, d, _l, _g in jsonld_to_triples(doc)}
    assert ("http://b/n1", "http://v/flag", "true", "literal",
            XSD + "boolean") in t
    assert ("http://b/n1", "http://v/n", "3", "literal", XSD + "integer") in t
    assert ("http://b/n1", "http://v/x", "1.5E0", "literal",
            XSD + "double") in t
    assert ("http://b/n1", "http://v/age", "42", "literal",
            XSD + "integer") in t
    assert ("http://b/n1", "http://v/link", "http://b/n2", "iri", "") in t
    assert not any(p == "http://v/skip" for _s, p, *_ in t)


def test_bnodes_deterministic_and_graph():
    doc = {"@context": {"@vocab": "http://v/"},
           "@id": "http://g1", "@graph": [
               {"p": {"q": "leaf"}},
               {"@id": "http://s2", "p": "v"}]}
    a = jsonld_to_triples(doc)
    b = jsonld_to_triples(doc)
    assert a == b  # deterministic skolem bnode ids (T9)
    assert all(g == "http://g1" for *_x, g in a)
    bnode_edges = [r for r in a if r[3] == "bnode"]
    assert bnode_edges and all(r[2].startswith("urn:") or r[2] for r in bnode_edges)


def test_unsupported_list_raises():
    with pytest.raises(ValueError):
        jsonld_to_triples({"@id": "http://s", "@list": []})


def test_read_jsonld_dataframe(spark, tmp_path):
    p = tmp_path / "fix.jsonld"
    p.write_text(json.dumps({
        "@context": {"@vocab": "http://v/"},
        "@id": "http://s", "name": "x"}), "utf-8")
    df = read_jsonld(spark, str(p))
    assert df.columns == ["subj", "pred", "obj_lex", "obj_kind",
                          "obj_dtype", "obj_lang", "graph"]
    rows = df.collect()
    assert len(rows) == 1 and rows[0].pred == "http://v/name"
