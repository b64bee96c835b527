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


def _follow_list(triples, head):
    """Walk an rdf:first/rest chain → [(lex, kind, dtype, lang)]."""
    from csvw_rdf_convertor_spark.spec import RDF
    by_subj = {}
    for s, p, o, k, d, lg, _g in triples:
        by_subj.setdefault(s, {})[p] = (o, k, d, lg)
    items = []
    while head != RDF + "nil":
        node = by_subj[head]
        items.append(node[RDF + "first"])
        head = node[RDF + "rest"][0]
    return items


def test_list_value_chain_isomorphic_to_turtle():
    """VERDICT r3 #6: @list parses to first/rest chains isomorphic to the
    Turtle parse of the same graph (chain-walk comparison — bnode ids are
    skolems from different seeds, so compare structure, not ids)."""
    from csvw_rdf_convertor_spark.sources.turtle_parse import parse_turtle
    doc = {"@context": {"@vocab": "http://v/"},
           "@id": "http://s",
           "items": {"@list": [1, "x", {"@id": "http://o"}]}}
    jt = jsonld_to_triples(doc)
    tt = parse_turtle(
        '@prefix v: <http://v/> . @prefix xsd: '
        '<http://www.w3.org/2001/XMLSchema#> .\n'
        '<http://s> v:items (1 "x" <http://o>) .')

    def head_of(triples):
        e = next(r for r in triples
                 if r[0] == "http://s" and r[1] == "http://v/items")
        assert e[3] == "bnode"
        return e[2]

    assert _follow_list(jt, head_of(jt)) == _follow_list(tt, head_of(tt))
    assert jsonld_to_triples(doc) == jt  # deterministic skolems (T9)


def test_list_container_term_and_empty_list():
    from csvw_rdf_convertor_spark.spec import RDF
    doc = {"@context": {"@vocab": "http://v/",
                        "seq": {"@id": "http://v/seq", "@container": "@list"}},
           "@id": "http://s", "seq": ["a", "b"], "none": {"@list": []}}
    t = jsonld_to_triples(doc)
    assert ("http://s", "http://v/none", RDF + "nil", "iri", "", "", "") in t
    head = next(r[2] for r in t if r[1] == "http://v/seq")
    assert [i[0] for i in _follow_list(t, head)] == ["a", "b"]


def test_graph_node_sibling_properties():
    """ADVICE r3: a named-graph document's sibling properties describe the
    graph node in the DEFAULT graph instead of being dropped."""
    doc = {"@context": {"@vocab": "http://v/"},
           "@id": "http://g1",
           "@graph": [{"@id": "http://s2", "p": "v"}],
           "name": "my graph"}
    t = jsonld_to_triples(doc)
    assert ("http://s2", "http://v/p", "v", "literal", "", "", "http://g1") in t
    assert ("http://g1", "http://v/name", "my graph",
            "literal", "", "", "") in t


def test_index_container_iterates_values_and_drops_keys():
    """@container: @index — map VALUES convert as normal property values;
    index keys are content-free in toRDF (json-ld-api section 13)."""
    doc = {"@context": {"@vocab": "http://v/",
                        "post": {"@id": "http://v/post",
                                 "@container": "@index"}},
           "@id": "http://s",
           "post": {"en": {"@id": "http://p1"},
                    "de": [{"@id": "http://p2"}, "plain"]}}
    t = jsonld_to_triples(doc)
    got = {(r[1], r[2], r[3]) for r in t}
    assert got == {
        ("http://v/post", "http://p1", "iri"),
        ("http://v/post", "http://p2", "iri"),
        ("http://v/post", "plain", "literal"),
    }
    assert not any("en" in r[2] or "de" in r[2] for r in t)


def test_node_level_index_entry_ignored():
    doc = {"@context": {"@vocab": "http://v/"},
           "@id": "http://s", "@index": "ignored", "p": "v"}
    t = jsonld_to_triples(doc)
    assert t == [("http://s", "http://v/p", "v", "literal", "", "", "")]


def test_nest_properties_hoist_to_enclosing_node():
    """JSON-LD 1.1 section 9.10: @nest groups properties syntactically; they
    expand as the PARENT node's own properties (incl. aliased @nest)."""
    doc = {"@context": {"@vocab": "http://v/",
                        "meta": "@nest"},
           "@id": "http://s",
           "p": "top",
           "@nest": {"q": "nested", "r": {"@id": "http://o"}},
           "meta": [{"s": "aliased"}]}
    t = jsonld_to_triples(doc)
    got = {(r[0], r[1], r[2]) for r in t}
    assert got == {
        ("http://s", "http://v/p", "top"),
        ("http://s", "http://v/q", "nested"),
        ("http://s", "http://v/r", "http://o"),
        ("http://s", "http://v/s", "aliased"),
    }
    assert jsonld_to_triples(doc) == t  # deterministic


def test_nest_with_id_raises():
    doc = {"@context": {"@vocab": "http://v/"},
           "@id": "http://s",
           "@nest": {"@id": "http://other", "q": "x"}}
    with pytest.raises(ValueError):
        jsonld_to_triples(doc)


def test_term_definition_compact_iri_expands():
    """A term definition whose @id is a COMPACT IRI ("skos:prefLabel")
    must expand through the prefix defined in the same context — the
    scheme regex alone cannot distinguish it from an absolute IRI
    (json-ld-api §5.2 step 6.3; found by the NKOD OFN remote context,
    where every term stayed compact)."""
    doc = {
        "@context": {
            "skos": "http://www.w3.org/2004/02/skos/core#",
            "label": {"@id": "skos:prefLabel"},
            "Scheme": "skos:ConceptScheme",
            "typ": "@type",
        },
        "@id": "http://s",
        "typ": "Scheme",
        "label": "x",
    }
    t = set(jsonld_to_triples(doc))
    SKOS = "http://www.w3.org/2004/02/skos/core#"
    RDF_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert ("http://s", RDF_T, SKOS + "ConceptScheme",
            "iri", "", "", "") in t
    assert ("http://s", SKOS + "prefLabel", "x",
            "literal", "", "", "") in t
    # absolute @id with a scheme that happens to equal a defined prefix
    # must NOT re-expand (suffix starts with //)
    doc2 = {"@context": {"http": "http://p/", "q": {"@id": "http://e/q"}},
            "@id": "http://s", "q": "v"}
    assert ("http://s", "http://e/q", "v", "literal", "", "", "") \
        in set(jsonld_to_triples(doc2))


def test_term_key_compact_iri_without_id_expands():
    """A term whose KEY is a compact IRI and whose definition has NO
    explicit @id ("skos:broader": {"@type": "@id"}) maps to the expansion
    of the key itself (json-ld-api §4.2.2 create-term-definition) — the
    compact form must not leak out as the predicate."""
    SKOS = "http://www.w3.org/2004/02/skos/core#"
    doc = {
        "@context": {
            "skos": SKOS,
            "skos:broader": {"@type": "@id"},
        },
        "@id": "http://s",
        "skos:broader": "http://b",
    }
    t = set(jsonld_to_triples(doc))
    assert ("http://s", SKOS + "broader", "http://b",
            "iri", "", "", "") in t
    assert not [r for r in t if r[1] == "skos:broader"]
