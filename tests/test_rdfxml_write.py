"""RDF/XML writer round-trips (S5 completion — BEYOND the reference, whose
N3 route silently writes Turtle when asked for rdfxml:
loaders/rdf-serialization.ts:1-8 maps rdfxml → 'text/turtle').

Writer → this repo's own RDF/XML parser → exact tuple equality (no bnode
renaming happens unless a label is not an NCName, which is tested
separately via the canon() isomorphism helper pattern)."""

import os

import pytest

from csvw_rdf_convertor_spark.sources.rdfxml import parse_rdfxml
from csvw_rdf_convertor_spark.sources.rdfxml_write import (
    pretty_rdfxml,
    split_qname,
)

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SKOS = "http://www.w3.org/2004/02/skos/core#"

ROWS = [
    ("http://ex/s1", RDF + "type", SKOS + "Concept", "iri", "", "", ""),
    ("http://ex/s1", SKOS + "prefLabel", "Vzdělání", "literal", "", "cs", ""),
    ("http://ex/s1", SKOS + "notation", "7", "literal",
     XSD + "integer", "", ""),
    ("http://ex/s1", SKOS + "related", "_:bn1", "bnode", "", "", ""),
    ("_:bn1", SKOS + "note", 'a <b> & "c"\nd', "literal", "", "", ""),
]


def test_roundtrip_exact():
    doc = pretty_rdfxml(ROWS)
    assert doc.startswith('<?xml version="1.0"')
    assert set(parse_rdfxml(doc)) == set(ROWS)


def test_deterministic():
    assert pretty_rdfxml(ROWS) == pretty_rdfxml(list(reversed(ROWS)))


def test_prefix_map_respected():
    doc = pretty_rdfxml(ROWS, {"skos": SKOS})
    assert "<skos:prefLabel" in doc
    assert set(parse_rdfxml(doc)) == set(ROWS)


def test_named_graph_refused():
    rows = [("http://ex/s", SKOS + "note", "x", "literal", "", "", "urn:g")]
    with pytest.raises(ValueError, match="named graphs"):
        pretty_rdfxml(rows)


def test_unsplittable_predicate_refused():
    # all-digit local part: no NCName suffix exists
    rows = [("http://ex/s", "http://ex/123", "x", "literal", "", "", "")]
    with pytest.raises(ValueError, match="NCName"):
        pretty_rdfxml(rows)


def test_split_qname():
    assert split_qname(SKOS + "prefLabel") == (SKOS, "prefLabel")
    assert split_qname("urn:nation#n_name") == ("urn:nation#", "n_name")
    # digits can appear INSIDE a local name, just not lead it
    assert split_qname("http://ex/v2x") == ("http://ex/", "v2x")
    with pytest.raises(ValueError):
        split_qname("123")


def test_non_ncname_bnode_relabeled_isomorphically():
    rows = [
        ("_:0abc", SKOS + "note", "x", "literal", "", "", ""),
        ("http://ex/s", SKOS + "related", "_:0abc", "bnode", "", "", ""),
    ]
    doc = pretty_rdfxml(rows)
    assert 'rdf:nodeID="b0abc"' in doc
    got = set(parse_rdfxml(doc))
    assert ("_:b0abc", SKOS + "note", "x", "literal", "", "", "") in got
    assert ("http://ex/s", SKOS + "related", "_:b0abc",
            "bnode", "", "", "") in got


def test_xmlliteral_embeds_canonically():
    # obtain a canonical XMLLiteral lexical form from the parser itself
    src = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:skos="{SKOS}">
      <rdf:Description rdf:about="http://ex/s">
        <skos:definition rdf:parseType="Literal">x
          <span xmlns="http://www.w3.org/1999/xhtml" lang="cs">y</span>
        </skos:definition>
      </rdf:Description>
    </rdf:RDF>"""
    first = parse_rdfxml(src)
    assert first and first[0][4] == RDF + "XMLLiteral"
    doc = pretty_rdfxml(first)
    assert 'rdf:parseType="Literal"' in doc
    assert set(parse_rdfxml(doc)) == set(first)


def test_malformed_xmlliteral_refused():
    rows = [("http://ex/s", SKOS + "definition", "<unclosed", "literal",
             RDF + "XMLLiteral", "", "")]
    with pytest.raises(ValueError, match="well-formed"):
        pretty_rdfxml(rows)


NKOD = "/root/reference/packages/core/test/nkod"


@pytest.mark.skipif(not os.path.isdir(NKOD), reason="NKOD goldens absent")
@pytest.mark.parametrize("name", ["organizační-struktura",
                                  "požadované-vzdělání"])
def test_nkod_golden_reserializes(name, spark):
    """Parse a real NKOD golden .nt, write RDF/XML, reparse: identical
    graph — the test the reference CANNOT pass (it would write Turtle)."""
    from csvw_rdf_convertor_spark.functions.ntriples import parse_ntriples
    path = os.path.join(NKOD, name, f"{name}.nt")
    rows = [tuple(r) for r in parse_ntriples(spark, path).collect()]
    assert rows
    doc = pretty_rdfxml(rows)
    assert set(parse_rdfxml(doc)) == set(rows)


def test_bnode_relabeling_is_injective():
    """``_:1`` and ``_:b1`` in one document must stay DISTINCT nodes: a
    bare 'b' prefix on non-NCName labels would give both rdf:nodeID="b1"
    and merge them on re-parse (the relabeling map is document-scoped and
    collision-checked)."""
    rows = [
        ("_:1", SKOS + "note", "one", "literal", "", "", ""),
        ("_:b1", SKOS + "note", "two", "literal", "", "", ""),
    ]
    back = parse_rdfxml(pretty_rdfxml(rows))
    assert len({r[0] for r in back}) == 2
    by_sub = {}
    for r in back:
        by_sub.setdefault(r[0], set()).add(r[2])
    assert sorted(sorted(v) for v in by_sub.values()) == [["one"], ["two"]]


def test_bnode_object_and_subject_share_relabeling():
    """The same non-NCName label appearing as subject AND object must get
    ONE image so the link survives the round trip."""
    rows = [
        ("http://ex/s", SKOS + "related", "_:0x", "bnode", "", "", ""),
        ("_:0x", SKOS + "note", "inner", "literal", "", "", ""),
    ]
    back = parse_rdfxml(pretty_rdfxml(rows))
    obj = next(r[2] for r in back if r[1] == SKOS + "related")
    assert (obj, SKOS + "note", "inner", "literal", "", "", "") in set(back)
