"""RDF/XML-subset reader (sources/rdfxml.py) — closes the last S4 format
(reference loaders route .rdf through rdfxml-streaming-parser)."""

import pytest

from csvw_rdf_convertor_spark.sources.rdfxml import parse_rdfxml
from csvw_rdf_convertor_spark.spec import RDF, XSD

DOC = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.org/ns#"
         xml:base="http://ex.org/base">
  <ex:Thing rdf:about="http://ex.org/a" ex:attr="inline">
    <ex:label xml:lang="en">Hello</ex:label>
    <ex:count rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">5</ex:count>
    <ex:link rdf:resource="http://ex.org/b"/>
    <ex:rel rdf:resource="#frag"/>
    <ex:nested>
      <rdf:Description rdf:nodeID="n1">
        <ex:inner>deep</ex:inner>
      </rdf:Description>
    </ex:nested>
    <ex:props rdf:parseType="Resource">
      <ex:p1>v1</ex:p1>
    </ex:props>
    <ex:list rdf:parseType="Collection">
      <rdf:Description rdf:about="http://ex.org/i1"/>
      <rdf:Description rdf:about="http://ex.org/i2"/>
    </ex:list>
  </ex:Thing>
</rdf:RDF>
"""

EX = "http://ex.org/ns#"


def test_full_document():
    t = parse_rdfxml(DOC)
    s = {(a, b, c, d, e, f) for a, b, c, d, e, f, _g in t}
    a = "http://ex.org/a"
    assert (a, RDF + "type", EX + "Thing", "iri", "", "") in s
    assert (a, EX + "attr", "inline", "literal", "", "") in s
    assert (a, EX + "label", "Hello", "literal", "", "en") in s
    assert (a, EX + "count", "5", "literal", XSD + "integer", "") in s
    assert (a, EX + "link", "http://ex.org/b", "iri", "", "") in s
    # xml:base fragment resolution
    assert (a, EX + "rel", "http://ex.org/base#frag", "iri", "", "") in s
    # labeled bnode
    assert (a, EX + "nested", "_:n1", "bnode", "", "") in s
    assert ("_:n1", EX + "inner", "deep", "literal", "", "") in s
    # parseType=Resource implicit bnode
    props = [o for (su, p, o, k, *_x) in s if p == EX + "props"]
    assert len(props) == 1 and props[0].startswith("_:")
    assert any(su == props[0] and p == EX + "p1" and o == "v1"
               for (su, p, o, *_x) in s)
    # collection: first/rest chain ending in nil
    heads = [o for (su, p, o, k, *_x) in s if p == EX + "list"]
    assert len(heads) == 1
    firsts = {su: o for (su, p, o, *_x) in s if p == RDF + "first"}
    rests = {su: o for (su, p, o, *_x) in s if p == RDF + "rest"}
    chain = []
    cur = heads[0]
    while cur != RDF + "nil":
        chain.append(firsts[cur])
        cur = rests[cur]
    assert chain == ["http://ex.org/i1", "http://ex.org/i2"]


def test_deterministic_bnodes():
    assert parse_rdfxml(DOC) == parse_rdfxml(DOC)


def test_parse_type_literal_xmlliteral():
    """rdf:parseType='Literal' (RDF/XML §2.11) → rdf:XMLLiteral-typed
    literal; lexical form is exclusive c14n of the content."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://e/">
      <rdf:Description rdf:about="http://s">
        <ex:x rdf:parseType="Literal">pre <b>markup</b> post</ex:x>
      </rdf:Description></rdf:RDF>"""
    t = parse_rdfxml(doc)
    (row,) = [r for r in t if r[1] == "http://e/x"]
    assert row[3] == "literal" and row[4] == RDF + "XMLLiteral"
    assert row[2] == "pre <b>markup</b> post"
    assert parse_rdfxml(doc) == t  # deterministic


def test_xmlliteral_exc_c14n_prefixes_and_attrs():
    """Exclusive c14n of XMLLiteral content (RDF 1.1 Concepts §5.1):
    source prefixes declared on an ANCESTOR re-declare inside the literal
    (visibly-utilized only), attributes sort by (ns-uri, local-name) with
    un-namespaced attrs first, tags never self-close."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://e/" xmlns:svg="http://www.w3.org/2000/svg"
             xmlns:un="http://unused/">
      <rdf:Description rdf:about="http://s">
        <ex:x rdf:parseType="Literal"><svg:rect svg:width="3" height="2"
          aria="y"/> t</ex:x>
      </rdf:Description></rdf:RDF>"""
    (row,) = [r for r in parse_rdfxml(doc) if r[1] == "http://e/x"]
    # svg: re-declared (utilized), un:/ex:/rdf: NOT (exc-c14n); attr order:
    # no-ns attrs (aria, height) sorted, then svg:width; no self-closing
    assert row[2] == ('<svg:rect xmlns:svg="http://www.w3.org/2000/svg"'
                      ' aria="y" height="2" svg:width="3"></svg:rect> t')


def test_xmlliteral_exc_c14n_escaping_and_nesting():
    """c14n escaping: text escapes & < > and CR; attribute values escape
    & < " TAB LF CR; an inner re-declaration does not repeat on a child
    already covered by the literal-local output context."""
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
           ' xmlns:ex="http://e/">'
           '<rdf:Description rdf:about="http://s">'
           '<ex:x rdf:parseType="Literal">a&amp;b<ex:i ex:q="x&amp;&quot;y">'
           '1 &lt; 2<ex:j/></ex:i>&gt;tail</ex:x>'
           '</rdf:Description></rdf:RDF>')
    (row,) = [r for r in parse_rdfxml(doc) if r[1] == "http://e/x"]
    assert row[2] == ('a&amp;b<ex:i xmlns:ex="http://e/" ex:q="x&amp;&quot;y">'
                      '1 &lt; 2<ex:j></ex:j></ex:i>&gt;tail')


def test_xmlliteral_exc_c14n_default_ns():
    """Content in the DEFAULT namespace: xmlns re-declares inside the
    literal; a no-namespace sibling needs no declaration."""
    doc = ('<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"'
           ' xmlns:ex="http://e/">'
           '<rdf:Description rdf:about="http://s">'
           '<ex:x rdf:parseType="Literal"><p xmlns="http://h/">d</p>'
           '<q>n</q></ex:x></rdf:Description></rdf:RDF>')
    (row,) = [r for r in parse_rdfxml(doc) if r[1] == "http://e/x"]
    assert row[2] == '<p xmlns="http://h/">d</p><q>n</q>'


def test_bare_typed_node_root():
    doc = """<ex:T xmlns:ex="http://e/" xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             rdf:about="http://s"><ex:p>v</ex:p></ex:T>"""
    t = parse_rdfxml(doc)
    assert ("http://s", RDF + "type", "http://e/T", "iri", "", "", "") in t
    assert ("http://s", "http://e/p", "v", "literal", "", "", "") in t


def test_format_router(tmp_path, spark):
    from csvw_rdf_convertor_spark.sources.parse import read_rdf
    (tmp_path / "a.rdf").write_text(DOC, "utf-8")
    (tmp_path / "b.ttl").write_text(
        '@prefix ex: <http://e/> . ex:s ex:p "v" .', "utf-8")
    (tmp_path / "c.nt").write_text(
        '<http://s> <http://p> "o" .\n', "utf-8")
    import json
    (tmp_path / "d.jsonld").write_text(json.dumps(
        {"@context": {"@vocab": "http://v/"}, "@id": "http://s",
         "name": "x"}), "utf-8")
    assert read_rdf(spark, str(tmp_path / "a.rdf")).count() > 5
    assert read_rdf(spark, str(tmp_path / "b.ttl")).count() == 1
    assert read_rdf(spark, str(tmp_path / "c.nt")).count() == 1
    assert read_rdf(spark, str(tmp_path / "d.jsonld")).count() == 1


def test_property_attributes_on_empty_property_element():
    """ADVICE r3: <ex:addr ex:city="X"/> → implicit bnode object carrying
    the attribute properties (RDF/XML §2.12), not an empty literal."""
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://e/">
      <rdf:Description rdf:about="http://s">
        <ex:addr ex:city="Paris" ex:zip="75001"/>
      </rdf:Description></rdf:RDF>"""
    t = parse_rdfxml(doc)
    edge = next(r for r in t if r[1] == "http://e/addr")
    assert edge[3] == "bnode"
    b = edge[2]
    assert (b, "http://e/city", "Paris", "literal", "", "", "") in t
    assert (b, "http://e/zip", "75001", "literal", "", "", "") in t
    assert not any(r[1] == "http://e/addr" and r[3] == "literal" for r in t)
    assert parse_rdfxml(doc) == t  # deterministic implicit bnode


def test_property_attributes_with_rdf_resource():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://e/">
      <rdf:Description rdf:about="http://s">
        <ex:knows rdf:resource="http://o" ex:name="Ann"/>
      </rdf:Description></rdf:RDF>"""
    t = parse_rdfxml(doc)
    assert ("http://s", "http://e/knows", "http://o", "iri", "", "", "") in t
    assert ("http://o", "http://e/name", "Ann", "literal", "", "", "") in t


def test_property_attributes_mixed_with_text_raises():
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
             xmlns:ex="http://e/">
      <rdf:Description rdf:about="http://s">
        <ex:p ex:q="x">text</ex:p>
      </rdf:Description></rdf:RDF>"""
    with pytest.raises(ValueError):
        parse_rdfxml(doc)


def test_rdf_type_property_attribute(spark, tmp_path):
    """rdf:type as a property ATTRIBUTE emits a type triple with a resolved
    IRI object — on node elements (§2.13) and on empty property elements
    (§2.12) alike (ADVICE r4: previously filtered as a syntax attribute and
    silently dropped on property elements)."""
    xml = """<?xml version="1.0"?>
<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
         xmlns:ex="http://ex.org/">
  <rdf:Description rdf:about="http://ex.org/a"
                   rdf:type="http://ex.org/TypeA">
    <ex:rel rdf:resource="http://ex.org/b"
            rdf:type="http://ex.org/TypeB"/>
  </rdf:Description>
</rdf:RDF>"""
    p = tmp_path / "t.rdf"
    p.write_text(xml)
    from csvw_rdf_convertor_spark.sources.rdfxml import read_rdfxml
    rows = {(r.subj, r.pred, r.obj_lex, r.obj_kind)
            for r in read_rdfxml(spark, str(p)).collect()}
    RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    assert ("http://ex.org/a", RT, "http://ex.org/TypeA", "iri") in rows
    assert ("http://ex.org/a", "http://ex.org/rel",
            "http://ex.org/b", "iri") in rows
    # the §2.12 case: type attribute applies to the property's OBJECT
    assert ("http://ex.org/b", RT, "http://ex.org/TypeB", "iri") in rows
