"""Driver-side spec machinery: column-name derivation (P11), inheritance
cascade, prefix/datatype expansion, dialect parsing, validation errors."""

from __future__ import annotations

import pytest

from csvw_rdf_convertor_spark import spec


def test_encode_column_name_percent_and_dash():
    # '-' → %2D (reference: convertor.ts:589); spaces percent-encoded
    assert spec.encode_column_name("On Street") == "On%20Street"
    assert spec.encode_column_name("a-b") == "a%2Db"
    assert spec.encode_column_name("ščž") == "%C5%A1%C4%8D%C5%BE"


def test_default_column_names_and_titles():
    t = spec.parse_table({
        "url": "t.csv",
        "tableSchema": {"columns": [
            {"titles": "My Title"},
            {},
            {"titles": {"en": ["English"], "cs": "Czech"}},
        ]},
    })
    assert t.columns[0].name == "My%20Title"
    assert t.columns[1].name == "_col.2"       # convertor.ts:571,590
    # language-map titles in a NON-default language are not name-eligible
    # (convertor.ts:578-590: only defaultLang / defaultLang-prefixed keys
    # may name the column; default is '@none' here) → _col.N fallback
    assert t.columns[2].name == "_col.3"
    assert set(t.columns[2].titles) == {"English", "Czech"}


def test_duplicate_column_names_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        spec.parse_table({
            "url": "t.csv",
            "tableSchema": {"columns": [{"name": "a"}, {"name": "a"}]},
        })


def test_virtual_ordering_rule():
    with pytest.raises(ValueError, match="virtual"):
        spec.parse_table({
            "url": "t.csv",
            "tableSchema": {"columns": [
                {"name": "v", "virtual": True, "propertyUrl": "p", "valueUrl": "u"},
                {"name": "a"},
            ]},
        })


def test_inheritance_cascade_group_table_schema_column():
    g = spec.parse_descriptor({
        "null": ["NA"],                       # group level
        "tables": [{
            "url": "t.csv",
            "lang": "cs",                     # table level
            "tableSchema": {
                "aboutUrl": "#r-{a}",         # schema level
                "columns": [
                    {"name": "a"},
                    {"name": "b", "null": ["-"], "lang": "en"},  # overrides
                ],
            },
        }],
    })
    a, b = g.tables[0].columns
    assert a.null == ("NA",) and a.lang == "cs" and a.aboutUrl == "#r-{a}"
    assert b.null == ("-",) and b.lang == "en"


def test_datatype_iris_and_aliases():
    assert spec.datatype_iri("number") == spec.XSD + "double"
    assert spec.datatype_iri("binary") == spec.XSD + "base64Binary"
    assert spec.datatype_iri("datetime") == spec.XSD + "dateTime"
    assert spec.datatype_iri("json") == spec.CSVW + "JSON"
    assert spec.datatype_iri("xml") == spec.RDF + "XMLLiteral"
    assert spec.datatype_iri("html") == spec.RDF + "HTML"
    assert spec.datatype_iri("integer") == spec.XSD + "integer"


def test_expand_iri():
    assert spec.expand_iri("skos:Concept") == \
        "http://www.w3.org/2004/02/skos/core#Concept"
    assert spec.expand_iri("http://x.y/z") == "http://x.y/z"
    assert spec.expand_iri("#frag", base="http://x.y/doc") == "http://x.y/doc#frag"
    assert spec.expand_iri("other.csv", base="http://x.y/dir/doc.csv") == \
        "http://x.y/dir/other.csv"


def test_dialect_defaults_and_offsets():
    d = spec.DialectSpec.parse({"headerRowCount": 2, "skipRows": 3})
    assert d.header_row_count == 2
    t = spec.parse_table({"url": "t.csv",
                          "dialect": {"headerRowCount": 2, "skipRows": 3},
                          "tableSchema": {"columns": [{"name": "a"}]}})
    assert t.source_row_offset == 5            # convertor.ts:374-378
    assert spec.DialectSpec().header_row_count == 1
    assert spec.DialectSpec.parse({"header": False}).header_row_count == 0


def test_dialect_codec_translates_node_labels():
    """The descriptor validation whitelist mirrors the reference's Node
    Buffer labels (validation/dialect.ts:17-33); ``codec`` translates them
    to names BOTH Python's codec registry and java.nio accept, so a
    validator-approved descriptor can't crash the reader/writer."""
    import codecs

    import pytest

    from csvw_rdf_convertor_spark.spec import DialectSpec
    expect = {"ascii": "US-ASCII", "utf8": "utf-8", "utf-8": "utf-8",
              "utf16le": "UTF-16LE", "ucs2": "UTF-16LE",
              "latin1": "ISO-8859-1", "binary": "ISO-8859-1"}
    for node, target in expect.items():
        c = DialectSpec(encoding=node).codec
        assert c == target
        codecs.lookup(c)  # resolvable in Python (and named for java.nio)
    # Node's base64/hex Buffer labels are not text encodings → loud error
    with pytest.raises(ValueError, match="not a text codec"):
        DialectSpec(encoding="base64").codec
