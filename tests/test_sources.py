"""S1 dialect-aware CSV scan + S4/S5 N-Triples parse/serialize round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.functions import ntriples
from csvw_rdf_convertor_spark.sources.csv_source import read_csv
from csvw_rdf_convertor_spark.spec import parse_descriptor

CSV_BODY = """# a comment line
meta,row,to,skip
GID;Name;Species
x;ignored-col-header;ignored
1;ADDISON AV;Celtis australis
2;EMERSON ST;Liquidambar styraciflua

3;BRYANT ST;Liquidambar styraciflua
"""

DESCRIPTOR = {
    "url": "trees.csv",
    "dialect": {
        "delimiter": ";",
        "commentPrefix": "#",
        "skipRows": 1,       # drop the 'meta,row,to,skip' line
        "headerRowCount": 2,  # the GID;Name;Species line + the x;... line
        "skipBlankRows": True,
    },
    "tableSchema": {
        "columns": [
            {"name": "GID"},
            {"name": "on_street"},
            {"name": "species"},
        ],
    },
}


def test_dialect_csv_scan(spark, tmp_path):
    p = tmp_path / "trees.csv"
    p.write_text(CSV_BODY)
    table = parse_descriptor(DESCRIPTOR).tables[0]
    df = read_csv(spark, str(p), table)
    rows = sorted((r.GID, r.on_street, r.species) for r in df.collect())
    assert rows == [
        ("1", "ADDISON AV", "Celtis australis"),
        ("2", "EMERSON ST", "Liquidambar styraciflua"),
        ("3", "BRYANT ST", "Liquidambar styraciflua"),
    ]
    assert table.source_row_offset == 3  # headerRowCount 2 + skipRows 1


def test_skip_columns(spark, tmp_path):
    p = tmp_path / "sk.csv"
    p.write_text("drop,a,b\nX,1,2\nY,3,4\n")
    desc = {
        "url": "sk.csv",
        "dialect": {"skipColumns": 1, "header": True},
        "tableSchema": {"columns": [{"name": "a"}, {"name": "b"}]},
    }
    df = read_csv(spark, str(p), parse_descriptor(desc).tables[0])
    assert sorted((r.a, r.b) for r in df.collect()) == [("1", "2"), ("3", "4")]


TRIPLES = [
    ("http://ex.org/s1", "http://ex.org/p", "plain lit", "literal", "", "", ""),
    ("http://ex.org/s1", "http://ex.org/p2", 'esc "q" \\ and\nnewline\ttab',
     "literal", "", "", ""),
    ("http://ex.org/s2", "http://ex.org/p", "typed",
     "literal", "http://www.w3.org/2001/XMLSchema#token", "", ""),
    ("http://ex.org/s2", "http://ex.org/p3", "bonjour", "literal", "", "fr", ""),
    ("_:skb1", "http://ex.org/p4", "http://ex.org/o", "iri", "", "", ""),
    ("http://ex.org/s3", "http://ex.org/p5", "_:skb1", "bnode", "", "", ""),
    ("http://ex.org/s4", "http://ex.org/p", "graphy", "literal", "", "",
     "http://ex.org/g1"),
]
SCHEMA = ("subj string, pred string, obj_lex string, obj_kind string, "
          "obj_dtype string, obj_lang string, graph string")


def test_ntriples_roundtrip(spark):
    df = spark.createDataFrame(TRIPLES, SCHEMA)
    lines = ntriples.to_ntriples_lines(df)
    back = ntriples.parse_ntriples(spark, lines.withColumnRenamed("line", "value"))
    orig = {tuple(r) for r in df.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert rt == orig


def test_ntriples_line_shapes(spark):
    df = spark.createDataFrame(TRIPLES, SCHEMA)
    lines = {r.line for r in ntriples.to_ntriples_lines(df).collect()}
    assert '<http://ex.org/s1> <http://ex.org/p> "plain lit" .' in lines
    assert ('<http://ex.org/s2> <http://ex.org/p> '
            '"typed"^^<http://www.w3.org/2001/XMLSchema#token> .') in lines
    assert '<http://ex.org/s2> <http://ex.org/p3> "bonjour"@fr .' in lines
    assert '_:skb1 <http://ex.org/p4> <http://ex.org/o> .' in lines
    assert '<http://ex.org/s3> <http://ex.org/p5> _:skb1 .' in lines
    assert ('<http://ex.org/s4> <http://ex.org/p> "graphy" <http://ex.org/g1> .'
            in lines)
    # escaping
    assert any('\\"q\\"' in ln and "\\n" in ln and "\\t" in ln and "\\\\" in ln
               for ln in lines)


def test_ntriples_write_read_files(spark, tmp_path):
    df = spark.createDataFrame(TRIPLES, SCHEMA)
    out = str(tmp_path / "nt")
    ntriples.write_ntriples(df, out)
    back = ntriples.parse_ntriples(spark, out)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_multi_file_csv_with_skip_rows_raises(spark, tmp_path):
    """skipRows/header prefix skipping is a single-file concept: the global
    row-order window must refuse multi-file inputs (scale guard)."""
    import pytest as _pytest

    from csvw_rdf_convertor_spark.spec import parse_descriptor
    d = tmp_path / "many"
    d.mkdir()
    (d / "a.csv").write_text("h1,h2\n1,2\n")
    (d / "b.csv").write_text("h1,h2\n3,4\n")
    table = parse_descriptor({
        "url": str(d), "tableSchema": {"columns": [{"name": "h1"}, {"name": "h2"}]},
    }).tables[0]
    from csvw_rdf_convertor_spark.sources.csv_source import read_csv
    with _pytest.raises(ValueError, match="single input file"):
        read_csv(spark, str(d), table).collect()
