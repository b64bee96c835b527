"""W3C CSVW official-suite shape widening (VERDICT r3 #7).

The reference runs the full W3C csvw2rdf manifest (packages/core/test/
csvw2rdf-official.test.ts:26-88) against the suite checkout at csvw/tests/
(an empty submodule in this sandbox, so the suite data itself is absent).
These fixtures re-create the manifest's SHAPE classes — positive tests
(isomorphic triples), TestWithWarnings (output + non-empty warnings), and
NegativeTest (must error) — over the semantics the suite exercises most:
virtual columns, null lists, defaults, separators, template specials
({_row}/{_sourceRow}/{_name}/{_sourceColumn}), inherited lang, table
groups, suppressOutput, facet violations and empty tables.

The 15 ids the reference itself skips (csvw2rdf-official.test.ts:34-40)
are adjudicated per-id in docs/PARITY.md §W3C.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.plans.csvw2rdf import (
    group_to_triples,
    table_to_triples,
)
from csvw_rdf_convertor_spark.spec import (
    CSVW,
    RDF,
    XSD,
    parse_descriptor,
    with_order,
)
from csvw_rdf_convertor_spark.validation import validate_table

RDF_TYPE = RDF + "type"


def _rows(spark, schema, rows, desc, order_by=None, minimal=True):
    t = parse_descriptor(desc).tables[0]
    if order_by:
        t = with_order(t, order_by)
    df = spark.createDataFrame(rows, schema)
    return table_to_triples(df, t, minimal=minimal).collect()


def _set(triples):
    return {(r.subj, r.pred, r.obj_lex, r.obj_kind, r.obj_dtype, r.obj_lang)
            for r in triples}


# --- positive shapes ---------------------------------------------------------

def test_virtual_column_constant_triple(spark):
    """Virtual columns emit per-row triples from templates alone (suite's
    virtual-column family; convertor.ts: virtual cells have no source)."""
    desc = {
        "url": "v.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "columns": [
                {"name": "id"},
                {"name": "t", "virtual": True,
                 "propertyUrl": RDF_TYPE,
                 "valueUrl": "http://schema.org/Thing"},
            ],
        },
    }
    got = _set(_rows(spark, "id string", [("1",), ("2",)], desc))
    assert ("v.csv#r-1", RDF_TYPE, "http://schema.org/Thing",
            "iri", "", "") in got
    assert ("v.csv#r-2", RDF_TYPE, "http://schema.org/Thing",
            "iri", "", "") in got
    # the physical column still maps normally
    assert ("v.csv#r-1", "v.csv#id", "1", "literal", "", "") in got


def test_null_list_suppresses_triples(spark):
    """`null` may be a LIST of sentinel strings; any match → no triple
    (suite null-value family; cells.py P3)."""
    desc = {
        "url": "n.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "columns": [{"name": "id"},
                        {"name": "v", "null": ["NA", "-"]}],
        },
    }
    got = _set(_rows(spark, "id string, v string",
                     [("1", "NA"), ("2", "-"), ("3", "x")], desc))
    v_triples = {t for t in got if t[1] == "n.csv#v"}
    assert v_triples == {("n.csv#r-3", "n.csv#v", "x", "literal", "", "")}


def test_default_value_applied_on_empty(spark):
    """Empty cell + `default` → the default maps as if it were the source
    value (suite default-value family; cells.py P2 before P3)."""
    desc = {
        "url": "d.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "columns": [{"name": "id"},
                        {"name": "v", "default": "unknown"}],
        },
    }
    got = _set(_rows(spark, "id string, v string",
                     [("1", ""), ("2", "set")], desc))
    assert ("d.csv#r-1", "d.csv#v", "unknown", "literal", "", "") in got
    assert ("d.csv#r-2", "d.csv#v", "set", "literal", "", "") in got


def test_unordered_separator_fanout_with_datatype(spark):
    """separator without ordered → one typed triple per item, canonical
    lexical forms (suite sequence family, unordered variant; T5+P5)."""
    desc = {
        "url": "s.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "columns": [{"name": "id"},
                        {"name": "ks", "separator": "|",
                         "datatype": "integer"}],
        },
    }
    got = _set(_rows(spark, "id string, ks string",
                     [("1", "01|2|30")], desc))
    ks = {t for t in got if t[1] == "s.csv#ks"}
    assert ks == {
        ("s.csv#r-1", "s.csv#ks", "1", "literal", XSD + "integer", ""),
        ("s.csv#r-1", "s.csv#ks", "2", "literal", XSD + "integer", ""),
        ("s.csv#r-1", "s.csv#ks", "30", "literal", XSD + "integer", ""),
    }


def test_property_url_name_special(spark):
    """propertyUrl may use {_name} (suite URI-template specials family)."""
    desc = {
        "url": "p.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "propertyUrl": "http://ex.org/prop/{_name}",
            "columns": [{"name": "id"}, {"name": "color"}],
        },
    }
    got = _set(_rows(spark, "id string, color string",
                     [("1", "red")], desc))
    assert ("p.csv#r-1", "http://ex.org/prop/color", "red",
            "literal", "", "") in got
    assert ("p.csv#r-1", "http://ex.org/prop/id", "1",
            "literal", "", "") in got


def test_about_url_cross_column(spark):
    """aboutUrl referencing a DIFFERENT column groups triples onto that
    column's subject (suite aboutUrl family)."""
    desc = {
        "url": "x.csv",
        "tableSchema": {
            "columns": [{"name": "grp", "suppressOutput": True},
                        {"name": "val", "aboutUrl": "#g-{grp}"}],
        },
    }
    got = _set(_rows(spark, "grp string, val string",
                     [("a", "1"), ("a", "2"), ("b", "3")], desc))
    assert got == {
        ("x.csv#g-a", "x.csv#val", "1", "literal", "", ""),
        ("x.csv#g-a", "x.csv#val", "2", "literal", "", ""),
        ("x.csv#g-b", "x.csv#val", "3", "literal", "", ""),
    }


def test_row_and_source_row_specials(spark):
    """{_row} is the logical 1-based row, {_sourceRow} adds the dialect
    offset (default header → +1); suite row-number family."""
    desc = {
        "url": "r.csv",
        "tableSchema": {
            "aboutUrl": "#row-{_row}-src-{_sourceRow}",
            "columns": [{"name": "id"}],
        },
    }
    got = _set(_rows(spark, "id string", [("a",), ("b",)], desc,
                     order_by="id"))
    assert ("r.csv#row-1-src-2", "r.csv#id", "a", "literal", "", "") in got
    assert ("r.csv#row-2-src-3", "r.csv#id", "b", "literal", "", "") in got


def test_source_column_special_with_skip_columns(spark):
    """{_sourceColumn} counts columns of the SOURCE file: logical index +
    dialect skipColumns (suite dialect/column-numbering family)."""
    desc = {
        "url": "c.csv",
        "dialect": {"skipColumns": 2},
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "propertyUrl": "http://ex.org/c{_sourceColumn}",
            "columns": [{"name": "id"}, {"name": "v"}],
        },
    }
    got = _set(_rows(spark, "id string, v string", [("1", "x")], desc))
    assert ("c.csv#r-1", "http://ex.org/c3", "1", "literal", "", "") in got
    assert ("c.csv#r-1", "http://ex.org/c4", "x", "literal", "", "") in got


def test_inherited_lang_tags_string_literals(spark):
    """`lang` set at schema level cascades to columns; string cells become
    language-tagged literals (suite lang family; inherited props A5/T4)."""
    desc = {
        "url": "l.csv",
        "tableSchema": {
            "lang": "en",
            "aboutUrl": "#r-{id}",
            "columns": [{"name": "id"},
                        {"name": "label"},
                        {"name": "n", "datatype": "integer"}],
        },
    }
    got = _set(_rows(spark, "id string, label string, n string",
                     [("1", "hello", "5")], desc))
    assert ("l.csv#r-1", "l.csv#label", "hello", "literal", "", "en") in got
    # non-string datatypes never take a language tag
    assert ("l.csv#r-1", "l.csv#n", "5", "literal", XSD + "integer", "") in got


def test_table_group_unions_tables(spark):
    """A TableGroup converts every table; triples union (suite multi-table
    family; group_to_triples)."""
    desc = {
        "tables": [
            {"url": "a.csv",
             "tableSchema": {"aboutUrl": "#a-{id}",
                             "columns": [{"name": "id"}]}},
            {"url": "b.csv",
             "tableSchema": {"aboutUrl": "#b-{id}",
                             "columns": [{"name": "id"}]}},
        ],
    }
    group = parse_descriptor(desc)
    dfs = {
        "a.csv": spark.createDataFrame([("1",)], "id string"),
        "b.csv": spark.createDataFrame([("2",)], "id string"),
    }
    got = _set(group_to_triples(dfs, group).collect())
    assert ("a.csv#a-1", "a.csv#id", "1", "literal", "", "") in got
    assert ("b.csv#b-2", "b.csv#id", "2", "literal", "", "") in got


def test_suppressed_table_excluded_from_group(spark):
    """suppressOutput on a TABLE removes all its output (suite
    suppress-output family)."""
    desc = {
        "tables": [
            {"url": "a.csv",
             "tableSchema": {"aboutUrl": "#a-{id}",
                             "columns": [{"name": "id"}]}},
            {"url": "b.csv", "suppressOutput": True,
             "tableSchema": {"aboutUrl": "#b-{id}",
                             "columns": [{"name": "id"}]}},
        ],
    }
    group = parse_descriptor(desc)
    dfs = {
        "a.csv": spark.createDataFrame([("1",)], "id string"),
        "b.csv": spark.createDataFrame([("2",)], "id string"),
    }
    got = _set(group_to_triples(dfs, group).collect())
    assert ("a.csv#a-1", "a.csv#id", "1", "literal", "", "") in got
    assert not any(s.startswith("b.csv") for s, *_ in got)


def test_empty_table_standard_mode_scaffolding_only(spark):
    """Zero data rows in standard mode → Table/TableGroup scaffolding, no
    Row nodes (suite empty-table family)."""
    desc = {
        "url": "e.csv",
        "tableSchema": {"aboutUrl": "#r-{id}",
                        "columns": [{"name": "id"}]},
    }
    t = with_order(parse_descriptor(desc).tables[0], "id")
    df = spark.createDataFrame([], "id string")
    rows = table_to_triples(df, t, minimal=False).collect()
    types = {r.obj_lex for r in rows if r.pred == RDF_TYPE}
    assert types == {CSVW + "TableGroup", CSVW + "Table"}
    assert not any(r.pred == CSVW + "rownum" for r in rows)


# --- facet violation (invalid demotion, P10) ---------------------------------

def test_minimum_facet_violation_demotes_to_string(spark):
    """Out-of-range numeric → warning-class demotion: the raw lexical is
    kept as an UNTYPED string literal while in-range values parse
    normally (suite validation family; convertor.ts:923-939)."""
    desc = {
        "url": "m.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "columns": [{"name": "id"},
                        {"name": "n",
                         "datatype": {"base": "integer", "minimum": 10}}],
        },
    }
    got = _set(_rows(spark, "id string, n string",
                     [("1", "5"), ("2", "15")], desc))
    assert ("m.csv#r-1", "m.csv#n", "5", "literal", "", "") in got
    assert ("m.csv#r-2", "m.csv#n", "15", "literal", XSD + "integer", "") in got


# --- TestWithWarnings / NegativeTest shapes ----------------------------------

def test_warning_shape_converts_and_warns(spark):
    """TestWithWarnings contract (csvw2rdf-official.test.ts:66-70): output
    is produced AND the issue list is non-empty."""
    desc = {
        "url": "w.csv",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "columns": [{"name": "id"},
                        {"name": "v", "ordered": True}],   # no separator
        },
    }
    t = parse_descriptor(desc).tables[0]
    issues = validate_table(t)
    assert any(i.level == "warning" and "ordered" in i.message
               for i in issues)
    got = _set(_rows(spark, "id string, v string", [("1", "x")], desc))
    assert ("w.csv#r-1", "w.csv#v", "x", "literal", "", "") in got


def test_negative_shape_unknown_datatype_base(spark):
    """NegativeTest contract (csvw2rdf-official.test.ts:77-83): a bad
    descriptor must surface an error (here: error-level issue)."""
    desc = {
        "url": "bad.csv",
        "tableSchema": {
            "columns": [{"name": "id", "datatype": "definitelyNotAType"}],
        },
    }
    t = parse_descriptor(desc).tables[0]
    issues = validate_table(t)
    assert any(i.level == "error" and "datatype" in i.message for i in issues)
