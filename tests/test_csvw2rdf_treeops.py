"""Flagship fixture: tree-ops (W3C CSVW example; reference fixture at
packages/core/test/rdf2csvwtests/011/). Golden triples derived from the
reference's input.ttl — minimal mode first, then standard-mode scaffolding.

Blank nodes are compared up to isomorphism: the reference mints fresh bnodes,
we mint deterministic skolems, so goldens use placeholders resolved via a
bijection check (here: the default-subject skolem is a pure function we can
recompute — simpler and stricter than generic isomorphism for these shapes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
from csvw_rdf_convertor_spark.spec import CSVW, RDF, XSD, parse_descriptor, with_order

TREE_OPS_DESCRIPTOR = {
    "url": "tree-ops.csv",
    "tableSchema": {
        "columns": [
            {"name": "GID", "titles": ["GID", "Generic Identifier"],
             "datatype": "string", "required": True},
            {"name": "on_street", "titles": "On Street", "datatype": "string"},
            {"name": "species", "titles": "Species", "datatype": "string"},
            {"name": "trim_cycle", "titles": "Trim Cycle", "datatype": "string"},
            {"name": "inventory_date", "titles": "Inventory Date",
             "datatype": {"base": "date", "format": "M/d/yyyy"}},
        ],
        "primaryKey": "GID",
        "aboutUrl": "#gid-{GID}",
    },
}

ROWS = [
    ("1", "ADDISON AV", "Celtis australis", "Large Tree Routine Prune", "10/18/2010"),
    ("2", "EMERSON ST", "Liquidambar styraciflua", "Large Tree Routine Prune", "6/2/2010"),
]


def _table(order_by="GID"):
    t = parse_descriptor(TREE_OPS_DESCRIPTOR).tables[0]
    return with_order(t, order_by)


def _input_df(spark):
    return spark.createDataFrame(
        ROWS, "GID string, on_street string, species string, "
              "trim_cycle string, inventory_date string")


def test_minimal_mode_matches_reference_golden(spark):
    triples = table_to_triples(_input_df(spark), _table(), minimal=True)
    got = {(r.subj, r.pred, r.obj_lex, r.obj_kind, r.obj_dtype, r.obj_lang)
           for r in triples.collect()}

    u = "tree-ops.csv#"
    expected = set()
    for gid, street, species, cycle, _date in ROWS:
        subj = f"{u}gid-{gid}"
        expected |= {
            (subj, u + "GID", gid, "literal", "", ""),
            (subj, u + "on_street", street, "literal", "", ""),
            (subj, u + "species", species, "literal", "", ""),
            (subj, u + "trim_cycle", cycle, "literal", "", ""),
        }
    # canonicalized dates per reference golden (input.ttl:10,16)
    expected.add((u + "gid-1", u + "inventory_date", "2010-10-18", "literal", XSD + "date", ""))
    expected.add((u + "gid-2", u + "inventory_date", "2010-06-02", "literal", XSD + "date", ""))
    assert got == expected


def test_standard_mode_adds_scaffolding(spark):
    triples = table_to_triples(_input_df(spark), _table(), minimal=False)
    rows = triples.collect()
    got = {(r.subj, r.pred, r.obj_lex) for r in rows}
    by_pred = {}
    for r in rows:
        by_pred.setdefault(r.pred, []).append(r)

    # table + group scaffolding (reference input.ttl:23-47)
    assert len(by_pred[RDF + "type"]) == 4  # TableGroup, Table, 2×Row
    assert {r.obj_lex for r in by_pred[RDF + "type"]} == {
        CSVW + "TableGroup", CSVW + "Table", CSVW + "Row"}
    rownums = {(r.obj_lex, r.obj_dtype) for r in by_pred[CSVW + "rownum"]}
    assert rownums == {("1", XSD + "integer"), ("2", XSD + "integer")}
    # csvw:url of rows carries the +1 header offset: rows 1,2 → #row=2,#row=3
    urls = {r.obj_lex for r in by_pred[CSVW + "url"]}
    assert "tree-ops.csv#row=2" in urls and "tree-ops.csv#row=3" in urls
    # describes points at the aboutUrl subjects
    describes = {r.obj_lex for r in by_pred[CSVW + "describes"]}
    assert describes == {"tree-ops.csv#gid-1", "tree-ops.csv#gid-2"}
    # all minimal-mode triples still present
    assert ("tree-ops.csv#gid-1", "tree-ops.csv#GID", "1") in got


def test_required_issue_emitted(spark):
    df = spark.createDataFrame(
        [("", "X", "Y", "Z", "1/1/2020")],
        "GID string, on_street string, species string, trim_cycle string, inventory_date string")
    from csvw_rdf_convertor_spark.plans.csvw2rdf import issues
    iss = issues(df, _table(order_by="on_street")).collect()
    assert len(iss) == 1 and iss[0].column == "GID"


def test_apply_template_iris_postpass(spark):
    """templateIris=true behavior (convertor.ts:1235-1243) as an opt-in
    post-pass: IDN host decode + decodeURI on IRI terms only."""
    from pyspark.sql import functions as F

    from csvw_rdf_convertor_spark.plans.csvw2rdf import apply_template_iris
    rows = [("http://xn--mnchen-3ya.example/x%20y", "http://p/q%20r",
             "lit%20eral", "literal", "", "", ""),
            ("_:skabc", "http://p/t", "http://o/a%20b", "iri", "", "", "")]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj_lex string, obj_kind string, "
              "obj_dtype string, obj_lang string, graph string")
    out = {r.subj: r for r in apply_template_iris(df).collect()}
    assert "http://münchen.example/x y" in out
    assert out["http://münchen.example/x y"].pred == "http://p/q r"
    # literals untouched, bnodes untouched, IRI objects decoded
    assert out["http://münchen.example/x y"].obj_lex == "lit%20eral"
    assert out["_:skabc"].obj_lex == "http://o/a b"
