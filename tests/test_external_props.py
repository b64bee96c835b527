"""T8: external (non-CSVW) descriptor annotations — tree-ops style
(reference golden: test/rdf2csvwtests/011/input.ttl:23-47)."""

from __future__ import annotations

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.functions.terms import skolem_value
from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
from csvw_rdf_convertor_spark.plans.external_props import external_triples
from csvw_rdf_convertor_spark.spec import XSD, parse_descriptor, with_order

DC = "http://purl.org/dc/terms/"
DCAT = "http://www.w3.org/ns/dcat#"
SCHEMA_ORG = "http://schema.org/"

DESCRIPTOR = {
    "url": "tree-ops.csv",
    "dc:title": "Tree Operations",
    "dcat:keyword": ["tree", "street", "maintenance"],
    "dc:publisher": {
        "schema:name": "Example Municipality",
        "schema:url": {"@id": "http://example.org"},
    },
    "dc:license": {"@id": "http://opendefinition.org/licenses/cc-by/"},
    "dc:modified": {"@value": "2010-12-31", "@type": "xsd:date"},
    "tableSchema": {
        "aboutUrl": "#gid-{GID}",
        "columns": [{"name": "GID"}],
    },
}


def test_external_props_collected():
    t = parse_descriptor(DESCRIPTOR).tables[0]
    keys = {k for k, _ in t.external}
    assert keys == {"dc:title", "dcat:keyword", "dc:publisher", "dc:license",
                    "dc:modified"}


def test_external_triples_shapes():
    t = parse_descriptor(DESCRIPTOR).tables[0]
    node = skolem_value("tree-ops.csv", "table")
    trip = set(external_triples(t.external, node, default_lang="en"))
    assert (node, DC + "title", "Tree Operations", "literal", "", "en", "") in trip
    for kw in ("tree", "street", "maintenance"):
        assert (node, DCAT + "keyword", kw, "literal", "", "en", "") in trip
    assert (node, DC + "license", "http://opendefinition.org/licenses/cc-by/",
            "iri", "", "", "") in trip
    assert (node, DC + "modified", "2010-12-31", "literal", XSD + "date",
            "", "") in trip
    # nested publisher → deterministic skolem child
    pubs = [x for x in trip if x[1] == DC + "publisher"]
    assert len(pubs) == 1 and pubs[0][3] == "bnode"
    child = pubs[0][2]
    assert (child, SCHEMA_ORG + "name", "Example Municipality",
            "literal", "", "en", "") in trip
    assert (child, SCHEMA_ORG + "url", "http://example.org", "iri", "", "", "") in trip


def test_standard_mode_unions_external(spark):
    df = spark.createDataFrame([("1",)], "GID string")
    table = with_order(parse_descriptor(DESCRIPTOR).tables[0], "GID")
    got = table_to_triples(df, table, minimal=False, default_lang="en")
    titles = got.where(F.col("pred") == DC + "title").collect()
    assert len(titles) == 1 and titles[0].obj_lex == "Tree Operations"
    assert titles[0].subj == skolem_value("tree-ops.csv", "table")
    # minimal mode omits them (conversion-options.ts:39)
    minimal = table_to_triples(df, table, minimal=True)
    assert minimal.where(F.col("pred") == DC + "title").count() == 0


def test_group_level_external_props(spark):
    """T8 at TableGroup scope (convertor.ts:177-211): namespaced group
    annotations re-emit on the group node in standard mode."""
    from csvw_rdf_convertor_spark.plans.csvw2rdf import group_to_triples
    group = parse_descriptor({
        "dc:title": "My Group",
        "dcat:keyword": ["a", "b"],
        "tables": [{
            "url": "t.csv",
            "order_by": "GID",
            "tableSchema": {"aboutUrl": "#g-{GID}",
                            "columns": [{"name": "GID"}]},
        }],
    })
    assert dict(group.external)["dc:title"] == "My Group"
    df = spark.createDataFrame([("1",), ("2",)], "GID string")
    out = group_to_triples({"t.csv": df}, group, minimal=False)
    rows = [r for r in out.collect() if r.subj == "_:skgroup"]
    preds = {r.pred for r in rows}
    assert DC + "title" in preds and DCAT + "keyword" in preds
    title = [r for r in rows if r.pred == DC + "title"][0]
    assert title.obj_lex == "My Group" and title.obj_kind == "literal"
    # minimal mode suppresses them (reference: !options.minimal guard)
    none = group_to_triples({"t.csv": df}, group, minimal=True)
    assert none.where(F.col("subj") == "_:skgroup").count() == 0


def test_row_titles_emit_csvw_title(spark):
    """T7 rowTitles → csvw:title with column language (convertor.ts:650-667);
    empty values are skipped (the reference's truthy check)."""
    desc = {
        "url": "urn:t",
        "tableSchema": {
            "aboutUrl": "#r-{id}",
            "rowTitles": ["name"],
            "columns": [{"name": "id"},
                        {"name": "name", "lang": "en", "null": [""]}],
        },
    }
    table = with_order(parse_descriptor(desc).tables[0], "id")
    df = spark.createDataFrame([("1", "Alpha"), ("2", "")], "id string, name string")
    out = table_to_triples(df, table, minimal=False)
    titles = out.where(F.col("pred") == "http://www.w3.org/ns/csvw#title").collect()
    assert len(titles) == 1
    assert titles[0].obj_lex == "Alpha" and titles[0].obj_lang == "en"
    # unknown rowTitles entry is skipped silently (no rowRecord binding)
    desc["tableSchema"]["rowTitles"] = ["nosuch"]
    table2 = with_order(parse_descriptor(desc).tables[0], "id")
    out2 = table_to_triples(df, table2, minimal=False)
    assert out2.where(F.col("pred") == "http://www.w3.org/ns/csvw#title").count() == 0
