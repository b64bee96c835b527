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
