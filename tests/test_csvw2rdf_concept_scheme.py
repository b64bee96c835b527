"""F2 concept_scheme fixture — rich mapping: multiple subjects per row,
virtual columns, lang-tagged literals, valueUrl IRI objects, prefixed-name
expansion, null handling of an optional column.

Modeled on the reference NKOD fixture
(packages/core/test/nkod/organizační-struktura/*.csv-metadata.json).
"""

from __future__ import annotations

from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
from csvw_rdf_convertor_spark.spec import RDF, parse_descriptor, with_order

SKOS = "http://www.w3.org/2004/02/skos/core#"

DESCRIPTOR = {
    "url": "https://example.org/scheme.csv",
    "tableSchema": {
        "columns": [
            {"name": "ciselnik", "aboutUrl": "{+ciselnik}",
             "propertyUrl": "rdf:type", "valueUrl": "skos:ConceptScheme",
             "datatype": "anyURI", "required": True},
            {"name": "nazev_cs", "aboutUrl": "{+ciselnik}",
             "propertyUrl": "skos:prefLabel", "lang": "cs"},
            {"name": "polozka", "aboutUrl": "{+polozka}",
             "propertyUrl": "rdf:type", "valueUrl": "skos:Concept"},
            {"name": "polozka_kod", "aboutUrl": "{+polozka}",
             "propertyUrl": "skos:notation"},
            {"name": "sirsi", "aboutUrl": "{+polozka}",
             "propertyUrl": "skos:broader", "valueUrl": "{+sirsi}",
             "required": False},
            {"name": "in_scheme", "virtual": True, "aboutUrl": "{+polozka}",
             "propertyUrl": "skos:inScheme", "valueUrl": "{+ciselnik}"},
        ],
        "primaryKey": "polozka",
    },
}

ROWS = [
    ("https://ex.org/cs1", "Číselník", "https://ex.org/cs1/item/A", "A", ""),
    ("https://ex.org/cs1", "Číselník", "https://ex.org/cs1/item/B", "B",
     "https://ex.org/cs1/item/A"),
]


def test_concept_scheme_mapping(spark):
    df = spark.createDataFrame(
        ROWS, "ciselnik string, nazev_cs string, polozka string, "
              "polozka_kod string, sirsi string")
    table = with_order(parse_descriptor(DESCRIPTOR).tables[0], "polozka")
    got = {(r.subj, r.pred, r.obj_lex, r.obj_kind, r.obj_dtype, r.obj_lang)
           for r in table_to_triples(df, table).collect()}

    cs, a, b = "https://ex.org/cs1", "https://ex.org/cs1/item/A", "https://ex.org/cs1/item/B"
    expected = {
        # scheme typing + label (two identical rows dedupe into the set)
        (cs, RDF + "type", SKOS + "ConceptScheme", "iri", "", ""),
        (cs, SKOS + "prefLabel", "Číselník", "literal", "", "cs"),
        # concepts
        (a, RDF + "type", SKOS + "Concept", "iri", "", ""),
        (b, RDF + "type", SKOS + "Concept", "iri", "", ""),
        (a, SKOS + "notation", "A", "literal", "", ""),
        (b, SKOS + "notation", "B", "literal", "", ""),
        # optional broader: only row B emits it (null cell in row A → P3)
        (b, SKOS + "broader", a, "iri", "", ""),
        # virtual membership column
        (a, SKOS + "inScheme", cs, "iri", "", ""),
        (b, SKOS + "inScheme", cs, "iri", "", ""),
    }
    assert got == expected


def test_explain_no_shuffle_beyond_rownumber(spark):
    """The conversion plan is a pure projection: the only exchange allowed is
    the row_number window sort (absent here because triples don't depend on
    it once order_by numbering is partition-local)."""
    df = spark.createDataFrame(
        ROWS, "ciselnik string, nazev_cs string, polozka string, "
              "polozka_kod string, sirsi string")
    table = with_order(parse_descriptor(DESCRIPTOR).tables[0], "polozka")
    plan = table_to_triples(df, table)._jdf.queryExecution().executedPlan().toString()
    # exactly one Exchange (for the global row_number of fixture parity); the
    # triple construction itself adds none
    assert plan.count("Exchange") <= 1
