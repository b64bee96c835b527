"""Descriptor→pattern compiler with object-subject chains (J1).

Reference: rdf2csvw/create-query.ts — var assignment :83-98 (one variable
per distinct aboutUrl/valueUrl template ⇒ chained columns share it),
recursion :470-501 (columns whose aboutUrl equals another column's valueUrl
are matched inside that column's group).
"""

from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.plans import rdf2csvw
from csvw_rdf_convertor_spark.spec import parse_descriptor

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

CHAIN_DESC = {
    "url": "urn:nr",
    "tableSchema": {
        "aboutUrl": "urn:nation#{n_nationkey}",
        "columns": [
            {"name": "n_name", "propertyUrl": "urn:n#name", "required": True},
            # FK column: its own name is the template variable, so the IRI
            # trims back to the key cell value (url-trimming.ts:20-44)
            {"name": "n_regionkey", "propertyUrl": "urn:n#region",
             "valueUrl": "urn:region#{n_regionkey}"},
            # chained: this column's aboutUrl IS the previous valueUrl
            {"name": "r_name", "aboutUrl": "urn:region#{n_regionkey}",
             "propertyUrl": "urn:r#name"},
        ],
    },
}


def _triples(spark):
    rows = [
        # nations: subj, name, region link
        ("urn:nation#1", "urn:n#name", "ALGERIA", "literal"),
        ("urn:nation#1", "urn:n#region", "urn:region#0", "iri"),
        ("urn:nation#2", "urn:n#name", "BRAZIL", "literal"),
        ("urn:nation#2", "urn:n#region", "urn:region#1", "iri"),
        # nation with a dangling region (no region triples)
        ("urn:nation#3", "urn:n#name", "ATLANTIS", "literal"),
        ("urn:nation#3", "urn:n#region", "urn:region#9", "iri"),
        # regions
        ("urn:region#0", "urn:r#name", "AFRICA", "literal"),
        ("urn:region#1", "urn:r#name", "AMERICA", "literal"),
        # noise: similar predicate on a non-template subject
        ("urn:other#x", "urn:n#name", "NOPE-WRONG-SUBJ", "literal"),
    ]
    return (spark.createDataFrame(
        rows, "subj string, pred string, obj_lex string, obj_kind string")
        .withColumn("obj_dtype", F.lit(""))
        .withColumn("obj_lang", F.lit(""))
        .withColumn("graph", F.lit("")))


def test_compiler_shares_variable_across_chain():
    table = parse_descriptor(CHAIN_DESC).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    by_name = {c.name: c for c in cols}
    # n_region's value variable == r_name's subject variable (the chain)
    region_var = by_name["n_regionkey"].var
    root_by_pred = {r.pred: r for r in roots}
    # r_name is NOT top-level: it is referenced via the chain
    assert "urn:r#name" not in root_by_pred
    chain_root = root_by_pred["urn:n#region"]
    assert chain_root.obj_var == region_var
    assert len(chain_root.children) == 1
    assert chain_root.children[0].pred == "urn:r#name"
    assert chain_root.children[0].subj_var == region_var


def test_chain_query_joins_object_to_subject(spark):
    table = parse_descriptor(CHAIN_DESC).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    out = rdf2csvw.match_table_query(_triples(spark), cols, roots)
    rows = {(r.n_name, r.n_regionkey, r.r_name) for r in out.collect()}
    # valueUrl trimming turns 'urn:region#0' back into the cell value '0';
    # the dangling region chain (OPTIONAL group) leaves r_name at null->''
    assert rows == {
        ("ALGERIA", "0", "AFRICA"),
        ("BRAZIL", "1", "AMERICA"),
        ("ATLANTIS", "9", ""),
    }


def test_subject_template_regex_excludes_foreign_subjects(spark):
    table = parse_descriptor(CHAIN_DESC).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    out = rdf2csvw.match_table_query(_triples(spark), cols, roots)
    assert not [r for r in out.collect() if r.n_name == "NOPE-WRONG-SUBJ"]


def test_type_column_group(spark):
    desc = {
        "url": "urn:t",
        "tableSchema": {
            "aboutUrl": "urn:item#{id}",
            "columns": [
                {"name": "subj", "propertyUrl": "rdf:type",
                 "valueUrl": "urn:t#Item", "required": True},
                {"name": "label", "propertyUrl": "urn:t#label"},
            ],
        },
    }
    table = parse_descriptor(desc).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    # the type column owns the group: label is matched inside it
    assert len(roots) == 1 and roots[0].obj_iri == "urn:t#Item"
    assert [c.pred for c in roots[0].children] == ["urn:t#label"]
    t = (_triples(spark).sparkSession.createDataFrame(
        [("urn:item#7", RDF_TYPE, "urn:t#Item", "iri"),
         ("urn:item#7", "urn:t#label", "seven", "literal"),
         ("urn:item#8", RDF_TYPE, "urn:t#Other", "iri"),
         ("urn:item#8", "urn:t#label", "eight", "literal")],
        "subj string, pred string, obj_lex string, obj_kind string")
        .withColumn("obj_dtype", F.lit("")).withColumn("obj_lang", F.lit(""))
        .withColumn("graph", F.lit("")))
    out = rdf2csvw.match_table_query(t, cols, roots)
    rows = {(r.subj, r.label) for r in out.collect()}
    # type column outputs the SUBJECT variable; wrong-typed subjects excluded
    assert rows == {("urn:item#7", "seven")}


def test_type_column_without_abouturl_binds_siblings(spark):
    """ADVICE r3 (medium): a type column with NO aboutUrl must not claim
    sibling aboutUrl-less columns as referenced — build() only collects
    children under a truthy aboutUrl, so their vars were never bound and
    match_table_query raised an unresolved-column error. With the
    create-query.ts:108-111 truthiness guard they become their own roots
    joined on the shared subject variable."""
    desc = {
        "url": "urn:t",
        "tableSchema": {
            "columns": [
                {"name": "subj", "propertyUrl": "rdf:type",
                 "valueUrl": "urn:t#Item"},
                {"name": "label", "propertyUrl": "urn:t#label"},
            ],
        },
    }
    table = parse_descriptor(desc).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    # both columns are roots sharing one subject variable
    assert len(roots) == 2
    assert len({r.subj_var for r in roots}) == 1
    t = (spark.createDataFrame(
        [("urn:item#7", RDF_TYPE, "urn:t#Item", "iri"),
         ("urn:item#7", "urn:t#label", "seven", "literal"),
         ("urn:item#8", RDF_TYPE, "urn:t#Other", "iri"),
         ("urn:item#8", "urn:t#label", "eight", "literal")],
        "subj string, pred string, obj_lex string, obj_kind string")
        .withColumn("obj_dtype", F.lit("")).withColumn("obj_lang", F.lit(""))
        .withColumn("graph", F.lit("")))
    out = rdf2csvw.match_table_query(t, cols, roots)
    rows = {(r.subj, r.label) for r in out.collect()}
    # all-optional seed admits subjects matching ANY root: item#8 is seeded
    # by the label pattern (reference's per-column optional-subjects UNION),
    # but the type-root seed itself only admits correctly-typed subjects
    assert rows == {("urn:item#7", "seven"), ("urn:item#8", "eight")}


def test_all_optional_seed_keeps_type_constraint(spark):
    """ADVICE r3 (low): the all-optional seed must carry each root's
    obj_iri constraint — a wrong-typed subject with NO other pattern match
    must not be admitted as an all-empty row."""
    desc = {
        "url": "urn:t",
        "tableSchema": {
            "aboutUrl": "urn:item#{id}",
            "columns": [
                {"name": "subj", "propertyUrl": "rdf:type",
                 "valueUrl": "urn:t#Item"},
            ],
        },
    }
    table = parse_descriptor(desc).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    t = (spark.createDataFrame(
        [("urn:item#7", RDF_TYPE, "urn:t#Item", "iri"),
         ("urn:item#8", RDF_TYPE, "urn:t#Other", "iri")],
        "subj string, pred string, obj_lex string, obj_kind string")
        .withColumn("obj_dtype", F.lit("")).withColumn("obj_lang", F.lit(""))
        .withColumn("graph", F.lit("")))
    out = rdf2csvw.match_table_query(t, cols, roots)
    assert {r.subj for r in out.collect()} == {"urn:item#7"}


def test_cartesian_guard_refuses_two_big_sides(spark, monkeypatch):
    """Disconnected-root cartesians are refused when both sides are
    data-sized (plans/rdf2csvw._guarded_cross; VERDICT r3 scale note)."""
    import pytest

    from csvw_rdf_convertor_spark.plans import rdf2csvw as mod

    monkeypatch.setattr(mod, "CARTESIAN_GUARD_ROWS", 5)
    big = spark.range(10).toDF("a")
    big2 = spark.range(10).toDF("b")
    small = spark.range(2).toDF("c")
    # one small side: broadcast nested loop, allowed
    assert mod._guarded_cross(big, small).count() == 20
    with pytest.raises(ValueError, match="cartesian"):
        mod._guarded_cross(big, big2)


def test_numeric_filter_tolerates_non_numeric_lexicals(spark):
    """A min/max-constrained numeric column must FILTER a non-numeric
    lexical (SPARQL type-error → false, like the reference's FILTER over
    xsd casts), not throw CAST_INVALID_INPUT for the whole job — under
    ANSI-on Spark 4 the bound check is a predicate-slice CONDITION, so the
    cast must be try_cast (CLAUDE.md cast rule)."""
    desc = {
        "url": "urn:m",
        "tableSchema": {
            "aboutUrl": "urn:m#{id}",
            "columns": [
                {"name": "id", "propertyUrl": "urn:m#id", "required": True},
                {"name": "n", "propertyUrl": "urn:m#n",
                 "datatype": {"base": "integer", "minimum": 0}},
            ],
        },
    }
    rows = [
        ("urn:m#a", "urn:m#id", "a", "literal"),
        ("urn:m#a", "urn:m#n", "3", "literal"),
        ("urn:m#b", "urn:m#id", "b", "literal"),
        ("urn:m#b", "urn:m#n", "n/a", "literal"),   # non-numeric lexical
        ("urn:m#c", "urn:m#id", "c", "literal"),
        ("urn:m#c", "urn:m#n", "-2", "literal"),    # violates minimum
    ]
    t = (spark.createDataFrame(
        rows, "subj string, pred string, obj_lex string, obj_kind string")
        .withColumn("obj_dtype", F.lit(""))
        .withColumn("obj_lang", F.lit(""))
        .withColumn("graph", F.lit("")))
    table = parse_descriptor(desc).tables[0]
    cols, roots = rdf2csvw.compile_table_query(table)
    out = rdf2csvw.match_table_query(t, cols, roots)
    # b (unparseable) and c (violating) both drop the whole row — the
    # constraint makes the pattern effectively required
    assert {(r.id, r.n) for r in out.collect()} == {("a", "3")}
