"""rdf2csvw output formatting: inverse-template URL trimming, per-datatype
formatters, null substitution (bindings-to-row-transformation.ts:16-85,
url-trimming.ts, format-*.ts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.functions import formatters as fmt
from csvw_rdf_convertor_spark.functions.ldml import format_number_ldml
from csvw_rdf_convertor_spark.plans import rdf2csvw
from csvw_rdf_convertor_spark.spec import DatatypeSpec


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first().v


# --- trim_url ----------------------------------------------------------------

def test_trim_url_simple(spark):
    c = fmt.trim_url(F.lit("http://ex.org/region/42"),
                     "http://ex.org/region/{id}", "id")
    assert _one(spark, c) == "42"


def test_trim_url_multi_var_with_separator(spark):
    c = fmt.trim_url(F.lit("http://ex.org/a/7/f/x"),
                     "http://ex.org/a/{code}/f/{frag}", "code")
    assert _one(spark, c) == "7"
    c2 = fmt.trim_url(F.lit("http://ex.org/a/7/f/x"),
                      "http://ex.org/a/{code}/f/{frag}", "frag")
    assert _one(spark, c2) == "x"


def test_trim_url_adjacent_lazy_groups_pass_through(spark):
    # two adjacent lazy groups: the first captures '' → falsy → the
    # reference returns the raw value (url-trimming.ts:44-51 semantics)
    c = fmt.trim_url(F.lit("http://ex.org/a/7#frag-x"),
                     "http://ex.org/a/{code}{#frag}", "code")
    assert _one(spark, c) == "http://ex.org/a/7#frag-x"


def test_trim_url_no_match_returns_value(spark):
    c = fmt.trim_url(F.lit("urn:other:thing"),
                     "http://ex.org/region/{id}", "id")
    assert _one(spark, c) == "urn:other:thing"


def test_trim_url_column_absent_returns_value(spark):
    c = fmt.trim_url(F.lit("http://ex.org/region/42"),
                     "http://ex.org/region/{id}", "name")
    assert _one(spark, c) == "http://ex.org/region/42"


# --- formatters --------------------------------------------------------------

def test_format_boolean_pair(spark):
    dt = DatatypeSpec(base="boolean", format="Y|N")
    assert _one(spark, fmt.format_boolean(F.lit("true"), dt)) == "Y"
    assert _one(spark, fmt.format_boolean(F.lit("false"), dt)) == "N"
    # non-boolean lexical passes through
    assert _one(spark, fmt.format_boolean(F.lit("maybe"), dt)) == "maybe"
    # invalid format string → default true/false pair
    bad = DatatypeSpec(base="boolean", format="x|y|z")
    assert _one(spark, fmt.format_boolean(F.lit("true"), bad)) == "true"


def test_format_numeric_decimal_char(spark):
    dt = DatatypeSpec(base="decimal", format={"decimalChar": ","})
    assert _one(spark, fmt.format_numeric(F.lit("12.5"), dt)) == "12,5"
    # invalid lexical → unchanged
    assert _one(spark, fmt.format_numeric(F.lit("abc"), dt)) == "abc"


def test_format_numeric_ldml_pattern(spark):
    dt = DatatypeSpec(base="decimal", format={"pattern": "#,##0.00"})
    assert _one(spark, fmt.format_numeric(F.lit("1234.5"), dt)) == "1,234.50"


def test_format_datetime_pattern(spark):
    dt = DatatypeSpec(base="date", format="dd/MM/yyyy")
    assert _one(spark, fmt.format_datetime(F.lit("2015-03-09"), dt)) == "09/03/2015"
    dt2 = DatatypeSpec(base="dateTime", format="yyyy-MM-dd HH:mm")
    assert _one(spark, fmt.format_datetime(
        F.lit("2015-03-09T14:30:00"), dt2)) == "2015-03-09 14:30"
    # offset preserved verbatim when the pattern has no zone tokens
    assert _one(spark, fmt.format_datetime(
        F.lit("2015-03-09T14:30:00Z"), dt2)) == "2015-03-09 14:30Z"
    # invalid lexical → unchanged
    assert _one(spark, fmt.format_datetime(F.lit("tuesday"), dt)) == "tuesday"


# --- pure LDML formatting ------------------------------------------------------

@pytest.mark.parametrize("num,pattern,expect", [
    (1234.5, "#,##0.00", "1,234.50"),
    (0.25, "#.##", "0.25"),
    (1234567.0, "#,##0", "1,234,567"),
    (-42.0, "0.0", "-42.0"),
    (-42.0, "0.0;(0.0)", "(42.0)"),
    (0.5, "0%", "50%"),
    (12.0, "¤0.00", "¤12.00"),
])
def test_format_number_ldml(num, pattern, expect):
    assert format_number_ldml(num, pattern) == expect


def test_format_number_ldml_separators():
    assert format_number_ldml(1234.5, "#,##0.00", group_char=" ",
                              decimal_char=",") == "1 234,50"


# --- match_patterns with formatting -------------------------------------------

def test_match_patterns_trim_format_null(spark):
    rows = [
        ("s1", "urn:t#region", "urn:region-3", "iri"),
        ("s1", "urn:t#flag", "true", "literal"),
        ("s2", "urn:t#region", "urn:region-7", "iri"),
        ("s2", "urn:t#flag", "false", "literal"),
        ("s1", "urn:t#note", "hello", "literal"),
    ]
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj_lex string, obj_kind string")
    pats = [
        rdf2csvw.TriplePattern("region", "urn:t#region", required=True,
                               valueUrl="urn:region-{region}",
                               datatype=DatatypeSpec(base="integer")),
        rdf2csvw.TriplePattern("flag", "urn:t#flag",
                               datatype=DatatypeSpec(base="boolean", format="Y|N")),
        rdf2csvw.TriplePattern("note", "urn:t#note", null=("NONE",)),
    ]
    out = {r.subj: r for r in rdf2csvw.match_patterns(triples, pats).collect()}
    assert out["s1"].region == "3" and out["s2"].region == "7"
    assert out["s1"].flag == "Y" and out["s2"].flag == "N"
    assert out["s1"].note == "hello" and out["s2"].note == "NONE"


def test_match_patterns_rdf_type_trims_about_template(spark):
    rows = [("s1", rdf2csvw.RDF_TYPE, "http://ex.org/type/City", "iri")]
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj_lex string, obj_kind string")
    pats = [rdf2csvw.TriplePattern("kind", rdf2csvw.RDF_TYPE,
                                   table_about="http://ex.org/type/{kind}")]
    assert rdf2csvw.match_patterns(triples, pats).first().kind == "City"
