"""F3 datatype battery — cell pipeline P1–P10 parity cases
(FIXTURES.md; reference semantics: utils/parse-number.ts, parse-date.ts,
csvw2rdf/convertor.ts:897-1177)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.functions import cells
from csvw_rdf_convertor_spark.spec import INVALID_SENTINEL, ColumnSpec, DatatypeSpec


def _run(spark, values, dt: DatatypeSpec, **colkw):
    col = ColumnSpec(name="c", datatype=dt, **colkw)
    df = spark.createDataFrame([(v,) for v in values], "c string")
    out = df.select(cells.cell_values(F.col("c"), col).alias("v")).collect()
    return [r.v for r in out]


def _one(spark, value, dt: DatatypeSpec, **colkw):
    [v] = _run(spark, [value], dt, **colkw)
    return v


def test_integer_basic_and_invalid(spark):
    res = _run(spark, ["42", "+07", "-13", "abc", "1.5"], DatatypeSpec(base="integer"))
    assert res[0] == ["42"]
    assert res[1] == ["7"]          # leading + and zeros canonicalized
    assert res[2] == ["-13"]
    assert res[3] == [INVALID_SENTINEL + "abc"]
    assert res[4] == [INVALID_SENTINEL + "1.5"]


def test_byte_range(spark):
    res = _run(spark, ["127", "128", "-128", "-129"], DatatypeSpec(base="byte"))
    assert res[0] == ["127"] and res[2] == ["-128"]
    assert res[1][0].startswith(INVALID_SENTINEL)
    assert res[3][0].startswith(INVALID_SENTINEL)


def test_unsigned_long_beyond_int64(spark):
    assert _one(spark, "18446744073709551615", DatatypeSpec(base="unsignedLong")) == \
        ["18446744073709551615"]
    assert _one(spark, "18446744073709551616", DatatypeSpec(base="unsignedLong"))[0] \
        .startswith(INVALID_SENTINEL)


def test_decimal_group_and_decimal_chars(spark):
    dt = DatatypeSpec(base="decimal", format={"decimalChar": ",", "groupChar": "."})
    assert _one(spark, "1.234,56", dt) == ["1234.56"]


def test_double_percent_and_specials(spark):
    dt = DatatypeSpec(base="double")
    assert _one(spark, "50%", dt) == ["0.5"]
    assert _one(spark, "250‰", dt) == ["0.25"]
    assert _one(spark, "INF", dt) == ["INF"]
    assert _one(spark, "-INF", dt) == ["-INF"]
    assert _one(spark, "NaN", dt) == ["NaN"]
    assert _one(spark, "-0", dt) == ["-0"]          # parse-number.ts:139
    assert _one(spark, "5", dt) == ["5"]            # JS toString: no '.0'
    assert _one(spark, "5.5", dt) == ["5.5"]


def test_ldml_pattern(spark):
    dt = DatatypeSpec(base="decimal", format={"pattern": "#,##0.0#"})
    assert _one(spark, "1,234.5", dt) == ["1234.5"]
    assert _one(spark, "12345.5", dt)[0].startswith(INVALID_SENTINEL)  # bad grouping
    assert _one(spark, "1,234", dt)[0].startswith(INVALID_SENTINEL)    # min frac 1


def test_min_max_constraints(spark):
    dt = DatatypeSpec(base="integer", minimum=0, maximum=100)
    assert _one(spark, "100", dt) == ["100"]
    assert _one(spark, "101", dt)[0].startswith(INVALID_SENTINEL)


def test_date_format_canonicalized(spark):
    dt = DatatypeSpec(base="date", format="d.M.yyyy")
    assert _one(spark, "18.10.2010", dt) == ["2010-10-18"]
    assert _one(spark, "2010-10-18", dt)[0].startswith(INVALID_SENTINEL)


def test_datetime_tz_preserved(spark):
    dt = DatatypeSpec(base="dateTime")
    assert _one(spark, "2010-10-18T12:00:00+02:00", dt) == ["2010-10-18T12:00:00+02:00"]
    assert _one(spark, "2010-10-18T12:00:00Z", dt) == ["2010-10-18T12:00:00Z"]
    assert _one(spark, "2010-10-18T12:00:00", dt) == ["2010-10-18T12:00:00"]
    # fractional seconds trimmed (convertor.ts:1074-1081)
    assert _one(spark, "2010-10-18T12:00:00.500", dt) == ["2010-10-18T12:00:00.5"]
    assert _one(spark, "2010-10-18T12:00:00.000", dt) == ["2010-10-18T12:00:00"]


def test_datetimestamp_requires_tz(spark):
    dt = DatatypeSpec(base="dateTimeStamp")
    assert _one(spark, "2010-10-18T12:00:00Z", dt) == ["2010-10-18T12:00:00Z"]
    assert _one(spark, "2010-10-18T12:00:00", dt)[0].startswith(INVALID_SENTINEL)


def test_time(spark):
    dt = DatatypeSpec(base="time")
    assert _one(spark, "14:45:05", dt) == ["14:45:05"]


def test_boolean_formats(spark):
    assert _one(spark, "Y", DatatypeSpec(base="boolean", format="Y|N")) == ["true"]
    assert _one(spark, "N", DatatypeSpec(base="boolean", format="Y|N")) == ["false"]
    assert _one(spark, "1", DatatypeSpec(base="boolean")) == ["true"]
    assert _one(spark, "yes", DatatypeSpec(base="boolean"))[0].startswith(INVALID_SENTINEL)


def test_gyear_duration_regexes(spark):
    assert _one(spark, "2010", DatatypeSpec(base="gYear")) == ["2010"]
    assert _one(spark, "20", DatatypeSpec(base="gYear"))[0].startswith(INVALID_SENTINEL)
    assert _one(spark, "P1Y2M3DT4H5M6S", DatatypeSpec(base="duration")) == ["P1Y2M3DT4H5M6S"]
    assert _one(spark, "P1S", DatatypeSpec(base="duration"))[0].startswith(INVALID_SENTINEL)


def test_base64_length_constraint(spark):
    # "aGVsbG8=" decodes to 5 bytes ("hello")
    dt = DatatypeSpec(base="base64Binary", length=5)
    assert _one(spark, "aGVsbG8=", dt) == ["aGVsbG8="]
    dt_bad = DatatypeSpec(base="base64Binary", length=4)
    assert _one(spark, "aGVsbG8=", dt_bad)[0].startswith(INVALID_SENTINEL)


def test_hexbinary_length_is_bytes(spark):
    dt = DatatypeSpec(base="hexBinary", length=2)
    assert _one(spark, "DEAD", dt) == ["DEAD"]
    assert _one(spark, "DEADBE", dt)[0].startswith(INVALID_SENTINEL)


def test_regex_format_validation(spark):
    dt = DatatypeSpec(base="string", format="[A-Z]{3}")
    assert _one(spark, "ABC", dt) == ["ABC"]
    assert _one(spark, "AB", dt)[0].startswith(INVALID_SENTINEL)


def test_whitespace_normalization_branching(spark):
    # non-string types collapse whitespace (P1); string keeps it
    assert _one(spark, "  4  2  ", DatatypeSpec(base="token")) == ["4 2"]
    assert _one(spark, " a  b ", DatatypeSpec(base="string")) == [" a  b "]
    assert _one(spark, "a\tb\nc", DatatypeSpec(base="normalizedString")) == ["a b c"]


def test_null_default_and_required(spark):
    col_kw = dict(null=("NA", "-"), default="unknown")
    assert _one(spark, "NA", DatatypeSpec(), **col_kw) is None
    assert _one(spark, "", DatatypeSpec(), **col_kw) == ["unknown"]  # default fires first
    assert _one(spark, "x", DatatypeSpec(), **col_kw) == ["x"]


def test_separator_split(spark):
    res = _one(spark, "a; b ;c", DatatypeSpec(base="token"), separator=";")
    assert res == ["a", "b", "c"]
    assert _one(spark, "", DatatypeSpec(base="token"), separator=";", null=("zzz",)) == []


def test_separator_string_keeps_spaces(spark):
    assert _one(spark, "a| b", DatatypeSpec(base="string"), separator="|", null=("@",)) \
        == ["a", " b"]
