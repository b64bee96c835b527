"""r6 equivalence battery: the trim-based decimal/datetime canonicalization
(functions/cells.py) must be byte-identical to the regex formulation it
replaced (the r6 optimization measured the old 3-regex + double-reparse
chain at ~5× the cost of the whole decimal parse)."""

import pytest
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.functions import cells
from csvw_rdf_convertor_spark.spec import DatatypeSpec

DEC_EDGE = ["1", "+1", "-1", "0", "-0", "-0.0", "00.100", "1.", ".5",
            "+.5", "-.5", ".", "+", "-", "", "1..2", ".+5", "5.+", "1+2",
            "5-2", "+0.000", "123.4500000000", "999999999999999999999.5",
            "0.0000000001", "-00012.3400", "-000", "007", "1e5", "INF",
            "NaN", "abc", "  1", "1 ", "25%", "-50%", "12‰", "%5", "‰40",
            "0%", "-0%", "3.14159", "10.010", "100.000"]

DT_EDGE = ["2020-01-01 00:00:00", "2020-01-01T00:00:05",
           "2020-01-01T00:00:05.500", "2020-01-01T00:00:10.000",
           "2020-01-01T00:00:10.120", "2020-01-31 23:59:59.999",
           "2020-06-30 10:20:30.000001", "2020-02-29 01:02:03",
           "1969-12-31 23:59:59", "0400-01-01 10:00:00.100",
           "2020-01-01 10:00:00Z", "2020-01-01 10:00:00+05:30",
           "2020-01-01 10:00:00-0230", "2020-01-01 10:00:00+14",
           "2020-01-01 10:00:00Z ", "2020-01-01 10:00:00+05",
           "2020-01-01 10:00:00 +05:30", "2020-01-01 10:00:00\t",
           "2020-01-01 10:00:00-05:30", "Z", "+05:30",
           "bad", ""]

TIME_EDGE = ["00:00:00", "23:59:59.999", "10:20:30.500", "10:20:30.000",
             "07:08:09.120", "1:2:3", "bad", ""]


def _old_decimal(value, dt):
    """The pre-r6 regex formulation of the decimal parse, verbatim."""
    p = cells.numeric_parts(value, dt)
    core, pct, pml, grp_ok = p["core"], p["pct"], p["pml"], p["grp_ok"]
    ok = core.rlike(f"^{cells.DECIMAL_RE}$")
    num = core.cast("decimal(38,10)")
    num = F.when(pct, num / 100).when(pml, num / 1000).otherwise(num)
    s = num.cast("string")
    out = F.regexp_replace(s, r"^\+", "")
    out = F.regexp_replace(out, r"(\.\d*?)0+$", "$1")
    out = F.regexp_replace(out, r"\.$", "")
    lex = F.when((out.cast("double") == 0) & core.startswith("-")
                 & ~out.startswith("-"),
                 F.concat(F.lit("-"), out)).otherwise(out)
    ok = ok & grp_ok
    return F.when(ok & num.isNotNull(), lex).otherwise(
        F.concat(F.lit("@@invalid@@"), value))


_OLD_TZ = r"(Z|[+-]\d{2}:?\d{2}|[+-]\d{2})\s*$"


def _old_extract_tz(value):
    """Pre-r6 whole-string tz extraction + regex-shape normalization."""
    tz = F.regexp_extract(value, _OLD_TZ, 1)
    local = F.when(tz != "", F.regexp_replace(value, _OLD_TZ, "")).otherwise(value)
    norm = (
        F.when(tz == "Z", F.lit("Z"))
        .when(tz.rlike(r"^[+-]\d{4}$"),
              F.concat(tz.substr(1, 3), F.lit(":"), tz.substr(4, 2)))
        .when(tz.rlike(r"^[+-]\d{2}$"), F.concat(tz, F.lit(":00")))
        .otherwise(tz)
    )
    return local, norm


def _old_datetime(value, dt):
    """The pre-r6 two-date_format + regex fraction formulation, verbatim,
    over the pre-r6 whole-string tz extraction."""
    local, tz = _old_extract_tz(value)
    base = "dateTime" if dt.base == "datetime" else dt.base
    if base == "time":
        ts = (
            F.when(local.rlike(r"\.\d{6}$"),
                   F.try_to_timestamp(local, F.lit("HH:mm:ss.SSSSSS")))
            .when(local.rlike(r"\.\d{3}$"),
                  F.try_to_timestamp(local, F.lit("HH:mm:ss.SSS")))
            .otherwise(F.try_to_timestamp(local, F.lit("HH:mm:ss")))
        )
    else:
        ts = (
            F.when(local.rlike(r"\.\d{6}$"),
                   F.try_to_timestamp(local, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")))
            .when(local.rlike(r"\.\d{3}$"),
                  F.try_to_timestamp(local, F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")))
            .when(local.contains("T"),
                  F.try_to_timestamp(local, F.lit("yyyy-MM-dd'T'HH:mm:ss")))
            .otherwise(F.try_to_timestamp(local, F.lit("yyyy-MM-dd HH:mm:ss")))
        )
    has_tz = tz != ""
    frac = F.regexp_replace(F.date_format(ts, ".SSS"), r"0+$", "")
    frac = F.when(frac == ".", F.lit("")).otherwise(frac)
    if base == "time":
        lex = F.concat(F.date_format(ts, "HH:mm:ss"), frac)
    else:
        lex = F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss"), frac)
    lex = F.when(has_tz, F.concat(lex, tz)).otherwise(lex)
    return F.when(ts.isNotNull(), lex).otherwise(
        F.concat(F.lit("@@invalid@@"), value))


@pytest.mark.parametrize("fmt", [None, {"decimalChar": ",", "groupChar": "."}])
def test_decimal_canon_matches_regex_form(spark, fmt):
    dt = DatatypeSpec(base="decimal", format=fmt)
    vals = DEC_EDGE + (["1.234,50", "1.000.000,25", ",5", "5,", "1..2"]
                       if fmt else [])
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    # compare COLLECTED outputs (a fused new-vs-old filter predicate would
    # let subexpression elimination hoist the guarded ANSI cast)
    new = df.select("v", cells.parse_number(F.col("v"), dt).alias("o")).collect()
    old = df.select("v", _old_decimal(F.col("v"), dt).alias("o")).collect()
    assert [(r.v, r.o) for r in new] == [(r.v, r.o) for r in old]


def test_integer_percent_canon_matches_regex_form(spark):
    dt = DatatypeSpec(base="integer")
    vals = ["500%", "50%", "-50%", "0%", "-0%", "12‰", "-0", "007", "%25"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    old_dt = DatatypeSpec(base="decimal")  # not comparable — use spot values
    out = {r.v: r.o for r in df.select(
        "v", cells.parse_number(F.col("v"), dt).alias("o")).collect()}
    assert out["500%"] == "5"
    assert out["50%"] == "0.5"
    assert out["-50%"] == "-0.5"
    assert out["0%"] == "0"
    assert out["-0%"] == "-0"
    assert out["12‰"] == "0.012"
    assert out["-0"] == "-0"
    assert out["007"] == "7"


@pytest.mark.parametrize("base,vals", [
    ("dateTime", DT_EDGE), ("time", TIME_EDGE)])
def test_datetime_canon_matches_regex_form(spark, base, vals):
    dt = DatatypeSpec(base=base)
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    new = df.select("v", cells.parse_datetime(F.col("v"), dt).alias("o")).collect()
    old = df.select("v", _old_datetime(F.col("v"), dt).alias("o")).collect()
    assert [(r.v, r.o) for r in new] == [(r.v, r.o) for r in old]


def test_double_positional_strip(spark):
    """_strip_frac_zeros feeds the double positional zone — from-decimal
    strings only (never scientific); spot-check canonical outputs."""
    dt = DatatypeSpec(base="double")
    vals = {"1.5": "1.5", "1.50": "1.5", "0.125": "0.125", "2": "2",
            "-0": "-0", "1e-5": "0.00001", "123.000": "123",
            "0.1": "0.1", "1e20": "100000000000000000000"}
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    out = {r.v: r.o for r in df.select(
        "v", cells.parse_number(F.col("v"), dt).alias("o")).collect()}
    assert out == vals
