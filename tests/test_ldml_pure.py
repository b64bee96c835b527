"""LDML number-pattern compiler — pure-python unit tests (no Spark session),
mirroring utils/parse-number.ts:179-399 semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from csvw_rdf_convertor_spark.functions.ldml import _parse_series, compile_ldml
from csvw_rdf_convertor_spark.spec import INVALID_SENTINEL


def run(pattern, base, values):
    return list(_parse_series(pd.Series(values), pattern, base))


def test_basic_grouped_pattern():
    assert run("#,##0.0#", "decimal", ["1,234.5"]) == ["1234.5"]
    assert run("#,##0.0#", "decimal", ["1,234.56"]) == ["1234.56"]


def test_grouping_is_enforced():
    out = run("#,##0.0#", "decimal", ["12345.5", "1,2345.5"])
    assert all(v.startswith(INVALID_SENTINEL) for v in out)


def test_min_fraction_digits():
    assert run("#,##0.0#", "decimal", ["1,234"])[0].startswith(INVALID_SENTINEL)
    assert run("#,##0.0#", "decimal", ["1,234.567"])[0].startswith(INVALID_SENTINEL)


def test_min_integer_digits():
    assert run("000", "integer", ["042"]) == ["42"]
    assert run("000", "integer", ["42"])[0].startswith(INVALID_SENTINEL)


def test_prefix_suffix_literals():
    assert run("$#,##0.00", "decimal", ["$1,000.50"]) == ["1000.5"]
    assert run("$#,##0.00", "decimal", ["1,000.50"])[0].startswith(INVALID_SENTINEL)


def test_percent_scaling():
    assert run("#0%", "decimal", ["50%"]) == ["0.5"]
    assert run("#0‰", "decimal", ["250‰"]) == ["0.25"]


def test_sign_and_negative_zero():
    assert run("#0.0#", "double", ["-0.0"]) == ["-0"]
    assert run("#0", "integer", ["-7"]) == ["-7"]


def test_nulls_pass_through():
    assert run("#0", "integer", [None]) == [None]


def test_compile_cache_and_shape():
    rx, min_int, min_frac, max_frac, primary = compile_ldml("#,##0.0#")
    assert min_int == 1 and min_frac == 1 and max_frac == 2 and primary == 3
    assert compile_ldml("#,##0.0#") is not None  # cached, no error


# --- walker-port capabilities (parse-number.ts:178-399) ----------------------

def test_exponent_clause():
    assert run("##0.####e0", "double", ["1.5e3"]) == ["1500"]
    assert run("##0.####e0", "double", ["1.5e-3"]) == ["0.0015"]
    # pattern and value must agree on the exponent marker and its case
    assert run("##0.####e0", "double", ["1.5"])[0].startswith(INVALID_SENTINEL)
    assert run("##0.####E0", "double", ["1.5e3"])[0].startswith(INVALID_SENTINEL)
    assert run("#0", "double", ["1e3"])[0].startswith(INVALID_SENTINEL)


def test_exponent_signed_pattern():
    assert run("0.###e+0", "double", ["1.2e+2"]) == ["120"]
    assert run("0.###e+0", "double", ["1.2e2"])[0].startswith(INVALID_SENTINEL)


def test_sign_slot_in_pattern():
    assert run("+#0", "integer", ["+42"]) == ["42"]
    assert run("+#0", "integer", ["-42"]) == ["-42"]
    assert run("+#0", "integer", ["42"])[0].startswith(INVALID_SENTINEL)


def test_secondary_grouping_indian_style():
    assert run("#,##,##0", "integer", ["12,34,567"]) == ["1234567"]
    assert run("#,##,##0", "integer", ["1,234,567"])[0].startswith(INVALID_SENTINEL)


def test_percent_must_agree_between_pattern_and_value():
    assert run("#0", "decimal", ["50%"])[0].startswith(INVALID_SENTINEL)
    assert run("#0%", "decimal", ["50"])[0].startswith(INVALID_SENTINEL)


def test_locale_separator_chars():
    import pandas as pd
    from csvw_rdf_convertor_spark.functions.ldml import _parse_series
    out = list(_parse_series(pd.Series(["1.234,5"]), "#,##0.0#", "decimal",
                             decimal_char=",", group_char="."))
    assert out == ["1234.5"]


def test_pattern_path_emits_js_canonical_for_every_base():
    # the reference's pattern path re-emits transformedNumber+'' with no
    # integrality re-check (parse-number.ts:146) — '50%' integer → '0.5'
    assert run("#0%", "integer", ["50%"]) == ["0.5"]


def test_inf_nan_bypass_pattern():
    assert run("#0.0", "double", ["INF", "-INF", "NaN"]) == ["INF", "-INF", "NaN"]


def test_extra_digits_beyond_pattern():
    # undefined pattern slot accepts digits unless the integer has a leading 0
    assert run("0", "integer", ["1234"]) == ["1234"]
    assert run("0", "integer", ["01234"])[0].startswith(INVALID_SENTINEL)


def test_literal_suffix_containing_e():
    # a bare 'E'/'e' in literal suffix text is affix, not an exponent marker
    # (ADVICE r02: '# EUR' / '#0 kWh' used to reject valid values)
    from csvw_rdf_convertor_spark.functions.ldml import parse_ldml
    assert parse_ldml("12 EUR", "# EUR") == 12.0
    assert parse_ldml("5 kWh", "#0 kWh") == 5.0
    assert parse_ldml("7 elk", "#0 elk") == 7.0
    # real exponent clauses still parse and still require marker agreement
    assert parse_ldml("1.2e3", "#.#e#") == 1200.0
    assert parse_ldml("3E4", "#E0") == 30000.0
    assert parse_ldml("12", "#e0") is None  # pattern has exponent, value not


def test_two_decimal_separators_split_fidelity():
    # reference split()[0..1] drops the third segment: '1.2.3' parses as 1.2
    from csvw_rdf_convertor_spark.functions.ldml import parse_ldml
    assert parse_ldml("1.2.3", "#.#") == 1.2
