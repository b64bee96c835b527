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
