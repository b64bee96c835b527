"""Property-based tests (hypothesis): the numeric cell pipeline against a
python reference model, batched through one Spark action per example set."""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from csvw_rdf_convertor_spark.functions import cells
from csvw_rdf_convertor_spark.spec import INVALID_SENTINEL, ColumnSpec, DatatypeSpec


def _run_batch(spark, values, dt: DatatypeSpec):
    col = ColumnSpec(name="c", datatype=dt)
    df = spark.createDataFrame([(v,) for v in values], "c string")
    out = df.select("c", cells.cell_values(F.col("c"), col).alias("v")).collect()
    return {r.c: r.v for r in out}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=-(10**20), max_value=10**20),
                min_size=1, max_size=30, unique=True))
def test_integer_roundtrip(spark, xs):
    """Any integer lexical (incl. beyond int64) canonicalizes to str(int)."""
    values = [str(x) for x in xs] + [f"+{abs(x)}" for x in xs[:5]]
    got = _run_batch(spark, values, DatatypeSpec(base="integer"))
    for x in xs:
        assert got[str(x)] == [str(x)]
    for x in xs[:5]:
        assert got[f"+{abs(x)}"] == [str(abs(x))]


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.decimals(allow_nan=False, allow_infinity=False,
                            min_value=Decimal("-1e10"), max_value=Decimal("1e10"),
                            places=6),
                min_size=1, max_size=30, unique=True))
def test_decimal_canonicalization(spark, xs):
    """Decimal lexicals normalize: no '+', no trailing fraction zeros, and
    numeric value is preserved."""
    values = [str(x) for x in xs]
    got = _run_batch(spark, values, DatatypeSpec(base="decimal"))
    for x in xs:
        [lex] = got[str(x)]
        assert not lex.startswith(INVALID_SENTINEL), (x, lex)
        assert Decimal(lex) == x
        if "." in lex:
            assert not lex.endswith("0") and not lex.endswith(".")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(alphabet="abcxyz.,-+ ", min_size=1, max_size=12),
                min_size=1, max_size=20, unique=True))
def test_garbage_never_crashes_and_tags_invalid(spark, xs):
    """Arbitrary junk either parses as a number or gets the sentinel —
    never an exception, never silent passthrough."""
    got = _run_batch(spark, xs, DatatypeSpec(base="double"))
    for x in xs:
        v = got.get(x)
        if v is None:   # null-normalized (empty after trim → null cell)
            continue
        [lex] = v
        if lex.startswith(INVALID_SENTINEL):
            continue
        float(lex)  # must be a valid float lexical
