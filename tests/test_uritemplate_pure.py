"""URI-template compiler internals — pure-python unit tests (no Spark)."""

from __future__ import annotations

import re

from csvw_rdf_convertor_spark.functions.uritemplate import (
    inverse_template_regex,
    parse_template,
    variables,
)


def test_parse_template_segments():
    parts = parse_template("http://x/{a}/y{+b}#z{#c}")
    kinds = [(k, op) for k, op, _ in parts]
    assert kinds == [("lit", "http://x/"), ("expr", ""), ("lit", "/y"),
                     ("expr", "+"), ("lit", "#z"), ("expr", "#")]


def test_variables_with_modifiers():
    assert variables("{+base}/{id:3}/{list*}") == {"base", "id", "list"}
    assert variables("no-expr") == set()


def test_inverse_regex_simple_vs_reserved():
    rx = inverse_template_regex("http://x/{a}/tail")
    m = re.match(rx, "http://x/v1/tail")
    assert m and m.group("a") == "v1"
    # simple expansion must not swallow '/'
    assert not re.match(rx, "http://x/v1/v2/tail")
    rx2 = inverse_template_regex("{+all}")
    assert re.match(rx2, "http://x/v1/v2").group("all") == "http://x/v1/v2"


def test_inverse_regex_sanitizes_group_names():
    rx = inverse_template_regex("{weird-name}")
    m = re.match(rx, "abc")
    assert m and m.group("weird_name") == "abc"
