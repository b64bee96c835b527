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


def test_js_decode_uri_reserved_set():
    from csvw_rdf_convertor_spark.functions.uritemplate import js_decode_uri
    # %20 decodes, reserved escapes (#$&+,/:;=?@) stay encoded — JS decodeURI
    assert js_decode_uri("http://e/a%20b%2Fc?x=%3D") == "http://e/a b%2Fc?x=%3D"
    assert js_decode_uri("no-escapes") == "no-escapes"
    # malformed escape passes through instead of raising
    assert js_decode_uri("bad%zz") == "bad%zz"


def test_idn_to_unicode():
    from csvw_rdf_convertor_spark.functions.uritemplate import idn_to_unicode
    assert idn_to_unicode("xn--mnchen-3ya.example") == "münchen.example"
    assert idn_to_unicode("plain.example") == "plain.example"


def test_template_iris_value_full():
    from csvw_rdf_convertor_spark.functions.uritemplate import template_iris_value
    out = template_iris_value("http://xn--mnchen-3ya.example/a%20b?x=1%2F2")
    assert out == "http://münchen.example/a b?x=1%2F2"
