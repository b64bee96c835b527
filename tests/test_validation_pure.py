"""Descriptor validation (reference validation/*.ts analogues) — pure python."""

from __future__ import annotations

from csvw_rdf_convertor_spark.spec import parse_descriptor
from csvw_rdf_convertor_spark.validation import validate_group


def _issues(desc, fks=None):
    return validate_group(parse_descriptor(desc), fks)


def test_clean_descriptor_validates():
    assert _issues({
        "url": "t.csv",
        "tableSchema": {"columns": [{"name": "a", "datatype": "integer"}],
                        "primaryKey": "a"},
    }) == []


def test_missing_primary_key_column():
    out = _issues({"url": "t.csv",
                   "tableSchema": {"columns": [{"name": "a"}], "primaryKey": "zz"}})
    assert any(i.level == "error" and "zz" in i.message for i in out)


def test_unknown_datatype_and_bad_facets():
    out = _issues({"url": "t.csv", "tableSchema": {"columns": [
        {"name": "a", "datatype": "notatype"},
        {"name": "b", "datatype": {"base": "integer", "length": 3}},
        {"name": "c", "datatype": {"base": "string", "minimum": 1}},
        {"name": "d", "ordered": True},
    ]}})
    msgs = [i.message for i in out]
    assert any("unknown datatype" in m for m in msgs)
    assert any("length facets" in m for m in msgs)
    assert any("minimum/maximum" in m for m in msgs)
    assert any("ordered" in m for m in msgs)


def test_foreign_key_wiring():
    desc = {"tables": [
        {"url": "a.csv", "tableSchema": {"columns": [{"name": "id"}, {"name": "b_id"}]}},
        {"url": "b.csv", "tableSchema": {"columns": [{"name": "id"}]}},
    ]}
    ok = _issues(desc, [{"table": "a.csv", "columnReference": "b_id",
                         "reference": {"resource": "b.csv", "columnReference": "id"}}])
    assert ok == []
    bad = _issues(desc, [{"table": "a.csv", "columnReference": "nope",
                          "reference": {"resource": "c.csv", "columnReference": "id"}}])
    assert any("nope" in i.message for i in bad)
    assert any("c.csv" in i.message for i in bad)
