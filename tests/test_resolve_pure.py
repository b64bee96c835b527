"""Driver-side descriptor resolution (S2/S6/S8) — pure python, no Spark."""

from __future__ import annotations

import json

from csvw_rdf_convertor_spark.sources.resolve import (
    FetchCache,
    PathOverrides,
    locate_metadata,
    resolve_descriptor,
)

META = {
    "url": "tree-ops.csv",
    "tableSchema": {"columns": [{"name": "GID"}], "aboutUrl": "#g-{GID}"},
}


def test_sidecar_metadata_discovery(tmp_path):
    csv = tmp_path / "tree-ops.csv"
    csv.write_text("GID\n1\n")
    (tmp_path / "tree-ops.csv-metadata.json").write_text(json.dumps(META))
    found = locate_metadata(str(csv))
    assert found and found.endswith("tree-ops.csv-metadata.json")
    g = resolve_descriptor(str(csv))
    assert g.tables[0].columns[0].name == "GID"
    assert g.tables[0].columns[0].aboutUrl == "#g-{GID}"


def test_directory_default_metadata(tmp_path):
    csv = tmp_path / "data.csv"
    csv.write_text("a\n1\n")
    (tmp_path / "csv-metadata.json").write_text(json.dumps(META))
    assert locate_metadata(str(csv)).endswith("csv-metadata.json")


def test_empty_schema_fallback(tmp_path):
    csv = tmp_path / "lonely.csv"
    csv.write_text("a\n1\n")
    g = resolve_descriptor(str(csv))
    assert g.tables[0].url == str(csv)
    assert g.tables[0].columns == ()


def test_path_overrides_longest_prefix():
    o = PathOverrides({"http://remote/": "/local/",
                       "http://remote/deep/": "/cache/"})
    assert o.apply("http://remote/deep/x.json") == "/cache/x.json"
    assert o.apply("http://remote/x.json") == "/local/x.json"
    assert o.apply("http://other/x") == "http://other/x"
    o2 = PathOverrides(regex_rules=[(r"^https://ex\.org/(\w+)$", r"/fix/\1.json")])
    assert o2.apply("https://ex.org/abc") == "/fix/abc.json"


def test_fetch_cache_memoizes(tmp_path):
    f = tmp_path / "m.json"
    f.write_text(json.dumps(META))
    c = FetchCache()
    a = c.load_json(str(f))
    f.write_text("{}")           # cache must shield from the rewrite
    b = c.load_json(str(f))
    assert a is b and b["url"] == "tree-ops.csv"
