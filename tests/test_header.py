"""Header-driven column naming (P11 default path, convertor.ts:409-592) and
language-map title rules (convertor.ts:471-478, 566-588)."""

from __future__ import annotations

import pytest

from csvw_rdf_convertor_spark.sources.header import (apply_csv_header,
                                                     merge_header_into_table)
from csvw_rdf_convertor_spark.sources.resolve import resolve_with_header
from csvw_rdf_convertor_spark.spec import parse_descriptor, parse_table


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


# --- header → names ---------------------------------------------------------

def test_bare_csv_header_names(tmp_path):
    path = _write(tmp_path, "t.csv",
                  "nation key,n-name,region key\n0,ALGERIA,0\n")
    tg = resolve_with_header(path)
    names = [c.name for c in tg.tables[0].columns]
    # percent-encoded, '-' → %2D (convertor.ts:589)
    assert names == ["nation%20key", "n%2Dname", "region%20key"]
    assert tg.tables[0].columns[0].titles == ("nation key",)


def test_multi_row_header_merges_titles(tmp_path):
    path = _write(tmp_path, "t.csv", "id,name\nident,label\n1,x\n")
    raw = {"url": path, "dialect": {"headerRowCount": 2},
           "tableSchema": {"columns": []}}
    apply_csv_header(raw, path)
    cols = raw["tableSchema"]["columns"]
    assert cols[0]["titles"] == ["id", "ident"]
    assert cols[1]["titles"] == ["name", "label"]
    t = parse_table(raw)
    assert [c.name for c in t.columns] == ["id", "name"]  # first title wins


def test_no_header_no_columns_peeks_data_row(tmp_path):
    path = _write(tmp_path, "t.csv", "1,2,3\n4,5,6\n")
    raw = {"url": path, "dialect": {"header": False},
           "tableSchema": {"columns": []}}
    apply_csv_header(raw, path)
    t = parse_table(raw)
    assert [c.name for c in t.columns] == ["_col.1", "_col.2", "_col.3"]


def test_partial_descriptor_extended_by_header(tmp_path):
    path = _write(tmp_path, "t.csv", "a,b,c\n1,2,3\n")
    raw = {"url": path,
           "tableSchema": {"columns": [{"name": "given", "datatype": "integer"}]}}
    apply_csv_header(raw, path)
    t = parse_table(raw)
    assert [c.name for c in t.columns] == ["given", "b", "c"]
    # descriptor-given column keeps its datatype, gains the header title
    assert t.columns[0].datatype.base == "integer"
    assert t.columns[0].titles == ("a",)


def test_duplicate_header_names_raise(tmp_path):
    path = _write(tmp_path, "t.csv", "x,x\n1,2\n")
    raw = {"url": path, "tableSchema": {"columns": []}}
    apply_csv_header(raw, path)
    with pytest.raises(ValueError, match="duplicate column name"):
        parse_table(raw)


def test_empty_header_cell_falls_back_to_col_n(tmp_path):
    path = _write(tmp_path, "t.csv", "a,,c\n1,2,3\n")
    raw = {"url": path, "tableSchema": {"columns": []}}
    apply_csv_header(raw, path)
    t = parse_table(raw)
    assert [c.name for c in t.columns] == ["a", "_col.2", "c"]


def test_skip_columns_header_slice(tmp_path):
    path = _write(tmp_path, "t.csv", "junk,a,b\n0,1,2\n")
    raw = {"url": path, "dialect": {"skipColumns": 1},
           "tableSchema": {"columns": []}}
    apply_csv_header(raw, path)
    t = parse_table(raw)
    assert [c.name for c in t.columns] == ["a", "b"]


def test_header_merge_into_language_map():
    raw = {"url": "t.csv",
           "tableSchema": {"columns": [{"titles": {"@none": "old"}}]}}
    merge_header_into_table(raw, [["old"], ["new"]], default_lang="en")
    # @none promoted to en first, then 'old' dedups, 'new' appends
    assert raw["tableSchema"]["columns"][0]["titles"] == {"en": ["old", "new"]}


# --- language-map title naming (convertor.ts:471-478, 566-588) --------------

def test_language_map_default_lang_names():
    d = {"@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
         "url": "t.csv",
         "tableSchema": {"columns": [
             {"titles": {"en": "Title", "de": "Titel"}},
             {"titles": {"de": "NurDeutsch"}},
             {"titles": {"en-US": "Color", "de": "Farbe"}},
             {"titles": {"@none": "Plain"}},
         ]}}
    t = parse_descriptor(d).tables[0]
    names = [c.name for c in t.columns]
    # en wins; de-only is NOT name-eligible → _col.N; en-US prefix-matches
    # en; @none promotes to the default language
    assert names == ["Title", "_col.2", "Color", "Plain"]
    # flattening puts default-language titles first
    assert t.columns[0].titles == ("Title", "Titel")


def test_table_lang_overrides_context_lang():
    d = {"@context": ["http://www.w3.org/ns/csvw", {"@language": "en"}],
         "url": "t.csv", "lang": "de",
         "tableSchema": {"columns": [{"titles": {"en": "Title", "de": "Titel"}}]}}
    t = parse_descriptor(d).tables[0]
    assert t.columns[0].name == "Titel"


def test_string_and_array_titles_always_name_eligible():
    d = {"url": "t.csv",
         "tableSchema": {"columns": [
             {"titles": "plain title"},
             {"titles": ["first", "second"]},
         ]}}
    t = parse_descriptor(d).tables[0]
    assert [c.name for c in t.columns] == ["plain%20title", "first"]


# --- end-to-end over Spark ---------------------------------------------------

def test_descriptorless_csv_to_triples(spark, tmp_path):
    from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
    from csvw_rdf_convertor_spark.sources.csv_source import read_csv
    from csvw_rdf_convertor_spark.spec import with_order

    path = _write(tmp_path, "nation.csv",
                  "key,n-name\n1,ALGERIA\n2,BRAZIL\n")
    tg = resolve_with_header(path)
    table = with_order(tg.tables[0], "key")
    df = read_csv(spark, path, table)
    rows = table_to_triples(df, table).collect()
    preds = {r.pred for r in rows}
    assert preds == {f"{path}#key", f"{path}#n%2Dname"}
    # default (no aboutUrl) subjects: one skolem bnode per row
    assert len({r.subj for r in rows}) == 2
    assert {r.obj_lex for r in rows} == {"1", "2", "ALGERIA", "BRAZIL"}
