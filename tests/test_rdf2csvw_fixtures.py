"""The reference's own rdf2csvw conformance corpus, executed end-to-end.

Mirrors packages/core/test/rdf2csvw.test.ts: for each of the 131 fixture
dirs under test/rdf2csvwtests (manifest.json: input.ttl + csv-metadata.json
+ expected CSVs), convert the parsed triples with the real descriptor via
``plans.rdf2csvw_run.convert`` and compare row SETS keyed by column title
(test harness semantics at rdf2csvw.test.ts:109-176: rows sorted by all
columns, expected values trimmed, expected table name = result path with
the test id prefix removed).

The reference itself skips 18 ids (rdf2csvw.test.ts:31-34 — official
csvw2rdf suite entries whose warnings conflict with JSON-LD semantics).
Twelve of those still pass the row comparison here and run as ordinary
tests. The remaining six are INFORMATION-DESTROYING reversals, xfailed with
the evidence:

- 038/039: a var-free ``valueUrl`` maps every cell value to one constant
  IRI, and a cell equal to the ``null`` marker emits no triple — the
  original cell text ('value', 'string') is gone from the graph.
- 283: CSV rows "123%" and "+123%" both parse to "1.23"^^xsd:decimal — the
  two RDF rows are byte-identical, the '+' row cannot be reconstructed.
- 305/306/307: two columns share one propertyUrl, so 2 rows × 2 list cells
  flatten to 12 (or 4 rdf:Lists of) values on ONE subject — the original
  row/column partition is unrecoverable.
"""

from __future__ import annotations

import csv
import json
import os

import pytest

FIXTURE_DIR = "/root/reference/packages/core/test/rdf2csvwtests"

#: +e.id values from rdf2csvw.test.ts:31-34 (documentation; most pass here)
REFERENCE_SKIPPED = {93, 99, 101, 270, 38, 39, 195, 228, 229, 230, 283, 305,
                     306, 307, 285, 284, 259, 282}

#: the subset whose forward conversion destroyed the information the
#: expected CSV requires (see module docstring) — xfail with evidence
UNRECOVERABLE = {38, 39, 283, 305, 306, 307}

if os.path.isdir(FIXTURE_DIR):
    with open(os.path.join(FIXTURE_DIR, "manifest.json"),
              encoding="utf-8") as _f:
        _MANIFEST = json.load(_f)
else:  # pragma: no cover - reference checkout absent
    _MANIFEST = []

_PARAMS = [
    pytest.param(e, id=e["id"],
                 marks=[pytest.mark.xfail(
                     strict=True,
                     reason="information-destroying reversal, also skipped "
                            "by the reference suite (rdf2csvw.test.ts:31-34)")]
                 if int(e["id"]) in UNRECOVERABLE else [])
    for e in _MANIFEST
]


def _load_expected(result_paths: list[str]) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for p in result_paths:
        name = p.split("/", 1)[1] if "/" in p else p
        with open(os.path.join(FIXTURE_DIR, p), newline="",
                  encoding="utf-8-sig") as f:
            out[name] = [
                {k.strip(): (v or "").strip() for k, v in r.items()}
                for r in csv.DictReader(f)]
    return out


def _canon(rows: list[dict]) -> list[tuple]:
    return sorted(tuple(sorted(r.items())) for r in rows)


@pytest.mark.skipif(not _MANIFEST, reason="reference fixtures not present")
@pytest.mark.parametrize("entry", _PARAMS)
def test_rdf2csvw_fixture(spark, entry):
    from csvw_rdf_convertor_spark.plans.rdf2csvw_run import convert, triples_df
    from csvw_rdf_convertor_spark.sources.turtle_parse import parse_turtle

    fdir = os.path.join(FIXTURE_DIR, entry["id"])
    with open(os.path.join(FIXTURE_DIR, entry["action"]),
              encoding="utf-8") as f:
        ttl = f.read()
    with open(os.path.join(FIXTURE_DIR, entry["metadata"]),
              encoding="utf-8") as f:
        descriptor = json.load(f)

    def loader(url: str):
        with open(os.path.join(fdir, url), encoding="utf-8") as g:
            return json.load(g)

    tables = convert(spark, descriptor,
                     triples_df(spark, parse_turtle(ttl, base="")),
                     loader=loader)
    got = {name: [{k.strip(): (v if v is not None else "").strip()
                   for k, v in row.asDict().items()}
                  for row in df.collect()]
           for name, df in tables.items()}
    want = _load_expected(entry["result"])

    assert set(got) == set(want)
    for name in want:
        assert _canon(got[name]) == _canon(want[name]), f"table {name}"
