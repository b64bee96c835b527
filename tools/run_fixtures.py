"""Batch-run the reference's rdf2csvw conformance fixtures and report.

Usage: python tools/run_fixtures.py [id ...]   (no args = all manifest ids)

For each fixture dir (input.ttl + csv-metadata.json + expected CSVs), runs
the repo's rdf2csvw conversion driver and compares row sets the way the
reference harness does (test/rdf2csvw.test.ts:109-176): rows keyed by column
title, values trimmed, row order ignored, expected table name = result path
with the test id trimmed.
"""

from __future__ import annotations

import csv
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FIXTURE_DIR = "/root/reference/packages/core/test/rdf2csvwtests"


def load_expected(testdir: str, result_paths: list[str]) -> dict[str, list[dict]]:
    out: dict[str, list[dict]] = {}
    for p in result_paths:
        name = p.split("/", 1)[1] if "/" in p else p
        with open(os.path.join(testdir, p), newline="", encoding="utf-8-sig") as f:
            rows = [{k.strip(): (v or "").strip() for k, v in r.items()}
                    for r in csv.DictReader(f)]
        out[name] = rows
    return out


def canon(rows: list[dict]) -> list[tuple]:
    return sorted(tuple(sorted(r.items())) for r in rows)


def run_fixture(spark, entry: dict) -> tuple[bool, str]:
    from csvw_rdf_convertor_spark.plans.rdf2csvw_run import convert, triples_df
    from csvw_rdf_convertor_spark.sources.turtle_parse import parse_turtle

    fdir = os.path.join(FIXTURE_DIR, entry["id"])
    with open(os.path.join(FIXTURE_DIR, entry["action"]), encoding="utf-8") as f:
        ttl = f.read()
    with open(os.path.join(FIXTURE_DIR, entry["metadata"]), encoding="utf-8") as f:
        desc = json.load(f)

    def loader(url: str):
        with open(os.path.join(fdir, url), encoding="utf-8") as g:
            return json.load(g)

    triples = parse_turtle(ttl, base="")
    tdf = triples_df(spark, triples)
    got = {name: [{k: (v if v is not None else "") for k, v in row.asDict().items()}
                  for row in df.collect()]
           for name, df in convert(spark, desc, tdf, loader=loader).items()}
    want = load_expected(FIXTURE_DIR, entry["result"])

    if set(got) != set(want):
        return False, f"table names: got {sorted(got)} want {sorted(want)}"
    for name in want:
        g = canon([{k.strip(): v.strip() for k, v in r.items()} for r in got[name]])
        w = canon(want[name])
        if g != w:
            lines = [f"table {name}: {len(g)} rows vs expected {len(w)}"]
            for row in w:
                if row not in g:
                    lines.append(f"  missing: {row}")
            for row in g:
                if row not in w:
                    lines.append(f"  extra:   {row}")
            return False, "\n".join(lines[:12])
    return True, ""


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[4]")
             .appName("rdf2csvw-fixtures")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    with open(os.path.join(FIXTURE_DIR, "manifest.json"), encoding="utf-8") as f:
        manifest = json.load(f)
    only = set(sys.argv[1:])
    passed, failed = [], []
    for entry in manifest:
        if only and entry["id"] not in only:
            continue
        try:
            ok, msg = run_fixture(spark, entry)
        except Exception:
            ok, msg = False, "EXC " + traceback.format_exc(limit=4).strip().replace("\n", " | ")[-400:]
        (passed if ok else failed).append(entry["id"])
        if not ok:
            print(f"FAIL {entry['id']} [{entry['type']}] {entry['name']}\n     {msg}")
    print(f"\n{len(passed)}/{len(passed) + len(failed)} passed")
    if failed:
        print("failed:", " ".join(failed))


if __name__ == "__main__":
    main()
