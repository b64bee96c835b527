"""Decompose the csvw2rdf_lineitem mapping cost by datatype family.

Runs the SAME lineitem input through descriptor variants that isolate each
cell-pipeline cost (strings only / integers / decimals / datetime / full),
plus a raw-scan floor and the N-Triples serialization delta, on a
taskset-pinned 2-core JVM (the reproducible protocol). Each number is the
median of 3 warm runs (first run discarded as compile/JIT).

Usage:  taskset -c 0-1 python tools/mapping_profile.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _desc(cols):
    return {"url": "urn:li",
            "tableSchema": {"aboutUrl": "#li-{l_orderkey}-{l_linenumber}",
                            "columns": cols}}


C = {
    "l_orderkey": "integer", "l_linenumber": "integer",
    "l_quantity": "decimal", "l_extendedprice": "decimal",
    "l_returnflag": "string", "l_linestatus": "string",
    "l_shipdate": "datetime",
}

VARIANTS = {
    # every column mapped, but parsed as plain strings → no datatype parse
    "all_as_string": [{"name": n, "datatype": "string"} for n in C],
    # only the two key integers (template still needs them)
    "integers_only": [{"name": n, "datatype": "integer"}
                      for n in ("l_orderkey", "l_linenumber")],
    "decimals_only": [{"name": n, "datatype": "integer"}
                      for n in ("l_orderkey", "l_linenumber")]
                     + [{"name": n, "datatype": "decimal"}
                        for n in ("l_quantity", "l_extendedprice")],
    "datetime_only": [{"name": n, "datatype": "integer"}
                      for n in ("l_orderkey", "l_linenumber")]
                     + [{"name": "l_shipdate", "datatype": "datetime"}],
    "full": [{"name": n, "datatype": t} for n, t in C.items()],
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench
    from csvw_rdf_convertor_spark.functions.ntriples import to_ntriples_lines
    from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
    from csvw_rdf_convertor_spark.spec import parse_descriptor

    spark = bench.build_spark(2)
    spark.sparkContext.setLogLevel("ERROR")
    li = bench._lineitem_mapping_input(spark, sf_dir, 2).cache()
    n = li.count()  # materialize cache: isolate compute from scan

    def timed(df):
        df.count()  # compile + warm
        reps = []
        for _ in range(3):
            t0 = time.time()
            c = df.count()
            reps.append(time.time() - t0)
        return round(statistics.median(reps), 2), c

    out = {"rows": n, "sf_dir": sf_dir}
    t, _ = timed(li.select("l_orderkey"))
    out["cached_scan_floor"] = t
    for name, cols in VARIANTS.items():
        df = table_to_triples(li, parse_descriptor(_desc(cols)).tables[0])
        t, c = timed(df)
        out[name] = {"sec": t, "triples": c}
    full = table_to_triples(li, parse_descriptor(_desc(VARIANTS["full"])).tables[0])
    t, c = timed(to_ntriples_lines(full))
    out["full_plus_ntriples"] = {"sec": t, "triples": c}
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
