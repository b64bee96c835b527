"""Skew evidence: salted vs unsalted conv-level support aggregation on the
Zipf transcript corpus — the measurement behind ``linking.link_exact``'s
design note that explicit salting of an ALGEBRAIC aggregation is a
pessimization, not a skew fix.

The measured op is the (conv_id, entity) support count that feeds link
scoring. A count is algebraic: HashAggregate's map-side partial_count
already splits the hot conversation's rows across every input partition
before the exchange — exactly what a salt would do. The explicit 16-way
salt on top inflates the partial-aggregate output toward input size
(typical groups hold only a handful of mentions) and adds a second
exchange; expect ``speedup_salted`` < 1 in the output.

Prints ONE JSON line; appends nothing. Run ALONE (same rule as
tools/scaling_run.py) — e.g.:

    python tools/skew_bench.py 8          # local[8], default corpus
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 300_000
    import os
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import SparkSession, functions as F
    from csvw_rdf_convertor_spark.kg import mentions as mentions_mod
    from csvw_rdf_convertor_spark.kg.synth import alias_dictionary, synth_transcripts

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("skew-bench")
             .config("spark.sql.shuffle.partitions", str(cpus * 2))
             .config("spark.sql.session.timeZone", "UTC")
             # AQE's skew mitigation would partly mask what we measure;
             # keep it on anyway — it's on in production, so the delta we
             # report is the delta a real job would see
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # max_len scaled up to sharpen the hot-conversation tail
    tr = (synth_transcripts(spark, n_convs=n_convs, max_len=5_000, skew=1.05)
          .repartition(cpus * 4).cache())
    n_turns = tr.count()
    ments = mentions_mod.detect_mentions(tr, alias_dictionary()).cache()
    cand = ments.select(
        "conv_id", "turn_idx", "match_i",
        F.explode("candidates").alias("entity_id")).cache()
    n_cand = cand.count()

    def unsalted():
        return (cand.groupBy("conv_id", "entity_id")
                .agg(F.count("*").alias("conv_support")))

    def salted():
        p = (cand.withColumn(
                "salt", F.pmod(F.xxhash64("turn_idx", "match_i"), F.lit(16)))
             .groupBy("conv_id", "entity_id", "salt")
             .agg(F.count("*").alias("c")))
        return (p.groupBy("conv_id", "entity_id")
                .agg(F.sum("c").alias("conv_support")))

    out = {"cpus": cpus, "n_convs": n_convs, "turns": n_turns,
           "candidate_rows": n_cand}
    for name, build in (("unsalted", unsalted), ("salted", salted)):
        build().write.format("noop").mode("overwrite").save()  # warm
        samples = []
        for _ in range(5):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        out[name] = {"sec": round(statistics.median(samples), 3),
                     "samples": [round(s, 2) for s in samples]}
    out["speedup_salted"] = round(out["unsalted"]["sec"] / out["salted"]["sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
