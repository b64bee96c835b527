"""Benchmark harness: headline operators at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, ...extras}

The driver testdata is one parquet file with ONE row group per table, so a
raw scan is a single task no matter the core count; every heavy input is
``repartition(cpus)``-ed after read to model the many-file layout a real
cluster reads (at 100 TB there are thousands of splits — the repartition
emulates that, it is not a tuning trick for the operators themselves).

Scaling evidence (BASELINE.md): tools/scaling_run.py runs this twice with
SPARK_GRAFT_CPUS=8 and =32 on identical input and reports
efficiency = (rate_32 / rate_8) / 4.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def build_spark(cpus: int):
    from pyspark.sql import SparkSession
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("csvw-rdf-convertor-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        # keep generated methods small enough for janino (cell pipeline
        # expressions are wide); without this the whole stage falls back to
        # interpreted mode (~3x slower)
        .config("spark.sql.codegen.methodSplitThreshold", "256")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


LINEITEM_DESC = {
    "url": "urn:li",
    "tableSchema": {
        "aboutUrl": "#li-{l_orderkey}-{l_linenumber}",
        "columns": [
            {"name": "l_orderkey", "datatype": "integer"},
            {"name": "l_linenumber", "datatype": "integer"},
            {"name": "l_quantity", "datatype": "decimal"},
            {"name": "l_extendedprice", "datatype": "decimal"},
            {"name": "l_returnflag", "datatype": "string"},
            {"name": "l_linestatus", "datatype": "string"},
            {"name": "l_shipdate", "datatype": "datetime"},
        ],
    },
}


def bench_queries(spark, sf_dir: str, cpus: int):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from csvw_rdf_convertor_spark.kg import pipeline
    from csvw_rdf_convertor_spark.kg.synth import synth_transcripts
    from csvw_rdf_convertor_spark.ops import dedup, similarity
    from csvw_rdf_convertor_spark.ops import text as text_ops
    from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
    from csvw_rdf_convertor_spark.spec import parse_descriptor

    def rp(name):
        return spark.read.parquet(f"{sf_dir}/{name}.parquet").repartition(cpus)

    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    counts: dict[str, int] = {}

    def run(name, df):
        """Best-of-2: the first run pays janino compile + JIT warm-up (and
        this host shows 3-4× run-to-run noise under neighbor CPU steal);
        the second run is the steady-state cost a long-lived executor
        actually sustains — which is the 100 TB-relevant number. Both are
        reported (``queries`` = steady, ``cold_queries`` = first run)."""
        t0 = time.time()
        counts[name] = df.count()
        cold[name] = round(time.time() - t0, 3)
        t0 = time.time()
        df.count()
        times[name] = round(min(time.time() - t0, cold[name]), 3)

    # warm-up (JVM + codegen caches) — not reported
    rp("nation").count()

    # 1. CSVW→RDF mapping over the widest table (the engine's core path)
    li = rp("lineitem").select(
        F.col("l_orderkey").cast("string").alias("l_orderkey"),
        F.col("l_linenumber").cast("string").alias("l_linenumber"),
        F.col("l_quantity").cast("string").alias("l_quantity"),
        F.col("l_extendedprice").cast("string").alias("l_extendedprice"),
        "l_returnflag", "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("l_shipdate"))
    run("csvw2rdf_lineitem",
        table_to_triples(li, parse_descriptor(LINEITEM_DESC).tables[0]))

    # 2. N-Triples serialization of the same mapping (scan→triples→lines)
    from csvw_rdf_convertor_spark.functions.ntriples import to_ntriples_lines
    run("ntriples_serialize",
        to_ntriples_lines(table_to_triples(
            li, parse_descriptor(LINEITEM_DESC).tables[0])))

    # 3. TPC-H shapes: agg + 3-way join
    lineitem = rp("lineitem")
    orders = rp("orders")
    customer = rp("customer")
    d = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    run("q1_pricing_summary",
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(d("l_quantity")).alias("sum_qty"),
             F.count("*").alias("count_order")))
    run("q3_join_topk",
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
              orders.o_custkey == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(d("l_extendedprice") * (F.lit(1).cast("decimal(18,2)")
                                           - d("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10))

    # 4. window
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"),
                                                F.asc("o_orderkey"))
    run("w1_rownum_topk",
        orders.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3))

    # 5. documents: quality profile + exact dedup + MinHash near-dup
    docs = rp("documents")
    run("text_profile", text_ops.document_profile(docs))
    run("dedup_exact", dedup.exact_duplicates(docs))
    run("dedup_minhash_pairs", dedup.minhash_near_duplicates(docs, threshold=0.6))

    # 6. embeddings: brute-force cosine top-k for 10 queries
    emb = rp("embeddings")
    queries = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
               .where(F.col("vec_id") < 10)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    run("sim_topk_bruteforce", similarity.brute_force_topk(emb, queries, k=5))

    # 7. KG pipeline end-to-end over synthetic transcripts (hot-conv skew);
    # corpus big enough that the ~15s fixed pipeline cost doesn't dominate
    n_convs = max(int(1_000_000 * _sf_of(sf_dir)), 50)
    tr = synth_transcripts(spark, n_convs=n_convs, max_len=400).repartition(cpus)
    kg_samples = []
    for i in range(2):   # best-of-2, same rationale as run()
        out = tempfile.mkdtemp(prefix="kg_bench_")
        t0 = time.time()
        m = pipeline.run(tr, out, n_buckets=max(cpus, 8), resume=False)
        kg_samples.append(round(time.time() - t0, 3))
        shutil.rmtree(out, ignore_errors=True)
    cold["kg_pipeline_end2end"] = kg_samples[0]
    times["kg_pipeline_end2end"] = min(kg_samples)
    counts["kg_pipeline_end2end"] = m.triples

    return times, counts, cold


def _sf_of(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    except Exception:
        return 0.1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    times, counts, cold = bench_queries(spark, sf_dir, cpus)
    total = round(sum(times.values()), 3)
    kg_tps = (counts["kg_pipeline_end2end"] / times["kg_pipeline_end2end"]
              if times.get("kg_pipeline_end2end") else 0)
    map_tps = (counts["csvw2rdf_lineitem"] / times["csvw2rdf_lineitem"]
               if times.get("csvw2rdf_lineitem") else 0)
    print(json.dumps({
        "metric": "headline operator wall time (sum, steady-state best-of-2 "
                  "per query) at sf; triples/sec for the KG pipeline and the "
                  "CSVW mapping path; cold_queries = first-run times incl. "
                  "codegen/JIT warm-up",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": _sf_of(sf_dir),
        "cpus": cpus,
        "counts": counts,
        "cold_queries": cold,
        "kg_triples_per_sec": round(kg_tps),
        "mapping_triples_per_sec": round(map_tps),
    }))


if __name__ == "__main__":
    main()
