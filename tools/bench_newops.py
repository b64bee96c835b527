"""One-off pinned-protocol benchmark for the round-5 training-data ops
(chunking, packing, decontamination, tf-idf, quantiles, minhash clusters,
quantized k-means).

Kept OUT of bench.py on purpose: the headline query set is pinned for
round-over-round comparability (BENCH/BASELINE.md), so new operators get
their own harness under the SAME protocol — fresh taskset-pinned 2-core
JVM, tmpfs shuffle, 1 warm-up (cold) + median of 3 steady repeats, inputs
``repartition(cpus)``-ed to model a many-file cluster scan.

Usage:  python tools/bench_newops.py [sf_dir] [out_json]
(re-execs itself under ``taskset -c 0-1`` when available)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PINNED_CORES = 2
SAMPLES = 3


def queries(spark, sf_dir: str, cpus: int):
    from pyspark.sql import functions as F

    from csvw_rdf_convertor_spark.ops import dedup, decontam
    from csvw_rdf_convertor_spark.ops import text as text_ops
    from csvw_rdf_convertor_spark.ops.chunk import (cdc_chunks,
                                                    chunk_documents,
                                                    pack_sequences)
    from csvw_rdf_convertor_spark.ops.kmeans import kmeans_quantized
    from csvw_rdf_convertor_spark.ops.sample import bottom_k_sample
    from csvw_rdf_convertor_spark.ops.sketch import theta_distinct
    from csvw_rdf_convertor_spark.ops import events as events_ops
    from csvw_rdf_convertor_spark.ops.snapshot import snapshot_diff
    from csvw_rdf_convertor_spark.ops.winnow import (winnow_fingerprints,
                                                     winnow_near_duplicates)

    def rp(name):
        return (spark.read.parquet(f"{sf_dir}/{name}.parquet")
                .repartition(cpus))

    docs = rp("documents")
    emb = rp("embeddings")
    train = docs.where(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    ev = docs.where(F.col("doc_id") % 10 >= 8).select("doc_id", "text")
    return {
        # production hash family (xxhash64) everywhere — md5 is gate-only
        "text_chunk_windows": lambda: chunk_documents(
            docs, size=16, overlap=4),
        "text_pack_sequences": lambda: pack_sequences(
            docs, context_len=2048, shard_size=4096, sep_tokens=1),
        "text_tfidf_topk": lambda: text_ops.tf_idf_top_terms(docs, 3),
        "text_length_quantiles": lambda: text_ops.group_quantiles(
            docs.select("lang", "doc_id",
                        text_ops.token_count(F.col("text")).cast("long")
                        .alias("n_tokens")),
            "n_tokens", "lang", "doc_id"),
        "decontam_ngram_overlap": lambda: decontam.ngram_contamination(
            train, ev, n=5, hash_family="xxhash64"),
        "dedup_minhash_clusters": lambda: dedup.near_dup_clusters(
            dedup.minhash_near_duplicates(docs, threshold=0.6,
                                          hash_family="xxhash64")),
        "kmeans_quantized_k8": lambda: kmeans_quantized(emb, k=8, n_iter=2),
        "text_cdc_chunks": lambda: cdc_chunks(
            docs, k=8, boundary_bits=6, min_size=16),
        "winnow_fingerprints": lambda: winnow_fingerprints(docs, k=8, w=4),
        "sketch_theta_distinct": lambda: theta_distinct(
            docs.select(F.explode(text_ops.tokens_ws(F.col("text")))
                        .alias("term")).where(F.col("term") != ""),
            "term", b=4),
        "sample_bottom_k": lambda: bottom_k_sample(docs, 1000, "bk"),
        "text_gopher_filter": lambda: text_ops.gopher_filter(docs),
        "winnow_near_dup": lambda: winnow_near_duplicates(
            docs, k=8, w=4, min_shared=20, max_df=50),
        "snapshot_diff": lambda: snapshot_diff(
            docs.select("doc_id", "text"),
            docs.select("doc_id", "text").where(F.col("doc_id") % 25 != 7)),
        "events_sessionize": lambda: events_ops.session_stats(
            rp("events"), gap_minutes=30),
        "events_funnel": lambda: events_ops.funnel(
            rp("events"), ["view", "click", "purchase"]),
        "events_retention": lambda: events_ops.retention_cohorts(
            rp("events")),
    }


def worker(sf_dir: str, out_path: str) -> None:
    from bench import build_spark
    local_dir = (tempfile.mkdtemp(prefix="bench_newops_", dir="/dev/shm")
                 if os.path.isdir("/dev/shm") else None)
    os.environ.setdefault("SPARK_GRAFT_MEM", f"{4 * PINNED_CORES}g")
    spark = build_spark(PINNED_CORES, local_dir)
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # JVM warm-up

    times, cold, counts, spread = {}, {}, {}, {}
    for name, make in queries(spark, sf_dir, PINNED_CORES).items():
        t0 = time.time()
        counts[name] = make().count()
        cold[name] = round(time.time() - t0, 3)
        reps = []
        for _ in range(SAMPLES):
            t0 = time.time()
            make().count()
            reps.append(round(time.time() - t0, 3))
        spread[name] = reps
        times[name] = round(statistics.median(reps), 3)
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "cpus": PINNED_CORES,
                   "queries": times, "counts": counts, "cold": cold,
                   "samples": spread}, f, indent=1)
    spark.stop()
    if local_dir:
        shutil.rmtree(local_dir, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2], sys.argv[3])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = (sys.argv[2] if len(sys.argv) > 2
           else os.path.join(REPO, "BENCH", "bench_newops_last.json"))
    cmd = [sys.executable, os.path.abspath(__file__), "worker", sf_dir, out]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{PINNED_CORES - 1}"] + cmd
    r = subprocess.run(cmd)
    if r.returncode == 0 and os.path.exists(out):
        with open(out) as f:
            print(json.dumps(json.load(f)["queries"]))
    else:
        sys.exit(1)


if __name__ == "__main__":
    main()
