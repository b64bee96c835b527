"""Multi-EXECUTOR scaling evidence for the north rule: the same total input
processed by 1 executor vs 4 executors, where an "executor" is a separate
taskset-pinned 2-core Spark JVM with its own heap — the faithful sandbox
stand-in for "two cluster sizes (N and 4N executors)".

Why not local[2] vs local[8] (the r02 protocol): a real cluster scales by
adding executor JVMs, each with its own allocator and GC. One JVM scaling
its thread count shares a single allocator — measured on this box, pure
compute scales 3.65×/4 (0.91) from 2→8 threads, but allocation-heavy
string work (triple building) caps at ~2.6×/4 (~0.65) purely from shared-
heap allocation/GC bandwidth, an artifact a multi-executor cluster does
not have. Separate JVMs restore the per-executor allocator, exactly like
adding executors does.

Input identity: the 4N level processes the SAME rows as the N level, split
into 4 conversation-disjoint shards by pmod(xxhash64(conv_id), 4) — the
same hash-bucketing a cluster uses to distribute conversations across
executors. Shards are materialized to tmpfs parquet once (untimed).

Timing: every worker warms up (codegen+JIT), signals ready, and blocks on
a shared go-file barrier; timed samples then run concurrently across all
executors of the level. Per level: rate = total output rows / max-over-
executors(median of 3 samples). efficiency = (rate_4N / rate_N) / 4.

Usage:
  python tools/scaling_exec.py [sf_dir]            # driver (run ALONE)
  python tools/scaling_exec.py worker <spec.json>  # internal
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = Path("/dev/shm/spark_exec_scaling")
CORES_PER_EXEC = 2
N_SAMPLES = 3
#: corpus sizes (identical totals at both levels); env-overridable for
#: smoke tests of the harness itself
KG_CONVS = int(os.environ.get("SCALE_KG_CONVS", 1_000_000))
KG_LEN = int(os.environ.get("SCALE_KG_LEN", 600))
TM_CONVS = int(os.environ.get("SCALE_TM_CONVS", 400_000))
TM_LEN = int(os.environ.get("SCALE_TM_LEN", 800))
MAP_REPL = int(os.environ.get("SCALE_MAP_REPL", 4))
#: dedup corpus: synthetic docs (vocab-hash tokens) with planted near-dup
#: pairs every 50 ids; pairs share a base id so they stay shard-local —
#: the harness's disjoint-shard model measures the per-executor LSH work
#: (shingle→signature→band→verify); the cross-executor band exchange at
#: cluster scale ships 8-byte id rows (ops/dedup.py design, not measurable
#: in single-JVM workers — same documented seam as the other workloads)
DD_DOCS = int(os.environ.get("SCALE_DD_DOCS", 150_000))
DD_LEN = int(os.environ.get("SCALE_DD_LEN", 50))
DD_VOCAB = int(os.environ.get("SCALE_DD_VOCAB", 5_000))
N_SAMPLES = int(os.environ.get("SCALE_SAMPLES", N_SAMPLES))
#: subset of workloads to run (comma list) — mapping,turn_mapping,kg.
#: Canonicalized to worker execution order (ADVICE r3: the driver's barrier
#: loop must release go-files in the SAME order workers hit them, or an env
#: ordering like "kg,mapping" deadlocks both sides)
_CANON_WORKLOADS = ("mapping", "turn_mapping", "kg", "dedup")
WORKLOADS = tuple(
    w for w in _CANON_WORKLOADS
    if w in set(os.environ.get("SCALE_WORKLOADS",
                               ",".join(_CANON_WORKLOADS)).split(",")))
#: untimed warm-up iterations per workload before the barrier — the
#: regex-heavy mapping codegen needs several full passes before the JIT
#: fully compiles it (measured: 4N samples drop 49s → 37s by sample 4);
#: a long-lived executor runs warm, so warm-up is excluded by protocol
N_WARM = int(os.environ.get("SCALE_WARMUPS", 2))
#: SCALE_EQUALIZE=1 → the N level runs with 3 untimed BALLAST workers
#: (same workload, same pinning as the 4N workers) so both levels measure
#: under identical machine-wide load. Rationale: on a real cluster every
#: executor sees the same per-host conditions at N and at 4N; on this ONE
#: box the idle-machine N baseline enjoys the whole DRAM bandwidth while
#: the 4N level shares it across 8 active cores — a sandbox artifact of
#: the same class as the shared disk (fixed: tmpfs) and shared allocator
#: (fixed: separate JVMs). Measured on the mapping workload: per-worker
#: pass time inflates from ~36 s (alone) to ~43 s (3 concurrent twins)
#: with zero code difference. Both protocols are reported in
#: BENCH/BASELINE.md; equalized isolates the ENGINE's scaling.
EQUALIZE = os.environ.get("SCALE_EQUALIZE", "0") == "1"

TITLES = {
    "mapping": "CSVW→RDF mapping (lineitem sf0.1 ×4, regex-heavy cells)",
    "turn_mapping": "transcripts turn mapping (narrow path)",
    "kg": "KG pipeline end-to-end (mapping+mentions+linking+CC+write)",
    "dedup": "MinHash-LSH near-dup pairs (shingle→signature→band→verify)",
}


def build_spark(cpus: int, app: str):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cpus}]")
            .appName(app)
            .config("spark.sql.shuffle.partitions", str(cpus * 2))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.codegen.methodSplitThreshold", "256")
            .config("spark.driver.memory", f"{4 * cpus}g")
            .config("spark.local.dir", str(SCRATCH / f"local-{app}"))
            .config("spark.ui.enabled", "false")
            .getOrCreate())


# --------------------------- data prep (driver) -----------------------------

def prep_inputs(sf_dir: str) -> None:
    """Materialize full + 4-shard parquet inputs on tmpfs (untimed)."""
    sys.path.insert(0, str(REPO))
    from pyspark.sql import functions as F

    from csvw_rdf_convertor_spark.kg.synth import synth_transcripts
    spark = build_spark(8, "prep")
    spark.sparkContext.setLogLevel("ERROR")

    if "kg" in WORKLOADS:
        tr = synth_transcripts(spark, n_convs=KG_CONVS, max_len=KG_LEN)
        tr = tr.withColumn("_shard",
                           F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int"))
        tr.write.mode("overwrite").partitionBy("_shard").parquet(
            str(SCRATCH / "kg_corpus"))

    if "turn_mapping" in WORKLOADS:
        tm = synth_transcripts(spark, n_convs=TM_CONVS, max_len=TM_LEN)
        tm = tm.withColumn("_shard",
                           F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int"))
        tm.write.mode("overwrite").partitionBy("_shard").parquet(
            str(SCRATCH / "tm_corpus"))

    if "dedup" in WORKLOADS:
        # tokens are vocab hashes of (base_key, pos); ids ≡ 1 (mod 50)
        # reuse id−1's stream except the last token → planted near-dup
        # pairs (~2% of docs), shard-local by construction (shard on base)
        base = F.when(F.col("id") % 50 == 1, F.col("id") - 1) \
                .otherwise(F.col("id"))
        toks = [F.concat(F.lit("w"), F.pmod(
                    F.xxhash64(base, F.lit(p)), F.lit(DD_VOCAB)))
                for p in range(DD_LEN - 1)]
        toks.append(F.concat(F.lit("w"), F.pmod(
            F.xxhash64(F.col("id"), F.lit(DD_LEN - 1)), F.lit(DD_VOCAB))))
        dd = (spark.range(DD_DOCS)
              .select(F.col("id").alias("doc_id"),
                      F.concat_ws(" ", *toks).alias("text"),
                      F.pmod(F.xxhash64(base), F.lit(4)).cast("int")
                      .alias("_shard")))
        dd.write.mode("overwrite").partitionBy("_shard").parquet(
            str(SCRATCH / "dd_corpus"))

    if "mapping" not in WORKLOADS:
        spark.stop()
        return
    li = (spark.read.parquet(f"{sf_dir}/lineitem.parquet")
          .withColumn("__r", F.explode(F.array(*[F.lit(i) for i in range(MAP_REPL)])))
          .withColumn("_shard", F.pmod(F.xxhash64("l_orderkey", "l_linenumber", "__r"),
                                       F.lit(4)).cast("int"))
          .select(
              F.concat_ws("-", F.col("l_orderkey").cast("string"),
                          F.col("__r").cast("string")).alias("l_orderkey"),
              F.col("l_linenumber").cast("string").alias("l_linenumber"),
              F.col("l_quantity").cast("string").alias("l_quantity"),
              F.col("l_extendedprice").cast("string").alias("l_extendedprice"),
              "l_returnflag", "l_linestatus",
              F.date_format("l_shipdate", "yyyy-MM-dd HH:mm:ss").alias("l_shipdate"),
              "_shard"))
    li.write.mode("overwrite").partitionBy("_shard").parquet(
        str(SCRATCH / "li_corpus"))
    spark.stop()


# ------------------------------- worker -------------------------------------

def worker(spec_path: str) -> None:
    spec = json.loads(Path(spec_path).read_text())
    sys.path.insert(0, str(REPO))
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    from pyspark.sql import functions as F

    from bench import LINEITEM_DESC
    from csvw_rdf_convertor_spark.kg import pipeline
    from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
    from csvw_rdf_convertor_spark.spec import parse_descriptor

    wid = spec["worker_id"]
    shards = spec["shards"]          # list of _shard values this worker owns
    spark = build_spark(CORES_PER_EXEC, f"exec-{spec['level']}-{wid}")
    spark.sparkContext.setLogLevel("ERROR")

    def shard_read(name):
        df = spark.read.parquet(str(SCRATCH / name))
        return (df.where(F.col("_shard").isin(shards)).drop("_shard")
                .repartition(CORES_PER_EXEC * 4).cache())

    t_start = time.time()
    out: dict = {"worker_id": wid, "workloads": {},
                 "ballast": spec.get("ballast", False),
                 "trace": {}}   # per-stage wall clock for run forensics

    def barrier(tag):
        (SCRATCH / f"ready-{spec['level']}-{tag}-{wid}").touch()
        go = SCRATCH / f"go-{spec['level']}-{tag}"
        while not go.exists():
            time.sleep(0.1)

    def sample_loop(tag, fn_once):
        """Barrier, then: timed workers take N_SAMPLES and signal done;
        BALLAST workers (load-equalized N protocol) loop the same pass
        untimed until the driver raises the stop flag."""
        tr = out["trace"].setdefault(tag, {})
        tr["barrier_enter"] = round(time.time() - t_start, 1)
        barrier(tag)
        tr["barrier_exit"] = round(time.time() - t_start, 1)
        if spec.get("ballast"):
            stop = SCRATCH / f"stop-{spec['level']}-{tag}"
            passes = 0
            while not stop.exists():
                fn_once()
                passes += 1
            tr["ballast_passes"] = passes
            tr["ballast_done"] = round(time.time() - t_start, 1)
            return None
        samples = []
        for _ in range(N_SAMPLES):
            t0 = time.time()
            fn_once()
            samples.append(round(time.time() - t0, 3))
        tr["samples_done"] = round(time.time() - t_start, 1)
        (SCRATCH / f"done-{spec['level']}-{tag}-{wid}").touch()
        return samples

    # --- mapping ---
    if "mapping" in WORKLOADS:
        _w_mapping(spec, shard_read, out, sample_loop)
    if "turn_mapping" in WORKLOADS:
        _w_turn(spec, shard_read, out, sample_loop)
    if "kg" in WORKLOADS:
        _w_kg(spec, shard_read, out, sample_loop)
    if "dedup" in WORKLOADS:
        _w_dedup(spec, shard_read, out, sample_loop)
    Path(spec["out_path"]).write_text(json.dumps(out))


def _w_mapping(spec, shard_read, out, sample_loop):
    import time
    from bench import LINEITEM_DESC
    from csvw_rdf_convertor_spark.plans.csvw2rdf import table_to_triples
    from csvw_rdf_convertor_spark.spec import parse_descriptor
    tr = out["trace"].setdefault("mapping", {})
    t0 = time.time()
    li = shard_read("li_corpus")
    li.count()
    tr["cache_sec"] = round(time.time() - t0, 1)
    tri = table_to_triples(li, parse_descriptor(LINEITEM_DESC).tables[0])
    n_tri = tri.count()              # warm
    once = lambda: tri.write.format("noop").mode("overwrite").save()  # noqa: E731
    t0 = time.time()
    for _ in range(N_WARM):
        once()
    tr["warm_sec"] = round(time.time() - t0, 1)
    # per-action FIXED cost (driver/planning, independent of data size and
    # of executor count on a real cluster): one noop pass over 0.1% of the
    # shard — measured ~2.0-2.6 s for this plan on an idle pinned 2-core
    # JVM; reported so BASELINE.md can show fixed-cost sensitivity
    tiny = table_to_triples(li.limit(max(li.count() // 1000, 1)),
                            parse_descriptor(LINEITEM_DESC).tables[0])
    t0 = time.time()
    tiny.write.format("noop").mode("overwrite").save()
    fixed = round(time.time() - t0, 3)
    samples = sample_loop("mapping", once)
    if samples is not None:
        out["workloads"]["mapping"] = {"rows": n_tri, "samples": samples,
                                       "fixed_cost": fixed}
    li.unpersist()


def _w_turn(spec, shard_read, out, sample_loop):
    from csvw_rdf_convertor_spark.kg import pipeline
    tm = shard_read("tm_corpus")
    tm.count()
    tt = pipeline.turn_triples(tm)
    n_tt = tt.count()
    once = lambda: tt.write.format("noop").mode("overwrite").save()  # noqa: E731
    for _ in range(N_WARM):
        once()
    samples = sample_loop("turn_mapping", once)
    if samples is not None:
        out["workloads"]["turn_mapping"] = {"rows": n_tt, "samples": samples}
    tm.unpersist()


def _w_kg(spec, shard_read, out, sample_loop):
    from csvw_rdf_convertor_spark.kg import pipeline
    wid = spec["worker_id"]
    tr = shard_read("kg_corpus")
    n_turns = tr.count()
    wdir = SCRATCH / f"kgout-{spec['level']}-{wid}"
    shutil.rmtree(wdir, ignore_errors=True)
    pipeline.run(tr, str(wdir / "warm"), n_buckets=16, resume=False)  # warm
    shutil.rmtree(wdir, ignore_errors=True)
    state = {"i": 0, "triples": 0}

    def once():
        d = wdir / f"s{state['i']}"
        state["i"] += 1
        m = pipeline.run(tr, str(d), n_buckets=16, resume=False)
        state["triples"] = m.triples
        shutil.rmtree(d, ignore_errors=True)

    samples = sample_loop("kg", once)
    if samples is not None:
        out["workloads"]["kg"] = {"rows": state["triples"],
                                  "turns": n_turns, "samples": samples}


def _w_dedup(spec, shard_read, out, sample_loop):
    from csvw_rdf_convertor_spark.ops.dedup import minhash_near_duplicates
    dd = shard_read("dd_corpus")
    n_docs = dd.count()
    pairs = minhash_near_duplicates(dd, threshold=0.6,
                                    hash_family="xxhash64")
    n_pairs = pairs.count()          # warm; ALSO the cross-level identity
    # signal: planted pairs are shard-local, so N (union of shards) and 4N
    # (one shard each) should discover the same pairs. NOTE (ADVICE r5):
    # the harness asserts COUNT equality across levels, not set equality —
    # differing pair sets of equal size would pass this check.
    once = lambda: pairs.write.format("noop").mode("overwrite").save()  # noqa: E731
    for _ in range(N_WARM):
        once()
    samples = sample_loop("dedup", once)
    if samples is not None:
        out["workloads"]["dedup"] = {"rows": n_pairs, "docs": n_docs,
                                     "samples": samples}
    dd.unpersist()


# ------------------------------- driver -------------------------------------

def run_level(n_execs: int, level: str) -> dict:
    """Launch n_execs pinned TIMED workers (+ 3 ballast twins when
    SCALE_EQUALIZE=1 and n_execs == 1); release each barrier when all are
    ready, raise the stop flag once every timed worker reports done."""
    procs, outs = [], []
    shard_sets = ([[0, 1, 2, 3]] if n_execs == 1
                  else [[i] for i in range(4)])
    n_ballast = 3 if (EQUALIZE and n_execs == 1) else 0
    for w in range(n_execs + n_ballast):
        ballast = w >= n_execs
        spec = {"level": level, "worker_id": w,
                # ballast twins take the same shards the 4N workers 1-3 use
                "shards": shard_sets[w] if not ballast else [w - n_execs + 1],
                "ballast": ballast,
                "out_path": str(SCRATCH / f"out-{level}-{w}.json")}
        sp = SCRATCH / f"spec-{level}-{w}.json"
        sp.write_text(json.dumps(spec))
        cores = f"{w * CORES_PER_EXEC}-{(w + 1) * CORES_PER_EXEC - 1}"
        cmd = ["taskset", "-c", cores, sys.executable, __file__,
               "worker", str(sp)]
        procs.append(subprocess.Popen(cmd, cwd=REPO,
                                      stdout=subprocess.DEVNULL,
                                      stderr=subprocess.DEVNULL))
        if not ballast:
            outs.append(spec["out_path"])

    # barrier manager: release go once ALL (timed + ballast) are ready;
    # after every timed worker signals done, raise stop so ballast loops
    # exit and move to the next workload's barrier
    for tag in WORKLOADS:
        while True:
            ready = [f for f in SCRATCH.glob(f"ready-{level}-{tag}-*")]
            if len(ready) == n_execs + n_ballast:
                break
            if any(p.poll() is not None and p.returncode != 0
                   for p in procs):
                raise SystemExit(f"worker died before {tag} barrier")
            time.sleep(0.2)
        (SCRATCH / f"go-{level}-{tag}").touch()
        while True:
            done = [f for f in SCRATCH.glob(f"done-{level}-{tag}-*")]
            if len(done) == n_execs:
                break
            if any(p.poll() is not None and p.returncode != 0
                   for p in procs):
                raise SystemExit(f"worker died during {tag} samples")
            time.sleep(0.5)
        (SCRATCH / f"stop-{level}-{tag}").touch()
    for p in procs:
        if p.wait() != 0:
            raise SystemExit(f"worker failed at level {level}")
    return {"workers": [json.loads(Path(o).read_text()) for o in outs]}


def summarize(levels: dict) -> dict:
    summary: dict = {"cores_per_executor": CORES_PER_EXEC,
                     "executors": {"N": 1, "4N": 4},
                     "load_equalized_N": EQUALIZE, "raw": levels}
    for w in WORKLOADS:
        per_level = {}
        for lvl, data in levels.items():
            rows = sum(wk["workloads"][w]["rows"] for wk in data["workers"])
            med = max(statistics.median(wk["workloads"][w]["samples"])
                      for wk in data["workers"])
            per_level[lvl] = {"rows": rows, "sec": med,
                              "rate": round(rows / med)}
            fixed = [wk["workloads"][w]["fixed_cost"]
                     for wk in data["workers"]
                     if "fixed_cost" in wk["workloads"][w]]
            if fixed:
                per_level[lvl]["fixed_cost"] = max(fixed)
        if per_level["N"]["rows"] != per_level["4N"]["rows"]:
            raise SystemExit(
                f"{w}: output rows differ across levels "
                f"({per_level['N']['rows']} vs {per_level['4N']['rows']}) — "
                "sharding broke input identity")
        eff = (per_level["4N"]["rate"] / per_level["N"]["rate"]) / 4
        summary[w] = {"rate_N": per_level["N"]["rate"],
                      "rate_4N": per_level["4N"]["rate"],
                      "sec_N": per_level["N"]["sec"],
                      "sec_4N": per_level["4N"]["sec"],
                      "efficiency": round(eff, 3)}
        for lvl in ("N", "4N"):
            if "fixed_cost" in per_level[lvl]:
                summary[w][f"fixed_cost_{lvl}"] = per_level[lvl]["fixed_cost"]
    return summary


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    shutil.rmtree(SCRATCH, ignore_errors=True)
    SCRATCH.mkdir(parents=True)
    print("prep…", flush=True)
    prep_inputs(sf_dir)
    print("level N (1 executor × 2 cores)…", flush=True)
    n1 = run_level(1, "N")
    print("level 4N (4 executors × 2 cores)…", flush=True)
    n4 = run_level(4, "4N")
    summary = summarize({"N": n1, "4N": n4})
    print(json.dumps(summary))
    (REPO / "BENCH").mkdir(exist_ok=True)
    suffix = "" if set(WORKLOADS) == {"mapping", "turn_mapping", "kg"} \
        else "_" + "_".join(WORKLOADS)
    if EQUALIZE:
        suffix += "_eq"
    (REPO / "BENCH" / f"scaling_exec_raw{suffix}.json").write_text(
        json.dumps(summary, indent=2))
    shutil.rmtree(SCRATCH, ignore_errors=True)


if __name__ == "__main__":
    main()
