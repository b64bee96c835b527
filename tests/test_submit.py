"""spark-submit launch path (north rule): package the engine as a
``--py-files`` zip and run the KG job end-to-end in a child Spark driver —
the exact invocation a multi-executor cluster uses, at local[2] scale.

The test cwd is a scratch dir so imports can ONLY come from the zip — a
missing module in the packaging step fails here, not on the cluster.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark
    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    pytest.skip("no spark-submit on PATH")


def _run_job(submit, zip_path, out_dir, tmp_path, extra=()):
    cmd = [submit, "--master", "local[2]",
           "--conf", "spark.sql.shuffle.partitions=4",
           "--conf", "spark.ui.enabled=false",
           "--py-files", str(zip_path),
           str(REPO / "jobs" / "kg_construct.py"),
           "--synth", "40", "--output", str(out_dir), "--n-buckets", "4",
           *extra]
    env = dict(os.environ, PYSPARK_PYTHON=sys.executable,
               PYSPARK_DRIVER_PYTHON=sys.executable)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                          cwd=tmp_path, env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith('{"job": "kg_construct"')]
    assert len(line) == 1, proc.stdout[-2000:]
    return json.loads(line[0])


def test_packaged_submit_end_to_end(tmp_path):
    submit = _spark_submit()
    sys.path.insert(0, str(REPO / "tools"))
    try:
        from package_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(tmp_path / "pkg.zip")
    out_dir = tmp_path / "kg"

    m1 = _run_job(submit, zip_path, out_dir, tmp_path)
    assert m1["buckets_done"] == 4 and m1["buckets_skipped"] == 0
    assert m1["triples"] > 0 and m1["turns"] > 0

    # resume: a second run over the same output is a no-op (exactly-once)
    m2 = _run_job(submit, zip_path, out_dir, tmp_path)
    assert m2["buckets_skipped"] == 4 and m2["buckets_done"] == 0
