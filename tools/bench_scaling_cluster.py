#!/usr/bin/env python
"""Two-CLUSTER-SIZE scaling benchmark in executor form (north rule shape).

`tools/bench_scaling.py` models N -> 4N with thread counts inside ONE JVM
(local[4] vs local[16]); that couples all tasks to a single shared heap,
allocator, and GC — a contention profile no real cluster has (every real
executor brings its own JVM). This variant runs the same job on
local-cluster[N,4,mem] vs local-cluster[4N,4,mem]: separate executor JVMs
(own heap + GC + python workers) with shuffle over netty, the closest
available model of "N executors vs 4N executors" on one box. Cores are
taskset-pinned to 4*N_EXEC / 16*N_EXEC like the thread-mode runs.

Usage: N_EXEC=1 REPEATS=2 python tools/bench_scaling_cluster.py
(pairs N_EXEC -> 4*N_EXEC executors, 4 cores + 8 GiB each)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import sys, time, json, os
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

n_exec = int(os.environ["N_EXEC_JOB"])
cores_per = int(os.environ.get("CORES_PER_EXEC", "4"))
mem_mb = int(os.environ.get("EXEC_MEM_MB", "8192"))
n_docs = int(os.environ["N_DOCS"])
path = os.environ["CORPUS_PATH"]

builder = (
    SparkSession.builder.appName("scaling_cluster")
    .master(f"local-cluster[{{n_exec}},{{cores_per}},{{mem_mb}}]")
    .config("spark.executor.memory", f"{{mem_mb - 1024}}m")
    .config("spark.driver.memory", "8g")
    # same job conf as the thread-mode protocol (see bench_scaling.py)
    .config("spark.sql.shuffle.partitions", "48")
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.sql.files.maxPartitionBytes", "16m")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    .config("spark.sql.maxPlanStringLength", "100000")
    .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    # spread tasks across executors immediately; cached blocks are
    # executor-local and the default 3s locality wait serializes waves
    .config("spark.locality.wait", "0")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
spark.sparkContext.addPyFile({repo!r} + "/dist/topojson_spark.zip")

from topojson_spark.sources.corpus import generate_documents
from topojson_spark.topology import Topology

warm = generate_documents(spark, 200, grid_w=8, grid_h=8)
Topology(warm, prequantize=False).arcs.count()

t0 = time.time()
docs = spark.read.parquet(path)
topo = Topology(docs, prequantize=False)
n_arcs = topo.arcs.count()
dt = time.time() - t0
print(json.dumps({{"n_exec": n_exec, "cores": n_exec * cores_per,
                   "sec": dt, "docs_per_sec": n_docs / dt,
                   "n_docs": n_docs, "n_arcs": int(n_arcs)}}))
spark.stop()
"""


def run_once(n_exec: int, n_docs: int, corpus_path: str) -> dict:
    cores = n_exec * int(os.environ.get("CORES_PER_EXEC", "4"))
    env = dict(os.environ, N_EXEC_JOB=str(n_exec), N_DOCS=str(n_docs),
               CORPUS_PATH=corpus_path)
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c",
           JOB.format(repo=REPO)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(lines[-1])


def main() -> int:
    n_docs = int(os.environ.get("N_DOCS", "160000"))
    grid = int(os.environ.get("GRID", "400"))
    vpe = int(os.environ.get("VPE", "32"))
    corpus_path = os.environ.get(
        "CORPUS_PATH", f"/tmp/bench_corpus_{n_docs}_{grid}_{vpe}"
    )
    if not os.path.exists(corpus_path):
        raise SystemExit(f"corpus missing: {corpus_path} "
                         "(generate via tools/bench_scaling.py first)")
    n_small = int(os.environ.get("N_EXEC", "1"))
    repeats = int(os.environ.get("REPEATS", "2"))
    results = {}
    for n_exec in (n_small, 4 * n_small):
        rs = [run_once(n_exec, n_docs, corpus_path) for _ in range(repeats)]
        results[n_exec] = min(rs, key=lambda r: r["sec"])
    rs, rb = results[n_small], results[4 * n_small]
    eff = (rb["docs_per_sec"] / rs["docs_per_sec"]) / 4.0
    report = {
        f"{n_small}->{4 * n_small} executors (4 cores each)": {
            "N": rs, "4N": rb, "scaling_efficiency": round(eff, 3),
        }
    }
    print(json.dumps(report, indent=2))
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/scaling_runs.jsonl", "a") as f:
        f.write(json.dumps({
            "mode": "local-cluster", "n_docs": n_docs, "grid": grid,
            "vpe": vpe, "repeats": repeats, "report": report,
        }) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
