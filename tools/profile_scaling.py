#!/usr/bin/env python
"""Per-stage scaling profiler: attributes the 4->16-core efficiency loss.

Runs the same topology pipeline as tools/bench_scaling.py but with an
eager barrier after every stage, at two taskset-pinned parallelism levels,
fresh JVM each. The corpus is pre-written to parquet OUTSIDE the timed
region (matching the Iceberg-table input of the north rule, and excluding
the Python doc-generator from the measurement).

Output: per-stage wall seconds at N and 4N cores + per-stage efficiency.
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
from topojson_spark.session import get_spark
from topojson_spark.topology import Topology
from topojson_spark.operators.extract import extract, features_from_documents
from topojson_spark.operators import join as J
from topojson_spark.operators.cut import cut_stage
from topojson_spark.operators.dedup import dedup_stage
from topojson_spark.operators.hashmap import hashmap_stage
from topojson_spark.options import TopoOptions
from topojson_spark.plans.pin import pin_truncate
from pyspark.sql import functions as F

cpus = int(os.environ["CPUS"])
path = os.environ["CORPUS_PATH"]
# fixed across levels: the job's conf, not the cluster's (see bench_scaling)
spark = get_spark("profile", master=f"local[{{cpus}}]",
                  shuffle_partitions=48, aqe=False)
spark.sparkContext.setLogLevel("ERROR")

# warm
from topojson_spark.sources.corpus import generate_documents
Topology(generate_documents(spark, 200, grid_w=8, grid_h=8),
         prequantize=False).arcs.count()

opts = TopoOptions(prequantize=False)
t = {{}}
T0 = time.time()

docs = spark.read.parquet(path)
features_in = features_from_documents(docs, "data")

t0 = time.time()
lines0, points0, features = extract(features_in, opts, None)
# the unified pin is lazy; force it via a cheap count on lines
n_lines = lines0.count()
t["extract_parse"] = time.time() - t0

t0 = time.time()
bbox, avg_wh, max_pts = J.compute_bbox_stats(lines0, points0)
t["bbox_agg"] = time.time() - t0
cell = max(avg_wh) if avg_wh else None

t0 = time.time()
lines_lid = lines0.withColumn(
    "lid", F.xxhash64(F.col("feature_seq"), F.col("unit_seq"), F.col("ring_seq"))
)
junctions = J.junctions_path_connected(lines_lid, bbox, cell=cell)
junctions = pin_truncate(junctions)
n_junc = junctions.count()
t["junctions"] = time.time() - t0

t0 = time.time()
parts, line_refs = cut_stage(lines0, junctions, False, bbox=bbox, cell=cell)
n_parts = parts.count()
t["cut"] = time.time() - t0

t0 = time.time()
# arcs_final arrives pinned from dedup_stage; re-pinning would double-persist
arcs_final, refs_final, pmap = dedup_stage(parts, line_refs)
n_arcs = arcs_final.count()
t["dedup"] = time.time() - t0

t0 = time.time()
resolved = hashmap_stage(line_refs, pmap, arcs_final, opts)
n_res = resolved.count()
t["hashmap"] = time.time() - t0

t["TOTAL"] = time.time() - T0
print(json.dumps({{"cpus": cpus, "stages": t, "n_lines": n_lines,
                   "n_junc": n_junc, "n_parts": int(n_parts),
                   "n_arcs": int(n_arcs), "n_res": int(n_res)}}))
"""


def run_once(cpus: int, corpus_path: str) -> dict:
    env = dict(os.environ, CPUS=str(cpus), CORPUS_PATH=corpus_path)
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
           JOB.format(repo=REPO)]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=3600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise SystemExit(1)
    return json.loads(lines[-1])


def main():
    n_docs = int(os.environ.get("N_DOCS", "40000"))
    grid = int(os.environ.get("GRID", "200"))
    vpe = int(os.environ.get("VPE", "32"))
    corpus_path = os.environ.get(
        "CORPUS_PATH", f"/tmp/profile_corpus_{n_docs}_{grid}_{vpe}"
    )
    if not os.path.exists(corpus_path):
        gen = (
            "import sys; sys.path.insert(0, %r); "
            "from topojson_spark.session import get_spark; "
            "from topojson_spark.sources.corpus import generate_documents; "
            "spark = get_spark('gen', master='local[32]'); "
            "spark.sparkContext.setLogLevel('ERROR'); "
            "generate_documents(spark, %d, grid_w=%d, grid_h=%d, "
            "verts_per_edge=%d).write.mode('overwrite').parquet(%r)"
            % (REPO, n_docs, grid, grid, vpe, corpus_path)
        )
        subprocess.run([sys.executable, "-c", gen], check=True)

    pairs = [(4, 16)]
    if os.environ.get("N_CORES"):
        n = int(os.environ["N_CORES"])
        pairs = [(n, 4 * n)]
    repeats = int(os.environ.get("REPEATS", "1"))

    def best_stages(cpus: int) -> dict:
        """Per-stage MIN across repeats: single-run per-stage timings on
        this VM swing up to 2x from GC/JIT/neighbor noise on identical
        plans (observed 12-29 s for the same 16-core cut leg), and the
        min is the standard noise-floor estimator of a stage's true cost.
        All raw runs are printed for the record."""
        runs = [run_once(cpus, corpus_path) for _ in range(repeats)]
        for r in runs:
            print(json.dumps({"raw": r, "cpus": cpus}))
        best = dict(runs[0])
        best["stages"] = {
            k: min(r["stages"][k] for r in runs) for k in runs[0]["stages"]
        }
        return best

    for n_small, n_big in pairs:
        rs = best_stages(n_small)
        rb = best_stages(n_big)
        print(f"\n== {n_small} -> {n_big} cores, {n_docs} docs ==")
        print(f"{'stage':<14}{'N sec':>9}{'4N sec':>9}{'eff':>7}{'share':>8}")
        total_n = rs["stages"]["TOTAL"]
        for k in rs["stages"]:
            a, b = rs["stages"][k], rb["stages"][k]
            eff = (a / b) / 4.0 if b > 0 else float("nan")
            print(f"{k:<14}{a:>9.2f}{b:>9.2f}{eff:>7.2f}"
                  f"{a / total_n:>8.1%}")
        print(json.dumps({"N": rs, "4N": rb}))


if __name__ == "__main__":
    main()
