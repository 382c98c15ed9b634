#!/usr/bin/env python
"""Junction-engine crossover bench (VERDICT r4 #4): run the three
path-connected junction engines (cellgrouped / pairwise / relational) on
the SAME corpus at two adjacency densities and record wall time + the
bytes each engine moves through its shuffles — turning the cellgrouped
docstring's "~3x fewer bytes" claim into a measured number.

Density knob: the mosaic grid. A dense grid (many small tiles) maximizes
shared-edge adjacency per line (the junction stage's pair fan-out); a
sparse grid (few big tiles over the same doc count) lowers it.

Usage: N_DOCS=40000 CPUS=16 python tools/bench_junction_engines.py
Appends one JSON line per (density, engine) to stdout.
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
from topojson_spark.operators.extract import extract, features_from_documents
from topojson_spark.operators import join as J
from topojson_spark.options import TopoOptions
from topojson_spark.plans.pin import pin_truncate
from pyspark.sql import functions as F

cpus = int(os.environ["CPUS"])
engine = os.environ["ENGINE"]
path = os.environ["CORPUS_PATH"]
spark = get_spark("jbench", master=f"local[{{cpus}}]",
                  shuffle_partitions=48, aqe=False)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

opts = TopoOptions(prequantize=False)
docs = spark.read.parquet(path)
features_in = features_from_documents(docs, "data")
lines0, points0, features = extract(features_in, opts, None)
lines0.count()  # warm the extract pin OUTSIDE the timed region
bbox, avg_wh, max_pts = J.compute_bbox_stats(lines0, points0)
cell = max(avg_wh) if avg_wh else None
lines_lid = lines0.withColumn(
    "lid", F.xxhash64(F.col("feature_seq"), F.col("unit_seq"), F.col("ring_seq")))

# shuffle-byte counters via the UI REST API (SPARK_GRAFT_UI=true): sum
# deltas across the run
import urllib.request

def shuffle_totals():
    base = sc.uiWebUrl
    app = sc.applicationId
    with urllib.request.urlopen(
        f"{{base}}/api/v1/applications/{{app}}/stages"
    ) as r:
        stages = json.load(r)
    tot_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    tot_r = sum(s.get("shuffleReadBytes", 0) for s in stages)
    return tot_w, tot_r

w0, r0 = shuffle_totals()
t0 = time.time()
junc = pin_truncate(J.junctions_path_connected(
    lines_lid, bbox, cell=cell, engine=engine,
    max_line_pts=max_pts))
n = junc.count()
dt = time.time() - t0
w1, r1 = shuffle_totals()
print(json.dumps({{"engine": engine, "cpus": cpus, "sec": round(dt, 2),
                   "n_junctions": int(n),
                   "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
                   "shuffle_read_mb": round((r1 - r0) / 1e6, 1)}}))
"""


def main() -> None:
    cpus = int(os.environ.get("CPUS", "16"))
    n_docs = int(os.environ.get("N_DOCS", "40000"))
    vpe = int(os.environ.get("VPE", "32"))
    densities = {
        # grid ~ sqrt(n_docs): every doc a distinct tile, max adjacency
        "dense": int(os.environ.get("GRID_DENSE", "200")),
        # few tiles: most docs duplicate a tile -> digest pre-dedup keeps
        # the junction input small but each rep overlaps many more cells
        "sparse": int(os.environ.get("GRID_SPARSE", "40")),
    }
    for label, grid in densities.items():
        corpus = f"/tmp/jbench_corpus_{n_docs}_{grid}_{vpe}"
        if not os.path.exists(corpus):
            gen = (
                "import sys; sys.path.insert(0, %r); "
                "from topojson_spark.session import get_spark; "
                "from topojson_spark.sources.corpus import generate_documents; "
                "spark = get_spark('gen', master='local[32]'); "
                "spark.sparkContext.setLogLevel('ERROR'); "
                "generate_documents(spark, %d, grid_w=%d, grid_h=%d, "
                "verts_per_edge=%d).write.mode('overwrite').parquet(%r)"
                % (REPO, n_docs, grid, grid, vpe, corpus)
            )
            subprocess.run([sys.executable, "-c", gen], check=True)
        for engine in ("cellgrouped", "pairwise", "relational"):
            env = dict(
                os.environ,
                CPUS=str(cpus),
                ENGINE=engine,
                CORPUS_PATH=corpus,
                SPARK_GRAFT_UI="true",
            )
            cmd = [
                "taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
                JOB.format(repo=REPO),
            ]
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=3600
            )
            lines = [
                ln for ln in out.stdout.splitlines() if ln.startswith("{")
            ]
            if not lines:
                print(out.stdout[-1500:], file=sys.stderr)
                print(out.stderr[-1500:], file=sys.stderr)
                raise SystemExit(1)
            rec = json.loads(lines[-1])
            rec["density"] = label
            rec["grid"] = grid
            rec["n_docs"] = n_docs
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
