#!/usr/bin/env python
"""Sub-step timing of the cut stage at two core counts: attributes the
stage's parallelism-independent wall cost (eff 0.60 at 4->16 in the
round-4 per-stage profile; extract/junctions sit at 0.92-0.95).

Usage: N_DOCS=160000 GRID=400 VPE=32 CPUS_LIST=4,16 python tools/profile_cut.py
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
from topojson_spark.operators import cut as C
from topojson_spark.options import TopoOptions
from topojson_spark.plans.pin import pin, pin_truncate
from pyspark.sql import functions as F
from pyspark.sql import types as T

cpus = int(os.environ["CPUS"])
path = os.environ["CORPUS_PATH"]
spark = get_spark("profcut", master=f"local[{{cpus}}]",
                  shuffle_partitions=48, aqe=False)
spark.sparkContext.setLogLevel("ERROR")
from topojson_spark.sources.corpus import generate_documents
Topology(generate_documents(spark, 200, grid_w=8, grid_h=8),
         prequantize=False).arcs.count()

opts = TopoOptions(prequantize=False)
docs = spark.read.parquet(path)
features_in = features_from_documents(docs, "data")
lines0, points0, features = extract(features_in, opts, None)
lines0.count()
bbox, avg_wh, max_pts = J.compute_bbox_stats(lines0, points0)
cell = max(avg_wh) if avg_wh else None
lines_lid = lines0.withColumn(
    "lid", F.xxhash64(F.col("feature_seq"), F.col("unit_seq"), F.col("ring_seq")))
junctions = pin_truncate(J.junctions_path_connected(lines_lid, bbox, cell=cell))
junctions.count()

t = {{}}
T0 = time.time()

# --- replay cut_stage's path-connected branch step by step ---
lines_c = lines0.select(*C._LINE_COLS)

t0 = time.time()
reps = pin(lines_c.groupBy("ldig").agg(
    F.first("is_ring").alias("is_ring"),
    F.first("coords").alias("coords"),
    F.first("x0").alias("x0"), F.first("y0").alias("y0"),
    F.first("x1").alias("x1"), F.first("y1").alias("y1")))
reps.count()
t["reps_agg"] = time.time() - t0

span = max(bbox[2] - bbox[0], bbox[3] - bbox[1])
cellc = cell if cell and cell > 0 else (span / 64 if span > 0 else 1.0)
if span > 0:
    cellc = max(cellc, span / 4096)
from topojson_spark.operators.join import _with_bbox_cells
lcells = _with_bbox_cells(
    reps.selectExpr("ldig as lid", "x0", "y0", "x1", "y1"), bbox, cellc)
jcells = junctions.select(
    "jx", "jy",
    F.floor((F.col("jx") - F.lit(bbox[0])) / F.lit(cellc)).alias("cx"),
    F.floor((F.col("jy") - F.lit(bbox[1])) / F.lit(cellc)).alias("cy"))
matched = (lcells.join(jcells, on=["cx", "cy"])
           .where((F.col("jx") >= F.col("x0")) & (F.col("jx") <= F.col("x1"))
                  & (F.col("jy") >= F.col("y0")) & (F.col("jy") <= F.col("y1")))
           .select(F.col("lid").alias("ldig"), "jx", "jy")
           .dropDuplicates(["ldig", "jx", "jy"]))
splitters = matched.groupBy("ldig").agg(
    F.collect_list(F.array("jx", "jy")).alias("splitters"))

t0 = time.time()
with_split = reps.join(splitters, on="ldig", how="left")
parts_raw = C._cut_with_splitters(with_split, path_mode=True)
parts = pin_truncate(parts_raw)
n_parts = parts.count()
t["splitjoin+kernel+pin"] = time.time() - t0

t["cut_stage_total"] = time.time() - T0
t["n_parts"] = int(n_parts)

# one more read of the pinned store, narrow columns only: what dedup's
# flag pipeline pays per pass over the checkpoint
t0 = time.time()
parts.select("ldig", "split_seq", "pdig").groupBy().count().collect()
t["narrow_rescan"] = time.time() - t0

print(json.dumps({{"cpus": cpus, "steps": t}}))
"""


def main():
    n_docs = int(os.environ.get("N_DOCS", "160000"))
    grid = int(os.environ.get("GRID", "400"))
    vpe = int(os.environ.get("VPE", "32"))
    corpus_path = os.environ.get(
        "CORPUS_PATH", f"/tmp/bench_corpus_{n_docs}_{grid}_{vpe}"
    )
    if not os.path.exists(corpus_path):
        raise SystemExit(f"corpus missing: {corpus_path}")
    for cpus in [int(c) for c in os.environ.get("CPUS_LIST", "4,16").split(",")]:
        env = dict(os.environ, CPUS=str(cpus), CORPUS_PATH=corpus_path)
        cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
               JOB.format(repo=REPO)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=3600)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(out.stdout[-2000:], file=sys.stderr)
            print(out.stderr[-2000:], file=sys.stderr)
            raise SystemExit(1)
        print(lines[-1])


if __name__ == "__main__":
    sys.exit(main())
