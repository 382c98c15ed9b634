#!/usr/bin/env python
"""Sub-step timing of the dedup stage: attributes its flat (parallelism-
independent) wall cost. Runs the pipeline up to cut, pins parts/line_refs,
then times each dedup action separately at one core count (CPUS env).

Usage: CPUS=16 N_DOCS=160000 python tools/profile_dedup.py
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
import numpy as np, pandas as pd
from topojson_spark.session import get_spark
from topojson_spark.topology import Topology
from topojson_spark.operators.extract import extract, features_from_documents
from topojson_spark.operators import join as J
from topojson_spark.operators.cut import cut_stage
from topojson_spark.operators import dedup as D
from topojson_spark.options import TopoOptions
from topojson_spark.plans.pin import pin, pin_truncate
from topojson_spark.plans.ids import dense_index
from pyspark.sql import functions as F

cpus = int(os.environ["CPUS"])
path = os.environ["CORPUS_PATH"]
spark = get_spark("profdedup", master=f"local[{{cpus}}]",
                  shuffle_partitions=48, aqe=False)
spark.sparkContext.setLogLevel("ERROR")
from topojson_spark.sources.corpus import generate_documents
Topology(generate_documents(spark, 200, grid_w=8, grid_h=8),
         prequantize=False).arcs.count()

opts = TopoOptions(prequantize=False)
docs = spark.read.parquet(path)
features_in = features_from_documents(docs, "data")
lines0, points0, features = extract(features_in, opts, None)
bbox, avg_wh, max_pts = J.compute_bbox_stats(lines0, points0)
cell = max(avg_wh) if avg_wh else None
lines_lid = lines0.withColumn(
    "lid", F.xxhash64(F.col("feature_seq"), F.col("unit_seq"), F.col("ring_seq")))
junctions = J.junctions_path_connected(lines_lid, bbox, cell=cell)
from topojson_spark.plans.pin import pin_truncate as PT
junctions = PT(junctions); junctions.count()
parts, line_refs = cut_stage(lines0, junctions, False, bbox=bbox, cell=cell)
parts = pin(parts); parts.count()
line_refs = pin(line_refs); line_refs.count()

t = {{}}
T0 = time.time()

# --- replay dedup_stage step by step, timing each action ---
parts_n = parts.select("ldig", "split_seq", "pdig")
line_agg = line_refs.groupBy("ldig").agg(
    F.max(F.struct("feature_seq", "unit_seq", "ring_seq")).alias("lmax"),
    F.count(F.lit(1)).alias("n_lines"))
part_pos = parts_n.join(line_agg, on="ldig")
pos_struct = F.struct(
    F.col("lmax.feature_seq").alias("feature_seq"),
    F.col("lmax.unit_seq").alias("unit_seq"),
    F.col("lmax.ring_seq").alias("ring_seq"),
    F.col("split_seq").alias("split_seq"))
agg = part_pos.groupBy("pdig").agg(
    F.max(pos_struct).alias("kept"),
    F.sum("n_lines").alias("n_refs"),
    F.max(F.struct(F.col("ldig"), F.col("split_seq"))).alias("keep_member"))

t0 = time.time()
part_flags = pin_truncate(
    parts_n.join(agg, on="pdig").select(
        "ldig", "split_seq", "kept",
        (F.col("n_refs") > 1).alias("is_shared"),
        ((F.col("ldig") == F.col("keep_member.ldig"))
         & (F.col("split_seq") == F.col("keep_member.split_seq"))
         ).alias("is_keeper")))
row_info = part_flags.groupBy("ldig").agg(
    F.max("split_seq").alias("max_split"),
    F.min(F.struct("split_seq", "is_shared"))["is_shared"].alias("first_shared"),
    F.max(F.struct("split_seq", "is_shared"))["is_shared"].alias("last_shared"))
stats = (row_info.groupBy("max_split")
         .agg(F.sum((~F.col("first_shared") & ~F.col("last_shared")).cast("int")).alias("n_ok"))
         .orderBy(F.desc("max_split")).limit(1).collect())
t["flags+stats"] = time.time() - t0
max_len = int(stats[0]["max_split"]) + 1 if stats else 0
n_eligible = int(stats[0]["n_ok"]) if stats else 0

t0 = time.time()
from topojson_spark.operators.cut import _SUMMARY_COLS
kept_arcs = pin(
    part_flags.where(F.col("is_keeper"))
    .join(parts.select("ldig", "split_seq", "coords", *_SUMMARY_COLS),
          on=["ldig", "split_seq"])
    .select("kept", "coords", "is_shared", *_SUMMARY_COLS))
kept_arcs.count()
t["kept_arcs"] = time.time() - t0

merge_s = 0.0
if max_len > 1 and n_eligible > 0:
    t0 = time.time()
    # merge subplan (same as dedup_stage)
    eligible = row_info.where(
        (F.col("max_split") == max_len - 1)
        & ~F.col("first_shared") & ~F.col("last_shared")).select("ldig")
    merge_in = (part_flags.join(eligible, on="ldig")
                .where(~F.col("is_shared"))
                .join(parts.select("ldig", "split_seq", "coords"),
                      on=["ldig", "split_seq"])
                .select("ldig", "split_seq", "kept", "coords"))
    n_mi = merge_in.count()
    merge_s = time.time() - t0
    t["merge_in_count"] = merge_s
    t["n_merge_in"] = n_mi

t0 = time.time()
kept_flat = kept_arcs.select(
    F.col("kept.feature_seq").alias("_f"), F.col("kept.unit_seq").alias("_u"),
    F.col("kept.ring_seq").alias("_r"), F.col("kept.split_seq").alias("_s"),
    "kept", "is_shared", "coords", *_SUMMARY_COLS)
arcs_final = dense_index(kept_flat, ["_f", "_u", "_r", "_s"], "final_idx",
                         key_cols=["kept"])
arcs_final = pin_truncate(
    arcs_final.select("kept", "final_idx", "is_shared", "coords",
                      *_SUMMARY_COLS))
n_arcs = arcs_final.count()
t["dense+pin"] = time.time() - t0

t0 = time.time()
pmap = pin(
    part_flags.select("ldig", "split_seq", "kept").join(
        arcs_final.select("kept", "final_idx", "is_shared", *_SUMMARY_COLS),
        on="kept").select("ldig", "split_seq", "final_idx", "is_shared",
                          "fx", "fy", "lx", "ly", "shl"))
pmap.count()
t["pmap"] = time.time() - t0

t["TOTAL"] = time.time() - T0
t["max_len"] = max_len
t["n_eligible"] = n_eligible
t["n_arcs"] = int(n_arcs)
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
    main()
