#!/usr/bin/env python
"""Stage-by-stage wall + JVM profile of the topology pipeline (dev tool).

SPARK_GRAFT_UI=true CPUS=8 N_DOCS=200000 GRID=140 python tools/profile_pipeline.py

Per tick: wall seconds plus (when the UI is on) the exact core-seconds,
GC seconds and shuffle bytes of the stages that completed during the tick.
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from topojson_spark.session import get_spark
from topojson_spark.sources.corpus import generate_documents
from topojson_spark.operators.extract import extract, features_from_documents
from topojson_spark.operators.join import (
    compute_bbox, junctions_path_connected, candidate_pairs,
)
from topojson_spark.operators.cut import cut_stage
from topojson_spark.operators.dedup import dedup_stage
from topojson_spark.operators.hashmap import hashmap_stage
from topojson_spark.options import TopoOptions


def main() -> None:
    cpus = int(os.environ.get("CPUS", "32"))
    n_docs = int(os.environ.get("N_DOCS", "20000"))
    grid = int(os.environ.get("GRID", "48"))
    vpe = int(os.environ.get("VPE", "0"))
    spark = get_spark("profile", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    opts = TopoOptions(prequantize=False)
    t: dict[str, float] = {}
    ui = os.environ.get("SPARK_GRAFT_UI", "").lower() in ("1", "true")
    base = None
    if ui:
        base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}"

    def stage_totals():
        if not base:
            return {}
        apps = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages")
        )
        return {
            s["stageId"]: (
                s.get("executorRunTime", 0),
                s.get("jvmGcTime", 0),
                s.get("shuffleWriteBytes", 0),
                s.get("numCompleteTasks", 0),
            )
            for s in stages
        }

    def tick(name, fn):
        before = stage_totals()
        t0 = time.time()
        out = fn()
        wall = round(time.time() - t0, 2)
        t[name] = wall
        extra = ""
        if base:
            after = stage_totals()
            run = gc = sw = nt = 0
            ns = 0
            for sid, (r, g, w, k) in after.items():
                pr = before.get(sid, (0, 0, 0, 0))
                if r > pr[0] or sid not in before:
                    run += r - pr[0]
                    gc += g - pr[1]
                    sw += w - pr[2]
                    nt += k - pr[3]
                    ns += 1
            extra = (
                f" core={run/1000:8.1f}s gc={gc/1000:6.1f}s "
                f"swrite={sw/1e6:8.1f}MB stages={ns:3d} tasks={nt:5d}"
            )
            t[name + "_core_s"] = round(run / 1000, 1)
        print(f"  {name:24s} {wall:8.2f}s{extra}", flush=True)
        return out

    docs = generate_documents(spark, n_docs, grid_w=grid, grid_h=grid,
                              verts_per_edge=vpe)
    feats_in = features_from_documents(docs, "data")
    lines, points, features = extract(feats_in, opts)
    lines = lines.localCheckpoint(eager=False)
    tick("extract(count lines)", lambda: lines.count())
    bbox = tick("bbox", lambda: compute_bbox(lines, points))

    lines_lid = lines.withColumn(
        "lid", F.xxhash64("feature_seq", "unit_seq", "ring_seq"))
    if os.environ.get("PROFILE_PAIRS"):
        pairs = candidate_pairs(lines_lid.select("lid", "coords", "x0", "y0", "x1", "y1"), bbox)
        tick("candidate_pairs(count)", lambda: pairs.count())

    junctions = junctions_path_connected(lines_lid, bbox)
    junctions = junctions.localCheckpoint(eager=False)
    tick("junctions(count)", lambda: junctions.count())

    parts, refs = cut_stage(lines, junctions, False, bbox=bbox)
    tick("cut(count parts)", lambda: parts.count())
    tick("cut(count refs)", lambda: refs.count())

    def run_dedup():
        a, r, pm = dedup_stage(parts, refs)
        return a, r, pm, a.count()

    arcs_final, refs_final, pmap, _ = tick("dedup(count arcs)", run_dedup)
    tick("dedup(count refs)", lambda: refs_final.count())
    resolved = hashmap_stage(refs, pmap, arcs_final, opts)
    tick("hashmap(count)", lambda: resolved.count())
    t["TOTAL"] = round(
        sum(v for k, v in t.items() if not k.endswith("_core_s")), 2
    )
    print(json.dumps({"cpus": cpus, "n_docs": n_docs, **t}))


if __name__ == "__main__":
    main()
