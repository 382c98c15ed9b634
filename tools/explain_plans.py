#!/usr/bin/env python
"""Write PLANS.md: formatted physical plans for representative operators,
annotated with what to look for (scan pruning/pushdown, broadcast joins,
whole-stage codegen spans, shuffle placement). Run after changing operator
dataflow; the file is plan-quality evidence reviewed alongside BENCH."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def fmt(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    out = buf.getvalue()
    # keep the operator tree + the first detail blocks; full detail is long
    head, _, tail = out.partition("\n\n")
    details = tail.split("\n\n")
    return head + "\n\n" + "\n\n".join(details[:6])


def main() -> None:
    import __spark_entry__ as E
    from topojson_spark.session import get_spark

    spark = get_spark("plans", master="local[8]", aqe=False)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    sections = []

    sections.append((
        "join_region — broadcast dimension joins",
        "Expect: BroadcastHashJoin for nation/region (explicit broadcast()"
        " hints), HashAggregate partial+final, parquet scans with pruned"
        " ReadSchema (only the join/group columns).",
        fmt(qs["join_region"](spark, SF_DIR)),
    ))
    sections.append((
        "filter_agg — predicate pushdown",
        "Expect: PushedFilters: [IsNotNull(value), GreaterThan(value,100.0)]"
        " reaching the parquet scan; ReadSchema limited to"
        " event_type/value.",
        fmt(qs["filter_agg"](spark, SF_DIR)),
    ))
    sections.append((
        "cosine_topk — JVM-side vector math",
        "Expect: no BatchEvalPython / ArrowEvalPython anywhere — the dot"
        " product and norm are aggregate/zip_with expressions inside"
        " WholeStageCodegen; single TakeOrderedAndProject-style window tail.",
        fmt(qs["cosine_topk"](spark, SF_DIR)),
    ))
    sections.append((
        "ivf_topk — partition-prunable IVF probe",
        "Expect: ONE parquet scan, ZERO Exchange: centroid assignment and"
        " probe filter are pure codegen projections (at 100 TB the"
        " assignment is persisted partitioned by centroid_id, so the probe"
        " is partition pruning), TakeOrderedAndProject for the top-k, rank"
        " window only over the <=k survivors.",
        fmt(qs["ivf_topk"](spark, SF_DIR)),
    ))
    sections.append((
        "minhash_lsh_pairs — banded self-join",
        "Expect: one Exchange on (band, bucket) feeding a SortMergeJoin or"
        " ShuffledHashJoin; shingle hashing fully in codegen (md5/conv"
        " expressions), no Python.",
        fmt(qs["minhash_lsh_pairs"](spark, SF_DIR)),
    ))
    sections.append((
        "tile_pyramid — one-pass multi-zoom rollup",
        "Expect: ONE scan; leaf groupBy with partial aggregation, then an"
        " explode over zoom levels and a second partial-agg groupBy — no"
        " joins, no Python; shuffle rows ~ leaf tiles x zooms, independent"
        " of input size.",
        fmt(qs["tile_pyramid"](spark, SF_DIR)),
    ))
    sections.append((
        "hash_sample — zero-shuffle deterministic sampling",
        "Expect: ONE parquet scan with a single codegen Filter on the"
        " md5-prefix hash — ZERO Exchange, no Python, ReadSchema limited to"
        " the projected columns. Sampling 1% of 100 TB is one pass that"
        " moves no bytes between executors.",
        fmt(qs["hash_sample"](spark, SF_DIR)),
    ))
    sections.append((
        "decontaminate — broadcast shingle semi-structure",
        "Expect: the benchmark side distinct-reduced then BroadcastExchange;"
        " the corpus side explodes shingles (Generate) and probes the"
        " broadcast hash table map-side — the only real Exchange is the"
        " final per-doc count over MATCHING shingles only.",
        fmt(qs["decontaminate"](spark, SF_DIR)),
    ))
    sections.append((
        "dedup_clusters — large-star/small-star connected components",
        "Expect: the pair producer pinned once (InMemoryRelation /"
        " LogicalRDD), then per-round plans over narrow (id, id) tuples"
        " only — Exchanges on node id, no text columns anywhere; the final"
        " label join is a LEFT join of nodes against star roots.",
        fmt(qs["dedup_clusters"](spark, SF_DIR)),
    ))
    sections.append((
        "repetition_metrics — tagged-gram word-count shuffle",
        "Expect: per-row terms (token count, distinct count) as codegen"
        " projections over ONE scan; a Generate (explode) of tagged"
        " (n, gram) structs feeding HashAggregate partial+final on"
        " (doc, n, gram) — map-side combine shrinks repeated grams before"
        " the Exchange; no Python anywhere.",
        fmt(qs["repetition_metrics"](spark, SF_DIR)),
    ))
    sections.append((
        "sessionize — one exchange for windows AND aggregate",
        "Expect: exactly ONE Exchange hashpartitioning(user_id): the"
        " lag/cumsum Window sort and the final session HashAggregate reuse"
        " the same partitioning (groupBy keys are a superset of the window"
        " partition key); no Python.",
        fmt(qs["sessionize"](spark, SF_DIR)),
    ))
    sections.append((
        "pip_lattice — cell-join + winding refine",
        "Expect: cell-id equi-join (Exchange on cell), ArrowEvalPython ONLY"
        " for the exact point-in-polygon refine over candidate pairs.",
        fmt(qs["pip_lattice"](spark, SF_DIR)),
    ))

    sections.append((
        "pack_sequences — distributed exclusive prefix sum",
        "Expect: ONE range Exchange (repartitionByRange on doc_id) feeding"
        " an in-partition sort + mapInPandas attach; the only serial step"
        " (the per-partition totals collect) is O(partitions) rows — NO"
        " global single-reducer window anywhere.",
        fmt(qs["pack_sequences"](spark, SF_DIR)),
    ))
    sections.append((
        "quantile_filter — global order statistic without a global sort",
        "Expect: the SURVIVOR plan is ONE parquet scan with a codegen"
        " Filter on the bucket expression — ZERO Exchange, no sort, no"
        " window: the threshold was resolved from a bucket histogram"
        " (<= grid narrow rows) and baked in as a literal.",
        fmt(qs["quantile_filter"](spark, SF_DIR)),
    ))

    sections.append((
        "token_budget_mixture — per-source budget fill, boundary bucket only",
        "Expect: BroadcastHashJoin of the tiny (source, cutoff, before,"
        " budget) spec onto the narrow (key, source, hash, n_tokens)"
        " projection; the below-cutoff branch is a pure codegen Filter;"
        " the ONLY Window (and its LOCAL sort, printed '], false') runs on"
        " the bucket==cutoff residue — no global sort, no per-source"
        " shuffle of the full corpus beyond the histogram exchange.",
        fmt(qs["token_budget_mixture"](spark, SF_DIR)),
    ))

    sections.append((
        "dup_spans — cross-doc duplicated n-gram fraction",
        "Expect: Generate (gram explode) -> HashAggregate partial+final on"
        " (term, doc) — one exchanged tuple per DISTINCT (gram, doc) —"
        " then a groupBy(term) df count and a shuffle JOIN on the gram"
        " (AQE-splittable, deliberately not a window) before the narrow"
        " doc_id rollup; no Python anywhere.",
        fmt(qs["dup_spans"](spark, SF_DIR)),
    ))
    sections.append((
        "source_token_report — exact median off a histogram",
        "Expect: ONE scan reduced map-side to a (source, n_tokens)"
        " histogram (HashAggregate partial+final); the median window runs"
        " over those tiny rows, never the corpus; mean/var are closed-form"
        " aggregate expressions; two Exchanges total, no Python.",
        fmt(qs["source_token_report"](spark, SF_DIR)),
    ))
    sections.append((
        "topk_per_source — two-phase salted top-k per group",
        "Expect: TWO Window operators — the first partitioned on"
        " (source, salt) over the full rows, the second on source over at"
        " most k*n_salts survivors — so no task ever sorts a whole group;"
        " narrow projection only, no Python.",
        fmt(qs["topk_per_source"](spark, SF_DIR)),
    ))
    sections.append((
        "semantic_decontam — broadcast eval-set cosine probe",
        "Expect: BroadcastNestedLoopJoin with the distinct-reduced eval"
        " side as the build; the cosine filter is codegen on the stream"
        " side (corpus never shuffles); the only Exchange is the per-id"
        " max over flagged rows.",
        fmt(qs["semantic_decontam"](spark, SF_DIR)),
    ))
    sections.append((
        "token_entropy — two-level count + closed-form entropy",
        "Expect: Generate (token explode) -> HashAggregate partial+final"
        " on (doc, term) — one exchanged tuple per DISTINCT term — then a"
        " doc_id rollup computing ln(n) - sum(c ln c)/n as codegen"
        " expressions; left join restores zero-count empty docs; no"
        " Python.",
        fmt(qs["token_entropy"](spark, SF_DIR)),
    ))
    sections.append((
        "zonal_stats — PIP join + map-side-combinable rollup",
        "Expect: the pip join's pinned coarse cell join + ArrowEvalPython"
        " refine (candidates only), then a values equi-join on point_id"
        " and a partial-aggregated groupBy(poly_id) — a hot polygon ships"
        " one partial row per task, never its candidate volume.",
        fmt(qs["zonal_stats"](spark, SF_DIR)),
    ))
    sections.append((
        "dup_span_extents — maximal cross-doc duplicated spans",
        "Expect: gram text reduced to a 60-bit md5-prefix hash BEFORE any"
        " exchange (positions ride (gh, doc, pos) tuples); two-level"
        " HashAggregate for the cross-doc test; the only Window partitions"
        " by doc_id (gaps-and-islands fusion) — never by the gram, so a"
        " boilerplate gram cannot serialize one task; no Python anywhere.",
        fmt(qs["dup_span_extents"](spark, SF_DIR)),
    ))
    sections.append((
        "bm25_topk — hits-only lexical scoring",
        "Expect: the explode Generate sits above a filter to the literal"
        " query vocabulary, so only query-term hits are generated and"
        " exchanged; BroadcastHashJoin for the tiny per-term df table;"
        " fixed-order pivot sum in codegen; TakeOrderedAndProject for the"
        " top-k (no global sort, rank window over <= k rows).",
        fmt(qs["bm25_topk"](spark, SF_DIR)),
    ))
    sections.append((
        "kmeans_assign — Lloyd final assignment",
        "Expect: ONE parquet scan and ZERO Exchange — every centroid"
        " distance is an unrolled codegen aggregate expression and the"
        " argmin a CASE chain; the training rounds behind it each moved"
        " only k*dim rows (posexplode + partial-agg mean, see"
        " similarity.kmeans_lloyd).",
        fmt(qs["kmeans_assign"](spark, SF_DIR)),
    ))
    sections.append((
        "semantic_dedup — in-cluster dominated drop",
        "Expect: the pairwise cosine join keyed on centroid_id (one"
        " co-partitioned Exchange pair), id_a < id_b halving the pair"
        " space, then a LEFT ANTI join of assignments against the dropped"
        " ids; distances/cosines all codegen, no Python.",
        fmt(qs["semantic_dedup"](spark, SF_DIR)),
    ))

    # pipeline slice: junction detection over a small corpus
    from topojson_spark.operators.extract import (
        extract,
        features_from_documents,
    )
    from topojson_spark.operators.join import junctions_shared_coords
    from topojson_spark.options import TopoOptions
    from topojson_spark.sources.corpus import generate_documents

    docs = generate_documents(spark, 200, grid_w=8, grid_h=8)
    lines, _, _ = extract(
        features_from_documents(docs, "data"), TopoOptions(prequantize=False)
    )
    sections.append((
        "junction detection (coords mode) — the north-rule groupBy",
        "Expect: Generate (explode of the flat-coords vertex transform) ->"
        " two HashAggregate pairs (partial/final; the two-level distinct"
        " neighbor-set count) with ONE Exchange on the quantized vertex key"
        " between them; everything JVM-side.",
        fmt(junctions_shared_coords(lines)),
    ))

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    with open(out_path, "w") as f:
        f.write("# PLANS — physical-plan evidence (`.explain(\"formatted\")`)"
                "\n\nGenerated by tools/explain_plans.py at sf0.01, AQE off"
                " for plan stability.\n\n")
        for title, expect, plan in sections:
            f.write(f"## {title}\n\n{expect}\n\n```\n{plan}\n```\n\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
