#!/usr/bin/env python
"""spark-submit entrypoint: curate a text corpus for pretraining — the
training-data twin of jobs/build_topology.py.

    spark-submit --py-files dist/topojson_spark.zip jobs/curate_corpus.py \
        --input   <parquet dir or table of documents(doc_id, text, source)> \
        --output  <parquet dir for the curated corpus> \
        [--eval <parquet of benchmark docs(text)>]   n-gram decontamination \
        [--budgets '{"web": 600000, "books": 150000}']  per-source token \
                                                        budgets (JSON) \
        [--min-tokens 5] [--min-alpha 0.7] [--lsh-threshold ...]

Pipeline (each stage a pure DataFrame transform; text leaves the scan
once, every inter-stage exchange carries narrow (id, metric) tuples):

    exact dedup (md5 groupBy keep-min)
      -> near-dup survivors (minhash LSH pairs -> connected components ->
         best-quality doc per cluster)
      -> quality gate (token count, alpha ratio)
      -> [--eval] benchmark n-gram decontamination (broadcast probe)
      -> [--budgets] token-budget per-source mixture
      -> write curated parquet

Prints ONE JSON line with the per-stage funnel counts — the numbers a
100 TB run is monitored by. No per-row Python anywhere (BASELINE.json
input_hint): minhash/quality/langid are codegen expressions, the CC loop
exchanges (id, id) tuples only.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval", default=None,
                    help="parquet of benchmark documents(text) to "
                         "decontaminate against")
    ap.add_argument("--budgets", default=None,
                    help="JSON dict of per-source token budgets")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--min-alpha", type=float, default=0.7)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from topojson_spark.functions.curation import (
        decontaminate,
        token_budget_mixture,
    )
    from topojson_spark.functions.graph import (
        connected_components,
        dedup_survivors,
    )
    from topojson_spark.functions.text import (
        minhash_lsh_pairs,
        quality_score,
    )

    spark = SparkSession.builder.appName("corpus_curate").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    docs = (
        spark.read.parquet(args.input)
        if "/" in args.input
        else spark.read.table(args.input)
    )
    funnel = {"input": docs.count()}

    # near-dup survivors: exact duplicates are byte-identical minhash
    # signatures, so the CC clusters subsume the exact-dedup groups; the
    # keep rule (best quality, then smallest id) is deterministic
    qual = quality_score(docs)
    score = qual.select("doc_id", F.col("alpha_ratio").alias("score"))
    clusters = connected_components(minhash_lsh_pairs(docs))
    surv = dedup_survivors(docs, clusters, score=score).select("doc_id")
    kept = docs.join(surv, "doc_id", "left_semi")
    funnel["after_dedup"] = kept.count()

    kept = (
        kept.join(
            qual.select("doc_id", "n_tokens", "alpha_ratio"), "doc_id"
        )
        .where(
            (F.col("n_tokens") >= args.min_tokens)
            & (F.col("alpha_ratio") > args.min_alpha)
        )
        .drop("n_tokens", "alpha_ratio")
    )
    funnel["after_quality"] = kept.count()

    if args.eval:
        bench = spark.read.parquet(args.eval)
        hits = decontaminate(kept, bench)
        kept = kept.join(hits.select("doc_id"), "doc_id", "left_anti")
        funnel["after_decontaminate"] = kept.count()

    if args.budgets:
        budgets = json.loads(args.budgets)
        picked = token_budget_mixture(kept, budgets)
        kept = kept.join(picked.select("doc_id"), "doc_id", "left_semi")
        funnel["after_mixture"] = kept.count()

    kept.write.mode("overwrite").parquet(args.output)
    funnel["written"] = spark.read.parquet(args.output).count()
    print(json.dumps(funnel))
    return 0


if __name__ == "__main__":
    sys.exit(main())
