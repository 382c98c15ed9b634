"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   : flagship — wrap sf0.001 documents into interleaved spans,
                 run the full extract->join->cut->dedup->hashmap topology
                 pipeline, return the deduplicated arc store.
queries()      : one entry per implemented operator family (SURVEY.md §2 +
                 the training-data ops); each (spark, sf_dir) -> DataFrame.
oracle_sql()   : DuckDB-equivalent ANSI SQL per query (omitted only for the
                 geometry/ANN ops that aren't SQL-expressible; those get the
                 driver's rows-only check and are covered by tests/).

Shared determinism trick: both engines hash text with an md5-prefix-as-int
(Spark: conv(substring(md5(x),1,15),16,10); DuckDB:
('0x'||substring(md5(x),1,15))::BIGINT) so minhash/simhash/fingerprint
oracles agree bit-for-bit.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- helpers

N_LANG = ["en", "de", "fr", "es"]
# single source of truth lives beside the Spark-side operators so the
# DuckDB oracle predicates cannot drift from the engine's list
from topojson_spark.functions.text import STOPWORDS  # noqa: E402

_NORM_SQL = "regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g')"
_TOKS_SQL = (
    f"list_filter(string_split_regex({_NORM_SQL}, '\\s+'), t -> t <> '')"
)

_STOP_LIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# per-source integer reputation counters (exact aggregates only — no
# floating-point means), shared by the source_stats/source_filter oracles
_SOURCE_STATS_SQL = f"""
            WITH t AS (
              SELECT source,
                     ('0x' || substring(md5(text), 1, 15))::BIGINT AS tdig,
                     len({_TOKS_SQL}) AS ntok,
                     len(list_filter({_TOKS_SQL},
                         t -> list_contains([{_STOP_LIST_SQL}], t))) AS nstop
              FROM documents
            ),
            src AS (
              SELECT source, count(*) AS n_docs,
                     count(DISTINCT tdig) AS n_distinct_texts,
                     sum(ntok)::BIGINT AS sum_tokens,
                     sum(nstop)::BIGINT AS sum_stop_hits
              FROM t GROUP BY source
            )"""

# deterministic 64-d query vector for similarity search (same literal in SQL)
QVEC = [round(((i * 37 + 11) % 64) / 64.0 - 0.5, 6) for i in range(64)]

# deterministic LSH hyperplanes (16 x 64) and IVF centroids (4 x 64): plain
# rational literals so Spark and the SQL oracle see bit-identical floats
PLANES = [
    [round(((i * 37 + j * 101 + 13) % 193) / 193.0 - 0.5, 6) for j in range(64)]
    for i in range(16)
]
CENTROIDS = [
    [round(((k * 59 + j * 17 + 29) % 83) / 83.0 - 0.5, 6) for j in range(64)]
    for k in range(4)
]
# argmin operand list for the oracle CASE expressions, derived from
# CENTROIDS so the SQL cannot silently exclude a centroid if the table grows
_LEAST_D = ", ".join(f"d{i}" for i in range(len(CENTROIDS)))

from topojson_spark.functions.curation import (  # noqa: E402
    decontaminate,
    hash_sample,
    pack_sequences,
    quantile_threshold_filter,
    stratified_sample,
    token_budget_mixture,
)
from topojson_spark.functions.events import (  # noqa: E402
    asof_join,
    sessionize,
)
from topojson_spark.functions.graph import (  # noqa: E402
    connected_components,
    dedup_survivors,
)
from topojson_spark.functions.text import (  # noqa: E402
    MINHASH_AS,
    MINHASH_BS,
    MINHASH_P,
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
    SUBWORD_RE,
    dup_span_fraction,
    exact_dedup,
    fingerprint,
    language_id,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    pii_redact,
    quality_score,
    repetition_metrics,
    simhash,
    source_filter,
    source_stats,
    term_stats,
    token_count,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _derived_points(spark, sf_dir):
    """Deterministic points over the (0,0,8,8) bbox derived from events —
    the arithmetic is reproduced verbatim in the SQL oracles."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_id").alias("point_id"),
        ((F.col("event_id") % 97) * 8.0 / 97).alias("x"),
        (((F.col("event_id") * 31) % 89) * 8.0 / 89).alias("y"),
    )


def _lattice_polygons(spark, w=8, h=8):
    rows = []
    pid = 0
    for row in range(h):
        for col in range(w):
            x, y = float(col), float(row)
            ring = [[x, y], [x + 1, y], [x + 1, y + 1], [x, y + 1], [x, y]]
            rows.append((pid, 0, ring))
            pid += 1
    return spark.createDataFrame(
        rows, "poly_id long, ring_seq int, coords array<array<double>>"
    )


def _docs_to_spans(documents: DataFrame, grid: int = 16) -> DataFrame:
    """Wrap the relational documents table into the interleaved
    (doc_id, spans) corpus shape (BASELINE.json input_hint): every doc gets
    a text span plus a lattice-polygon geometry span keyed by doc_id, so
    interior edges are shared bit-identically (junction/dedup stressor)."""
    d = documents.select(
        F.col("doc_id").cast("long").alias("did"), F.col("text")
    )
    col = (F.col("did") % grid).cast("double")
    row = ((F.col("did") / grid).cast("long") % grid).cast("double")
    ring = F.array(
        F.array(col, row),
        F.array(col + 1, row),
        F.array(col + 1, row + 1),
        F.array(col, row + 1),
        F.array(col, row),
    )
    geom_json = F.concat(
        F.lit('{"type": "Polygon", "coordinates": ['),
        F.to_json(ring),
        F.lit("]}"),
    )
    return d.select(
        F.format_string("doc_%08d", "did").alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ),
            F.struct(
                F.lit("geometry").alias("kind"),
                geom_json.alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(1000).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )


# ---------------------------------------------------------------- entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sf0.001 documents -> interleaved spans -> full topology."""
    from topojson_spark.topology import Topology

    docs = _t(spark, "/root/testdata/sf0.001", "documents")
    corpus = _docs_to_spans(docs)
    topo = Topology(corpus, prequantize=False)
    return topo.arcs.select(
        "final_idx",
        "is_shared",
        (F.size("coords") / 2).cast("int").alias("n_points"),
    )


# ---------------------------------------------------------------- queries


def q_bounds(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    )


def q_junction_groupby(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_suppkey").alias("n_neigh"))
        .where(F.col("n_neigh") > 1)
        .select("l_partkey", "n_neigh")
    )


def q_dedup_keepmin(spark, sf_dir):
    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_shared_count(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_refs"))
        .where(F.col("n_refs") > 1)
        .select("o_custkey", "n_refs")
    )


def q_filter_agg(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.col("value") > 100.0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select("event_type", "n", "min_value", "max_value")
    )


def q_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey")).select(
        "o_orderkey", "o_totalprice"
    ).limit(10)


def q_join_region(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select("r_name", "n_customers")
    )


def q_token_count(spark, sf_dir):
    return token_count(_t(spark, sf_dir, "documents"))


def q_subword_count(spark, sf_dir):
    """BPE-ish regex word-piece count next to the whitespace count —
    the token-budget estimator; pure codegen, zero shuffles."""
    from topojson_spark.functions.text import subword_count

    return subword_count(_t(spark, sf_dir, "documents"))


def q_quality(spark, sf_dir):
    return quality_score(_t(spark, sf_dir, "documents"))


def q_langid(spark, sf_dir):
    return language_id(_t(spark, sf_dir, "documents"))


def q_fingerprint(spark, sf_dir):
    return fingerprint(_t(spark, sf_dir, "documents"))


def q_simhash(spark, sf_dir):
    return simhash(_t(spark, sf_dir, "documents"))


def q_minhash(spark, sf_dir):
    sig = minhash_signatures(_t(spark, sf_dir, "documents"))
    return sig.select(
        "doc_id", *[F.col("sig")[i].alias(f"h{i}") for i in range(8)]
    )


def q_lsh_pairs(spark, sf_dir):
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"))


def q_dedup_clusters(spark, sf_dir):
    """Transitive closure of the minhash near-dup pair graph: one
    (doc_id, cluster_id=component-min) row per doc appearing in a pair."""
    docs = _t(spark, sf_dir, "documents")
    return connected_components(minhash_lsh_pairs(docs))


def q_dedup_survivors(spark, sf_dir):
    """Full dedup pipeline: pairs -> clusters -> keep the best-quality doc
    per cluster (alpha_ratio desc, doc_id asc); singletons survive."""
    docs = _t(spark, sf_dir, "documents")
    clusters = connected_components(minhash_lsh_pairs(docs))
    score = quality_score(docs).select(
        "doc_id", F.col("alpha_ratio").alias("score")
    )
    return dedup_survivors(docs, clusters, score=score)


def q_corpus_curation(spark, sf_dir):
    """The end-to-end training-set selection: near-dup survivors (minhash
    pairs -> connected components -> best-quality per cluster) filtered to
    English docs above quality thresholds — every stage shuffles only
    narrow (id, metric) tuples; text leaves the scan once."""
    docs = _t(spark, sf_dir, "documents")
    clusters = connected_components(minhash_lsh_pairs(docs))
    qual = quality_score(docs)
    score = qual.select("doc_id", F.col("alpha_ratio").alias("score"))
    surv = dedup_survivors(docs, clusters, score=score)
    lang = language_id(docs)
    return (
        docs.select("doc_id")
        .join(surv.select("doc_id"), "doc_id", "left_semi")
        .join(lang, "doc_id")
        .join(qual.select("doc_id", "alpha_ratio", "n_tokens"), "doc_id")
        .where(
            (F.col("lang_guess") == "en")
            & (F.col("alpha_ratio") > 0.7)
            & (F.col("n_tokens") >= 5)
        )
        .select("doc_id", "n_tokens")
    )


def q_corpus_curation_v2(spark, sf_dir):
    """The round-5 curation recipe end-to-end: Lee-style duplicated-span
    filter (drop docs whose trigram positions are >60% cross-doc dups)
    INTERSECT SemDeDup semantic survivors (docs whose embedding was
    pruned in-cluster at cos >= 0.4 drop; docs without a vector pass)
    INTERSECT quality-weighted deterministic sampling (p = n_chars/400).
    Each leg is its own oracle-gated operator; this query gates the
    composition. Text rides no shuffle in any leg."""
    from topojson_spark.functions.similarity import semantic_dedup
    from topojson_spark.functions.text import dup_span_fraction
    from topojson_spark.functions.curation import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    spans = dup_span_fraction(docs, n=3)
    keep = spans.where(F.col("dup_frac") <= 0.6).select(
        "doc_id", "dup_frac"
    )
    sem = semantic_dedup(emb, centroids=CENTROIDS, threshold=0.4)
    sem_dropped = (
        emb.select("vec_id")
        .join(sem.select("vec_id"), "vec_id", "left_anti")
        .withColumnRenamed("vec_id", "doc_id")
    )
    cand = docs.join(keep, "doc_id").join(
        sem_dropped, "doc_id", "left_anti"
    )
    return weighted_sample(
        cand, F.col("n_chars") / F.lit(400.0), salt="v2"
    ).select("doc_id", "source", "n_chars", "dup_frac")


def q_hash_sample(spark, sf_dir):
    """Deterministic 25% Bernoulli sample by content hash — re-run-stable
    and partition-order independent (a rand(seed) sample is neither)."""
    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, 0.25, salt="r3").select("doc_id", "lang")


def q_pack_sequences(spark, sf_dir):
    """Pretraining sequence packing: deterministic doc order, distributed
    exclusive prefix sum of token counts, context-window assignment."""
    return pack_sequences(_t(spark, sf_dir, "documents"), max_tokens=2048)


def q_quantile_filter(spark, sf_dir):
    """Keep the corpus's top 30% by alpha quality ratio — a global order
    statistic computed WITHOUT a global sort: bucket histogram (narrow
    map-side reduce), driver cumsum over <= grid rows, broadcast-literal
    codegen filter."""
    qual = quality_score(_t(spark, sf_dir, "documents")).select(
        "doc_id", "alpha_ratio"
    )
    return quantile_threshold_filter(qual, "alpha_ratio", 0.30).select(
        "doc_id"
    )


def q_token_budget_mixture(spark, sf_dir):
    """Per-source corpus mixture to token budgets (the pretraining data
    mixing step): greedy keep in key-hash order until each source's
    budget fills. Scale path: map-side (source, hash-bucket) token
    histogram + driver cumsum + broadcast boundary spec — only the
    boundary bucket (~1/65,536th of a source) pays a prefix window."""
    docs = _t(spark, sf_dir, "documents")
    return token_budget_mixture(
        docs, {"src3": 0, "src7": 150}, default_budget=600, salt="mix"
    )


def q_weighted_sample(spark, sf_dir):
    """Quality-weighted deterministic sampling: per-row keep probability
    n_chars/400 (clamped), one codegen filter, zero shuffles."""
    from topojson_spark.functions.curation import weighted_sample

    docs = _t(spark, sf_dir, "documents")
    return weighted_sample(
        docs, F.col("n_chars") / F.lit(400.0), salt="wq"
    ).select("doc_id", "source", "n_chars")


def q_stratified_sample(spark, sf_dir):
    """Exact 20-doc quota per language, drawn by key-hash order (a seeded
    uniform draw without replacement, deterministic across engines)."""
    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, "lang", 20, salt="r3").select(
        "doc_id", "lang"
    )


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs (train split: doc_id % 7 != 0)
    sharing any word 6-gram with the eval split (doc_id % 7 == 0), with
    the count of distinct shared shingles."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 7 == 0)
    train = docs.where(F.col("doc_id") % 7 != 0)
    return decontaminate(train, bench, n=6)


def q_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return ngram_jaccard_pairs(docs, threshold=0.01).select(
        "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard_r")
    )


def q_cosine_topk(spark, sf_dir):
    from topojson_spark.functions.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, QVEC, 20)
    return out.select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim_r"), "rank"
    )


def q_ivf_assign(spark, sf_dir):
    from topojson_spark.functions.similarity import ivf_assign

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_assign(emb, CENTROIDS).select("vec_id", "centroid_id")


def _ivf_probes(n_probe: int) -> list:
    """Centroid ids nearest QVEC (driver-side literals, shared verbatim by
    the Spark query and the SQL oracle — same selection ivf_topk makes)."""
    d2 = []
    for i, c in enumerate(CENTROIDS):
        d2.append((sum((a - b) ** 2 for a, b in zip(QVEC, c)), i))
    return [i for _, i in sorted(d2)[:n_probe]]


def q_ivf_topk(spark, sf_dir):
    from topojson_spark.functions.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    out = ivf_topk(emb, CENTROIDS, QVEC, k=10, n_probe=2)
    return out.select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim_r"), "rank"
    )


def _query_probes(planes) -> list:
    """LSH probe buckets for QVEC against ``planes`` (driver-side literal,
    shared verbatim by the Spark query and the SQL oracle)."""
    base = 0
    for i, p in enumerate(planes):
        dot = 0.0
        for a, b in zip(QVEC, p):
            dot += a * b
        if dot >= 0:
            base |= 1 << i
    probes = {base}
    for i in range(len(planes)):
        probes.add(base ^ (1 << i))
    return sorted(probes)


# 8 planes -> 256 buckets: the probed set stays a small fraction of the
# corpus while still holding a non-trivial candidate pool at sf0.01
ANN_PLANES = PLANES[:8]


def q_ann_lsh(spark, sf_dir):
    from topojson_spark.functions.similarity import (
        cosine_topk,
        lsh_signature_col,
    )

    emb = _t(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id", "embedding",
        lsh_signature_col("embedding", ANN_PLANES).alias("sig"),
    )
    cand = bucketed.where(F.col("sig").isin(_query_probes(ANN_PLANES)))
    out = cosine_topk(cand, QVEC, 10)
    return out.select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim_r"), "rank"
    )


def q_kmeans(spark, sf_dir):
    """Distributed k-means (Lloyd, k=4, 2 recompute rounds from id-ordered
    seeds): per-round stats collapse map-side to k*dim rows, centroids
    ride back as codegen literals. Output is the final integer assignment
    surface — engine-reproducible like ivf_assign."""
    from topojson_spark.functions.similarity import kmeans_lloyd

    emb = _t(spark, sf_dir, "embeddings")
    assigned, _ = kmeans_lloyd(emb, k=4, iters=2)
    return assigned.select("vec_id", "centroid_id")


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup-style pruning against the fixed codebook: within each
    cluster drop every vector with a smaller-id neighbor at cos >= 0.4.
    The pairwise scan never leaves a cluster (one co-partitioned join)."""
    from topojson_spark.functions.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, centroids=CENTROIDS, threshold=0.4)


def q_embedding_neardup(spark, sf_dir):
    from topojson_spark.functions.similarity import cosine_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    out = cosine_neardup_pairs(emb, PLANES, n_bands=4, threshold=0.4)
    return out.select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim_r")
    )


def q_simhash_neardup(spark, sf_dir):
    from topojson_spark.functions.text import simhash_neardup_pairs

    return simhash_neardup_pairs(
        _t(spark, sf_dir, "documents"), max_hamming=6, n_bands=8
    )


def q_pip(spark, sf_dir):
    from topojson_spark.spatial.pip import point_in_polygon_join

    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("point_id"),
        ((F.col("vec_id") % 16) * 0.5 + 0.25).alias("x"),
        (F.floor((F.col("vec_id") % 256) / 16) * 0.5 + 0.25).alias("y"),
    )
    polys = _lattice_polygons(spark, 8, 8)
    return point_in_polygon_join(pts, polys, (0.0, 0.0, 8.0, 8.0), level=4)


def q_raster(spark, sf_dir):
    from topojson_spark.spatial.tiles import rasterize_points

    pts = _derived_points(spark, sf_dir)
    out = rasterize_points(pts, (0.0, 0.0, 8.0, 8.0), zoom=3)
    return out.select("tile_x", "tile_y", "n")


def q_repetition(spark, sf_dir):
    """Gopher-style repetition filters: duplicate-token fraction plus top
    bigram/trigram token fractions — per-row terms are codegen over the
    scan, the gram maxima one narrow tagged-gram word-count shuffle."""
    docs = _t(spark, sf_dir, "documents")
    return repetition_metrics(docs)


def q_pii_redact(spark, sf_dir):
    """PII scrub (emails / phones / IPv4 -> bracketed sentinels). The
    synthetic corpus carries no PII, so the query injects a deterministic
    email+phone+ip tail per document (same expression in the oracle) —
    the redaction passes then have real work to do on every row."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-123-4567 ip 10.0.0."),
            ((F.col("doc_id") % 254) + 1).cast("string"),
        ).alias("text"),
    )
    return pii_redact(docs)


def q_source_stats(spark, sf_dir):
    """Per-source integer reputation stats (doc/distinct/token/stopword
    counts) — the tiny dimension a domain filter broadcasts."""
    return source_stats(_t(spark, sf_dir, "documents"))


def q_source_filter(spark, sf_dir):
    """C4-style source filter: drop every document whose source fails the
    duplicate-rate or stopword-density reputation gates (integer
    cross-multiplied predicates; 60 per-mille splits the synthetic
    sources roughly in half, so the filter has real signal)."""
    docs = _t(spark, sf_dir, "documents")
    return source_filter(docs, max_dup_pct=50, min_stop_per_mille=60)


_US_SQL = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
    "cast(ts as timestamp_ntz))"
)


def q_asof_join(spark, sf_dir):
    """Backward as-of join: every non-error event picks up the latest
    preceding (or simultaneous) error of the same user. Spark has no
    ASOF JOIN; the operator is the union+window composition — one
    exchange, no row multiplication."""
    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") != "error").select(
        "event_id", "ts", "user_id", "value"
    )
    right = ev.where(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id", "value"
    )
    out = asof_join(left, right, right_cols=("value",))
    return out.select(
        "user_id",
        "event_id",
        F.expr(_US_SQL).alias("us"),
        "value",
        "asof_us",
        "asof_value",
    )


def q_asof_join_bucketed(spark, sf_dir):
    """The as-of join's hot-key escape hatch (windows partition on
    (key, time bucket) so a pathological key subdivides across tasks) —
    contractually bit-equal to asof_join, so it shares asof_join's DuckDB
    ASOF oracle verbatim: the strongest possible equivalence check."""
    from topojson_spark.functions.events import asof_join_bucketed

    ev = _t(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") != "error").select(
        "event_id", "ts", "user_id", "value"
    )
    right = ev.where(F.col("event_type") == "error").select(
        "event_id", "ts", "user_id", "value"
    )
    out = asof_join_bucketed(
        left, right, right_cols=("value",), bucket_minutes=60
    )
    return out.select(
        "user_id",
        "event_id",
        F.expr(_US_SQL).alias("us"),
        "value",
        "asof_us",
        "asof_value",
    )


def q_ivf_topk_persisted(spark, sf_dir):
    """IVF probe over a PERSISTED assignment store partitioned by
    centroid_id (the 100 TB probe path: the isin(probes) filter becomes a
    directory-pruning PartitionFilter at the scan). Shares ivf_topk's
    oracle — the store is written once per (sf_dir) from the same
    embeddings table, then only the probed partitions are read."""
    import hashlib as _hl
    import os as _os

    from topojson_spark.functions.similarity import (
        ivf_assign,
        ivf_topk_persisted,
    )
    from topojson_spark.sources.tables import write_table

    # cache key includes the source parquet's (mtime, size): regenerated
    # testdata at the same path gets a FRESH store instead of a stale one
    src = _os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = _os.stat(src)
        fingerprint = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fingerprint = sf_dir
    store = (
        "/tmp/ivf_store_"
        + _hl.sha1(fingerprint.encode()).hexdigest()[:12]
    )
    if not _os.path.exists(_os.path.join(store, "_SUCCESS")):
        emb = _t(spark, sf_dir, "embeddings")
        write_table(
            ivf_assign(emb, CENTROIDS), store, partition_by=["centroid_id"]
        )
    out = ivf_topk_persisted(spark, store, CENTROIDS, QVEC, k=10, n_probe=2)
    return out.select(
        "vec_id", F.round("cos_sim", 6).alias("cos_sim_r"), "rank"
    )


def q_zonal_stats(spark, sf_dir):
    """Zonal statistics over the 8x8 lattice: per-polygon count/sum/min/
    max/mean of an integer point value — the PIP join's narrow pairs plus
    a map-side-combinable rollup. Values are longs so the mean's single
    division is engine-exact."""
    from topojson_spark.spatial.pip import zonal_stats

    emb = _t(spark, sf_dir, "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("point_id"),
        ((F.col("vec_id") % 16) * 0.5 + 0.25).alias("x"),
        (F.floor((F.col("vec_id") % 256) / 16) * 0.5 + 0.25).alias("y"),
        (F.col("vec_id") % 97).alias("value"),
    )
    polys = _lattice_polygons(spark, 8, 8)
    return zonal_stats(pts, polys, (0.0, 0.0, 8.0, 8.0), level=4)


def q_token_entropy(spark, sf_dir):
    """Per-doc token-distribution Shannon entropy (repetitive/templated
    text scores low): two-level (doc, term) count, per-doc rollup;
    entropy = ln(n) - sum(c ln c)/n, rounded to 6 in both engines."""
    from topojson_spark.functions.text import token_entropy

    return token_entropy(_t(spark, sf_dir, "documents"))


def q_semantic_decontam(spark, sf_dir):
    """Embedding-cosine benchmark decontamination: corpus vectors within
    0.35 cosine of any eval vector (here: the 10 smallest-id embeddings
    standing in for an eval set, broadcast map-side). The semantic twin
    of the n-gram decontaminate query."""
    from topojson_spark.functions.similarity import semantic_decontaminate

    emb = _t(spark, sf_dir, "embeddings")
    ev = emb.where(F.col("vec_id") < 10)
    out = semantic_decontaminate(emb, ev, threshold=0.35)
    return out.select(
        "vec_id", F.round("max_eval_cos", 6).alias("max_cos_r")
    )


def q_topk_per_source(spark, sf_dir):
    """Exact top-5 documents per source by token count — the two-phase
    (salted then merged) selection, so no task ever sorts a whole
    source."""
    from topojson_spark.functions.curation import topk_per_group
    from topojson_spark.functions.text import token_count

    docs = _t(spark, sf_dir, "documents")
    scored = token_count(docs).join(
        docs.select("doc_id", "source"), on="doc_id"
    )
    return topk_per_group(scored, "source", "n_tokens", k=5)


def q_source_token_report(spark, sf_dir):
    """Per-source token-length distribution (count/sum/min/max/mean/var/
    exact median). The median comes off a (source, n_tokens) histogram +
    tiny window — no value buffering, no global sort; mean/var are
    closed-form over exact integer aggregates so every double is
    engine-reproducible."""
    from topojson_spark.functions.text import source_token_report

    return source_token_report(_t(spark, sf_dir, "documents"))


def q_term_stats(spark, sf_dir):
    """Corpus vocabulary (document frequency + term frequency, df >= 2):
    the two-level word-count whose exchange carries one tuple per
    distinct (term, doc), never one per occurrence."""
    return term_stats(_t(spark, sf_dir, "documents"), min_df=2)


def q_ngram_stats(spark, sf_dir):
    """Word-bigram vocabulary (df >= 2) — the frequency table behind
    boilerplate detection. Same two-level count plan as term_stats; a
    document ships one tuple per distinct bigram."""
    return term_stats(_t(spark, sf_dir, "documents"), min_df=2, n=2)


def q_bm25(spark, sf_dir):
    """BM25 top-15 lexical retrieval for a 3-term query: hits-only
    explode (the corpus text never shuffles), fixed-order pivot sum for
    engine-exact scores, TakeOrderedAndProject selection."""
    from topojson_spark.functions.text import bm25_topk

    out = bm25_topk(
        _t(spark, sf_dir, "documents"), ["customer", "scan", "spark"], k=15
    )
    return out.select(
        "doc_id", F.round("score", 6).alias("score_r"), "rank"
    )


def q_dup_spans(spark, sf_dir):
    """Duplicated-span scoring (Lee et al. 2022): per document, the
    fraction of its word trigram positions shared with another document.
    Two-level gram count + AQE-splittable shuffle join — no windows."""
    return dup_span_fraction(_t(spark, sf_dir, "documents"), n=3)


def q_dup_span_extents(spark, sf_dir):
    """Maximal cross-document duplicated token spans (the strip-list form
    of dup_spans): positions of cross-doc-duplicated trigrams fused into
    [span_start, span_end) islands. Gram text never shuffles (60-bit
    md5-prefix hash); the only window partitions by doc_id."""
    from topojson_spark.functions.text import dup_span_extents

    return dup_span_extents(_t(spark, sf_dir, "documents"), n=3)


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-minute gap): one exchange on user_id
    serves the lag/cumsum windows AND the session aggregate."""
    ev = _t(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=30)


def q_event_windows(spark, sf_dir):
    """Tumbling 10-minute event-time windows (the batch shape of
    streaming.stream_windowed_event_counts). Sums go through decimal so
    they are order-independent and bit-identical across engines."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("win_start"),
            "event_type", "n", "sum_value",
        )
    )


def q_tile_pyramid(spark, sf_dir):
    from topojson_spark.spatial.tiles import tile_pyramid

    pts = _derived_points(spark, sf_dir)
    return tile_pyramid(pts, (0.0, 0.0, 8.0, 8.0), max_zoom=3).select(
        "zoom", "tile_x", "tile_y", "n"
    )


def q_tile_clip(spark, sf_dir):
    """Vector-tile clipping over event-derived horizontal segments: one
    clipped piece per touched tile; rounding reconciles the kernel's
    p + t*d crossing arithmetic with the oracle's exact interval math."""
    from topojson_spark.spatial.tiles import clip_arcs_to_tiles

    pts = _derived_points(spark, sf_dir)
    arcs = pts.select(
        F.col("point_id").alias("arc_id"),
        F.array(
            "x", "y", F.least(F.col("x") + 2.5, F.lit(8.0)), "y"
        ).alias("coords"),
    )
    out = clip_arcs_to_tiles(arcs, (0.0, 0.0, 8.0, 8.0), zoom=3)
    return out.select(
        "arc_id", "tile_x", "tile_y",
        F.round(F.col("coords")[0], 9).alias("x0"),
        F.round(F.col("coords")[1], 9).alias("y0"),
        F.round(F.col("coords")[2], 9).alias("x1"),
        F.round(F.col("coords")[3], 9).alias("y1"),
    )


def q_knn(spark, sf_dir):
    from topojson_spark.spatial.knn import knn_join

    pts = _derived_points(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 15)
    qs = emb.select(
        F.col("vec_id").alias("qid"),
        (((F.col("vec_id") * 7) % 13) * 8.0 / 13).alias("x"),
        (((F.col("vec_id") * 11) % 17) * 8.0 / 17).alias("y"),
    )
    out = knn_join(qs, pts, k=5, bbox=(0.0, 0.0, 8.0, 8.0), level=3,
                   max_rings=2)
    return out.select("qid", "point_id", "rank")


MOSAIC_ARCS = "/tmp/spark_graft_oracle/mosaic_arcs.parquet"
MOSAIC_LINKS = "/tmp/spark_graft_oracle/mosaic_links.parquet"


def q_topology_mosaic(spark, sf_dir):
    """Full pipeline over the deterministic synthetic corpus, with a
    NON-CIRCULAR invariant oracle (upgraded from rows-only in r4):

    The per-arc ``is_shared`` flag (a dedup-stage output) and the
    per-ring signed-arc references (a hashmap-stage output) are written
    to side parquets; the DuckDB oracle RECOMPUTES is_shared from the
    reference counts of the signed-arc surface (decode ``s < 0 -> -s-1``,
    count occurrences, shared := refcount >= 2) — two independently
    computed engine surfaces cross-checked — and gates n_points on
    structural invariants (every arc referenced, every reference in
    range, >= 2 points per arc, even flat length, all coordinates
    integral lattice points inside the 8x8 grid). Any violation emits a
    poisoned value and fails the hash. Exact stitched-geometry semantics
    stay pinned by tests/test_pipeline.py and test_fixture_parity.py."""
    from topojson_spark.sources.corpus import generate_documents
    from topojson_spark.topology import Topology

    docs = generate_documents(spark, n_docs=80, grid_w=8, grid_h=8)
    topo = Topology(docs, prequantize=False)
    arcs = topo.arcs.select("final_idx", "is_shared", "coords")
    arcs.write.mode("overwrite").parquet(MOSAIC_ARCS)
    topo.resolved.select(
        "fkey", "unit_seq", "ring_seq",
        F.explode("signed_arcs").alias("s"),
    ).write.mode("overwrite").parquet(MOSAIC_LINKS)
    return arcs.select(
        "final_idx", "is_shared",
        (F.size("coords") / 2).cast("int").alias("n_points"),
    )


SIMP_ORIG = "/tmp/spark_graft_oracle/simplify_orig.parquet"
SIMP_OUT = "/tmp/spark_graft_oracle/simplify_out.parquet"


def q_toposimplify(spark, sf_dir):
    """Post-op chain: pipeline -> toposimplify -> arc sizes, with a
    NON-CIRCULAR invariant oracle (upgraded from rows-only in r4):

    Original and simplified arc stores are written to side parquets; the
    DuckDB oracle checks the Douglas-Peucker contract without
    reimplementing DP — per arc: vertex count <= original, both
    endpoints preserved bit-for-bit, every retained vertex a member of
    the original vertex sequence, and the arc SET preserved one-to-one
    (full outer join; an arc present on only one side or any violated
    invariant emits a poisoned n_points and fails the hash/row gate).
    Exact retained-vertex values are pinned by tests/test_postops.py."""
    from topojson_spark.sources.corpus import generate_documents
    from topojson_spark.topology import Topology

    docs = generate_documents(spark, n_docs=80, grid_w=8, grid_h=8,
                              verts_per_edge=4)
    topo = Topology(docs, prequantize=False)
    topo.arcs.select("final_idx", "coords").write.mode(
        "overwrite"
    ).parquet(SIMP_ORIG)
    simp = topo.toposimplify(0.3)
    simp.arcs.select("final_idx", "coords").write.mode(
        "overwrite"
    ).parquet(SIMP_OUT)
    return simp.arcs.select(
        "final_idx", (F.size("coords") / 2).cast("int").alias("n_points")
    )


VECTOR_TILES_SEGS = "/tmp/spark_graft_oracle/vector_tiles_segs.parquet"


def q_vector_tiles(spark, sf_dir):
    """Raster<->vector tile assignment over the deduplicated arc store.

    Oracle design: the arc SEGMENTS (arc_id, per-segment bbox) are written
    to a side parquet; the DuckDB oracle independently recomputes the
    segment -> tile cover (clamped floor grid math + tile-range expansion)
    and the per-tile distinct-arc counts from those raw segments — the tile
    assignment and aggregation logic is fully cross-checked, only the arc
    store itself is pinned by tests/test_pipeline.py instead."""
    from topojson_spark.sources.corpus import generate_documents
    from topojson_spark.spatial.tiles import assign_arcs_to_tiles
    from topojson_spark.topology import Topology

    docs = generate_documents(spark, n_docs=80, grid_w=8, grid_h=8)
    topo = Topology(docs, prequantize=False)
    arcs = topo.arcs.select(F.col("final_idx").alias("arc_id"), "coords")
    segs = arcs.select(
        "arc_id",
        F.expr(
            "explode(transform(sequence(0, (size(coords) div 2) - 2), "
            "i -> struct(least(coords[2*i], coords[2*i + 2]) as sx0, "
            "least(coords[2*i + 1], coords[2*i + 3]) as sy0, "
            "greatest(coords[2*i], coords[2*i + 2]) as sx1, "
            "greatest(coords[2*i + 1], coords[2*i + 3]) as sy1)))"
        ).alias("s"),
    ).select("arc_id", "s.sx0", "s.sy0", "s.sx1", "s.sy1")
    segs.write.mode("overwrite").parquet(VECTOR_TILES_SEGS)
    out = assign_arcs_to_tiles(arcs, (0.0, 0.0, 8.0, 8.0), zoom=2)
    return out.groupBy("tile_x", "tile_y").agg(
        F.count(F.lit(1)).alias("n_arcs")
    )


def q_media_features(spark, sf_dir):
    """Multimodal plumbing: decode-stub features + a payload digest the
    DuckDB oracle can recompute (synth payloads are sha256-derived, so the
    oracle rebuilds the hex payload and hashes it VARCHAR-side)."""
    from topojson_spark.functions.multimodal import extract_features, synth_media

    media = synth_media(spark, 64)
    feats = extract_features(media).select(
        "media_id", F.size("feat").alias("n_feat")
    )
    digests = media.select(
        "media_id", F.sha2(F.hex(F.col("payload")), 256).alias("payload_digest")
    )
    return feats.join(digests, on="media_id").select(
        "media_id", "n_feat", "payload_digest"
    )


def q_span_roundtrip(spark, sf_dir):
    """Span-sequence invariant over the interleaved shape of input_hint:
    documents are re-shaped into (kind, text, media_ref, offset) span
    arrays — every 4th span a media ref, the rest 8-word text chunks —
    and flattened through span_manifest. The DuckDB oracle rebuilds the
    exact same manifest from the raw documents table, checking the
    interleave, ordering and offsets end-to-end."""
    from topojson_spark.sources.corpus import span_manifest

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") < 200)
        .select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.split(F.col("text"), " ").alias("words"),
        )
        .select(
            "doc_id",
            F.expr(
                """
                transform(
                  sequence(0, cast(ceil(size(words) / 8.0) as int) - 1),
                  k -> struct(
                    if(k % 4 = 3, 'media', 'text') as kind,
                    if(k % 4 = 3, cast(null as string),
                       array_join(slice(words, k * 8 + 1, 8), ' ')) as text,
                    if(k % 4 = 3, concat('m_', doc_id, '_', cast(k as string)),
                       cast(null as string)) as media_ref,
                    cast(k * 8 as int) as offset
                  )
                )
                """
            ).alias("spans"),
        )
    )
    return span_manifest(spark, docs)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bounds_agg": q_bounds,
        "junction_groupby": q_junction_groupby,
        "dedup_keepmin": q_dedup_keepmin,
        "shared_count": q_shared_count,
        "filter_agg": q_filter_agg,
        "topk_orders": q_topk,
        "join_region": q_join_region,
        "token_count": q_token_count,
        "subword_count": q_subword_count,
        "quality_score": q_quality,
        "language_id": q_langid,
        "fingerprint": q_fingerprint,
        "simhash": q_simhash,
        "minhash_signatures": q_minhash,
        "minhash_lsh_pairs": q_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_survivors": q_dedup_survivors,
        "corpus_curation": q_corpus_curation,
        "corpus_curation_v2": q_corpus_curation_v2,
        "hash_sample": q_hash_sample,
        "pack_sequences": q_pack_sequences,
        "quantile_filter": q_quantile_filter,
        "stratified_sample": q_stratified_sample,
        "weighted_sample": q_weighted_sample,
        "token_budget_mixture": q_token_budget_mixture,
        "decontaminate": q_decontaminate,
        "ngram_jaccard": q_jaccard,
        "cosine_topk": q_cosine_topk,
        "ivf_assign": q_ivf_assign,
        "ivf_topk": q_ivf_topk,
        "ann_lsh_topk": q_ann_lsh,
        "embedding_neardup": q_embedding_neardup,
        "kmeans_assign": q_kmeans,
        "semantic_dedup": q_semantic_dedup,
        "simhash_neardup": q_simhash_neardup,
        "pip_lattice": q_pip,
        "toposimplify_arcs": q_toposimplify,
        "vector_tiles": q_vector_tiles,
        "raster_tiles": q_raster,
        "tile_pyramid": q_tile_pyramid,
        "tile_clip": q_tile_clip,
        "event_windows": q_event_windows,
        "repetition_metrics": q_repetition,
        "pii_redact": q_pii_redact,
        "source_stats": q_source_stats,
        "source_filter": q_source_filter,
        "source_token_report": q_source_token_report,
        "semantic_decontam": q_semantic_decontam,
        "token_entropy": q_token_entropy,
        "zonal_stats": q_zonal_stats,
        "topk_per_source": q_topk_per_source,
        "asof_join": q_asof_join,
        "asof_join_bucketed": q_asof_join_bucketed,
        "ivf_topk_persisted": q_ivf_topk_persisted,
        "term_stats": q_term_stats,
        "ngram_stats": q_ngram_stats,
        "dup_spans": q_dup_spans,
        "dup_span_extents": q_dup_span_extents,
        "bm25_topk": q_bm25,
        "sessionize": q_sessionize,
        "knn_grid": q_knn,
        "topology_mosaic": q_topology_mosaic,
        "media_features": q_media_features,
        "span_roundtrip": q_span_roundtrip,
    }


# ---------------------------------------------------------------- oracles


def _sh_cte(doc_filter: str = "") -> str:
    """Shared CTEs: normalized tokens + distinct 3-gram shingle hashes."""
    return f"""
    toks AS (
      SELECT doc_id, {_TOKS_SQL} AS tk FROM documents {doc_filter}
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             ('0x' || substring(md5(g), 1, 7))::BIGINT AS shingle_hash
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - 1),
                      i -> array_to_string(tk[i:i+2], ' '))) AS g
        FROM toks WHERE len(tk) >= 3
      )
    )"""


def _minhash_sig_sql(doc_filter: str = "") -> str:
    mins = ",\n        ".join(
        f"min((shingle_hash * {MINHASH_AS[i]} + {MINHASH_BS[i]}) % {MINHASH_P}) AS h{i}"
        for i in range(8)
    )
    return f"""WITH {_sh_cte(doc_filter)},
    sig AS (
      SELECT doc_id,
        {mins}
      FROM sh GROUP BY doc_id
    )"""


def _sql_vec(v) -> str:
    return "[" + ", ".join(str(x) for x in v) + "]"


def _sql_dot(vec_expr: str, lit) -> str:
    """Dot product of a FLOAT[] column with a literal vector — identical
    fold shape to the Spark side (F.aggregate over zip_with)."""
    return (
        f"list_aggregate(list_transform(list_zip({vec_expr}, "
        f"{_sql_vec(lit)}::DOUBLE[]), p -> p[1]::DOUBLE * p[2]), 'sum')"
    )


def _kmeans_sql(k: int, iters: int) -> str:
    """Lloyd CTE chain mirroring kmeans_lloyd: c0 = id-ordered seeds,
    then ``iters`` rounds of (assign a{t} -> mean-recompute c{t}), output
    the final assignment. Tie-break ORDER BY dist, cid = ivf_assign's
    first-least pick; per-coordinate avg matches Spark's groupBy avg (the
    integer surface is insensitive to either engine's sum order)."""
    dist = (
        "list_aggregate(list_transform(list_zip(e.embedding, c.cl), "
        "p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])), 'sum')"
    )
    parts = [
        f"""c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid,
                 list_transform(embedding, x -> x::DOUBLE) AS cl
          FROM (SELECT vec_id, embedding FROM embeddings
                ORDER BY vec_id LIMIT {k})
        )"""
    ]
    for t in range(1, iters + 2):
        parts.append(f"""a{t} AS (
          SELECT vec_id, embedding, cid AS centroid_id FROM (
            SELECT e.vec_id, e.embedding, c.cid,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist}, c.cid) AS rn
            FROM embeddings e, c{t - 1} c) q
          WHERE rn = 1
        )""")
        if t <= iters:
            parts.append(f"""c{t} AS (
              SELECT centroid_id AS cid, list(m ORDER BY pos) AS cl
              FROM (
                SELECT a.centroid_id, s.i AS pos,
                       avg(a.embedding[s.i]::DOUBLE) AS m
                FROM a{t} a, LATERAL (
                  SELECT unnest(generate_series(1, len(a.embedding)))
                ) AS s(i)
                GROUP BY 1, 2) sub
              GROUP BY 1
            )""")
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT vec_id, centroid_id FROM a{iters + 1}"
    )


def _sql_sig(planes) -> str:
    """LSH sign-bit signature of ``embedding`` vs literal planes."""
    return " + ".join(
        f"(CASE WHEN {_sql_dot('embedding', p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )


def oracle_sql() -> dict[str, str]:
    simhash_bits = ",\n        ".join(
        f"sum(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(32)
    )
    simhash_sum = " + ".join(
        f"((CASE WHEN b{i} > 0 THEN 1 ELSE 0 END)::BIGINT << {i})"
        for i in range(32)
    )
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    lang_scores = ", ".join(
        f"len(list_filter(tk, t -> list_contains([{', '.join(chr(39) + w + chr(39) for w in ws)}], t))) AS {lang}"
        for lang, ws in {
            "en": ["the", "and", "of", "to", "is"],
            "de": ["der", "die", "und", "das", "ist"],
            "fr": ["le", "la", "et", "les", "est"],
            "es": ["el", "la", "que", "los", "es"],
        }.items()
    )
    lang_pick = "CASE WHEN greatest(en, de, fr, es) = 0 THEN 'und' " + " ".join(
        f"WHEN {l} = greatest(en, de, fr, es) THEN '{l}'" for l in N_LANG
    ) + " END"
    qvec_sql = "[" + ", ".join(str(v) for v in QVEC) + "]"
    bands_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, concat(h{2*b}, ':', h{2*b+1}) AS bucket FROM sig"
        for b in range(4)
    )

    minhash_pairs_sql = _minhash_sig_sql() + f""",
    banded AS (
      {bands_union}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands_hit
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id"""
    # transitive closure of the pair graph; cluster label = component min.
    # (recursive closure is fine at oracle scale; the Spark side uses the
    # O(log n)-round large-star/small-star plan instead)
    cc_ctes = f"""WITH RECURSIVE pairs AS (
      {minhash_pairs_sql}
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    walk(node, reach) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT w.node, e.v FROM walk w JOIN edges e ON e.u = w.reach
    ),
    clusters AS (
      SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
    )"""

    d = {
        "bounds_agg": """
            SELECT min(value) AS min_value, max(value) AS max_value,
                   count(*) AS n FROM events""",
        "junction_groupby": """
            SELECT l_partkey, count(DISTINCT l_suppkey) AS n_neigh
            FROM lineitem GROUP BY l_partkey
            HAVING count(DISTINCT l_suppkey) > 1""",
        "dedup_keepmin": """
            SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id,
                   count(*) AS n_dups
            FROM documents GROUP BY md5(text)""",
        "shared_count": """
            SELECT o_custkey, count(*) AS n_refs FROM orders
            GROUP BY o_custkey HAVING count(*) > 1""",
        "filter_agg": """
            SELECT event_type, count(*) AS n, min(value) AS min_value,
                   max(value) AS max_value
            FROM events WHERE value > 100.0 GROUP BY event_type""",
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "join_region": """
            SELECT r_name, count(*) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "token_count": f"""
            SELECT doc_id, len({_TOKS_SQL}) AS n_tokens FROM documents""",
        # the LITERAL same SUBWORD_RE both engines run (imported, like PII)
        "subword_count": f"""
            SELECT doc_id, len({_TOKS_SQL}) AS n_tokens,
                   len(regexp_extract_all(lower(text), '{SUBWORD_RE}'))
                   AS n_subtokens
            FROM documents""",
        "quality_score": f"""
            WITH t AS (
              SELECT doc_id, text, {_TOKS_SQL} AS tk FROM documents
            )
            SELECT doc_id,
              length(text) AS n_chars_q,
              len(tk) AS n_tokens,
              length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                / greatest(length(text), 1) AS alpha_ratio,
              length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                / greatest(length(text), 1) AS punct_ratio,
              len(list_filter(tk, t -> list_contains([{stop_list}], t)))
                / greatest(len(tk), 1) AS stopword_ratio
            FROM t""",
        "language_id": f"""
            WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
            s AS (SELECT doc_id, {lang_scores} FROM t)
            SELECT doc_id, {lang_pick} AS lang_guess FROM s""",
        "fingerprint": f"""
            SELECT doc_id, md5(array_to_string({_TOKS_SQL}, ' ')) AS fp
            FROM documents""",
        "simhash": f"""
            WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
            tok AS (SELECT doc_id, unnest(tk) AS tt FROM t),
            th AS (SELECT doc_id,
                   ('0x' || substring(md5(tt), 1, 15))::BIGINT AS th FROM tok),
            agg AS (SELECT doc_id, {simhash_bits} FROM th GROUP BY doc_id)
            SELECT doc_id, {simhash_sum} AS simhash FROM agg""",
        "minhash_signatures": _minhash_sig_sql()
        + "\n    SELECT doc_id, h0, h1, h2, h3, h4, h5, h6, h7 FROM sig",
        "minhash_lsh_pairs": minhash_pairs_sql,
        "dedup_clusters": cc_ctes
        + "\n    SELECT doc_id, cluster_id FROM clusters",
        "dedup_survivors": cc_ctes
        + """,
    sc AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1) AS score
      FROM documents
    ),
    lab AS (
      SELECT d.doc_id,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             sc.score
      FROM documents d
      LEFT JOIN clusters c ON c.doc_id = d.doc_id
      LEFT JOIN sc ON sc.doc_id = d.doc_id
    )
    SELECT doc_id, cluster_id FROM (
      SELECT doc_id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY score DESC NULLS LAST, doc_id) AS rn
      FROM lab
    ) WHERE rn = 1""",
        "corpus_curation": cc_ctes
        + f""",
    sc AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1) AS score
      FROM documents
    ),
    lab AS (
      SELECT d.doc_id,
             coalesce(c.cluster_id, d.doc_id) AS cluster_id,
             sc.score
      FROM documents d
      LEFT JOIN clusters c ON c.doc_id = d.doc_id
      LEFT JOIN sc ON sc.doc_id = d.doc_id
    ),
    surv AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               row_number() OVER (PARTITION BY cluster_id
                                  ORDER BY score DESC NULLS LAST, doc_id)
                 AS rn
        FROM lab
      ) WHERE rn = 1
    ),
    tk AS (SELECT doc_id, text, {_TOKS_SQL} AS tk FROM documents),
    lng AS (
      SELECT doc_id, {lang_pick} AS lang_guess FROM (
        SELECT doc_id, {lang_scores} FROM tk
      )
    ),
    q AS (
      SELECT doc_id,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
               / greatest(length(text), 1) AS alpha_ratio,
             len(tk) AS n_tokens
      FROM tk
    )
    SELECT d.doc_id, q.n_tokens
    FROM documents d
    JOIN surv USING (doc_id)
    JOIN lng USING (doc_id)
    JOIN q USING (doc_id)
    WHERE lng.lang_guess = 'en' AND q.alpha_ratio > 0.7
      AND q.n_tokens >= 5""",
        # md5-prefix hash identical to functions/curation._key_hash: first
        # 15 hex chars of md5(key || salt) as a 60-bit int
        "hash_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE ('0x' || substring(md5(doc_id::VARCHAR || 'r3'), 1, 15))::BIGINT
                  < {int(0.25 * (1 << 60))}""",
        # floor (not a raw cast: Spark truncates, DuckDB rounds) of the
        # clamped per-row probability times 2^60 — weighted_sample verbatim
        "weighted_sample": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE ('0x' || substring(md5(doc_id::VARCHAR || 'wq'), 1, 15))::BIGINT
                  < floor(least(greatest(n_chars / 400.0, 0.0), 1.0)
                          * 1152921504606846976.0)::BIGINT""",
        # exclusive running token total in doc_id order; the Spark side is
        # a distributed two-phase prefix sum, the oracle the plain window
        "pack_sequences": f"""
            WITH t AS (
              SELECT doc_id, len({_TOKS_SQL})::BIGINT AS n_tokens
              FROM documents
            ), p AS (
              SELECT doc_id, n_tokens,
                COALESCE(SUM(n_tokens) OVER (
                  ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0)::BIGINT AS start_tok
              FROM t
            )
            SELECT doc_id, n_tokens, start_tok,
              (start_tok // 2048)::BIGINT AS pack_id,
              (start_tok % 2048)::BIGINT AS pack_offset
            FROM p""",
        # same bucket/threshold contract as quantile_threshold_filter:
        # ceil-quota over a descending bucket cumsum, whole boundary
        # bucket survives
        "quantile_filter": """
            WITH s AS (
              SELECT doc_id,
                CAST(floor((length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                  / greatest(length(text), 1)) * 100000) AS BIGINT) AS b
              FROM documents
            ), h AS (
              SELECT b, count(*)::BIGINT AS c FROM s GROUP BY b
            ), cm AS (
              SELECT b, sum(c) OVER (ORDER BY b DESC) AS cum FROM h
            ), t AS (
              SELECT max(b) AS thr FROM cm
              WHERE cum >= ceil(0.30 * (SELECT count(*) FROM s))
            )
            SELECT s.doc_id FROM s, t WHERE s.b >= t.thr""",
        # exact semantics of the histogram/boundary-bucket plan: within
        # each source, keep in (key-hash, doc_id) order while the
        # EXCLUSIVE token prefix is below that source's budget
        "token_budget_mixture": f"""
            WITH h AS (
              SELECT doc_id, source,
                ('0x' || substring(md5(doc_id::VARCHAR || 'mix'), 1, 15))::BIGINT AS hk,
                len({_TOKS_SQL})::BIGINT AS n_tokens
              FROM documents
              WHERE text IS NOT NULL AND source IS NOT NULL
            ), p AS (
              SELECT doc_id, source, n_tokens,
                COALESCE(SUM(n_tokens) OVER (PARTITION BY source
                  ORDER BY hk, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS excl
              FROM h
            )
            SELECT doc_id, source, n_tokens FROM p
            WHERE excl < CASE WHEN source = 'src3' THEN 0
                              WHEN source = 'src7' THEN 150
                              ELSE 600 END""",
        "stratified_sample": """
            WITH h AS (
              SELECT doc_id, lang,
                ('0x' || substring(md5(doc_id::VARCHAR || 'r3'), 1, 15))::BIGINT AS hk
              FROM documents
            )
            SELECT doc_id, lang FROM (
              SELECT doc_id, lang,
                     row_number() OVER (PARTITION BY lang
                                        ORDER BY hk, doc_id) AS rk
              FROM h
            ) WHERE rk <= 20""",
        "decontaminate": """
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
              FROM documents
            ),
            grams AS (
              SELECT DISTINCT doc_id, array_to_string(t[i : i+5], ' ') AS g
              FROM toks, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(t) - 5, 0)))
              ) AS s(i)
            ),
            bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0)
            SELECT g.doc_id, count(*) AS n_hits
            FROM grams g JOIN bench b USING (g)
            WHERE g.doc_id % 7 <> 0
            GROUP BY g.doc_id""",
        "ngram_jaccard": f"""WITH {_sh_cte("WHERE doc_id % 10 = 0")},
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b
        ON a.shingle_hash = b.shingle_hash AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(i / (sa.sz + sb.sz - i), 6) AS jaccard_r
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE i / (sa.sz + sb.sz - i) >= 0.01""",
        "cosine_topk": f"""
            WITH q AS (SELECT {qvec_sql}::DOUBLE[] AS qv),
            scored AS (
              SELECT vec_id,
                list_aggregate(list_transform(
                    list_zip(embedding, (SELECT qv FROM q)),
                    p -> p[1]::DOUBLE * p[2]), 'sum')
                / (greatest(sqrt(list_aggregate(list_transform(embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)
                   * sqrt(list_aggregate(list_transform((SELECT qv FROM q),
                        e -> e * e), 'sum'))) AS cos_sim
              FROM embeddings
            )
            SELECT vec_id, round(cos_sim, 6) AS cos_sim_r,
                   row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
            QUALIFY rank <= 20""",
        "ivf_assign": f"""
            WITH d AS (
              SELECT vec_id,
                {", ".join(
                    f"list_aggregate(list_transform(list_zip(embedding, "
                    f"{_sql_vec(c)}::DOUBLE[]), "
                    f"p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])), "
                    f"'sum') AS d{i}"
                    for i, c in enumerate(CENTROIDS)
                )}
              FROM embeddings
            )
            SELECT vec_id,
              CASE {" ".join(
                  f"WHEN d{i} = least({_LEAST_D}) THEN {i}"
                  for i in range(len(CENTROIDS))
              )} END AS centroid_id
            FROM d""",
        "ivf_topk": f"""
            WITH d AS (
              SELECT vec_id, embedding,
                {", ".join(
                    f"list_aggregate(list_transform(list_zip(embedding, "
                    f"{_sql_vec(c)}::DOUBLE[]), "
                    f"p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])), "
                    f"'sum') AS d{i}"
                    for i, c in enumerate(CENTROIDS)
                )}
              FROM embeddings
            ),
            assigned AS (
              SELECT vec_id, embedding,
                CASE {" ".join(
                    f"WHEN d{i} = least({_LEAST_D}) THEN {i}"
                    for i in range(len(CENTROIDS))
                )} END AS centroid_id
              FROM d
            ),
            cand AS (
              SELECT * FROM assigned WHERE centroid_id IN (
                {", ".join(str(p) for p in _ivf_probes(2))})
            ),
            scored AS (
              SELECT vec_id,
                {_sql_dot('embedding', QVEC)}
                / (greatest(sqrt(list_aggregate(list_transform(embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)
                   * sqrt(list_aggregate(list_transform({_sql_vec(QVEC)}::DOUBLE[],
                        e -> e * e), 'sum'))) AS cos_sim
              FROM cand
            )
            SELECT vec_id, round(cos_sim, 6) AS cos_sim_r,
                   row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
            QUALIFY rank <= 10""",
        "ann_lsh_topk": f"""
            WITH sig AS (
              SELECT vec_id, embedding, {_sql_sig(ANN_PLANES)} AS sig
              FROM embeddings
            ),
            cand AS (
              SELECT * FROM sig
              WHERE sig IN (
                {", ".join(str(p) for p in _query_probes(ANN_PLANES))})
            ),
            scored AS (
              SELECT vec_id,
                {_sql_dot('embedding', QVEC)}
                / (greatest(sqrt(list_aggregate(list_transform(embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)
                   * sqrt(list_aggregate(list_transform({_sql_vec(QVEC)}::DOUBLE[],
                        e -> e * e), 'sum'))) AS cos_sim
              FROM cand
            )
            SELECT vec_id, round(cos_sim, 6) AS cos_sim_r,
                   row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
            QUALIFY rank <= 10""",
        "embedding_neardup": f"""
            WITH sig AS (
              SELECT vec_id,
                {", ".join(
                    " + ".join(
                        f"(CASE WHEN {_sql_dot('embedding', PLANES[b * 4 + i])}"
                        f" >= 0 THEN {1 << i} ELSE 0 END)"
                        for i in range(4)
                    ) + f" AS b{b}"
                    for b in range(4)
                )}
              FROM embeddings
            ),
            banded AS (
              {" UNION ALL ".join(
                  f"SELECT vec_id, {b} AS band, b{b} AS val FROM sig"
                  for b in range(4)
              )}
            ),
            cand AS (
              SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
              FROM banded a JOIN banded b
                ON a.band = b.band AND a.val = b.val AND a.vec_id < b.vec_id
            ),
            scored AS (
              SELECT id_a, id_b,
                list_aggregate(list_transform(list_zip(ea.embedding,
                    eb.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')
                / (greatest(sqrt(list_aggregate(list_transform(ea.embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)
                   * greatest(sqrt(list_aggregate(list_transform(eb.embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)) AS cos_sim
              FROM cand
              JOIN embeddings ea ON ea.vec_id = id_a
              JOIN embeddings eb ON eb.vec_id = id_b
            )
            SELECT id_a, id_b, round(cos_sim, 6) AS cos_sim_r
            FROM scored WHERE cos_sim >= 0.4""",
        "kmeans_assign": _kmeans_sql(4, 2),
        # assignment CTE = the ivf_assign oracle; the dominated-drop rule
        # (EXISTS smaller-id in-cluster neighbor at cos >= 0.4) is the
        # literal transcription of semantic_dedup's join + anti-join
        "semantic_dedup": f"""
            WITH d AS (
              SELECT vec_id, embedding,
                {", ".join(
                    f"list_aggregate(list_transform(list_zip(embedding, "
                    f"{_sql_vec(c)}::DOUBLE[]), "
                    f"p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])), "
                    f"'sum') AS d{i}"
                    for i, c in enumerate(CENTROIDS)
                )}
              FROM embeddings
            ),
            asg AS (
              SELECT vec_id, embedding,
                CASE {" ".join(
                    f"WHEN d{i} = least({_LEAST_D}) THEN {i}"
                    for i in range(len(CENTROIDS))
                )} END AS centroid_id
              FROM d
            ),
            dropped AS (
              SELECT DISTINCT b.vec_id
              FROM asg a JOIN asg b
                ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
              WHERE
                list_aggregate(list_transform(list_zip(a.embedding,
                    b.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')
                / (greatest(sqrt(list_aggregate(list_transform(a.embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)
                   * greatest(sqrt(list_aggregate(list_transform(b.embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)) >= 0.4
            )
            SELECT vec_id, centroid_id FROM asg
            WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""",
        "simhash_neardup": f"""
            WITH t AS (SELECT doc_id, {_TOKS_SQL} AS tk FROM documents),
            tok AS (SELECT doc_id, unnest(tk) AS tt FROM t),
            th AS (SELECT doc_id,
                   ('0x' || substring(md5(tt), 1, 15))::BIGINT AS th FROM tok),
            agg AS (SELECT doc_id, {{simhash_bits}} FROM th GROUP BY doc_id),
            sh2 AS (SELECT doc_id, {{simhash_sum}} AS simhash FROM agg)
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   bit_count(xor(a.simhash, b.simhash))::INTEGER AS hamming
            FROM sh2 a JOIN sh2 b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""".replace(
            "{simhash_bits}", simhash_bits
        ).replace("{simhash_sum}", simhash_sum),
        "pip_lattice": """
            SELECT vec_id AS point_id,
                   (floor((vec_id % 16) * 0.5 + 0.25)
                    + 8 * floor(floor((vec_id % 256) / 16) * 0.5 + 0.25))::BIGINT
                   AS poly_id
            FROM embeddings""",
        "zonal_stats": """
            WITH p AS (
              SELECT vec_id AS point_id,
                     (floor((vec_id % 16) * 0.5 + 0.25)
                      + 8 * floor(floor((vec_id % 256) / 16) * 0.5 + 0.25)
                     )::BIGINT AS poly_id,
                     (vec_id % 97)::BIGINT AS v
              FROM embeddings
            )
            SELECT poly_id, count(*) AS n_points,
                   sum(v)::BIGINT AS sum_value,
                   min(v) AS min_value, max(v) AS max_value,
                   sum(v)::DOUBLE / count(*) AS mean_value
            FROM p GROUP BY poly_id""",
        "raster_tiles": """
            WITH pts AS (
              SELECT (event_id % 97) * 8.0 / 97 AS x,
                     ((event_id * 31) % 89) * 8.0 / 89 AS y
              FROM events
            )
            SELECT least(greatest(floor(x / 8.0 * 8)::BIGINT, 0), 7) AS tile_x,
                   least(greatest(floor(y / 8.0 * 8)::BIGINT, 0), 7) AS tile_y,
                   count(*) AS n
            FROM pts GROUP BY 1, 2""",
        "tile_clip": """
            WITH pts AS (
              SELECT event_id AS arc_id,
                     (event_id % 97) * 8.0 / 97 AS x,
                     ((event_id * 31) % 89) * 8.0 / 89 AS y
              FROM events
            ),
            seg AS (
              SELECT arc_id, x, y, least(x + 2.5, 8.0) AS x2 FROM pts
            ),
            t AS (
              SELECT seg.*, unnest(range(0, 8))::BIGINT AS tile_x FROM seg
            ),
            clip AS (
              SELECT arc_id, tile_x,
                     least(greatest(floor(y)::BIGINT, 0), 7) AS tile_y,
                     greatest(x, tile_x::DOUBLE) AS cx0,
                     least(x2, (tile_x + 1)::DOUBLE) AS cx1, y
              FROM t
              WHERE least(x2, (tile_x + 1)::DOUBLE)
                      > greatest(x, tile_x::DOUBLE)
            )
            SELECT arc_id, tile_x, tile_y,
                   round(cx0, 9) AS x0, round(y, 9) AS y0,
                   round(cx1, 9) AS x1, round(y, 9) AS y1
            FROM clip""",
        "event_windows": """
            SELECT epoch(time_bucket(INTERVAL '10 minutes', ts))::BIGINT
                     AS win_start,
                   event_type, count(*) AS n,
                   (sum(value::DECIMAL(18,6)))::DOUBLE AS sum_value
            FROM events GROUP BY 1, 2""",
        "repetition_metrics": f"""
            WITH toks AS (
              SELECT doc_id, {_TOKS_SQL} AS tk FROM documents
            ),
            base AS (
              SELECT doc_id, len(tk) AS n_tokens,
                     len(list_distinct(tk)) AS n_distinct, tk
              FROM toks
            ),
            grams2 AS (
              SELECT doc_id, 2 AS n,
                     array_to_string(tk[s.i : s.i + 1], ' ') AS gram
              FROM base, LATERAL (
                SELECT unnest(generate_series(
                  1, greatest(len(tk) - 1, 0))) AS i
              ) s
            ),
            grams3 AS (
              SELECT doc_id, 3 AS n,
                     array_to_string(tk[s.i : s.i + 2], ' ') AS gram
              FROM base, LATERAL (
                SELECT unnest(generate_series(
                  1, greatest(len(tk) - 2, 0))) AS i
              ) s
            ),
            cnts AS (
              SELECT doc_id, n, gram, count(*) AS cnt
              FROM (SELECT * FROM grams2 UNION ALL SELECT * FROM grams3)
              GROUP BY 1, 2, 3
            ),
            tops AS (
              SELECT doc_id,
                     max(CASE WHEN n = 2 THEN cnt END) AS max2,
                     max(CASE WHEN n = 3 THEN cnt END) AS max3
              FROM cnts GROUP BY 1
            )
            SELECT b.doc_id, b.n_tokens,
              (b.n_tokens - b.n_distinct) / greatest(b.n_tokens, 1)
                AS dup_word_frac,
              least(coalesce(t.max2, 0) * 2 / greatest(b.n_tokens, 1), 1.0)
                AS top_bigram_frac,
              least(coalesce(t.max3, 0) * 3 / greatest(b.n_tokens, 1), 1.0)
                AS top_trigram_frac
            FROM base b LEFT JOIN tops t USING (doc_id)""",
        "pii_redact": f"""
            WITH injected AS (
              SELECT doc_id,
                text || ' reach user' || doc_id
                     || '@example.com or 555-123-4567 ip 10.0.0.'
                     || ((doc_id % 254) + 1) AS text
              FROM documents
            ),
            p1 AS (
              SELECT doc_id, text,
                regexp_replace(text, '{PII_EMAIL_RE}', '[EMAIL]', 'g') AS t1
              FROM injected
            ),
            p2 AS (
              SELECT doc_id, text, t1,
                regexp_replace(t1, '{PII_PHONE_RE}', '[PHONE]', 'g') AS t2
              FROM p1
            )
            SELECT doc_id,
              regexp_replace(t2, '{PII_IPV4_RE}', '[IP]', 'g') AS clean_text,
              len(regexp_extract_all(text, '{PII_EMAIL_RE}')) AS n_emails,
              len(regexp_extract_all(t1, '{PII_PHONE_RE}')) AS n_phones,
              len(regexp_extract_all(t2, '{PII_IPV4_RE}')) AS n_ips
            FROM p2""",
        "source_stats": _SOURCE_STATS_SQL
        + """
            SELECT source, n_docs, n_distinct_texts,
                   sum_tokens, sum_stop_hits
            FROM src""",
        "source_filter": _SOURCE_STATS_SQL
        + """,
            keep AS (
              SELECT source FROM src
              WHERE (n_docs - n_distinct_texts) * 100 <= 50 * n_docs
                AND sum_stop_hits * 1000 >= 60 * sum_tokens
            )
            SELECT d.* FROM documents d JOIN keep USING (source)""",
        # mean/var are the SAME closed-form expressions over exact integer
        # aggregates as the Spark side (one double division each, no
        # accumulation-order float sums); quantile_cont(0.5) interpolates
        # the same two integer order statistics as the histogram median
        "source_token_report": f"""
            WITH t AS (
              SELECT source, len({_TOKS_SQL}) AS ntok FROM documents
            )
            SELECT source,
                   count(*) AS n_docs,
                   sum(ntok)::BIGINT AS sum_tokens,
                   min(ntok) AS min_tokens,
                   max(ntok) AS max_tokens,
                   sum(ntok)::DOUBLE / count(*) AS mean_tokens,
                   sum(ntok::HUGEINT * ntok)::DOUBLE / count(*)
                     - (sum(ntok)::DOUBLE / count(*))
                     * (sum(ntok)::DOUBLE / count(*)) AS var_tokens,
                   quantile_cont(ntok, 0.5) AS median_tokens
            FROM t GROUP BY source""",
        "token_entropy": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
            ),
            pt AS (
              SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2
            ),
            st AS (
              SELECT doc_id, sum(c)::BIGINT AS n_tokens,
                     count(*) AS n_distinct,
                     sum(c::DOUBLE * ln(c::DOUBLE)) AS clnc
              FROM pt GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(st.n_tokens, 0) AS n_tokens,
                   coalesce(st.n_distinct, 0) AS n_distinct,
                   coalesce(round(ln(st.n_tokens::DOUBLE)
                                  - st.clnc / st.n_tokens, 6), 0.0)
                     AS entropy_r
            FROM documents d LEFT JOIN st USING (doc_id)""",
        # same list_zip dot / norm expressions the semantic_dedup oracle
        # proved engine-exact at sf1; max() over eval matches is order-free
        "semantic_decontam": """
            WITH ev AS (
              SELECT DISTINCT embedding AS ev FROM embeddings
              WHERE vec_id < 10
            ),
            p AS (
              SELECT e.vec_id,
                list_aggregate(list_transform(list_zip(e.embedding, ev.ev),
                    p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')
                / (greatest(sqrt(list_aggregate(list_transform(e.embedding,
                        x -> x::DOUBLE * x), 'sum')), 1e-12)
                   * greatest(sqrt(list_aggregate(list_transform(ev.ev,
                        x -> x::DOUBLE * x), 'sum')), 1e-12)) AS c
              FROM embeddings e CROSS JOIN ev
            )
            SELECT vec_id, round(max(c), 6) AS max_cos_r
            FROM p WHERE c >= 0.35 GROUP BY vec_id""",
        "topk_per_source": f"""
            WITH t AS (
              SELECT doc_id, source, len({_TOKS_SQL}) AS n_tokens
              FROM documents
            ),
            r AS (
              SELECT source, n_tokens, doc_id,
                row_number() OVER (
                  PARTITION BY source ORDER BY n_tokens DESC, doc_id
                ) AS rank
              FROM t
            )
            SELECT source, n_tokens, doc_id, rank FROM r WHERE rank <= 5""",
        "asof_join": """
            WITH err AS (
              SELECT user_id, epoch_us(ts) AS us, value,
                     row_number() OVER (
                       PARTITION BY user_id, epoch_us(ts)
                       ORDER BY event_id DESC) AS rn
              FROM events WHERE event_type = 'error'
            ),
            err1 AS (SELECT user_id, us, value FROM err WHERE rn = 1),
            lft AS (
              SELECT user_id, event_id, epoch_us(ts) AS us, value
              FROM events WHERE event_type <> 'error'
            )
            SELECT l.user_id, l.event_id, l.us, l.value,
                   e.us AS asof_us, e.value AS asof_value
            FROM lft l ASOF LEFT JOIN err1 e
              ON l.user_id = e.user_id AND l.us >= e.us""",
        "term_stats": f"""
            WITH tok AS (
              SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
            ),
            pd AS (
              SELECT term, doc_id, count(*) AS n FROM tok GROUP BY 1, 2
            )
            SELECT term, count(*) AS df, sum(n)::BIGINT AS tf
            FROM pd GROUP BY term HAVING count(*) >= 2""",
        # bigram vocabulary: DuckDB's inclusive slice t[i : i+1] is the
        # 2-token window matching _gram_strings(toks, 2)'s space-join
        "ngram_stats": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ),
            grams AS (
              SELECT doc_id, array_to_string(t[i : i+1], ' ') AS term
              FROM tok, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(t) - 1, 0)))
              ) AS s(i)
            ),
            pd AS (
              SELECT term, doc_id, count(*) AS n FROM grams GROUP BY 1, 2
            )
            SELECT term, count(*) AS df, sum(n)::BIGINT AS tf
            FROM pd GROUP BY term HAVING count(*) >= 2""",
        # the three proven oracle blocks (dup_spans, semantic_dedup's
        # dropped CTE, weighted_sample's floor-hash predicate) composed
        # verbatim — the query gates the COMPOSITION, each leg has its own
        "corpus_curation_v2": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ),
            grams AS (
              SELECT doc_id, array_to_string(t[i : i+2], ' ') AS term
              FROM tok, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(t) - 2, 0)))
              ) AS s(i)
            ),
            pd AS (
              SELECT term, doc_id, count(*) AS cnt FROM grams GROUP BY 1, 2
            ),
            dfreq AS (
              SELECT term, count(*) AS df FROM pd GROUP BY 1
            ),
            dup AS (
              SELECT pd.doc_id, sum(pd.cnt)::BIGINT AS dup_grams
              FROM pd JOIN dfreq USING (term) WHERE dfreq.df >= 2
              GROUP BY 1
            ),
            spans AS (
              SELECT tok.doc_id,
                     CASE WHEN len(t) - 2 > 0
                          THEN coalesce(dup.dup_grams, 0)::DOUBLE
                               / (len(t) - 2)::DOUBLE
                          ELSE 0.0 END AS dup_frac
              FROM tok LEFT JOIN dup USING (doc_id)
            ),
            dsc AS (
              SELECT vec_id, embedding,
                {", ".join(
                    f"list_aggregate(list_transform(list_zip(embedding, "
                    f"{_sql_vec(c)}::DOUBLE[]), "
                    f"p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])), "
                    f"'sum') AS d{i}"
                    for i, c in enumerate(CENTROIDS)
                )}
              FROM embeddings
            ),
            asg AS (
              SELECT vec_id, embedding,
                CASE {" ".join(
                    f"WHEN d{i} = least({_LEAST_D}) THEN {i}"
                    for i in range(len(CENTROIDS))
                )} END AS centroid_id
              FROM dsc
            ),
            sem_dropped AS (
              SELECT DISTINCT b.vec_id
              FROM asg a JOIN asg b
                ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
              WHERE
                list_aggregate(list_transform(list_zip(a.embedding,
                    b.embedding), p -> p[1]::DOUBLE * p[2]::DOUBLE), 'sum')
                / (greatest(sqrt(list_aggregate(list_transform(a.embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)
                   * greatest(sqrt(list_aggregate(list_transform(b.embedding,
                        e -> e::DOUBLE * e), 'sum')), 1e-12)) >= 0.4
            )
            SELECT d.doc_id, d.source, d.n_chars, s.dup_frac
            FROM documents d
            JOIN spans s USING (doc_id)
            WHERE s.dup_frac <= 0.6
              AND d.doc_id NOT IN (SELECT vec_id FROM sem_dropped)
              AND ('0x' || substring(md5(d.doc_id::VARCHAR || 'v2'),
                   1, 15))::BIGINT
                  < floor(least(greatest(d.n_chars / 400.0, 0.0), 1.0)
                          * 1152921504606846976.0)::BIGINT""",
        # arithmetic is the literal transcription of bm25_topk (same
        # association order, same fixed alphabetical-term pivot sum), so
        # scores are engine-exact; avgdl is exact (integer-valued double
        # sums), ln()'s 1-ulp libm risk is absorbed by round(...,6)
        "bm25_topk": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ),
            base AS (SELECT doc_id, t, len(t) AS dl FROM tok),
            stats AS (
              SELECT count(*)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl
              FROM base
            ),
            hits AS (
              SELECT doc_id, dl, term, count(*) AS tf FROM (
                SELECT doc_id, dl, unnest(t) AS term FROM base) u
              WHERE term IN ('customer', 'scan', 'spark')
              GROUP BY 1, 2, 3
            ),
            dfs AS (SELECT term, count(*) AS df FROM hits GROUP BY 1),
            contrib AS (
              SELECT h.doc_id, h.term,
                ln(1.0 + ((SELECT n FROM stats) - d.df + 0.5)
                         / (d.df + 0.5))
                * (h.tf / (h.tf + 1.2 * (0.25 + 0.75 * h.dl
                           / (SELECT avgdl FROM stats)))) AS c
              FROM hits h JOIN dfs d USING (term)
            ),
            pv AS (
              SELECT doc_id,
                max(CASE WHEN term = 'customer' THEN c END) AS c0,
                max(CASE WHEN term = 'scan' THEN c END) AS c1,
                max(CASE WHEN term = 'spark' THEN c END) AS c2
              FROM contrib GROUP BY 1
            ),
            sc AS (
              SELECT doc_id,
                coalesce(c0, 0.0) + coalesce(c1, 0.0)
                + coalesce(c2, 0.0) AS score
              FROM pv
            )
            SELECT doc_id, round(score, 6) AS score_r,
                   row_number() OVER (ORDER BY score DESC, doc_id) AS rank
            FROM sc QUALIFY rank <= 15""",
        # trigram slice t[i : i+2] is DuckDB's inclusive 3-token window,
        # matching _gram_strings(toks, 3); int/int double division is
        # IEEE-identical across engines, so dup_frac needs no rounding
        "dup_spans": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ),
            grams AS (
              SELECT doc_id, array_to_string(t[i : i+2], ' ') AS term
              FROM tok, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(t) - 2, 0)))
              ) AS s(i)
            ),
            pd AS (
              SELECT term, doc_id, count(*) AS cnt FROM grams GROUP BY 1, 2
            ),
            df AS (
              SELECT term, count(*) AS df FROM pd GROUP BY 1
            ),
            dup AS (
              SELECT pd.doc_id, sum(pd.cnt)::BIGINT AS dup_grams
              FROM pd JOIN df USING (term) WHERE df.df >= 2 GROUP BY 1
            )
            SELECT tok.doc_id,
                   greatest(len(t) - 2, 0)::BIGINT AS n_grams,
                   coalesce(dup.dup_grams, 0)::BIGINT AS dup_grams,
                   CASE WHEN len(t) - 2 > 0
                        THEN coalesce(dup.dup_grams, 0)::DOUBLE
                             / (len(t) - 2)::DOUBLE
                        ELSE 0.0 END AS dup_frac
            FROM tok LEFT JOIN dup USING (doc_id)""",
        # positions: DuckDB's 1-based gram index i maps to the 0-based
        # token position i-1 (Spark posexplode). The gap rule (<= 3 fuses)
        # and the 60-bit md5-prefix gram hash are shared verbatim.
        "dup_span_extents": f"""
            WITH tok AS (
              SELECT doc_id, {_TOKS_SQL} AS t FROM documents
            ),
            g AS (
              SELECT doc_id, i - 1 AS pos,
                     ('0x' || substring(
                        md5(array_to_string(t[i : i+2], ' ')), 1, 15
                      ))::BIGINT AS gh
              FROM tok, LATERAL (
                SELECT unnest(generate_series(1, greatest(len(t) - 2, 0)))
              ) AS s(i)
            ),
            pd AS (SELECT gh, doc_id FROM g GROUP BY 1, 2),
            crossg AS (SELECT gh FROM pd GROUP BY gh HAVING count(*) >= 2),
            duppos AS (SELECT doc_id, pos FROM g JOIN crossg USING (gh)),
            brk AS (
              SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER (
                       PARTITION BY doc_id ORDER BY pos) <= 3
                     THEN 0 ELSE 1 END AS b
              FROM duppos
            ),
            isl AS (
              SELECT doc_id, pos,
                sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM brk
            )
            SELECT doc_id, min(pos) AS span_start,
                   max(pos) + 3 AS span_end,
                   count(*) AS n_dup_grams
            FROM isl GROUP BY doc_id, island""",
        "sessionize": """
            WITH flag AS (
              SELECT user_id, event_id, epoch_us(ts) AS us, value,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                          > 1800000000
                     THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY epoch_us(ts), event_id)
            ),
            seq AS (
              SELECT user_id, us, value,
                (sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 + 1)::INTEGER AS session_seq
              FROM flag
            )
            SELECT user_id, session_seq, count(*) AS n_events,
                   min(us) AS start_us, max(us) AS end_us,
                   (max(us) - min(us)) / 1000000.0 AS duration_s,
                   (sum(value::DECIMAL(18,6)))::DOUBLE AS sum_value
            FROM seq GROUP BY 1, 2""",
        "tile_pyramid": """
            WITH pts AS (
              SELECT (event_id % 97) * 8.0 / 97 AS x,
                     ((event_id * 31) % 89) * 8.0 / 89 AS y
              FROM events
            ),
            leaf AS (
              SELECT least(greatest(floor(x / 8.0 * 8)::BIGINT, 0), 7) AS lx,
                     least(greatest(floor(y / 8.0 * 8)::BIGINT, 0), 7) AS ly,
                     count(*) AS n
              FROM pts GROUP BY 1, 2
            )
            SELECT z.zoom::INTEGER AS zoom,
                   (lx >> (3 - z.zoom))::BIGINT AS tile_x,
                   (ly >> (3 - z.zoom))::BIGINT AS tile_y,
                   sum(n)::BIGINT AS n
            FROM leaf CROSS JOIN (SELECT unnest(range(0, 4)) AS zoom) z
            GROUP BY 1, 2, 3""",
        "knn_grid": """
            WITH pts AS (
              SELECT event_id AS point_id,
                     (event_id % 97) * 8.0 / 97 AS px,
                     ((event_id * 31) % 89) * 8.0 / 89 AS py
              FROM events
            ),
            qs AS (
              SELECT vec_id AS qid,
                     ((vec_id * 7) % 13) * 8.0 / 13 AS qx,
                     ((vec_id * 11) % 17) * 8.0 / 17 AS qy
              FROM embeddings WHERE vec_id < 15
            ),
            cand AS (
              SELECT qid, point_id,
                     sqrt((qx - px) * (qx - px) + (qy - py) * (qy - py)) AS dist
              FROM qs CROSS JOIN pts
            )
            SELECT qid, point_id,
                   row_number() OVER (PARTITION BY qid
                                      ORDER BY dist, point_id) AS rank
            FROM cand
            QUALIFY rank <= 5""",
        "vector_tiles": f"""
            WITH t AS (
              SELECT arc_id,
                least(greatest(cast(floor(sx0 / 8.0 * 4) as bigint), 0), 3) AS tx0,
                least(greatest(cast(floor(sx1 / 8.0 * 4) as bigint), 0), 3) AS tx1,
                least(greatest(cast(floor(sy0 / 8.0 * 4) as bigint), 0), 3) AS ty0,
                least(greatest(cast(floor(sy1 / 8.0 * 4) as bigint), 0), 3) AS ty1
              FROM '{VECTOR_TILES_SEGS}/*.parquet'
            ),
            cx AS (
              SELECT arc_id, unnest(range(tx0, tx1 + 1)) AS tile_x, ty0, ty1
              FROM t
            ),
            cy AS (
              SELECT arc_id, tile_x, unnest(range(ty0, ty1 + 1)) AS tile_y
              FROM cx
            ),
            cover AS (SELECT DISTINCT arc_id, tile_x, tile_y FROM cy)
            SELECT tile_x, tile_y, count(*) AS n_arcs
            FROM cover GROUP BY 1, 2""",
        "media_features": """
            WITH ids AS (SELECT unnest(range(64)) AS i)
            SELECT 'image_' || lpad(cast(i as varchar), 6, '0') AS media_id,
                   64 AS n_feat,
                   sha256(upper(repeat(sha256('42:image:' || i), 4)))
                     AS payload_digest
            FROM ids""",
        "span_roundtrip": """
            WITH base AS (
              SELECT cast(doc_id as varchar) AS doc_id,
                     string_split(text, ' ') AS words
              FROM documents WHERE doc_id < 200
            ),
            chunks AS (
              SELECT doc_id, words,
                     unnest(range(cast(ceil(len(words) / 8.0) as bigint)))
                       AS k
              FROM base
            )
            SELECT doc_id,
                   cast(k as int) AS span_ix,
                   CASE WHEN k % 4 = 3 THEN 'media' ELSE 'text' END AS kind,
                   CASE WHEN k % 4 = 3 THEN NULL
                        ELSE array_to_string(words[k*8 + 1 : k*8 + 8], ' ')
                   END AS text,
                   CASE WHEN k % 4 = 3
                        THEN 'm_' || doc_id || '_' || cast(k as varchar)
                        ELSE NULL END AS media_ref,
                   cast(k * 8 as int) AS "offset"
            FROM chunks""",
        # topology_mosaic / toposimplify_arcs (r4): INVARIANT oracles.
        # The VALUES (arc coords) come from engine side-parquets — DuckDB
        # does not re-run the pipeline — but every emitted row is gated on
        # structural invariants DuckDB verifies independently, and
        # is_shared is RECOMPUTED from the hashmap reference surface
        # rather than read back. A violated invariant poisons the value
        # (-1 / flipped flag) and fails the hash gate.
        "topology_mosaic": f"""
            WITH arcs AS (
              SELECT final_idx, is_shared, coords
              FROM read_parquet('{MOSAIC_ARCS}/*.parquet')
            ),
            refs AS (
              SELECT CASE WHEN s >= 0 THEN s ELSE -s - 1 END AS a,
                     count(*) AS c
              FROM read_parquet('{MOSAIC_LINKS}/*.parquet')
              GROUP BY 1
            ),
            out_of_range AS (
              SELECT count(*) AS nb
              FROM refs r LEFT JOIN arcs a ON a.final_idx = r.a
              WHERE a.final_idx IS NULL
            )
            SELECT a.final_idx,
                   coalesce(r.c, 0) >= 2 AS is_shared,
                   CASE WHEN coalesce(r.c, 0) >= 1
                             AND len(a.coords) >= 4
                             AND len(a.coords) % 2 = 0
                             AND len(list_filter(a.coords,
                                   v -> v <> floor(v) OR v < 0 OR v > 8
                                 )) = 0
                             AND (SELECT nb FROM out_of_range) = 0
                        THEN len(a.coords) // 2 ELSE -1 END AS n_points
            FROM arcs a LEFT JOIN refs r ON r.a = a.final_idx""",
        "toposimplify_arcs": f"""
            WITH o AS (
              SELECT final_idx,
                     coords,
                     list_transform(
                       range(len(coords) // 2),
                       k -> coords[2*k + 1] || ',' || coords[2*k + 2]
                     ) AS verts
              FROM read_parquet('{SIMP_ORIG}/*.parquet')
            ),
            s AS (
              SELECT final_idx,
                     coords,
                     list_transform(
                       range(len(coords) // 2),
                       k -> coords[2*k + 1] || ',' || coords[2*k + 2]
                     ) AS verts
              FROM read_parquet('{SIMP_OUT}/*.parquet')
            )
            SELECT coalesce(s.final_idx, o.final_idx) AS final_idx,
                   CASE WHEN s.final_idx IS NOT NULL
                             AND o.final_idx IS NOT NULL
                             AND len(s.coords) >= 4
                             AND len(s.coords) % 2 = 0
                             AND len(s.coords) <= len(o.coords)
                             AND s.coords[1] = o.coords[1]
                             AND s.coords[2] = o.coords[2]
                             AND s.coords[len(s.coords) - 1]
                                   = o.coords[len(o.coords) - 1]
                             AND s.coords[len(s.coords)]
                                   = o.coords[len(o.coords)]
                             AND list_has_all(o.verts, s.verts)
                        THEN len(s.coords) // 2 ELSE -1 END AS n_points
            FROM s FULL OUTER JOIN o ON s.final_idx = o.final_idx""",
    }
    # bit-equal-by-contract variants share their base operator's oracle
    # verbatim — the strongest equivalence statement the gate can make
    d["asof_join_bucketed"] = d["asof_join"]
    d["ivf_topk_persisted"] = d["ivf_topk"]
    return d
