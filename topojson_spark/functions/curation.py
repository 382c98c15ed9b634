"""Corpus-curation operators: deterministic sampling and decontamination.

Training-data pipelines need (a) reproducible sampling — the same document
set survives every re-run, across engines, regardless of partitioning — and
(b) benchmark decontamination — dropping training documents that share
verbatim n-grams with an evaluation set (the GPT-3/PaLM 13-gram protocol,
here parameterized).

Both are built on a CONTENT hash, not ``rand()``: ``rand(seed)`` is
partition-order dependent (a repartition or AQE re-plan changes which rows
survive), while ``md5(key)`` is a pure projection — the sample is a
deterministic function of the data, identical on Spark, DuckDB, or a
hand calculator. The md5-prefix trick (first 15 hex chars -> 60-bit int)
is used instead of ``xxhash64`` because every engine agrees on md5, which
is what makes these operators oracle-checkable bit-for-bit.

100 TB design:

- ``hash_sample`` is a scan-side filter (whole-stage codegen, no shuffle,
  no state). Sampling 1% of 100 TB touches every row once and moves zero
  bytes between executors.
- ``stratified_sample_rates`` is the scale path for quota sampling: the
  per-stratum rate table is tiny (one row per language/source), broadcast
  into the same codegen filter — still zero shuffles. Deriving the rates
  from target quotas costs one narrow groupBy-count.
- ``stratified_sample`` (exact top-k per stratum by hash order) uses a
  rank window partitioned on the stratum — exact quotas, but a hot stratum
  (one language holding 90% of the corpus) lands on one reducer. Use it
  when quotas must be exact and strata are balanced; otherwise derive
  rates and take the filter path (the docstring's rate recipe gives
  binomial-exact quotas in expectation with zero skew exposure).
- ``decontaminate`` shuffles only (id, shingle) tuples; document text
  never moves. The benchmark side (eval sets are ~1e5 documents, i.e.
  ~1e7 shingles) is distinct-reduced and broadcast, so the probe side is
  a map-side hash lookup over the corpus — one pass, no corpus shuffle
  except the final per-doc count aggregation over matching shingles only.
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 60-bit hash space: 15 hex chars, exactly representable in a signed long
# and in a double's 53-bit mantissa... NOT in the latter — so thresholds
# are computed in integer space (rate scaled to 2^60) and never through a
# double division.
_HASH_BITS = 60
_HASH_SPACE = 1 << _HASH_BITS

# quantile_threshold_filter collects its bucket histogram to the driver;
# the grid is clamped here so driver memory is bounded BY CONSTRUCTION
# (1e7 buckets is far past useful threshold resolution already).
_GRID_CAP = 10_000_000


def _key_hash(key_col, salt: str = ""):
    """Uniform 60-bit integer from a key column: first 15 hex chars of
    md5(cast(key as string) || salt). Engine-portable (DuckDB:
    ('0x' || substr(md5(k || salt), 1, 15))::bigint)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def hash_sample(
    df: DataFrame, rate: float, key: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose key hashes below
    ``rate`` of the hash space.

    The survivor set is a pure function of (key, salt) — stable across
    re-runs, partitionings and engines. Change ``salt`` to draw an
    independent sample. The plan is a single codegen filter on the scan.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    threshold = int(rate * _HASH_SPACE)
    return df.where(_key_hash(F.col(key), salt) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata: str,
    k: int,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exact-quota stratified sample: the k rows with the SMALLEST key
    hash within each stratum (deterministic — equivalent to a seeded
    uniform draw without replacement).

    Exactness costs a rank window partitioned on ``strata``: a stratum's
    candidates converge on one reducer, so this is for balanced strata /
    moderate cardinality. For skewed corpora use
    ``stratified_sample_rates`` (pure filter, quota exact in expectation).
    """
    h = _key_hash(F.col(key), salt)
    w = Window.partitionBy(strata).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def stratified_sample_rates(
    df: DataFrame,
    strata: str,
    rates: DataFrame,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli sample: ``rates`` is (strata, rate) — tiny,
    broadcast — and each row survives iff its key hash falls below its
    stratum's rate. No windows, no stratum skew exposure: the hot-language
    problem disappears because the filter is per-row.

    To hit target quotas q_s: rates = q_s / count_s from one groupBy-count.
    """
    r = rates.select(
        F.col(strata),
        (F.col("rate") * _HASH_SPACE).cast("long").alias("_threshold"),
    )
    return (
        df.join(F.broadcast(r), on=strata)
        .where(_key_hash(F.col(key), salt) < F.col("_threshold"))
        .drop("_threshold")
    )


def weighted_sample(
    df: DataFrame,
    prob_col,
    key: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic PER-ROW-probability sample: row i survives iff
    hash(key_i, salt) < p_i * hash_space, where ``prob_col`` is a column
    expression yielding the row's keep probability (clamped to [0, 1]).
    The quality-weighted resampling move (DCLM / FineWeb-edu style: keep
    probability a function of a classifier or heuristic score) — the
    per-row generalization of :func:`hash_sample`.

    Survivors are a pure function of (key, salt, p) — stable across
    re-runs, partitionings and engines, and MONOTONIC in p: raising a
    row's score can only add it to the sample, never remove another
    (useful for incremental threshold tuning). The plan is one codegen
    filter on the scan: zero shuffles, no RNG state, corpus never moves.
    The threshold is floor(p * space) — floor, not a raw long cast,
    because double->int casts TRUNCATE in Spark but ROUND in DuckDB;
    floor of a non-negative double is identical everywhere, so any
    engine reproduces the exact survivor set. A NULL probability drops
    the row (the filter is null-rejecting), it never errors.
    """
    p = F.least(F.greatest(prob_col.cast("double"), F.lit(0.0)), F.lit(1.0))
    threshold = F.floor(p * F.lit(float(_HASH_SPACE))).cast("long")
    return df.where(_key_hash(F.col(key), salt) < threshold)


def shingle_ngrams(text_col, n: int):
    """Word n-grams of a text column as array<string>: whitespace-split,
    each shingle the space-join of ``n`` consecutive tokens. Documents
    shorter than ``n`` tokens produce an empty array. Gram construction
    delegates to text._gram_strings (the zip_with form — 9x faster than
    the per-position slice+join it replaced, byte-identical output)."""
    from .text import _gram_strings

    toks = F.split(F.trim(text_col), r"\s+")
    return _gram_strings(toks, n)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: Optional[bool] = None,
    auto_broadcast_max_bytes: int = 128 << 20,
    metrics=None,
) -> DataFrame:
    """Benchmark-overlap detection: for each document sharing at least one
    word ``n``-gram with the benchmark set, return (id_col, n_hits) where
    n_hits counts the DISTINCT shared shingles. Join against the output
    with a left anti to drop contaminated docs, or keep the counts for a
    severity threshold.

    ``benchmark`` needs only ``text_col``. Shingles compare as strings —
    no hash collisions to reason about, and the DuckDB oracle rebuilds the
    identical shingle set symbol-for-symbol.

    Build-side sizing (``broadcast_benchmark``): ``None`` (default) sizes
    the build side with a one-row aggregate over the distinct benchmark
    shingles — estimated bytes = sum of UTF-8 lengths + 48 B/row object
    overhead — and broadcasts only under ``auto_broadcast_max_bytes``
    (default 128 MB: comfortably driver/executor-safe, far above Spark's
    10 MB autoBroadcastJoinThreshold because this build side is a
    distinct-reduced string set worth shipping). A real ~1e7-shingle eval
    set estimates to several hundred MB and auto-selects the shuffle
    join. ``True``/``False`` force the choice and skip the sizing pass.
    The decision is recorded through ``metrics``
    (``plans.metrics.StageMetrics.record``) when provided.

    Plan shape, broadcast path: the corpus side probes the broadcast set
    FIRST (map-side, zero shuffle) and only the matching (doc, shingle)
    rows — rare by construction — reach the count-distinct exchange.
    Deduplicating the corpus shingles before the join would instead
    shuffle every shingle of every document; at 100 TB that ordering is
    the whole game. Shuffle path: both sides exchange on the shingle —
    still only (id, shingle) tuples, never document text.
    """
    bench_shingles = (
        benchmark.select(
            F.explode(shingle_ngrams(F.col(text_col), n)).alias("g")
        )
        .distinct()
    )
    if broadcast_benchmark is None:
        # the sizing aggregate is an action, so pin the distinct shingle
        # set first — the probe join then reuses the materialized blocks
        # instead of re-running the benchmark scan+distinct
        from ..plans.pin import pin_truncate

        bench_shingles = pin_truncate(bench_shingles)
        stats = bench_shingles.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.octet_length("g")), F.lit(0)).alias("b"),
        ).collect()[0]
        est_bytes = int(stats["b"]) + 48 * int(stats["n"])
        broadcast_benchmark = est_bytes <= auto_broadcast_max_bytes
        if metrics is not None:
            metrics.record(
                "decontaminate",
                n_benchmark_shingles=int(stats["n"]),
                est_build_bytes=est_bytes,
                broadcast=broadcast_benchmark,
            )
    elif metrics is not None:
        metrics.record(
            "decontaminate",
            n_benchmark_shingles=None,
            est_build_bytes=None,
            broadcast=broadcast_benchmark,
        )
    if broadcast_benchmark:
        bench_shingles = F.broadcast(bench_shingles)
    doc_shingles = docs.select(
        F.col(id_col),
        F.explode(shingle_ngrams(F.col(text_col), n)).alias("g"),
    )
    return (
        doc_shingles.join(bench_shingles, on="g")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("g")).alias("n_hits"))
    )


def pack_sequences(
    documents: DataFrame,
    max_tokens: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pretraining sequence packing: lay documents end-to-end in a
    deterministic id order and assign each one its position in the
    resulting fixed-budget context-window stream.

    Returns (id, n_tokens, start_tok, pack_id, pack_offset) where
    ``start_tok`` is the exclusive running token total before the document,
    ``pack_id = start_tok div max_tokens`` is the context window its first
    token lands in, and ``pack_offset`` the position inside that window —
    the concatenate-then-split packing used by GPT-style data loaders
    (documents may straddle pack boundaries; the loader splits there).

    Scale path: the global running total is a distributed two-phase prefix
    sum (plans.ids.prefix_sum) — range-partition on the id, per-partition
    cumsum, one O(partitions) offsets collect. A window ``SUM() OVER
    (ORDER BY id)`` would funnel 10^12 rows through a single reducer; this
    plan's only serial step is the tiny offsets collect. Token counts ride
    the narrow (id, n_tokens) projection — text never moves."""
    from .text import tokens_col
    from ..plans.ids import prefix_sum

    toks = documents.select(
        F.col(id_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    pref = prefix_sum(toks, [id_col], "n_tokens", "start_tok")
    return pref.select(
        id_col,
        "n_tokens",
        "start_tok",
        F.floor(F.col("start_tok") / F.lit(max_tokens)).alias("pack_id"),
        (F.col("start_tok") % F.lit(max_tokens)).alias("pack_offset"),
    )


def quantile_threshold_filter(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    grid: int = 100_000,
    metrics=None,
) -> DataFrame:
    """Keep the rows whose ``score_col`` falls in the corpus's top
    ``keep_frac`` fraction — a global order statistic WITHOUT a global
    sort ("keep the best 30% of the corpus by quality score").

    Contract: scores are quantized to ``floor(score * grid)`` buckets; the
    threshold is the largest bucket value whose descending cumulative count
    reaches ``ceil(keep_frac * n)``, and every row at-or-above it survives.
    The result is therefore the smallest superset of the quota that is
    closed under score ties at grid resolution — deterministic, engine
    portable, partition-order independent.

    100 TB design: a window ``percent_rank() OVER (ORDER BY score)`` is a
    global sort — the one plan shape this engine never emits. Here the
    corpus is reduced map-side to a bucket histogram (≤ ``grid`` + 1 narrow
    rows cross the exchange regardless of corpus size), the threshold is a
    driver-side cumsum over that tiny table, and the survivor set is a
    zero-shuffle whole-stage-codegen filter — two passes over the scan,
    zero bytes of document data moved. ``grid`` trades threshold
    resolution against the histogram's (bounded) size and is clamped to
    ``_GRID_CAP`` (1e7 ≈ a few hundred MB of driver rows at absolute
    worst) so a caller-supplied huge grid cannot OOM the driver. NULL
    scores are excluded from both the quota and the survivor set — a NULL
    can never satisfy ``score >= threshold``, so counting it would
    silently inflate the quota."""
    if grid < 1:
        raise ValueError(f"grid must be >= 1, got {grid}")
    grid = min(int(grid), _GRID_CAP)
    b = F.floor(F.col(score_col) * F.lit(grid)).cast("long")
    hist = (
        df.where(F.col(score_col).isNotNull())
        .groupBy(b.alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    rows = hist.collect()
    total = sum(r["_c"] for r in rows)
    if total == 0:
        return df
    # plain IEEE ceil(frac * n): bit-identical to the SQL oracle's
    # ceil(0.3 * count(*)) — an "int-exact" reformulation would round the
    # product differently at representation boundaries
    quota = math.ceil(keep_frac * total)
    cum = 0
    threshold = None
    for r in sorted(rows, key=lambda r: r["_b"], reverse=True):
        cum += r["_c"]
        if cum >= quota:
            threshold = int(r["_b"])
            break
    if threshold is None:  # quota exceeds corpus (keep_frac >= 1)
        threshold = min(int(r["_b"]) for r in rows)
    if metrics is not None:
        metrics.record(
            "quantile_threshold",
            threshold_bucket=threshold, quota=quota, n=total,
        )
    return df.where(b >= F.lit(threshold))


def token_budget_mixture(
    documents: DataFrame,
    budgets: dict,
    default_budget: Optional[int] = None,
    key: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    salt: str = "",
    bucket_shift: int = 44,
    metrics=None,
) -> DataFrame:
    """Deterministic per-source corpus mixture to token budgets — the
    "data mixing" step of a pretraining pipeline ("600k tokens of src A,
    150k of src B, none of src C").

    Contract: within each source, documents are ranked by key hash
    (``_key_hash(key, salt)``, ties broken by the key) — a seeded uniform
    draw without replacement — and kept greedily while the EXCLUSIVE
    running token total is still below the source's budget, so the
    document that crosses the boundary is included and every nonzero
    budget yields at least one document. Sources missing from ``budgets``
    take ``default_budget``; with no default they are dropped. The
    survivor set is a pure function of (data, budgets, salt): identical
    across re-runs, partitionings and engines, and exactly expressible as
    a per-source ``SUM() OVER`` prefix in ANSI SQL (see oracle).

    100 TB design: the naive plan — a running-sum window partitioned by
    source — serializes each source through one reducer (20 sources on a
    1000-executor cluster = 20 busy cores). Here the corpus is reduced
    map-side to a (source, hash-bucket) token histogram (``bucket =
    hk >> bucket_shift``; at the default shift, <= 65,536 buckets/source
    cross the exchange and reach the driver REGARDLESS of corpus size),
    the per-source boundary bucket is found by a driver cumsum over that
    tiny table, and survivors resolve with a broadcast spec join:
    buckets strictly below the boundary keep via a codegen filter (no
    window, no shuffle beyond the histogram's), and ONLY the boundary
    bucket — ~1/65,536th of a source — pays an exact prefix-sum window.
    Token counts ride a narrow (key, source, hash, n_tokens) projection;
    document text never moves. Driver memory is O(sources * 2^(60-shift))
    rows, bounded by construction like quantile_threshold_filter's grid.

    Returns (key, source, n_tokens) survivors; semi-join on ``key`` to
    recover full rows.
    """
    if bucket_shift < 0 or bucket_shift > _HASH_BITS:
        raise ValueError(f"bucket_shift must be in [0, 60], got {bucket_shift}")
    from .text import tokens_col

    narrow = (
        documents.where(
            F.col(text_col).isNotNull() & F.col(source_col).isNotNull()
        ).select(
            F.col(key),
            F.col(source_col),
            _key_hash(F.col(key), salt).alias("_hk"),
            F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        )
    )
    if default_budget is None:
        # only budgeted sources participate: push the keep-list into the
        # scan so unbudgeted sources never reach the histogram exchange
        narrow = narrow.where(F.col(source_col).isin([*budgets]))

    hist = (
        narrow.groupBy(source_col, F.shiftright("_hk", bucket_shift).alias("_bkt"))
        .agg(F.sum("n_tokens").alias("_tok"))
        .collect()
    )

    by_source: dict = {}
    for r in hist:
        by_source.setdefault(r[source_col], []).append((r["_bkt"], int(r["_tok"])))

    _ALL = (1 << 62)  # sentinel cutoff: every bucket is below it
    spec = []  # (source, cutoff bucket, tokens before it, budget)
    n_partial = 0
    for src, buckets in by_source.items():
        b = budgets.get(src, default_budget)
        if b is None or b <= 0:
            continue  # source drops entirely
        cum = 0
        cutoff, before = None, 0
        for bkt, tok in sorted(buckets):
            if cum + tok >= b:
                cutoff, before = bkt, cum
                n_partial += 1
                break
            cum += tok
        if cutoff is None:  # budget >= source total: keep everything
            cutoff = _ALL
        spec.append((src, int(cutoff), int(before), int(b)))
    if metrics is not None:
        metrics.record(
            "token_budget_mixture",
            n_sources=len(by_source), n_kept_sources=len(spec),
            n_boundary_sources=n_partial, n_hist_rows=len(hist),
        )

    spark = documents.sparkSession
    spec_df = spark.createDataFrame(
        spec, schema=f"{source_col} string, _cut long, _before long, _budget long"
    )
    joined = narrow.withColumn(
        "_bkt", F.shiftright("_hk", bucket_shift)
    ).join(F.broadcast(spec_df), on=source_col)

    out_cols = [key, source_col, "n_tokens"]
    below = joined.where(F.col("_bkt") < F.col("_cut")).select(*out_cols)
    w = (
        Window.partitionBy(source_col)
        .orderBy(F.col("_hk").asc(), F.col(key).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        joined.where(F.col("_bkt") == F.col("_cut"))
        .withColumn("_excl", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .where(F.col("_before") + F.col("_excl") < F.col("_budget"))
        .select(*out_cols)
    )
    return below.unionByName(boundary)


def topk_per_group(
    df: DataFrame,
    group_cols,
    order_col: str,
    k: int,
    id_col: str = "doc_id",
    descending: bool = True,
    n_salts: int = 64,
) -> DataFrame:
    """Exact top-``k`` rows per group (e.g. the k best-scoring documents
    of every source), with ``rank`` attached (1-based; ties broken by
    ``id_col`` ascending, so the selection is deterministic and
    engine-reproducible).

    100 TB design — two-phase selection, never one task per group: a
    window partitioned on the bare group key sorts EVERY row of a group
    in one task (a billion-doc source = one straggler sorting 1e9 rows).
    Here phase 1 runs the rank window on (group, salt) — salt =
    hash(id) mod ``n_salts`` — keeping at most k rows per salt, so each
    task sorts ~1/n_salts of a group; phase 2 re-ranks the <= k*n_salts
    survivors per group, which is O(k * n_salts) rows however large the
    group. Any row in the true top-k is in its salt's top-k, so the
    result is exactly the single-window answer. Both windows shuffle
    narrow projections only; ``df``'s full rows never move (semi-join the
    output back on ``id_col`` to recover them).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_salts < 1:
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = (
        F.col(order_col).desc() if descending else F.col(order_col).asc()
    )
    narrow = df.select(
        *groups, order_col, id_col,
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("_salt"),
    )
    w1 = Window.partitionBy(*groups, "_salt").orderBy(
        order, F.col(id_col).asc()
    )
    survivors = (
        narrow.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy(*groups).orderBy(order, F.col(id_col).asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
    )
