"""Text-pipeline operators over the ``documents`` table.

Large-scale training-data preparation ops, each a pure DataFrame transform
designed so the same logic is expressible as the DuckDB oracle SQL in
__spark_entry__.py (shared deterministic hash = md5-prefix-as-int, available
in both engines):

- exact dedup:      md5(text) groupBy keep-min doc_id
- ngram jaccard:    shingle sets + pairwise jaccard among LSH candidates
- minhash LSH:      k permutation-free minhashes from the md5 shingle hash
                    (h_i = (a_i * h + b_i) mod p), banded into buckets
- simhash:          32-bit sign-aggregate of token hashes (32 keeps the
                    fingerprint oracle-exact in DuckDB long arithmetic)
- quality score:    length/punctuation/stopword ratios
- language id:      stopword-hit heuristic over a tiny built-in lexicon
- token count:      whitespace + punctuation-aware regex count
- fingerprint:      normalized-token md5 (content-defined document identity)

All hot paths are built-in pyspark.sql.functions (JVM/codegen); nothing here
uses a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# modulus for the universal-hash family; coefficients sized so
# (h % P) * a + b stays < 2^62 (no 64-bit overflow -> Spark and DuckDB agree)
MINHASH_P = (1 << 31) - 1  # Mersenne prime 2^31-1
MINHASH_AS = [1103515245, 1140671485, 1664525, 22695477,
              134775813, 214013, 69069, 1103515246]
MINHASH_BS = [12345, 1013904223, 1013904225, 1, 2531011, 2533, 362437, 777]


def _md5_64(col):
    """Deterministic 60-bit int hash from md5 hex — identical expression
    exists in DuckDB (see oracle_sql), unlike xxhash64/hash()."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _md5_28(col):
    """28-bit md5-prefix hash (7 hex chars) for overflow-safe arithmetic."""
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def normalized_text(col):
    return F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " ")


def tokens_col(col):
    """Whitespace tokens of the normalized text, empty strings dropped."""
    return F.filter(F.split(normalized_text(col), r"\s+"), lambda t: t != "")


# The ONE stopword list shared by quality_score / source_stats here and by
# the DuckDB oracle harness (__spark_entry__.py imports it) — a single
# source of truth so the two engines cannot silently drift.
STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is")


def _stop_hits(toks):
    """Count of stopword tokens in a token-array column."""
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


# ------------------------------------------------------------ bucket caps


def cap_bucket_members(
    banded: DataFrame, key_cols, id_col: str, cap,
    metrics=None, metric_name: str = "lsh_cap",
) -> DataFrame:
    """Deterministically keep at most ``cap`` members per LSH bucket.

    A viral near-duplicate cluster (the common case in web corpora) puts n
    members into one (band, value) bucket and the bucket self-join emits
    O(n^2) pairs — AQE skew-split divides the *task* but not the pair
    count. Members are ranked by xxhash64(id) (stable content-independent
    sampling) and ranks above ``cap`` are excluded from pair generation in
    that bucket only — a member dropped from one hot bucket still pairs
    through its other bands, so recall degrades gracefully instead of a
    stage going quadratic (run exact_dedup FIRST: byte-identical clusters
    collapse there and never hit the LSH caps). The rank window
    partitions on the same keys as the pair join (no extra exchange
    pattern) and a sort is O(n log n) where the pairs were O(n^2).
    Over-cap buckets are auditable — never silently — two ways: the
    ``hot_buckets`` audit query (per-bucket detail, separate pass) and, when
    a ``plans.metrics.StageMetrics`` is passed as ``metrics``, an Observation
    named ``metric_name`` that counts capped-out memberships inline with
    whatever action executes the operator (zero extra jobs — the counter a
    100-TB run reads to learn its recall degraded). ``cap=None`` disables.
    """
    if cap is None:
        return banded
    w = Window.partitionBy(*key_cols).orderBy(
        F.xxhash64(F.col(id_col)), F.col(id_col)
    )
    ranked = banded.withColumn("_mrank", F.row_number().over(w))
    if metrics is not None:
        ranked = metrics.observe(
            metric_name,
            ranked,
            F.sum((F.col("_mrank") > cap).cast("long")).alias(
                "n_capped_members"
            ),
            F.count(F.lit(1)).alias("n_members_total"),
        )
    return ranked.where(F.col("_mrank") <= cap).drop("_mrank")


def hot_buckets(banded: DataFrame, key_cols, cap: int) -> DataFrame:
    """Audit query for ``cap_bucket_members``: one row per over-cap bucket
    with its member count and the number of pairs the cap dropped
    (C(n,2) - C(cap,2))."""
    kept_pairs = cap * (cap - 1) // 2
    return (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") > cap)
        .withColumn(
            "n_dropped_pairs",
            (F.col("n_members") * (F.col("n_members") - 1) / 2).cast("long")
            - F.lit(kept_pairs),
        )
    )


# ------------------------------------------------------------ simple ops


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Keep the min doc_id per exact text duplicate group."""
    return (
        documents.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
        .select("text_hash", "keep_doc_id", "n_dups")
    )


def token_count(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("n_tokens")
    )


# BPE-ish word-piece pattern, portable Java-regex/RE2 subset: short
# letter runs (<=4), digit runs (<=3), or a single non-alnum mark — a
# 9-letter word counts as 3 pieces, punctuation counts like a real
# tokenizer's specials. The ONE pattern both engines run verbatim.
SUBWORD_RE = r"([a-z]{1,4}|[0-9]{1,3}|[^a-z0-9\s])"


def subword_count(documents: DataFrame) -> DataFrame:
    """BPE-ish token budget estimate: greedy regex word-piece count over
    the lowercased text, next to the whitespace count. The cheap stand-in
    for a real tokenizer when sizing corpora in tokens (mandate:
    whitespace + BPE-ish regex counting); pure codegen, zero shuffles.
    """
    return documents.select(
        "doc_id",
        F.size(tokens_col(F.col("text"))).alias("n_tokens"),
        F.regexp_count(F.lower(F.col("text")), F.lit(SUBWORD_RE)).alias(
            "n_subtokens"
        ),
    )


def quality_exprs(text):
    """The ONE definition of the quality gate's expressions, shared by
    :func:`quality_score` and the streaming gate
    (``streaming.ingest.stream_text_curation``) so the two surfaces
    cannot drift: (n_tokens, punct_ratio, stop_hits) column expressions
    over a text column."""
    n_chars = F.length(text)
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    toks = tokens_col(text)
    return (
        F.size(toks),
        n_punct / F.greatest(n_chars, F.lit(1)),
        _stop_hits(toks),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """Length/punct/stopword heuristics; one row per doc with components so
    thresholds can move downstream without recomputation."""
    text = F.col("text")
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_tokens, punct_ratio, stop_hits = quality_exprs(text)
    return documents.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (n_alpha / F.greatest(n_chars, F.lit(1))).alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )


def _gram_strings(toks, n: int):
    """Word n-grams of a token array as array<string> (space-joined).

    Built with n-1 ``zip_with`` passes over shifted copies of the token
    array rather than a per-position ``slice`` + ``array_join``:
    higher-order functions run INTERPRETED in Spark, so the per-gram form
    paid an array allocation + join loop per position — measured 9x
    slower on the sf0.1 corpus (15.1 s vs 1.7 s for the exploded trigram
    scan) than this per-doc form, which allocates one result array per
    pass. Output is byte-identical (asserted in tests). The tail entries
    of each zip (where the shifted copy has run out) concat with NULL and
    become NULL; the final slice drops them, and Spark's ``sequence(1, 0)
    DESCENDS`` quirk never arises because the short-document case is
    guarded explicitly (same contract as curation.shingle_ngrams)."""
    g = toks
    for i in range(1, n):
        nxt = F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(1)))
        g = F.zip_with(g, nxt, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(
        F.size(toks) >= n, F.slice(g, 1, F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<string>"))


def _term_col(toks, n: int):
    """Validated term column: the raw tokens at ``n == 1``, word n-grams
    above. The ONE gram definition term_stats / dup_span_fraction /
    dup_span_extents share — their oracle-parity argument depends on the
    three operators agreeing on it exactly."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    return toks if n == 1 else _gram_strings(toks, n)


def repetition_metrics(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters: per-document duplicate-token
    fraction and top bigram / trigram token fractions.

    (Rae et al. 2021 §A1.1 uses duplicate-line and top-n-gram CHARACTER
    fractions, which are bounded by 1 because each character is counted
    once; the corpus here is single-line so the line family is vacuous,
    and the fractions are token-based. Token grams OVERLAP, so the raw
    ratio ``max_count * n / n_tokens`` can exceed 1 on highly repetitive
    docs ("a b a b a" has top_trigram 2*3/5 = 1.2); to keep Gopher's
    bounded-filter semantics — a threshold near 1 means "almost the whole
    document is one repeated gram" — the gram fractions are clamped to
    [0, 1] in both engines. Exact integer-ratio arithmetic otherwise.)

    Output: (id_col, n_tokens, dup_word_frac, top_bigram_frac,
    top_trigram_frac) where

    - ``dup_word_frac``    = 1 - distinct_tokens / n_tokens
    - ``top_bigram_frac``  = min(1, 2 * max bigram count  / n_tokens)
    - ``top_trigram_frac`` = min(1, 3 * max trigram count / n_tokens)

    Plan shape at 100 TB: the per-row terms (token count, distinct count)
    are pure codegen over the scan — no shuffle. Only the top-gram maxima
    need grouping: bigrams and trigrams are tagged (n, gram) structs
    exploded from ONE projection and partially aggregated map-side
    (hash-agg on (doc, n, gram) combines repeats before the exchange), so
    the shuffle carries at most one narrow row per distinct gram, never
    the text. Documents shorter than two tokens produce no gram rows and
    rejoin with zero fractions via the left join.
    """
    toks = tokens_col(F.col(text_col))
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("_n_distinct"),
    )

    def _tagged(n):
        return F.transform(
            _gram_strings(toks, n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram")),
        )

    grams = documents.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.concat(_tagged(2), _tagged(3))).alias("tg"),
    ).select("doc_id", F.col("tg.n").alias("n"), F.col("tg.gram").alias("gram"))
    tops = (
        grams.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("n") == 2, F.col("cnt"))).alias("_max2"),
            F.max(F.when(F.col("n") == 3, F.col("cnt"))).alias("_max3"),
        )
    )
    denom = F.greatest(F.col("n_tokens"), F.lit(1))
    return (
        base.join(tops, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            ((F.col("n_tokens") - F.col("_n_distinct")) / denom).alias(
                "dup_word_frac"
            ),
            F.least(
                F.coalesce(F.col("_max2"), F.lit(0)) * 2 / denom, F.lit(1.0)
            ).alias("top_bigram_frac"),
            F.least(
                F.coalesce(F.col("_max3"), F.lit(0)) * 3 / denom, F.lit(1.0)
            ).alias("top_trigram_frac"),
        )
    )


_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "que", "los", "es"],
}


def language_id(documents: DataFrame) -> DataFrame:
    """Stopword-hit language guess (deterministic, SQL-expressible)."""
    toks = tokens_col(F.col("text"))

    def _hits(ws):
        return lambda t: t.isin(*ws)

    scores = [
        F.size(F.filter(toks, _hits(ws))).alias(lang)
        for lang, ws in _LANG_MARKERS.items()
    ]
    scored = documents.select("doc_id", *scores)
    langs = list(_LANG_MARKERS)
    best = F.greatest(*[F.col(l) for l in langs])
    pick = F.when(best == 0, F.lit("und"))
    for l in langs:  # first language reaching the max wins (deterministic)
        pick = pick.when(F.col(l) == best, F.lit(l))
    return scored.select("doc_id", pick.alias("lang_guess"))


def fingerprint(documents: DataFrame) -> DataFrame:
    """Order-preserving normalized-token fingerprint (md5 of the joined
    normalized tokens) — content-defined identity robust to case/punct."""
    return documents.select(
        "doc_id",
        F.md5(F.array_join(tokens_col(F.col("text")), " ")).alias("fp"),
    )


# ------------------------------------------------------------ shingles


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle_hash long) distinct word n-grams (gram
    construction via the zip_with form — see _gram_strings)."""
    toks = tokens_col(F.col("text"))
    return (
        documents.withColumn("_toks", toks)
        .where(F.size("_toks") >= n)
        .select(
            "doc_id", F.explode(_gram_strings(F.col("_toks"), n)).alias("shingle")
        )
        .select("doc_id", _md5_28(F.col("shingle")).alias("shingle_hash"))
        .distinct()
    )


def minhash_signatures(
    documents: DataFrame, n: int = 3, num_hashes: int = 8
) -> DataFrame:
    """(doc_id, sig array<long>) — min over shingles of affine re-hashes."""
    sh = shingles(documents, n)
    # h_i = (a_i * h + b_i) mod P; h < 2^28, a < 2^31 -> product < 2^59
    mins = [
        F.min(
            (F.col("shingle_hash") * MINHASH_AS[i] + MINHASH_BS[i]) % MINHASH_P
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    bucket_cap: int = 5000,
    metrics=None,
) -> DataFrame:
    """Near-duplicate candidate pairs: band the signature, bucket-join.
    Returns (doc_a, doc_b, n_bands_hit) with doc_a < doc_b. Buckets larger
    than ``bucket_cap`` members are deterministically sampled down before
    the self-join (see cap_bucket_members)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, n, num_hashes)
    # bucket key = the band's signature values themselves (joined as text),
    # not an engine-specific hash -> reproducible in the DuckDB oracle
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col("sig")[i].cast("string")
                                for i in range(
                                    b * rows_per_band, (b + 1) * rows_per_band
                                )
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    banded = cap_bucket_members(
        banded, ["band", "bucket"], "doc_id", bucket_cap,
        metrics=metrics, metric_name="minhash_lsh_cap",
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_bands_hit"))
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    shingle_cap: int = 5000,
) -> DataFrame:
    """Exact n-gram Jaccard over shingle sets, pre-filtered by sharing at
    least one shingle (the scalable path pre-filters by LSH instead):
    (doc_a, doc_b, jaccard). A shingle shared by more than ``shingle_cap``
    documents is a stopword-like n-gram; its membership is capped before
    pair expansion (which slightly lowers the computed intersection for
    capped pairs — at scale, pre-drop such shingles entirely, df-style)."""
    sh = shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    capped = cap_bucket_members(sh, ["shingle_hash"], "doc_id", shingle_cap)
    a = capped.alias("a")
    b = capped.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle_hash") == F.col("b.shingle_hash"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("sz", "sz_a"), on="doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("sz", "sz_b"), on="doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def simhash(documents: DataFrame) -> DataFrame:
    """32-bit simhash of token hashes: per bit, sign of sum(+-1).
    Token hash = md5-based (oracle-reproducible); bit extraction via
    integer shifts — all codegen. 32 bits (not 64) keeps the whole
    fingerprint inside a non-negative long so the DuckDB oracle's shift
    arithmetic matches bit-for-bit; ``simhash_neardup_pairs``'s pigeonhole
    banding is width-agnostic."""
    tok = (
        documents.select("doc_id", F.explode(tokens_col(F.col("text"))).alias("t"))
        .select("doc_id", _md5_64(F.col("t")).alias("th"))
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(32)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(32):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.alias("simhash"))


def simhash_neardup_pairs(
    documents: DataFrame,
    max_hamming: int = 6,
    n_bands: int = 8,
    bucket_cap: int = 5000,
    metrics=None,
) -> DataFrame:
    """SimHash near-duplicate pairs with EXACT recall.

    The 32-bit simhash is split into ``n_bands`` equal bands and candidate
    pairs are generated by an equi-join on (band, band value) — the scale
    path (one shuffle on band buckets instead of an O(n^2) cross join).
    Pigeonhole guarantee: ``max_hamming`` differing bits can touch at most
    ``max_hamming`` bands, so any pair within the radius shares at least one
    band whenever ``max_hamming < n_bands`` — banding loses nothing, and a
    brute-force O(n^2) scan is a *provably equal* oracle. Survivors are
    refined with the exact popcount of XOR.
    Returns (doc_a, doc_b, hamming), doc_a < doc_b.

    Buckets above ``bucket_cap`` members are deterministically sampled
    before the self-join (cap_bucket_members) — the exact-recall guarantee
    then holds for pairs whose LOWEST shared band survived the cap; over-cap
    buckets are auditable via ``hot_buckets``.

    Scale note: a pair sharing m bands comes out of the band join m times,
    but the duplicates are dropped WITHOUT a shuffle — each pair is kept
    only in its lowest matching band, decided by recomputing the band-
    equality bitmask from the two simhashes in whole-stage codegen
    (``matches & (2^band - 1) == 0``). With 4-bit bands the candidate
    volume is ~n^2/16 per band; shipping that through a dropDuplicates
    exchange was the dominant cost of this operator at bench scale, and at
    100 TB it would be the dominant shuffle of the whole job. The hamming
    radius filter also runs before pair emission for the same reason.
    """
    assert max_hamming < n_bands
    assert 32 % n_bands == 0
    r = 32 // n_bands
    sh = simhash(documents)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * r)
                        .bitwiseAND(F.lit((1 << r) - 1))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.band", "bv.val")
    banded = cap_bucket_members(
        banded, ["band", "val"], "doc_id", bucket_cap,
        metrics=metrics, metric_name="simhash_lsh_cap",
    )
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"),
        "band", "val",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
        "band", "val",
    )
    mask = (1 << r) - 1
    band_eq = [
        (
            F.shiftright(F.col("sh_a"), b2 * r).bitwiseAND(F.lit(mask))
            == F.shiftright(F.col("sh_b"), b2 * r).bitwiseAND(F.lit(mask))
        ).cast("int") * F.lit(1 << b2)
        for b2 in range(n_bands)
    ]
    matches = band_eq[0]
    for term in band_eq[1:]:
        matches = matches + term
    return (
        a.join(b, on=["band", "val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))),
        )
        .where(F.col("hamming") <= max_hamming)
        # keep the pair only in its lowest matching band: no band below
        # `band` has equal values, so exactly one of the m duplicate rows
        # survives — pair dedup with zero exchanges
        .where(
            matches.bitwiseAND(F.expr("shiftleft(1, band) - 1")) == 0
        )
        .select("doc_a", "doc_b", "hamming")
    )


# -------------------------------------------------------------- vocabulary


def term_stats(documents: DataFrame, min_df: int = 1, n: int = 1) -> DataFrame:
    """Corpus vocabulary: one row per distinct term with its document
    frequency (``df`` — documents containing the term) and total term
    frequency (``tf`` — occurrences across the corpus), filtered to
    ``df >= min_df``. The input to IDF tables, vocab pruning and
    tokenizer training. With ``n > 1`` the terms are word n-grams
    (space-joined, via ``_gram_strings``) — the frequency table behind
    boilerplate detection: an n-gram whose df approaches the corpus's
    per-source document count is template text, not content.

    100 TB design: the classic two-level word-count. Tokens explode to
    (term, doc_id) and aggregate per (term, doc_id) first — partial
    aggregation collapses a document's repeated terms map-side, so the
    exchange carries at most one tuple per DISTINCT (term, doc) pair,
    not one per occurrence. The second groupBy (term) rides the same
    hash partitioning prefix. Zipf skew is absorbed by the map-side
    combine: a stopword appearing 1e9 times still ships one tuple per
    (doc, term). No count_distinct (its expand doubles the shuffle).
    The same bounds hold at any ``n`` (a doc yields len-n+1 grams).
    """
    toks = tokens_col(F.col("text"))
    terms = _term_col(toks, n)
    per_doc = (
        documents.select(
            "doc_id", F.explode(terms).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        per_doc.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("n").alias("tf"),
        )
        .where(F.col("df") >= F.lit(min_df))
    )



def token_entropy(documents: DataFrame) -> DataFrame:
    """Per-document token-distribution Shannon entropy (nats):
    ``-sum_t (c_t/n) ln(c_t/n)`` over the document's distinct tokens,
    plus (n_tokens, n_distinct). Low entropy = repetitive/templated text
    (a quality signal complementary to the Gopher repetition ratios: it
    catches many-distinct-but-skewed distributions the top-gram fractions
    miss). Empty documents get entropy 0.0.

    100 TB design: the same two-level shape as :func:`term_stats` — the
    exchange carries one (doc, term, count) tuple per DISTINCT term
    (map-side combine absorbs repeats), and the per-doc rollup keys on
    doc_id. The entropy sum is a groupBy aggregate of per-term
    contributions; both engines round to 6 decimals (sum-order float
    noise is ~1e-15 relative, far inside the rounding).
    """
    toks = tokens_col(F.col("text"))
    per_term = (
        documents.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    stats = per_term.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double")))
        .alias("_clnc"),
    )
    # -sum(p ln p) = ln(n) - sum(c ln c)/n  (exact algebra; one log per
    # distinct term plus one of n, instead of a division inside the sum)
    ent = F.log(F.col("n_tokens").cast("double")) - F.col("_clnc") / F.col(
        "n_tokens"
    )
    totals = documents.select("doc_id")
    return totals.join(stats, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        F.coalesce(F.round(ent, 6), F.lit(0.0)).alias("entropy_r"),
    )

def dup_span_fraction(documents: DataFrame, n: int = 3) -> DataFrame:
    """Per-document duplicated-span score: for each document, the fraction
    of its word n-gram positions whose n-gram also occurs in at least one
    OTHER document. The corpus-level dedup signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"): a doc
    whose spans are mostly shared is boilerplate/near-duplicate even when
    no single whole-document match exists. Returns
    (doc_id, n_grams, dup_grams, dup_frac) for every document.

    100 TB design: the same two-level plan as :func:`term_stats` — the
    exchange carries one tuple per distinct (gram, doc), never one per
    occurrence, so Zipf-skewed grams are collapsed map-side. The
    cross-doc signal (``df >= 2``) comes from a groupBy + shuffle JOIN on
    the gram rather than a ``count(*) over (partition by gram)`` window:
    a partial-aggregated groupBy absorbs a hot gram before the exchange
    and AQE can split the join's skewed partitions, while a window would
    serialize every row of the hot gram in one task. The final per-doc
    rollup and the left join back to the (narrow) totals projection both
    key on doc_id.
    """
    toks = tokens_col(F.col("text"))
    terms = _term_col(toks, n)
    per_doc = (
        documents.select("doc_id", F.explode(terms).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    gram_df = per_doc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dup = (
        per_doc.join(gram_df.where(F.col("df") >= 2), on="term")
        .groupBy("doc_id")
        .agg(F.sum("cnt").alias("dup_grams"))
    )
    totals = documents.select(
        "doc_id",
        F.greatest(F.size(toks) - (n - 1), F.lit(0))
        .cast("long")
        .alias("n_grams"),
    )
    dup_grams = F.coalesce(F.col("dup_grams"), F.lit(0).cast("long"))
    # int/int double division is IEEE-identical across engines; no rounding
    frac = F.when(
        F.col("n_grams") > 0,
        dup_grams.cast("double") / F.col("n_grams").cast("double"),
    ).otherwise(F.lit(0.0))
    return totals.join(dup, on="doc_id", how="left").select(
        "doc_id",
        "n_grams",
        dup_grams.alias("dup_grams"),
        frac.alias("dup_frac"),
    )


def dup_span_extents(
    documents: DataFrame, n: int = 3, min_len: int = 0
) -> DataFrame:
    """WHERE the duplication lives: per document, the maximal token spans
    covered by cross-document duplicated word n-grams. The actionable form
    of :func:`dup_span_fraction` — instead of a score, it returns the
    [span_start, span_end) token intervals a Lee-et-al-2022-style
    exact-substring dedup pass would strip (their suffix-array "remove
    every duplicated substring of >= L tokens", approximated at n-gram
    granularity: a token is covered iff some n-gram through it also occurs
    in at least one OTHER document; runs of covered positions fuse into
    maximal spans). Returns (doc_id, span_start, span_end, n_dup_grams),
    positions 0-based token indices, ``span_end`` exclusive; ``min_len``
    drops spans shorter than that many tokens. Note the fused span is
    duplicated COVERAGE — consecutive grams may each match a different
    peer document; for the per-doc strip decision that is exactly what is
    wanted (every token in the span appears verbatim elsewhere in context
    >= n).

    100 TB design: gram text never shuffles — positions ride a 60-bit
    md5-prefix hash of the gram, so the exchanges carry (hash, doc, pos)
    tuples. 60 bits, not the 28 :func:`shingles` uses for overflow-safe
    arithmetic: this hash is only compared for equality, and a collision
    FABRICATES a duplicated span, so the space must dwarf the distinct
    gram count (expected spurious gram pairs ~ B^2/2^61 — under 0.5 even
    at a billion distinct grams, where 28 bits would flag nearly every
    position). The cross-doc test is the
    same partial-aggregated two-level groupBy as :func:`term_stats`
    (one tuple per distinct (gram, doc) crosses the second exchange;
    Zipf-hot grams collapse map-side), probed back with a shuffle join
    AQE can split on skew. The only window partitions by doc_id — bounded
    by document length, never by gram popularity, so a boilerplate gram
    shared by 1e9 documents cannot serialize a task. Interval fusion is
    the gaps-and-islands idiom: a new island starts where the gap between
    consecutive duplicated positions exceeds ``n``.
    """
    toks = tokens_col(F.col("text"))
    terms = _term_col(toks, n)
    pos = documents.select(
        "doc_id", F.posexplode(terms).alias("pos", "term")
    ).select("doc_id", "pos", _md5_64(F.col("term")).alias("gh"))
    cross = (
        pos.groupBy("gh", "doc_id")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= 2)
        .select("gh")
    )
    duppos = pos.join(cross, on="gh").select("doc_id", "pos")
    by_doc = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(by_doc) <= F.lit(n), F.lit(0)
    ).otherwise(F.lit(1))  # lag NULL (first position) -> new island
    islands = duppos.select(
        "doc_id",
        "pos",
        F.sum(brk).over(
            by_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_isl"),
    )
    out = islands.groupBy("doc_id", "_isl").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(n)).alias("span_end"),
        F.count(F.lit(1)).alias("n_dup_grams"),
    )
    if min_len > 0:
        out = out.where(
            F.col("span_end") - F.col("span_start") >= F.lit(min_len)
        )
    return out.select("doc_id", "span_start", "span_end", "n_dup_grams")


def bm25_topk(
    documents: DataFrame,
    query_terms,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25-ranked top-k document retrieval for a bag of query terms
    (Robertson/Spärck Jones idf, ``ln(1 + (N - df + .5)/(df + .5))``).
    Returns (doc_id, score, rank), rank <= k; only documents containing
    at least one query term are candidates (zero-score docs never rank). The lexical-retrieval twin
    of ``cosine_topk`` — the standard tool for mining topical subsets out
    of a pretraining corpus.

    100 TB design: tokens are exploded ALREADY FILTERED to the (tiny,
    broadcast-literal) query vocabulary, so the exchange carries only
    query-term hits — one partially-aggregated tuple per (doc, term) —
    never the corpus vocabulary. Corpus stats (N, avgdl) are one 1-row
    aggregate; per-term df rides the same hit tuples (a second groupBy of
    an already-small table). The final selection is orderBy+limit =
    TakeOrderedAndProject, per-partition top-k with no global sort. The
    corpus text itself never shuffles.
    """
    terms = sorted({str(t) for t in query_terms})
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens_col(F.col("text"))
    base = documents.select(
        "doc_id", toks.alias("tk"), F.size(toks).alias("dl")
    )
    n_row = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    ).collect()[0]
    if not n_row["n"]:
        raise ValueError("bm25_topk: empty corpus")
    n_docs, avgdl = int(n_row["n"]), float(n_row["avgdl"])
    qset = F.array(*[F.lit(t) for t in terms])
    hits = (
        base.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(F.col("tk"), lambda t: F.array_contains(qset, t))
            ).alias("term"),
        )
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_tbl = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    contrib = idf * (
        F.col("tf")
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
    )
    # fixed-order pivot sum: docs sharing a (tf, dl) profile must score
    # bit-identically in any engine, so the per-doc total is added in
    # sorted-term order (a groupBy sum's accumulation order would not be)
    per_term = [
        F.max(F.when(F.col("term") == t, contrib)).alias(f"c{i}")
        for i, t in enumerate(terms)
    ]
    score = None
    for i in range(len(terms)):
        part = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
        score = part if score is None else score + part
    scored = (
        hits.join(F.broadcast(df_tbl), on="term")
        .groupBy("doc_id")
        .agg(*per_term)
        .select("doc_id", score.alias("score"))
    )
    out = scored.orderBy(F.desc("score"), "doc_id").limit(k)
    return out.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), "doc_id")
        ),
    )


# -------------------------------------------------------------- PII redact


# Patterns are written to the common subset of Java regex (Spark) and RE2
# (DuckDB): character classes, bounded repetition, \b word boundaries — no
# lookarounds, no backreferences — so the oracle runs the LITERAL same
# pattern. Order matters and is fixed (email -> phone -> ipv4): an email's
# local part may contain digit runs a later pattern could clip, so emails
# are removed first in both engines.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"
PII_IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_redact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails / phone numbers / IPv4 addresses from ``text_col``.

    One row per document: ``doc_id, clean_text, n_emails, n_phones,
    n_ips``. Counts are taken BEFORE any replacement (on the raw text for
    emails; on the email-redacted text for phones, etc.) so each count
    reflects what its own pass actually removed.

    100 TB design: three chained ``regexp_count``/``regexp_replace``
    projections — pure whole-stage codegen, zero shuffles, zero state. A
    PII scrub over 100 TB is exactly one scan. The replacement tokens are
    bracketed uppercase sentinels (never produced by the patterns
    themselves, so the three passes cannot cascade into each other).
    """
    text = F.col(text_col)
    after_email = F.regexp_replace(text, PII_EMAIL_RE, "[EMAIL]")
    after_phone = F.regexp_replace(after_email, PII_PHONE_RE, "[PHONE]")
    after_ip = F.regexp_replace(after_phone, PII_IPV4_RE, "[IP]")
    return documents.select(
        "doc_id",
        after_ip.alias("clean_text"),
        F.regexp_count(text, F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_count(after_phone, F.lit(PII_IPV4_RE)).alias("n_ips"),
    )


# ------------------------------------------------------- source reputation


def source_stats(documents: DataFrame) -> DataFrame:
    """Per-source corpus statistics for C4-style domain/source filtering.

    One row per ``source``: doc count, distinct-text count (md5 identity),
    total token count and total stopword hits. All four are exact integer
    aggregates — no floating-point means — so the row is bit-identical
    across engines and partition orders; consumers derive ratios
    (dup rate = 1 - n_distinct/n_docs, stopword density = sum_stop_hits /
    sum_tokens) or compare via cross-multiplied integers as
    :func:`source_filter` does.

    100 TB design: a single groupBy on ``source`` with map-side partial
    aggregation — only (source, partial counters) tuples shuffle, never
    text. The result is one row per source (web corpora: ~1e7 domains,
    a few hundred MB), which is exactly the small side a broadcast join
    wants downstream.
    """
    toks = tokens_col(F.col("text"))
    stop_hits = _stop_hits(toks)
    return (
        documents.select(
            "source",
            _md5_64(F.col("text")).alias("tdig"),
            F.size(toks).alias("ntok"),
            stop_hits.alias("nstop"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("tdig")).alias("n_distinct_texts"),
            F.sum("ntok").alias("sum_tokens"),
            F.sum("nstop").alias("sum_stop_hits"),
        )
    )


def source_token_report(documents: DataFrame) -> DataFrame:
    """Per-source token-length distribution report: (source, n_docs,
    sum_tokens, min_tokens, max_tokens, mean_tokens, var_tokens,
    median_tokens) — the corpus report card a mixture designer reads
    before setting :func:`~..curation.token_budget_mixture` budgets.

    Exactness across engines: mean and variance are closed-form
    expressions over EXACT integer aggregates (sum, sum of squares,
    count) — one double division each, no accumulation-order-dependent
    float sums — and the median interpolates two exact integer order
    statistics, so every output value is bit-reproducible by any engine
    (DuckDB's quantile_cont(0.5) agrees exactly: (a + b)/2 of two ints).

    100 TB design — the exact median WITHOUT buffering values: a naive
    ``percentile`` aggregate buffers every group's values in one task
    (OOM on a billion-doc source) and a sort-based median is a global
    sort. Here the corpus reduces map-side to a (source, n_tokens)
    HISTOGRAM — at most O(sources × distinct lengths) rows cross the
    exchange regardless of corpus size — and the median is read off the
    cumulative histogram with a window over those tiny rows. The sums
    ride the same histogram (weighted by count), so the corpus is
    scanned exactly once and never shuffled.
    """
    hist = (
        documents.select(
            "source", F.size(tokens_col(F.col("text"))).alias("ntok")
        )
        .groupBy("source", "ntok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("source").orderBy("ntok")
    full = Window.partitionBy("source").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = (
        hist.withColumn(
            "c_hi",
            F.sum("cnt").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("c_lo", F.col("c_hi") - F.col("cnt"))
        .withColumn("n", F.sum("cnt").over(full))
    )
    # 0-based order-statistic positions bracketing the median
    lo = F.floor((F.col("n") - 1) / 2)
    hi = F.floor(F.col("n") / 2)
    covers = lambda p: (F.col("c_lo") <= p) & (p < F.col("c_hi"))  # noqa: E731
    ntok = F.col("ntok").cast("long")
    return cum.groupBy("source").agg(
        F.max("n").alias("n_docs"),
        F.sum(ntok * F.col("cnt")).alias("sum_tokens"),
        F.min("ntok").alias("min_tokens"),
        F.max("ntok").alias("max_tokens"),
        (
            F.sum(ntok * F.col("cnt")).cast("double") / F.max("n")
        ).alias("mean_tokens"),
        # sum of ntok^2 widened to decimal BEFORE the aggregate: a 1e9-doc
        # source averaging 1e5 tokens sums to ~1e19 > 2^63, where a long
        # sum would silently wrap (the oracle's HUGEINT stays exact).
        # ntok^2 itself is long-safe (a doc would need 3e9 tokens to
        # overflow); the decimal sum is exact, so the final double cast
        # is still correctly rounded — bit-equal to the oracle.
        (
            F.sum((ntok * ntok).cast("decimal(38,0)") * F.col("cnt"))
            .cast("double")
            / F.max("n")
            - (F.sum(ntok * F.col("cnt")).cast("double") / F.max("n"))
            * (F.sum(ntok * F.col("cnt")).cast("double") / F.max("n"))
        ).alias("var_tokens"),
        (
            (
                F.max(F.when(covers(lo), ntok)).cast("double")
                + F.max(F.when(covers(hi), ntok)).cast("double")
            )
            / 2.0
        ).alias("median_tokens"),
    )


def source_filter(
    documents: DataFrame,
    max_dup_pct: int = 50,
    min_stop_per_mille: int = 10,
) -> DataFrame:
    """Drop every document from low-reputation sources.

    A source is kept iff its duplicate rate is at most ``max_dup_pct``
    percent (duplicates = docs beyond the first per distinct text) AND its
    corpus-wide stopword density is at least ``min_stop_per_mille`` per
    thousand tokens. Both predicates are evaluated as cross-multiplied
    integer comparisons — no division, no doubles — so the keep set is
    engine-exact.

    Returns the surviving documents (all original columns).

    100 TB design: :func:`source_stats` reduces to one tiny row per
    source; the keep list is broadcast back into a map-side semi join, so
    the corpus itself is scanned once and never shuffled.
    """
    stats = source_stats(documents)
    keep = stats.where(
        (
            (F.col("n_docs") - F.col("n_distinct_texts")) * 100
            <= F.lit(max_dup_pct) * F.col("n_docs")
        )
        & (
            F.col("sum_stop_hits") * 1000
            >= F.lit(min_stop_per_mille) * F.col("sum_tokens")
        )
    ).select("source")
    return documents.join(F.broadcast(keep), on="source", how="inner")
