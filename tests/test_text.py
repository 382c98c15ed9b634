"""Text-pipeline operator tests (dedup family, quality, langid, fingerprint)."""

import pytest
from pyspark.sql import functions as F

from topojson_spark.functions import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "the quick brown fox jumps over the lazy dog!"),  # near dup
        (4, "der hund und die katze, das ist gut"),
        (5, "completely different content about spark engines"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["text_hash"]: r for r in X.exact_dedup(docs).collect()}
    dups = [r for r in out.values() if r["n_dups"] > 1]
    assert len(dups) == 1
    assert dups[0]["keep_doc_id"] == 1 and dups[0]["n_dups"] == 2


def test_token_count(docs):
    out = {r["doc_id"]: r["n_tokens"] for r in X.token_count(docs).collect()}
    assert out[1] == 9
    assert out[6] == 0


def test_quality_score(docs):
    out = {r["doc_id"]: r for r in X.quality_score(docs).collect()}
    assert out[1]["stopword_ratio"] == pytest.approx(2 / 9)
    assert out[3]["punct_ratio"] > 0
    assert out[6]["n_tokens"] == 0


def test_language_id(docs):
    out = {r["doc_id"]: r["lang_guess"] for r in X.language_id(docs).collect()}
    assert out[1] == "en"
    assert out[4] == "de"
    assert out[6] == "und"


def test_fingerprint_normalizes(docs):
    out = {r["doc_id"]: r["fp"] for r in X.fingerprint(docs).collect()}
    # doc 3 differs only by case/punctuation -> same fingerprint as 1
    assert out[1] == out[2] == out[3]
    assert out[1] != out[5]


def test_simhash_near_dups_close(docs):
    out = {r["doc_id"]: r["simhash"] for r in X.simhash(docs).collect()}
    assert out[1] == out[2] == out[3]  # same normalized tokens
    ham = bin(out[1] ^ out[5]).count("1")
    assert ham > 4  # different content far apart


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["n_bands_hit"]
        for r in X.minhash_lsh_pairs(docs).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 4
    assert (1, 3) in pairs
    assert (1, 5) not in pairs


def test_ngram_jaccard(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in X.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] == 1.0  # normalization removes the '!' difference


def test_bucket_cap_bounds_viral_cluster(spark):
    """A 1k-member near-duplicate cluster must not make any LSH bucket
    quadratic: with a cap of 40, pair counts are bounded by C(40,2) and the
    over-cap buckets are reported by the audit query with exact
    dropped-pair accounting."""
    base = "spark engines process very large corpora with shuffles "
    rows = [(i, base + f"variant common tail {i % 2}") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from topojson_spark.plans.metrics import StageMetrics

    metrics = StageMetrics()
    pairs = X.minhash_lsh_pairs(docs, bucket_cap=40, metrics=metrics).collect()
    # every band bucket contributes at most C(40,2) pairs; 4 bands
    assert 0 < len(pairs) <= 4 * (40 * 39 // 2)
    # uncapped would be ~C(500,2)*2 = 249500 pairs
    assert len(pairs) < 5000
    # the degradation counter rode along with the collect (no extra job):
    # 1000 docs x 4 bands memberships, most of them capped out at 40/bucket
    m = metrics.get("minhash_lsh_cap")
    assert m is not None
    assert m["n_members_total"] == 4000
    assert m["n_capped_members"] > 0

    # audit: rebuild the banded frame via the public pieces and check math
    sig = X.minhash_signatures(docs)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ":",
                            *[F.col("sig")[i].cast("string") for i in range(b * 2, b * 2 + 2)],
                        ).alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    hot = X.hot_buckets(banded, ["band", "bucket"], cap=40).collect()
    assert hot, "the viral cluster must surface in the audit"
    for r in hot:
        n = r["n_members"]
        assert r["n_dropped_pairs"] == n * (n - 1) // 2 - 40 * 39 // 2


def test_bucket_cap_default_is_above_test_scale(docs):
    """Default caps must not change results at oracle/test scale."""
    with_cap = sorted(
        (r["doc_a"], r["doc_b"]) for r in X.minhash_lsh_pairs(docs).collect()
    )
    no_cap = sorted(
        (r["doc_a"], r["doc_b"])
        for r in X.minhash_lsh_pairs(docs, bucket_cap=None).collect()
    )
    assert with_cap == no_cap


# ------------------------------------------------- repetition metrics


def test_repetition_metrics_hand_computed(spark):
    rows = [
        # "a b a b a" -> 5 tokens, 2 distinct; bigrams: a-b x2, b-a x2
        # -> top_bigram 2*2/5; trigrams (a b a), (b a b), (a b a) ->
        # max 2 -> raw 3*2/5 = 1.2 over OVERLAPPING grams, clamped to 1
        (1, "a b a b a"),
        # all distinct, every gram unique
        (2, "one two three four"),
        # single token: no grams at all
        (3, "solo"),
        # empty doc
        (4, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from topojson_spark.functions.text import repetition_metrics

    out = {r["doc_id"]: r for r in repetition_metrics(docs).collect()}
    assert out[1]["n_tokens"] == 5
    assert out[1]["dup_word_frac"] == pytest.approx(3 / 5)
    assert out[1]["top_bigram_frac"] == pytest.approx(4 / 5)
    # raw overlap-counted ratio is 6/5; the operator clamps to the Gopher
    # character-fraction bound of 1
    assert out[1]["top_trigram_frac"] == pytest.approx(1.0)
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(2 / 4)
    assert out[2]["top_trigram_frac"] == pytest.approx(3 / 4)
    assert out[3]["n_tokens"] == 1
    assert out[3]["top_bigram_frac"] == 0.0
    assert out[3]["top_trigram_frac"] == 0.0
    assert out[4]["n_tokens"] == 0
    assert out[4]["dup_word_frac"] == 0.0
    assert out[4]["top_bigram_frac"] == 0.0


def test_repetition_metrics_normalizes(spark):
    # punctuation/case fold into the same tokens before counting
    docs = spark.createDataFrame(
        [(1, "Spam! spam? SPAM. ham")], "doc_id long, text string"
    )
    from topojson_spark.functions.text import repetition_metrics

    r = repetition_metrics(docs).collect()[0]
    assert r["n_tokens"] == 4
    assert r["dup_word_frac"] == pytest.approx(2 / 4)
    # bigrams: spam-spam x2, spam-ham -> 2*2/4
    assert r["top_bigram_frac"] == pytest.approx(4 / 4)


# ----------------------------------------------------------------- PII


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (1, "mail me at john.doe+spam@sub.example.co.uk today"),
        (2, "call 555-123-4567 or 020.555.1234 anytime"),  # both match
        (3, "server at 192.168.0.1 and 10.0.0.255, port 80"),
        (4, "a@b.io x@y.z 999-888-7777 1.2.3.4"),  # x@y.z: tld too short
        (5, "nothing sensitive here at all"),
        (6, "trailing dot user@example.com. end"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redact_counts_and_text(pii_docs):
    out = {r["doc_id"]: r for r in X.pii_redact(pii_docs).collect()}
    assert out[1]["n_emails"] == 1
    assert out[1]["clean_text"] == "mail me at [EMAIL] today"
    # 020.555.1234 is 3-3-4? no: 020.555.1234 -> 3-3-4 digits, matches
    assert out[2]["n_phones"] == 2
    assert out[2]["clean_text"] == "call [PHONE] or [PHONE] anytime"
    assert out[3]["n_ips"] == 2
    assert out[3]["clean_text"] == "server at [IP] and [IP], port 80"
    assert (out[4]["n_emails"], out[4]["n_phones"], out[4]["n_ips"]) == (
        1, 1, 1,
    )
    assert out[4]["clean_text"] == "[EMAIL] x@y.z [PHONE] [IP]"
    assert out[5]["clean_text"] == "nothing sensitive here at all"
    assert (out[5]["n_emails"], out[5]["n_phones"], out[5]["n_ips"]) == (
        0, 0, 0,
    )
    # greedy local/domain classes stop before the trailing period
    assert out[6]["clean_text"] == "trailing dot [EMAIL]. end"


def test_pii_redact_matches_duckdb_semantics(pii_docs):
    """The oracle runs the LITERAL same patterns in RE2; pin the Java-regex
    result against DuckDB on the adversarial fixture (leftmost-match and
    greediness agreement is the whole parity claim)."""
    import duckdb

    rows = pii_docs.select("doc_id", "text").collect()
    con = duckdb.connect()
    con.execute("create table d (doc_id bigint, text varchar)")
    con.executemany(
        "insert into d values (?, ?)", [(r[0], r[1]) for r in rows]
    )
    ora = {
        r[0]: r[1:]
        for r in con.execute(
            f"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(text,
            '{X.PII_EMAIL_RE}', '[EMAIL]', 'g'),
            '{X.PII_PHONE_RE}', '[PHONE]', 'g'),
            '{X.PII_IPV4_RE}', '[IP]', 'g') AS clean_text,
          len(regexp_extract_all(text, '{X.PII_EMAIL_RE}')) AS n_emails
        FROM d"""
        ).fetchall()
    }
    got = {r["doc_id"]: r for r in X.pii_redact(pii_docs).collect()}
    for doc_id, (clean, n_em) in ora.items():
        assert got[doc_id]["clean_text"] == clean, doc_id
        assert got[doc_id]["n_emails"] == n_em, doc_id


# ------------------------------------------------------- source reputation


@pytest.fixture(scope="module")
def sourced_docs(spark):
    rows = [
        # good source: distinct texts, normal stopword density
        (1, "the cat sat on the mat and looked to the door", "good"),
        (2, "a dog ran in the park and found a stick", "good"),
        (3, "the sun is high and the day is long", "good"),
        # spammy source: 3 copies of the same text
        (4, "buy cheap widgets now best price widgets", "dupfarm"),
        (5, "buy cheap widgets now best price widgets", "dupfarm"),
        (6, "buy cheap widgets now best price widgets", "dupfarm"),
        # gibberish source: zero stopwords
        (7, "zzz qqq xxx www yyy kkk", "gibberish"),
        (8, "mmm nnn ppp rrr sss ttt", "gibberish"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_source_stats(sourced_docs):
    out = {r["source"]: r for r in X.source_stats(sourced_docs).collect()}
    assert out["good"]["n_docs"] == 3
    assert out["good"]["n_distinct_texts"] == 3
    assert out["dupfarm"]["n_docs"] == 3
    assert out["dupfarm"]["n_distinct_texts"] == 1
    assert out["gibberish"]["sum_stop_hits"] == 0
    assert out["good"]["sum_stop_hits"] > 0
    assert out["good"]["sum_tokens"] == 30


def test_source_filter(sourced_docs):
    kept = X.source_filter(
        sourced_docs, max_dup_pct=50, min_stop_per_mille=10
    ).collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2, 3]
    # relaxing both gates keeps everything
    all_kept = X.source_filter(
        sourced_docs, max_dup_pct=100, min_stop_per_mille=0
    ).collect()
    assert len(all_kept) == 8


def test_source_filter_broadcasts_keep_list(sourced_docs):
    plan = X.source_filter(sourced_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_bm25_topk_matches_reference(spark):
    import math

    rows = [
        (1, "spark spark spark join"),
        (2, "spark join window window"),
        (3, "window window window window window"),
        (4, "other words entirely here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = X.bm25_topk(docs, ["spark", "window"], k=4).collect()

    # pure-python BM25 (k1=1.2, b=0.75) over the same corpus
    toks = {r[0]: r[1].split() for r in rows}
    n, avgdl = 4, sum(len(t) for t in toks.values()) / 4
    dfs = {
        q: sum(q in t for t in toks.values()) for q in ("spark", "window")
    }
    def score(d):
        s = 0.0
        for q in ("spark", "window"):
            tf = toks[d].count(q)
            if not tf:
                continue
            idf = math.log(1.0 + (n - dfs[q] + 0.5) / (dfs[q] + 0.5))
            s += idf * tf / (tf + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl))
        return s
    # only docs containing >= 1 query term are retrieval candidates
    want = sorted(
        (d for d in toks if score(d) > 0), key=lambda d: (-score(d), d)
    )
    assert [r["doc_id"] for r in got] == want
    assert [r["rank"] for r in got] == [1, 2, 3]
    by_id = {r["doc_id"]: r["score"] for r in got}
    for d in want:
        assert by_id[d] == pytest.approx(score(d), rel=1e-12)
    assert 4 not in by_id  # no query-term hit -> not a candidate
    with pytest.raises(ValueError):
        X.bm25_topk(docs, [])


def test_bm25_plan_is_distributed(spark):
    docs = spark.createDataFrame(
        [(i, "spark join") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        X.bm25_topk(docs, ["spark"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # per-partition top-k selection, no global sort of the corpus
    assert "TakeOrderedAndProject" in plan


def test_bm25_empty_corpus_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        X.bm25_topk(empty, ["spark"])


def test_source_token_report_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # source A: lengths 1, 2, 4 (odd count -> median 2)
            (1, "a", "A"),
            (2, "a b", "A"),
            (3, "a b c d", "A"),
            # source B: lengths 2, 4 (even count -> median 3.0)
            (4, "x y", "B"),
            (5, "x y z w", "B"),
            # source C: single doc, variance 0
            (6, "only three words", "C"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in X.source_token_report(docs).collect()}
    a, b, c = out["A"], out["B"], out["C"]
    assert (a["n_docs"], a["sum_tokens"], a["min_tokens"], a["max_tokens"]) \
        == (3, 7, 1, 4)
    assert a["median_tokens"] == 2.0
    assert a["mean_tokens"] == pytest.approx(7 / 3)
    # var = E[x^2] - E[x]^2 = (1+4+16)/3 - (7/3)^2
    assert a["var_tokens"] == pytest.approx(21 / 3 - (7 / 3) ** 2)
    assert b["median_tokens"] == 3.0  # interpolated between 2 and 4
    assert (c["n_docs"], c["var_tokens"], c["median_tokens"]) == (1, 0.0, 3.0)


def test_subword_count_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            # "internationalization" -> inte|rnat|iona|liza|tion = 5 pieces
            (1, "internationalization"),
            # "Hi there!" -> hi|ther|e|! = 4 pieces, 2 whitespace tokens
            (2, "Hi there!"),
            # digits chunk in 3s: 12345 -> 123|45; dash is its own piece
            (3, "12345-6"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.subword_count(docs).collect()}
    assert out[1]["n_tokens"] == 1 and out[1]["n_subtokens"] == 5
    assert out[2]["n_tokens"] == 2 and out[2]["n_subtokens"] == 4
    assert out[3]["n_subtokens"] == 4  # 123|45|-|6
    assert out[4]["n_tokens"] == 0 and out[4]["n_subtokens"] == 0


def test_token_entropy_hand_computed(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),        # single token: entropy 0
            (2, "a b c d"),        # uniform over 4: ln(4)
            (3, "a a b"),          # -(2/3 ln 2/3 + 1/3 ln 1/3)
            (4, ""),               # empty: entropy 0, zero counts
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in X.token_entropy(docs).collect()}
    assert out[1]["entropy_r"] == 0.0 and out[1]["n_distinct"] == 1
    assert out[2]["entropy_r"] == round(math.log(4), 6)
    want3 = -(2 / 3 * math.log(2 / 3) + 1 / 3 * math.log(1 / 3))
    assert out[3]["entropy_r"] == pytest.approx(want3, abs=1e-6)
    assert out[4]["n_tokens"] == 0 and out[4]["entropy_r"] == 0.0
