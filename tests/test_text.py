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
