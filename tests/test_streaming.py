"""Streaming ingest test: documents stream -> staged extract tables ->
batch topology over the staged output equals the all-batch result."""

import pytest

from topojson_spark.sources.corpus import generate_documents


def test_stream_extract_matches_batch(spark, tmp_path):
    from topojson_spark.streaming.ingest import (
        read_documents_stream,
        stream_extract,
    )
    from topojson_spark.operators.extract import extract, features_from_documents
    from topojson_spark.options import TopoOptions

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")

    docs = generate_documents(spark, 40, 4, 4)
    # write as multiple files to exercise multi-trigger ingestion
    docs.repartition(4).write.parquet(src)

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    assert stream.isStreaming
    queries = stream_extract(stream, out, ckpt)
    for q in queries:
        q.awaitTermination(120)

    from topojson_spark.streaming.ingest import read_staged

    staged_lines, _, _ = read_staged(spark, out)
    opts = TopoOptions()
    batch_lines, _, _ = extract(
        features_from_documents(docs), opts
    )
    a = {
        (r["fkey"], r["unit_seq"], r["ring_seq"]): r["coords"]
        for r in staged_lines.collect()
    }
    b = {
        (r["fkey"], r["unit_seq"], r["ring_seq"]): r["coords"]
        for r in batch_lines.collect()
    }
    assert a == b


def test_stream_resume_is_incremental(spark, tmp_path):
    """Restarting the stream after new files arrive only processes the new
    files (exactly-once via checkpoint) — the resumability story."""
    from topojson_spark.streaming.ingest import (
        read_documents_stream,
        stream_extract,
    )

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "staged")
    ckpt = str(tmp_path / "ckpt")

    generate_documents(spark, 20, 4, 4).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    from topojson_spark.streaming.ingest import read_staged

    for q in stream_extract(read_documents_stream(spark, src), out, ckpt):
        q.awaitTermination(120)
    n1 = read_staged(spark, out)[2].count()

    # second batch of *different* docs arrives
    generate_documents(spark, 15, 4, 4, seed=99).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    for q in stream_extract(read_documents_stream(spark, src), out, ckpt):
        q.awaitTermination(120)
    n2 = read_staged(spark, out)[2].count()

    # each doc carries exactly one geometry span -> one feature per doc;
    # the first 20 must not be reprocessed on resume
    assert n1 == 20
    assert n2 == 35
