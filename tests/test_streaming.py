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


def test_stream_exact_dedup_state(spark, tmp_path):
    """Cross-micro-batch stateful dedup: first occurrence of each text wins,
    later arrivals carry their duplicate ordinal and the original's id."""
    from topojson_spark.streaming.ingest import stream_exact_dedup

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: docs 0..4, texts t0..t2 with dup inside the batch
    b1 = spark.createDataFrame(
        [(0, "t0"), (1, "t1"), (2, "t2"), (3, "t0"), (4, "t1")],
        "doc_id long, text string",
    )
    # batch 2 (separate file -> separate trigger): re-sends t0 and adds t3
    b2 = spark.createDataFrame(
        [(5, "t0"), (6, "t3")], "doc_id long, text string"
    )
    b1.coalesce(1).write.parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_exact_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert len(rows) == 7
    firsts = {r["doc_id"] for r in rows.values() if r["is_first"]}
    # one winner among the intra-batch t0 dups (0/3: order inside a batch
    # group is not contractual), the rest are exact
    assert {"1", "2", "6"} <= firsts and len(firsts & {"0", "3"}) == 1
    assert len(firsts) == 4
    by_hash = {}
    for r in rows.values():
        by_hash.setdefault(r["text_hash"], []).append(r)
    for grp in by_hash.values():
        # ordinals are dense 0..k-1 and every row names the same original
        assert sorted(g["n_seen_before"] for g in grp) == list(
            range(len(grp))
        )
        assert len({g["first_doc_id"] for g in grp}) == 1
        first = min(grp, key=lambda g: g["n_seen_before"])
        assert first["is_first"] and first["first_doc_id"] == first["doc_id"]
    # cross-batch: doc 5 duplicates batch-1's t0 (docs 0 and 3), so its
    # ordinal is 2 and it points at whichever of them won the first batch
    assert rows["5"]["n_seen_before"] == 2
    assert rows["5"]["first_doc_id"] in {"0", "3"}
    assert not rows["5"]["is_first"]


def test_stream_windowed_event_counts_watermark(spark, tmp_path):
    """Tumbling event-time windows with watermark: windows emit once the
    watermark passes, and a row older than the bound is dropped."""
    import datetime as dt

    from topojson_spark.streaming.ingest import stream_windowed_event_counts

    src = str(tmp_path / "events_in")
    out = str(tmp_path / "windows")
    ckpt = str(tmp_path / "ckpt")

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(t0 + dt.timedelta(minutes=m), et, float(v))
                for m, et, v in specs]

    schema = "ts timestamp, event_type string, value double"
    # batch 1: two windows' worth of events
    spark.createDataFrame(
        rows((1, "a", 1.0), (2, "a", 2.0), (11, "b", 3.0)), schema
    ).coalesce(1).write.parquet(src)
    # batch 2: advances the watermark far past both windows (ts=120min ->
    # watermark 100min; BOTH late-filtering and state eviction apply it
    # only from the NEXT batch — advancement lags one batch)
    spark.createDataFrame(rows((120, "c", 5.0)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    # batch 3: processed under the 100min watermark — closes and emits
    # windows [0,10) and [10,20)
    spark.createDataFrame(rows((121, "c", 7.0)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    # batch 4: a VERY late row into the closed window [0,10) — must be
    # dropped by the 100/101min watermark, not re-open the window
    spark.createDataFrame(rows((3, "a", 100.0)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_windowed_event_counts(stream, "10 minutes", "20 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["window_start"].minute, r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    # windows [0,10) and [10,20) closed; [120,130) still open (no later
    # watermark to flush it in availableNow mode) -> not emitted
    assert got.get((0, "a")) == (2, 3.0)
    assert got.get((10, "b")) == (1, 3.0)
    # the late (3, "a") row arrived after the watermark passed its window:
    # the closed window's counts must NOT include it (and no duplicate
    # emission of window [0,10) exists)
    assert len([k for k in got if k == (0, "a")]) == 1


def test_stream_sessionize_gap_sessions(spark, tmp_path):
    """session_window sessionization: a user's events within the gap merge
    into one session row; a larger gap starts a new session; sessions emit
    once the watermark passes (append mode)."""
    import datetime as dt

    from topojson_spark.streaming.ingest import stream_sessionize

    src = str(tmp_path / "sess_in")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "sess_ckpt")

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(t0 + dt.timedelta(minutes=m), int(u), float(v))
                for m, u, v in specs]

    schema = "ts timestamp, user_id long, value double"
    # batch 1: user 1 -> events at 0 and 10 min (one session);
    # user 2 -> single event
    spark.createDataFrame(
        rows((0, 1, 1.0), (10, 1, 2.0), (5, 2, 7.0)), schema
    ).coalesce(1).write.parquet(src)
    # batch 2: user 1 again 50 min later (NEW session: 50 - 10 > 30)
    spark.createDataFrame(rows((60, 1, 4.0)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    # batch 3/4: watermark driver far in the future closes everything
    # (watermark advancement lags one batch, hence two driver batches)
    spark.createDataFrame(rows((600, 3, 0.0)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)
    spark.createDataFrame(rows((601, 3, 0.0)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_sessionize(stream, gap="30 minutes", watermark="60 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def mins(ts):
        return ts.hour * 60 + ts.minute

    got = {
        (r["user_id"], mins(r["session_start"])): r
        for r in spark.read.parquet(out).collect()
    }
    # user 1 session A: events at 0 and 10 min merge -> window [0, 40)
    # (session end = last event + gap)
    assert got[(1, 0)]["n_events"] == 2
    assert got[(1, 0)]["sum_value"] == 3.0
    assert mins(got[(1, 0)]["session_end"]) == 40
    # user 1 session B: the 60-min event is 50 min after the last -> its
    # own session [60, 90)
    assert got[(1, 60)]["n_events"] == 1
    assert got[(1, 60)]["sum_value"] == 4.0
    assert mins(got[(1, 60)]["session_end"]) == 90
    # user 2: single-event session [5, 35)
    assert got[(2, 5)]["n_events"] == 1
    assert got[(2, 5)]["sum_value"] == 7.0
    assert mins(got[(2, 5)]["session_end"]) == 35


# -------------------------------------------- kill-and-resume (north rule)
#
# The north rule demands resumability. Batch stages have durable
# checkpoints (plans/pin.py); these tests cover the STATEFUL streaming
# operators: a query is started with a checkpointLocation, KILLED
# (q.stop() interrupts, possibly mid-batch — the in-flight batch is
# uncommitted and must replay), then restarted on the SAME checkpoint and
# drained. Exactly-once means: no row lost, no row duplicated, state
# (dedup ordinals / window aggregates / session merges) identical to a
# single uninterrupted run.


def _kill_then_resume(spark, build, schema, src, out, ckpt):
    """Start `build(stream)` -> parquet sink, kill after the first
    data-carrying progress event (mid-stream when timing allows — the
    assertions never depend on WHERE the kill lands), resume from the
    same checkpoint with availableNow and drain to completion."""
    import time

    def start(trigger_kwargs):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        return (
            build(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(**trigger_kwargs)
            .start()
        )

    q = start({"processingTime": "0 seconds"})
    deadline = time.time() + 90
    while time.time() < deadline:
        if any(p["numInputRows"] > 0 for p in q.recentProgress):
            break
        time.sleep(0.1)
    q.stop()  # the kill: interrupts the run loop, in-flight batch dies
    q.awaitTermination(90)

    q2 = start({"availableNow": True})
    q2.awaitTermination(180)
    return spark.read.parquet(out)


def test_stream_dedup_ledger_kill_and_resume(spark, tmp_path):
    """Stateful exact-dedup ledger survives a kill: after resume, exactly
    one ledger row per input doc, one is_first per hash, and the per-hash
    ordinals are a gap-free 0..n-1 — a replayed batch that double-counted
    state would break the ordinal sequence, a lost batch the row count."""
    from topojson_spark.streaming.ingest import stream_exact_dedup

    src = str(tmp_path / "docs")
    out = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id string, text string"

    # 12 docs in 6 ordered files; 4 distinct texts x 3 repeats each
    for f in range(6):
        rows = [(f"d{f}_{i}", f"text {(f * 2 + i) % 4}") for i in range(2)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    got = _kill_then_resume(
        spark, stream_exact_dedup, schema, src, out, ckpt
    ).collect()

    assert len(got) == 12
    assert len({r["doc_id"] for r in got}) == 12
    by_hash = {}
    for r in got:
        by_hash.setdefault(r["text_hash"], []).append(r)
    assert len(by_hash) == 4
    for rows in by_hash.values():
        assert sorted(r["n_seen_before"] for r in rows) == [0, 1, 2]
        firsts = [r for r in rows if r["is_first"]]
        assert len(firsts) == 1 and firsts[0]["n_seen_before"] == 0
        assert {r["first_doc_id"] for r in rows} == {firsts[0]["doc_id"]}


def test_stream_sessionize_kill_and_resume(spark, tmp_path):
    """session_window state survives a kill: the resumed stream's emitted
    sessions are exactly-once (no duplicates) and identical to the SAME
    operator run as one uninterrupted batch job (session_window works on
    batch frames — the perfect twin for resume semantics)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from topojson_spark.streaming.ingest import stream_sessionize

    src = str(tmp_path / "ev")
    out = str(tmp_path / "sess")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, user_id long, value double"
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(t0 + dt.timedelta(minutes=m), int(u), float(v))
                for m, u, v in specs]

    batches = [
        rows((0, 1, 1.0), (10, 1, 2.0), (5, 2, 7.0)),
        rows((20, 1, 3.0), (32, 2, 1.0)),   # u1 merges; u2 merges (27 < 30)
        rows((60, 3, 5.0)),
        rows((90, 1, 9.0)),                 # u1 second session
        rows((600, 9, 0.0)),                # watermark drivers
        rows((601, 9, 0.0)),
        rows((602, 9, 0.0)),
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    build = lambda s: stream_sessionize(  # noqa: E731
        s, gap="30 minutes", watermark="60 minutes"
    )
    got = _kill_then_resume(spark, build, schema, src, out, ckpt).collect()

    key = lambda r: (  # noqa: E731
        r["user_id"], r["session_start"], r["session_end"],
        r["n_events"], r["sum_value"],
    )
    keys = [key(r) for r in got]
    assert len(keys) == len(set(keys)), "duplicate session emission"

    all_events = [r for b in batches for r in b]
    twin = {
        key(r)
        for r in spark.createDataFrame(all_events, schema)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("sum_value"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events", "sum_value")
        .collect()
    }
    assert set(keys) <= twin, "resumed stream emitted a corrupted session"
    # every real user's closed sessions must have been emitted: u1 [0,50)
    # merged across the kill point + [90,120) single, u2 one merged
    # two-event session (5 -> 32, gap 27 < 30), u3 one single
    emitted_users = sorted(
        (k[0], k[3]) for k in keys if k[0] in (1, 2, 3)
    )
    assert emitted_users == [(1, 1), (1, 3), (2, 2), (3, 1)]


def test_stream_event_windows_kill_and_resume(spark, tmp_path):
    """Watermarked tumbling-window aggregation survives a kill: resumed
    output has no duplicate windows and equals the uninterrupted batch
    twin for every closed window."""
    import datetime as dt

    from pyspark.sql import functions as F

    from topojson_spark.streaming.ingest import stream_windowed_event_counts

    src = str(tmp_path / "ev")
    out = str(tmp_path / "win")
    ckpt = str(tmp_path / "ckpt")
    schema = "ts timestamp, event_type string, value double"
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [(t0 + dt.timedelta(minutes=m), et, float(v))
                for m, et, v in specs]

    batches = [
        rows((1, "a", 1.0), (2, "a", 2.0)),
        rows((11, "b", 3.0), (4, "a", 4.0)),   # late-but-in-bound add
        rows((25, "b", 1.0)),
        rows((600, "z", 0.0)),                 # watermark drivers
        rows((601, "z", 0.0)),
        rows((602, "z", 0.0)),
    ]
    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    build = lambda s: stream_windowed_event_counts(  # noqa: E731
        s, window="10 minutes", watermark="20 minutes"
    )
    got = _kill_then_resume(spark, build, schema, src, out, ckpt).collect()

    key = lambda r: (  # noqa: E731
        r["window_start"], r["event_type"], r["n"], r["sum_value"]
    )
    keys = [key(r) for r in got]
    assert len(keys) == len(set(keys)), "duplicate window emission"

    all_events = [r for b in batches for r in b]
    twin = {
        key(r)
        for r in spark.createDataFrame(all_events, schema)
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("window_start"), "event_type",
                "n", "sum_value")
        .collect()
    }
    assert set(keys) <= twin
    # the three real closed windows arrived intact across the kill
    closed = {(k[0].minute, k[1]): (k[2], k[3]) for k in keys
              if k[1] in ("a", "b")}
    assert closed == {(0, "a"): (3, 7.0), (10, "b"): (1, 3.0),
                      (20, "b"): (1, 1.0)}


def test_stream_text_curation_matches_batch(spark, tmp_path):
    """The stateless quality gate must be row-for-row the batch result on
    the same input — no state, no watermark, any trigger."""
    from topojson_spark.streaming.ingest import stream_text_curation

    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "no", "a"),                        # too short
        (3, "??!!..,,;;::!!??..,,;;!!", "b"),  # punctuation soup
        (4, "a clean sentence with the usual stopwords in it", "b"),
        (5, "", "c"),
    ]
    schema = "doc_id long, text string, source string"
    src = str(tmp_path / "txt_in")
    out = str(tmp_path / "txt_out")
    ckpt = str(tmp_path / "txt_ckpt")
    spark.createDataFrame(rows, schema).repartition(3).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        stream_text_curation(stream, min_tokens=3, max_punct_ratio=0.3)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = stream_text_curation(
        spark.createDataFrame(rows, schema),
        min_tokens=3,
        max_punct_ratio=0.3,
    )
    assert not batch.isStreaming  # same code path runs both modes
    got = {
        (r["doc_id"], r["n_tokens"], r["stop_hits"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["doc_id"], r["n_tokens"], r["stop_hits"]) for r in batch.collect()
    }
    assert got == want and {t[0] for t in got} == {1, 4}
