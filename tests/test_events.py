"""Sessionization tests (gap-based sessions over the events shape)."""

import datetime as dt

import pytest

from topojson_spark.functions.events import sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, minute // 60, minute % 60, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, _ts(0), 1, 1.0),
        (2, _ts(10), 1, 2.0),
        (3, _ts(29), 1, 4.0),
        (4, _ts(74), 1, 8.0),   # 45 min after event 3 -> new session
        (5, _ts(80), 1, 16.0),
        # user 2: exactly-30-min gap does NOT split (> means strictly over)
        (6, _ts(0), 2, 1.0),
        (7, _ts(30), 2, 1.0),
        # user 2 again: 30 min + 1 s DOES split
        (8, _ts(60, 1), 2, 1.0),
        # user 3: single event
        (9, _ts(5), 3, 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, value double"
    )


def test_sessionize_splits_on_gap(events):
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in sessionize(events, gap_minutes=30).collect()
    }
    assert out[(1, 1)]["n_events"] == 3
    assert out[(1, 1)]["sum_value"] == pytest.approx(7.0)
    assert out[(1, 1)]["duration_s"] == pytest.approx(29 * 60)
    assert out[(1, 2)]["n_events"] == 2
    assert out[(1, 2)]["duration_s"] == pytest.approx(6 * 60)
    # boundary semantics: gap == 30 min stays, 30 min + 1 s splits
    assert out[(2, 1)]["n_events"] == 2
    assert out[(2, 2)]["n_events"] == 1
    assert out[(3, 1)]["n_events"] == 1
    assert len(out) == 5


def test_sessionize_single_exchange(events):
    """The lag/cumsum windows and the session aggregate reuse ONE
    exchange on user_id — no second shuffle in the plan."""
    plan = sessionize(events)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------- asof join


@pytest.fixture(scope="module")
def asof_tables(spark):
    from topojson_spark.functions.events import asof_join  # noqa: F401

    left = spark.createDataFrame(
        [
            (10, _ts(5), 1, 1.5),    # after err@0 only -> matches 100
            (11, _ts(20), 1, 2.5),   # after the err@15 pair
            (12, _ts(15), 1, 3.5),   # EXACTLY at the err@15 pair
            (13, _ts(1), 2, 4.5),    # user 2 has no errors -> NULLs
            (14, _ts(0), 3, 5.5),    # before user 3's only error -> NULLs
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(0), 1, 9.0),
            (101, _ts(15), 1, 8.0),
            (102, _ts(15), 1, 7.0),  # same ts as 101: greater id wins
            (103, _ts(10), 3, 6.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    return left, right


def test_asof_join_basic(asof_tables):
    from topojson_spark.functions.events import asof_join

    left, right = asof_tables
    out = {
        r["event_id"]: r
        for r in asof_join(left, right, right_cols=("value",)).collect()
    }
    assert len(out) == 5
    assert out[10]["asof_value"] == 9.0
    # equal right timestamps: greatest tiebreak (event_id 102) wins
    assert out[11]["asof_value"] == 7.0
    # left ts exactly equal to a right ts matches it (<= semantics)
    assert out[12]["asof_value"] == 7.0
    # no error for user 2 / error strictly after: NULL
    assert out[13]["asof_value"] is None and out[13]["asof_us"] is None
    assert out[14]["asof_value"] is None


def test_asof_join_preserves_left_columns(asof_tables):
    from topojson_spark.functions.events import asof_join

    left, right = asof_tables
    out = asof_join(left, right, right_cols=("value",))
    assert set(out.columns) == {
        "user_id", "event_id", "ts", "value", "asof_us", "asof_value",
    }
    assert out.count() == left.count()  # no row multiplication


def test_asof_join_single_exchange(asof_tables):
    """The whole as-of join must cost ONE shuffle (on the key)."""
    from topojson_spark.functions.events import asof_join

    left, right = asof_tables
    plan = (
        asof_join(left, right, right_cols=("value",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_asof_join_null_payload_stays_null(spark):
    """A MATCHED right row with a genuinely NULL payload must yield a NULL
    asof_value (not an older row's value), and asof_us must come from that
    same matched row — the struct-carry contract."""
    from topojson_spark.functions.events import asof_join

    left = spark.createDataFrame(
        [(10, _ts(20), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    right = spark.createDataFrame(
        [(100, _ts(0), 1, 9.0), (101, _ts(15), 1, None)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    row = asof_join(left, right, right_cols=("value",)).collect()[0]
    # matched row is event 101 (ts 15): its NULL payload stays NULL, and
    # asof_us is 101's timestamp, not 100's
    assert row["asof_value"] is None
    epoch_15min = int(
        (_ts(15) - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    )
    assert row["asof_us"] == epoch_15min


def test_asof_join_null_right_ts_never_matches(spark):
    """A right row with NULL ts cannot satisfy right.ts <= left.ts; it must
    not be carried as a spurious oldest match."""
    from topojson_spark.functions.events import asof_join

    left = spark.createDataFrame(
        [(10, _ts(5), 1, 1.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    right = spark.createDataFrame(
        [(100, None, 1, 9.0)],
        "event_id long, ts timestamp, user_id long, value double",
    )
    row = asof_join(left, right, right_cols=("value",)).collect()[0]
    assert row["asof_value"] is None and row["asof_us"] is None


def test_asof_join_bucketed_matches_plain(spark):
    """The skew escape hatch must be bit-equivalent to asof_join on a
    corpus that exercises every seam: matches carried within a bucket,
    across one bucket, across several empty buckets, NULL payloads,
    equal-timestamp ties, and unmatched leads."""
    import random

    from topojson_spark.functions.events import asof_join, asof_join_bucketed

    rnd = random.Random(11)
    lrows, rrows = [], []
    eid = 0
    for u in (1, 2, 3):
        for _ in range(60):
            eid += 1
            lrows.append((eid, _ts(rnd.randrange(0, 600)), u, float(eid)))
        for _ in range(25):
            eid += 1
            val = None if rnd.random() < 0.3 else float(eid)
            rrows.append((eid, _ts(rnd.randrange(0, 600)), u, val))
    # tie pair at one timestamp + a right row far before everything
    rrows += [(9001, _ts(300), 1, 77.0), (9002, _ts(300), 1, 88.0)]
    schema = "event_id long, ts timestamp, user_id long, value double"
    left = spark.createDataFrame(lrows, schema)
    right = spark.createDataFrame(rrows, schema)

    def key(r):
        return (r["user_id"], r["event_id"], r["asof_us"], r["asof_value"])

    want = sorted(map(key, asof_join(left, right).collect()))
    for bucket in (7, 60, 1440):
        got = sorted(
            map(
                key,
                asof_join_bucketed(
                    left, right, bucket_minutes=bucket
                ).collect(),
            )
        )
        assert got == want, f"bucket_minutes={bucket} diverged"


def test_asof_join_bucketed_null_keys_match_plain(spark):
    """asof_join's window partitionBy groups NULL keys into one partition,
    so the hatch's spine/carry joins must be NULL-SAFE: a cross-bucket
    match for a NULL-key left row must survive (regression: an equality
    join dropped it)."""
    from pyspark.sql import functions as F

    from topojson_spark.functions.events import asof_join, asof_join_bucketed

    schema = "event_id long, ts timestamp, user_id long, value double"
    left = spark.createDataFrame(
        [(10, _ts(90), None, 1.0), (11, _ts(95), 7, 2.0)], schema
    )
    right = spark.createDataFrame(
        [(100, _ts(5), None, 9.0), (101, _ts(6), 7, 8.0)], schema
    )

    def key(r):
        return (r["event_id"], r["user_id"], r["asof_us"], r["asof_value"])

    want = sorted(map(key, asof_join(left, right).collect()),
                  key=lambda t: t[0])
    # bucket_minutes=60: ts(5) and ts(90) land in different buckets, so
    # the NULL-key match must come through the cross-bucket carry
    got = sorted(
        map(key, asof_join_bucketed(left, right, bucket_minutes=60).collect()),
        key=lambda t: t[0],
    )
    assert got == want
    assert any(
        r["user_id"] is None and r["asof_value"] == 9.0
        for r in asof_join_bucketed(left, right, bucket_minutes=60).collect()
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        asof_join_bucketed(left, right, bucket_minutes=0)


def test_asof_hot_key_audit_null_key_counts_combined(spark):
    """A hot NULL key is one window partition in asof_join, so the audit
    must combine its left+right counts on ONE row (regression: an
    equality outer join split them and the key slipped the threshold)."""
    from topojson_spark.functions.events import asof_hot_key_audit

    schema = "event_id long, ts timestamp, user_id long, value double"
    left = spark.createDataFrame(
        [(i, _ts(i), None, 1.0) for i in range(4)], schema
    )
    right = spark.createDataFrame(
        [(100 + i, _ts(i), None, 2.0) for i in range(4)], schema
    )
    hot = asof_hot_key_audit(left, right, threshold=6).collect()
    assert [(r["user_id"], r["n_left"], r["n_right"]) for r in hot] == [
        (None, 4, 4)
    ]


def test_asof_join_bucketed_windows_partition_on_bucket(spark, asof_tables):
    """The whole point of the hatch: no window in the plan partitions on
    the bare key — every row-level window key includes the time bucket, so
    a hot key subdivides."""
    from topojson_spark.functions.events import asof_join_bucketed

    left, right = asof_tables
    plan = (
        asof_join_bucketed(left, right)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    # the row-level union window (the one producing _match) must list
    # _bucket among its partition keys; the only key-partitioned window
    # is the bucket-spine carry (_carry, O(buckets) rows)
    row_windows = re.findall(
        r"Window \[last\([^\]]*AS _match[^\]]*\], \[([^\]]*)\]", plan
    )
    assert row_windows and all("_bucket" in w for w in row_windows), plan
    carry_windows = re.findall(
        r"Window \[last\([^\]]*AS _carry[^\]]*\], \[([^\]]*)\]", plan
    )
    assert len(carry_windows) == 1 and "_bucket" not in carry_windows[0]


def test_asof_hot_key_audit(spark, asof_tables):
    from topojson_spark.functions.events import asof_hot_key_audit

    left, right = asof_tables
    hot = asof_hot_key_audit(left, right, threshold=3).collect()
    # user 1: 3 left + 3 right = 6 > 3; users 2/3 have 2 rows each
    assert [(r["user_id"], r["n_left"], r["n_right"]) for r in hot] == [
        (1, 3, 3)
    ]
    assert asof_hot_key_audit(left, right, threshold=100).count() == 0


# --------------------------------------------------------------- term stats


def test_term_stats(spark):
    from topojson_spark.functions.text import term_stats

    docs = spark.createDataFrame(
        [
            (1, "the cat the cat the"),
            (2, "the dog"),
            (3, "cat! CAT?"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in term_stats(docs).collect()}
    assert out["the"]["df"] == 2 and out["the"]["tf"] == 4
    assert out["cat"]["df"] == 2 and out["cat"]["tf"] == 4  # normalized
    assert out["dog"]["df"] == 1 and out["dog"]["tf"] == 1
    filtered = {r["term"] for r in term_stats(docs, min_df=2).collect()}
    assert filtered == {"the", "cat"}


def test_term_stats_ngrams(spark):
    from topojson_spark.functions.text import term_stats
    import pytest as _pt

    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),       # bigrams: "the cat", "cat sat"
            (2, "the cat"),           # bigram:  "the cat"
            (3, "cat"),               # 1 token -> NO bigrams (guard)
            (4, ""),                  # 0 tokens -> no rows at all
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in term_stats(docs, n=2).collect()}
    assert out["the cat"]["df"] == 2 and out["the cat"]["tf"] == 2
    assert out["cat sat"]["df"] == 1 and out["cat sat"]["tf"] == 1
    assert set(out) == {"the cat", "cat sat"}
    # min_df composes with n
    top = {r["term"] for r in term_stats(docs, min_df=2, n=2).collect()}
    assert top == {"the cat"}
    with _pt.raises(ValueError):
        term_stats(docs, n=0)


def test_dup_span_fraction(spark):
    from topojson_spark.functions.text import dup_span_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),    # bigrams: ab bc cd de
            (2, "a b c x y"),    # shares ab, bc with doc 1
            (3, "a b a b"),      # ab x2 (shared), ba (unique to doc 3)
            (4, "zz"),           # 1 token -> 0 bigrams
            (5, ""),             # empty -> 0 bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dup_span_fraction(docs, n=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert out[1]["n_grams"] == 4 and out[1]["dup_grams"] == 2
    assert out[1]["dup_frac"] == pytest.approx(0.5)
    assert out[2]["n_grams"] == 4 and out[2]["dup_grams"] == 2
    # doc 3: "a b" occurs twice (both count as duplicated OCCURRENCES),
    # "b a" appears only in doc 3 -> not cross-doc duplicated
    assert out[3]["n_grams"] == 3 and out[3]["dup_grams"] == 2
    assert out[3]["dup_frac"] == pytest.approx(2 / 3)
    # degenerate docs keep a row with an exact-zero fraction
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] == 0.0
    assert out[5]["n_grams"] == 0 and out[5]["dup_grams"] == 0
    with pytest.raises(ValueError):
        dup_span_fraction(docs, n=0)


def test_dup_span_extents_hand_computed(spark):
    from topojson_spark.functions.text import dup_span_extents

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),  # ab(0) bc(1) cd(2) de(3) ef(4)
            (2, "a b c q e f"),  # shares ab, bc, ef with doc 1
            (3, "x y z"),        # nothing shared -> no rows
            (4, "a b"),          # single shared bigram
        ],
        "doc_id long, text string",
    )
    out = dup_span_extents(docs, n=2).collect()
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_grams"])
        for r in out
    }
    # docs 1 and 2: positions {0, 1} fuse (gap 1 <= n), position 4 is its
    # own island (gap 3 > n); doc 4: one single-gram span
    assert got == {
        (1, 0, 3, 2), (1, 4, 6, 1),
        (2, 0, 3, 2), (2, 4, 6, 1),
        (4, 0, 2, 1),
    }
    short = dup_span_extents(docs, n=2, min_len=3).collect()
    assert {(r["doc_id"], r["span_start"]) for r in short} == {(1, 0), (2, 0)}
    with pytest.raises(ValueError):
        dup_span_extents(docs, n=0)
