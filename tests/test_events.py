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
