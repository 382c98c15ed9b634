"""Adversarial skew corpus for the junction engines (VERDICT r4 #3).

The mesh2d failure mode at scale: one grid cell / one collinear corridor
shared by *many* lines, so a single cell group holds k lines and the pair
set is O(k^2). The cellgrouped engine must (a) survive that cell at
bounded memory — blocked triangular enumeration, never O(k^2) scratch
(join.py _PAIR_BLOCK) — and (b) produce exactly the same junction set as
the independent pairwise engine and as its own fast (un-blocked) path.

Reference behavior family: /root/reference/tests/test_join.py:475-527
(self-intersection / shared-segment density), here at ~100x density.
"""

import time

import pytest

from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)

N_LINES = 120
SPAN = 40  # vertices every 1.0 -> 40 segments per line


def _corridor_data():
    """N_LINES collinear, vertex-aligned, mutually overlapping lines along
    y=0: line i runs x = i .. i+SPAN. Every pair within SPAN of each other
    shares a multi-segment chain, all inside a handful of grid cells."""
    return {
        f"l{i}": {
            "type": "LineString",
            "coordinates": [[float(x), 0.0] for x in range(i, i + SPAN + 1)],
        }
        for i in range(N_LINES)
    }


@pytest.fixture(scope="module")
def corridor_junctions_fast(spark):
    """Expected junction set: the cellgrouped engine's un-blocked (triu)
    path on the corridor corpus."""
    t = Topology(
        _corridor_data(), spark=spark, junction_engine="cellgrouped", **STAGE
    )
    pts = sorted(map(tuple, t.junction_points()))
    # sanity: the corpus is genuinely junction-dense (every interior
    # overlap boundary is a chain endpoint)
    assert len(pts) > 100
    return pts


def test_hot_cell_blocked_enumeration_matches_fast_path(
    spark, monkeypatch, corridor_junctions_fast
):
    """Force the blocked path (pair budget far below the ~7k pairs per
    cell) and require the identical junction set, within a wall-time
    canary — proving the O(_PAIR_BLOCK)-memory path is semantics- and
    order-preserving, not just non-crashing."""
    monkeypatch.setenv("SPARK_GRAFT_PAIR_BLOCK", "64")
    t0 = time.monotonic()
    t = Topology(
        _corridor_data(), spark=spark, junction_engine="cellgrouped", **STAGE
    )
    pts = sorted(map(tuple, t.junction_points()))
    elapsed = time.monotonic() - t0
    assert pts == corridor_junctions_fast
    # generous canary: the blocked sweep of ~7k pairs/cell must stay far
    # from quadratic-memory thrash territory
    assert elapsed < 300, f"hot-cell blocked sweep took {elapsed:.0f}s"


def test_hot_cell_pairwise_engine_agrees(spark, corridor_junctions_fast):
    """Independent engine cross-check on the same skew corpus."""
    t = Topology(
        _corridor_data(), spark=spark, junction_engine="pairwise", **STAGE
    )
    assert sorted(map(tuple, t.junction_points())) == corridor_junctions_fast
