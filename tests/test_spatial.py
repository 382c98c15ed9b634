"""Spatial layer tests (north rule operators): cells, PIP, kNN, tiles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from topojson_spark.spatial import cells as C
from topojson_spark.spatial.knn import knn_brute_force, knn_join
from topojson_spark.spatial.pip import point_in_polygon_join
from topojson_spark.spatial.tiles import (
    assign_arcs_to_tiles,
    raster_to_cells,
    rasterize_points,
)

BBOX = (0.0, 0.0, 8.0, 8.0)


def test_morton_roundtrip():
    ix = np.array([0, 1, 5, 1000, (1 << 20) - 1])
    iy = np.array([0, 3, 5, 999, 12345])
    cid = C.encode(ix, iy, 20)
    lvl, rx, ry = C.decode(cid)
    assert (lvl == 20).all()
    assert (rx == ix).all() and (ry == iy).all()


def test_cell_col_matches_numpy(spark):
    pts = [(float(i) * 0.7 + 0.1, float(i) * 0.9 + 0.2) for i in range(10)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = [
        r["c"]
        for r in df.select(
            C.cell_col(F.col("x"), F.col("y"), BBOX, 6).alias("c")
        ).collect()
    ]
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    want = C.cell_id(xs, ys, BBOX, 6).tolist()
    assert got == want


def test_ring_cells():
    r0 = C.ring_cells(4, 4, 6, 0)
    assert len(r0) == 1
    r1 = C.ring_cells(4, 4, 6, 1)
    assert len(r1) == 8
    r2 = C.ring_cells(0, 0, 6, 1)  # corner clipped
    assert len(r2) == 3


def _lattice_polygons(spark, w, h):
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


def test_pip_lattice_ground_truth(spark):
    polys = _lattice_polygons(spark, 4, 4)
    pts = [(i, 0.5 + (i % 4), 0.5 + (i // 4)) for i in range(16)]
    points = spark.createDataFrame(pts, "point_id long, x double, y double")
    got = {
        (r["point_id"], r["poly_id"])
        for r in point_in_polygon_join(points, polys, (0, 0, 4, 4), level=4).collect()
    }
    want = {(i, (i % 4) + 4 * (i // 4)) for i in range(16)}
    assert got == want


def test_pip_hole(spark):
    outer = [[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0], [0.0, 0.0]]
    hole = [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]]
    polys = spark.createDataFrame(
        [(0, 0, outer), (0, 1, hole)],
        "poly_id long, ring_seq int, coords array<array<double>>",
    )
    points = spark.createDataFrame(
        [(0, 0.5, 0.5), (1, 2.0, 2.0), (2, 3.5, 0.5)],
        "point_id long, x double, y double",
    )
    got = sorted(
        r["point_id"]
        for r in point_in_polygon_join(points, polys, (0, 0, 4, 4), 3).collect()
    )
    assert got == [0, 2]  # the hole-interior point is excluded


def test_pip_single_hot_polygon_splits_refine(spark):
    """One polygon holding every candidate point: the refine must run in
    more than one task (cogroup on (poly_id, point-cell bucket)), not one
    straggler group per polygon — and stay exact."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    pts = [
        (int(i), float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(0, 4, (10_000, 2)))
    ]
    points = spark.createDataFrame(pts, "point_id long, x double, y double")
    # square [1,3]x[1,3] -> exactly the points with 1<=x<=3, 1<=y<=3
    ring = [[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0], [1.0, 1.0]]
    polys = spark.createDataFrame(
        [(7, 0, ring)], "poly_id long, ring_seq int, coords array<array<double>>"
    )
    res = point_in_polygon_join(
        points, polys, (0, 0, 4, 4), level=5, rows_per_bucket=500
    )
    want = sorted(
        i for i, x, y in pts if 1.0 <= x <= 3.0 and 1.0 <= y <= 3.0
    )
    assert sorted(r["point_id"] for r in res.collect()) == want
    # AQE's byte-based coalescing legitimately merges these tiny test
    # partitions; disable it to observe the task split the bucketing buys
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def n_tasks(rpb):
            out = point_in_polygon_join(
                points, polys, (0, 0, 4, 4), level=5, rows_per_bucket=rpb
            )
            return (
                out.select(F.spark_partition_id().alias("pid"))
                .distinct()
                .count()
            )

        hot = n_tasks(200)   # ~2.8k candidates -> ~15 buckets
        cold = n_tasks(50_000)  # same candidates fit one bucket
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # refine parallelism scales with candidate volume: the same polygon
    # saturates every shuffle partition (test session runs 4) when
    # candidates >> rows_per_bucket and collapses to one group when they fit
    assert hot == 4
    assert cold == 1


def test_knn_matches_brute_force(spark):
    rng = np.random.default_rng(11)
    pts = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(0, 8, (200, 2)))]
    qs = [(int(i), float(x), float(y)) for i, (x, y) in enumerate(rng.uniform(1, 7, (10, 2)))]
    points = spark.createDataFrame(pts, "point_id long, x double, y double")
    queries = spark.createDataFrame(qs, "qid long, x double, y double")
    got = {
        (r["qid"], r["rank"]): r["point_id"]
        for r in knn_join(queries, points, 5, BBOX, level=3, max_rings=2).collect()
    }
    want = {
        (r["qid"], r["rank"]): r["point_id"]
        for r in knn_brute_force(queries, points, 5).collect()
    }
    assert got == want


def test_knn_boundary_cluster_exactness(spark):
    """A true neighbor just OUTSIDE the fixed search window, with the k-th
    in-window candidate far away (near the window corner): the naive
    fixed-window cut returns the wrong neighbor; the k-th-distance guard
    must detect the unproven bound and fall back to the exact pass."""
    bbox = (0.0, 0.0, 1.0, 1.0)  # level=3 -> cell 0.125, max_rings=1 -> R=0.125
    points = spark.createDataFrame(
        [
            (0, 0.07, 0.06),  # dist 0.01, in window
            (1, 0.24, 0.24),  # dist ~0.2546, in window (corner)
            (2, 0.26, 0.06),  # dist 0.20, OUTSIDE the 1-ring window
        ],
        "point_id long, x double, y double",
    )
    queries = spark.createDataFrame([(0, 0.06, 0.06)], "qid long, x double, y double")
    got = {
        r["rank"]: r["point_id"]
        for r in knn_join(queries, points, 2, bbox, level=3, max_rings=1).collect()
    }
    assert got == {1: 0, 2: 2}  # rank-2 must be the out-of-window point


def test_knn_sparse_returns_all_points(spark):
    """Dataset smaller than k: every point must come back (the fixed-window
    pass alone silently returns <k rows for sparse regions)."""
    bbox = (0.0, 0.0, 1.0, 1.0)
    points = spark.createDataFrame(
        [(0, 0.05, 0.05), (1, 0.9, 0.9)], "point_id long, x double, y double"
    )
    queries = spark.createDataFrame([(0, 0.06, 0.06)], "qid long, x double, y double")
    from topojson_spark.plans.metrics import StageMetrics

    metrics = StageMetrics()
    rows = knn_join(
        queries, points, 5, bbox, level=3, max_rings=1, metrics=metrics
    ).collect()
    assert sorted(r["point_id"] for r in rows) == [0, 1]
    assert sorted(r["rank"] for r in rows) == [1, 2]
    # degradation counters: rings doubled 1->2->4, then the residue (this
    # one unsatisfiable query — dataset < k) went through brute force
    m = metrics.get("knn_join")
    assert m == {"n_escalations": 2, "n_fallback": 1, "final_rings": 4}


def test_tiles_assignment(spark):
    arcs = spark.createDataFrame(
        [
            (0, [0.5, 0.5, 1.5, 0.5]),  # crosses tiles (0,0) and (1,0) @z3
            (1, [6.5, 6.5, 6.6, 6.6]),
        ],
        "arc_id long, coords array<double>",  # flat interleaved
    )
    tiles = assign_arcs_to_tiles(arcs, BBOX, zoom=3)
    got = {
        (r["arc_id"], r["tile_x"], r["tile_y"]) for r in tiles.collect()
    }
    assert (0, 0, 0) in got and (0, 1, 0) in got
    assert (1, 6, 6) in got
    assert len([g for g in got if g[0] == 0]) == 2


def test_rasterize_and_back(spark):
    pts = [(float(x) + 0.5, float(y) + 0.5, 1.0) for x in range(8) for y in range(8)]
    points = spark.createDataFrame(pts, "x double, y double, v double")
    raster = rasterize_points(points, BBOX, zoom=3, value_col="v")
    rows = raster.collect()
    assert len(rows) == 64
    assert all(r["n"] == 1 for r in rows)
    cells_back = raster_to_cells(raster, BBOX, 3, F.col("n") >= 1)
    assert cells_back.count() == 64
    one = cells_back.limit(1).collect()[0]["ring"]
    assert len(one) == 5


def test_tile_pyramid_invariants(spark):
    from topojson_spark.spatial.tiles import tile_pyramid

    rng = [(float(i % 8) + 0.3, float((i * 3) % 8) + 0.7, float(i % 5))
           for i in range(200)]
    points = spark.createDataFrame(rng, "x double, y double, v double")
    pyr = tile_pyramid(points, BBOX, max_zoom=3, value_col="v").collect()
    by_zoom = {}
    for r in pyr:
        by_zoom.setdefault(r["zoom"], []).append(r)
    assert set(by_zoom) == {0, 1, 2, 3}
    # every level re-counts every point; zoom 0 is the single root tile
    for z, rows in by_zoom.items():
        assert sum(r["n"] for r in rows) == 200
        assert sum(r["sum_value"] for r in rows) == sum(p[2] for p in rng)
    assert len(by_zoom[0]) == 1 and by_zoom[0][0]["tile_x"] == 0
    # each level equals a direct rasterization at that zoom (floor/shift
    # commute), and parents exactly fold their four children
    for z in range(4):
        direct = {
            (r["tile_x"], r["tile_y"]): r["n"]
            for r in rasterize_points(points, BBOX, zoom=z).collect()
        }
        assert {
            (r["tile_x"], r["tile_y"]): r["n"] for r in by_zoom[z]
        } == direct
    kids = {(r["tile_x"], r["tile_y"]): r["n"] for r in by_zoom[2]}
    for (px, py), n in {
        (r["tile_x"], r["tile_y"]): r["n"] for r in by_zoom[1]
    }.items():
        assert n == sum(
            kids.get((px * 2 + dx, py * 2 + dy), 0)
            for dx in (0, 1) for dy in (0, 1)
        )


def test_clip_arcs_to_tiles(spark):
    from topojson_spark.spatial.tiles import clip_arcs_to_tiles

    # arc 0: fully inside tile (0,0) at zoom 3 -> passes through unchanged;
    # arc 1: diagonal crossing tiles; arc 2: outside-to-outside crossing
    arcs = spark.createDataFrame(
        [
            (0, [0.2, 0.2, 0.8, 0.2, 0.8, 0.8]),
            (1, [0.5, 0.5, 1.5, 1.5]),
            (2, [-1.0, 0.5, 9.0, 0.5]),
        ],
        "arc_id long, coords array<double>",
    )
    out = clip_arcs_to_tiles(arcs, BBOX, zoom=3).collect()
    by = {}
    for r in out:
        by.setdefault(r["arc_id"], []).append(r)

    # identity for the fully-inside arc
    a0 = by[0]
    assert len(a0) == 1 and a0[0]["coords"] == [0.2, 0.2, 0.8, 0.2, 0.8, 0.8]

    # the diagonal splits at the exact tile corner (1,1); both tiles carry
    # the identical crossing coordinate
    a1 = {(r["tile_x"], r["tile_y"]): r["coords"] for r in by[1]}
    assert a1[(0, 0)] == [0.5, 0.5, 1.0, 1.0]
    assert a1[(1, 1)] == [1.0, 1.0, 1.5, 1.5]

    # the horizontal line spans all 8 tiles in row 0; total clipped length
    # equals the in-bbox portion (8.0), every piece stays in its tile
    a2 = sorted(by[2], key=lambda r: r["tile_x"])
    assert [r["tile_x"] for r in a2] == list(range(8))
    tot = 0.0
    for r in a2:
        c = r["coords"]
        assert c[1] == 0.5 and c[3] == 0.5
        assert r["tile_x"] * 1.0 <= c[0] and c[2] <= (r["tile_x"] + 1) * 1.0
        tot += c[2] - c[0]
    assert tot == pytest.approx(8.0)


def test_batched_clip_kernel_matches_scalar_bitwise():
    """The batched Liang-Barsky kernel (one numpy pass over concatenated
    pair buffers — the r4 replacement for the per-(arc,tile) itertuples
    loop) must reproduce the scalar kernel PIECE-FOR-PIECE, BIT-FOR-BIT
    on randomized polylines: same piece count/order, identical float64
    payloads (np.array_equal, no tolerance)."""
    import random

    import numpy as np

    from topojson_spark.functions.kernels import (
        clip_polyline_to_rect,
        clip_polylines_to_rects_batch,
    )

    rng = random.Random(1234)
    polylines, rects = [], []
    for i in range(300):
        n = rng.choice([0, 1, 2, 3, 5, 9, 17])
        style = rng.random()
        pts = []
        for _ in range(n):
            if style < 0.3:
                # snapped to a coarse grid: exercises on-boundary points,
                # zero-length segments and axis-parallel runs
                pts.append((rng.randint(-2, 6) * 0.5, rng.randint(-2, 6) * 0.5))
            else:
                pts.append((rng.uniform(-2, 4), rng.uniform(-2, 4)))
        if n >= 2 and rng.random() < 0.3:
            pts[rng.randrange(1, n)] = pts[rng.randrange(n)]  # dup vertex
        polylines.append(np.asarray(pts, np.float64).reshape(-1, 2))
        x0, y0 = rng.uniform(-1, 2), rng.uniform(-1, 2)
        rects.append((x0, y0, x0 + rng.uniform(0.1, 2), y0 + rng.uniform(0.1, 2)))
    # a few degenerate rects aligned exactly on grid lines
    polylines.append(np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]))
    rects.append((0.0, 0.0, 1.0, 1.0))
    polylines.append(np.array([[0.5, -1.0], [0.5, 2.0]]))
    rects.append((0.0, 0.0, 1.0, 1.0))

    lens = np.array([len(p) for p in polylines], np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens)))
    flat = (
        np.concatenate([p for p in polylines if len(p)])
        if offsets[-1] else np.empty((0, 2))
    )
    pair, seq, p_off, out = clip_polylines_to_rects_batch(
        flat, offsets, np.asarray(rects, np.float64)
    )
    got = {}
    for j in range(len(pair)):
        got.setdefault(int(pair[j]), []).append(
            (int(seq[j]), out[p_off[j]: p_off[j + 1]])
        )
    n_scalar_pieces = 0
    for i, (poly, rect) in enumerate(zip(polylines, rects)):
        expect = clip_polyline_to_rect(poly, *rect)
        n_scalar_pieces += len(expect)
        have = got.get(i, [])
        assert len(have) == len(expect), f"pair {i}: piece count"
        for (s, piece), exp in zip(have, expect):
            assert np.array_equal(piece, exp), f"pair {i} piece {s}"
        assert [s for s, _ in have] == list(range(len(expect)))
    assert n_scalar_pieces > 100  # the case mix actually exercised clipping


def test_zonal_stats_hand_computed(spark):
    from topojson_spark.spatial.pip import zonal_stats

    # unit-square polygons at (0,0) and (1,0); three points in the first,
    # one in the second, one outside everything
    polys = spark.createDataFrame(
        [
            (0, 0,
             [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]),
            (1, 0,
             [[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 0.0]]),
        ],
        "poly_id long, ring_seq int, coords array<array<double>>",
    )
    pts = spark.createDataFrame(
        [
            (10, 0.2, 0.2, 4),
            (11, 0.8, 0.5, 10),
            (12, 0.5, 0.9, 1),
            (13, 1.5, 0.5, 7),
            (14, 5.0, 5.0, 100),
        ],
        "point_id long, x double, y double, value long",
    )
    out = {
        r["poly_id"]: r
        for r in zonal_stats(
            pts, polys, (0.0, 0.0, 8.0, 8.0), level=3
        ).collect()
    }
    assert set(out) == {0, 1}
    a = out[0]
    assert (a["n_points"], a["sum_value"], a["min_value"], a["max_value"]) \
        == (3, 15, 1, 10)
    assert a["mean_value"] == 5.0
    assert out[1]["n_points"] == 1 and out[1]["mean_value"] == 7.0
