"""Junction parity, part 3: the remainder of the reference's
tests/test_join.py corpus (both option families use path-connected
junctions; the reference's `Join` defaults to shared_coords=False,
utils.py:24, so the `shared_paths_*` twins at test_join.py:625-1040 pin
the same semantics as the default-family cases at test_join.py:9-620).

1:1 mapping to reference cases (test_join.py line numbers in comments).

Skip-list (sandbox-impossible — fixtures need GDAL/gpkg):
- test_join_shared_junctions_in_shared_paths        (:108)
- test_join_shared_segment_partly_start_partly_end  (:126)
- test_join_non_noded_intersection                  (:615)
- test_join_shared_paths_non_noded_intersection     (:1036)
Already ported elsewhere: tests/test_join_parity.py (19 cases),
tests/test_join_parity2.py (point/bbox/ring/invalid), the linemerge
multilinestring pair (tests/test_stage_parity.py).
"""

import pytest

from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)


def junctions(spark, data, **kw):
    t = Topology(data, spark=spark, **{**STAGE, **kw})
    return set(t.junction_points())


# ------------------------------------------------- pinned junction sets


CASES_PINNED = {
    # :42 — old arc ABC extends new arc AB -> junctions at A and B
    "ABC_extends_new_line_AB": (
        {
            "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
            "ab": {"type": "LineString", "coordinates": [[0, 0], [1, 0]]},
        },
        {(0.0, 0.0), (1.0, 0.0)},
    ),
    # :66 — new line ABC extends old line AB
    "ABC_extends_line_AB": (
        {
            "ab": {"type": "LineString", "coordinates": [[0, 0], [1, 0]]},
            "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        },
        {(0.0, 0.0), (1.0, 0.0)},
    ),
    # :79 — new line ABC extends reversed old line BA
    "ABC_extends_line_BA": (
        {
            "ba": {"type": "LineString", "coordinates": [[1, 0], [0, 0]]},
            "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        },
        {(0.0, 0.0), (1.0, 0.0)},
    ),
    # :93 — new line BC starts mid reversed old line CBA
    "BC_start_middle_reversed_CBA": (
        {
            "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
            "bc": {"type": "LineString", "coordinates": [[1, 0], [2, 0]]},
        },
        {(1.0, 0.0), (2.0, 0.0)},
    ),
    # :136 — GeometryCollection of two adjacent squares (the reference only
    # asserts the stage's dict key count; the content invariant is the
    # shared-edge junction pair)
    "geometrycollection_adjacent_squares": (
        {
            "gc": {
                "type": "GeometryCollection",
                "geometries": [
                    {
                        "type": "Polygon",
                        "coordinates": [
                            [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
                        ],
                    },
                    {
                        "type": "Polygon",
                        "coordinates": [
                            [[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]
                        ],
                    },
                ],
            }
        },
        {(1.0, 0.0), (1.0, 1.0)},
    ),
}


@pytest.mark.parametrize("name", sorted(CASES_PINNED))
def test_pinned_junctions(spark, name):
    data, expected = CASES_PINNED[name]
    assert junctions(spark, data) == expected


# ------------------------------------------------- membership assertions


def test_undefined_for_non_junction_points(spark):
    # :9 — B=(1,0) is interior to the shared run, never a junction. The
    # reference asserts ONLY the non-membership (test_join.py:16): ab has
    # no (1,0) vertex, so the overlap is purely geometric; vertex-level
    # topology sees no shared path here, and downstream arcs are identical
    # either way (nothing to cut at endpoints, nothing dedups).
    j = junctions(spark, {
        "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
        "ab": {"type": "LineString", "coordinates": [[0, 0], [2, 0]]},
    })
    assert (1.0, 0.0) not in j


def test_reversed_CBA_extends_new_AB_contains_B(spark):
    # :55
    j = junctions(spark, {
        "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
        "ab": {"type": "LineString", "coordinates": [[0, 0], [1, 0]]},
    })
    assert (1.0, 0.0) in j


@pytest.mark.parametrize("shared_coords", [False, True])
def test_true_for_junction_points_count(spark, shared_coords):
    # :227 (default family) / :649 (shared_paths family)
    j = junctions(spark, {
        "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
        "ab": {"type": "LineString", "coordinates": [[0, 0], [1, 0]]},
    }, shared_coords=shared_coords)
    assert len(j) == 2


# ------------------------------------------------- no-junction cases


CASES_EMPTY = {
    # :488/:908 — ABACD self-intersects with its start
    "ABACD_self_intersects_start": {
        "abacd": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [0, 0], [3, 0], [4, 0]],
        }
    },
    # :501/:921 — ABCDBD self-intersects with its end
    "ABCDBD_self_intersects_end": {
        "abcdbd": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [4, 0], [3, 0], [4, 0]],
        }
    },
    # :548/:969 — exact duplicate rings ABCA & ABCA
    "exact_duplicate_rings_ABCA_ABCA": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "abca2": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
    },
    # :583/:1004 — coincident rings ABCA & BACB
    "coincident_rings_ABCA_BACB": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "bacb": {"type": "Polygon", "coordinates": [[[1, 0], [0, 0], [0, 1], [1, 0]]]},
    },
    # :594/:1015 — rings share only the point B
    "coincident_rings_share_point_B": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "dbed": {"type": "Polygon", "coordinates": [[[2, 1], [1, 0], [2, 2], [2, 1]]]},
    },
    # :605/:1026 — ring and line share only the point B
    "ring_and_line_share_point_B": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "dbe": {"type": "LineString", "coordinates": [[2, 1], [1, 0], [2, 2]]},
    },
    # :351 — single closed LineString ring ABCA
    "single_ring_ABCA_linestring": {
        "abca": {"type": "LineString",
                 "coordinates": [[0, 0], [1, 0], [1, 1], [0, 0]]}
    },
}


@pytest.mark.parametrize("name", sorted(CASES_EMPTY))
def test_no_junctions(spark, name):
    assert junctions(spark, CASES_EMPTY[name]) == set()


# ------------------------------------------------- polygon shared paths


def _ring(*pts):
    return [list(p) for p in pts]


def test_polygons_shared_path(spark):
    # :1045 — two polygons sharing a multi-vertex boundary path -> 2
    p0 = _ring(
        (520, 1108), (520, 1111), (531, 1111), (531, 1100), (530, 1100),
        (530, 1103), (529, 1103), (529, 1105), (524, 1110), (523, 1110),
        (523, 1108), (520, 1108),
    )
    p1 = _ring(
        (529, 1099), (522, 1107), (522, 1108), (523, 1108), (523, 1110),
        (524, 1110), (529, 1105), (529, 1103), (530, 1103), (530, 1099),
        (529, 1099),
    )
    j = junctions(spark, {
        "abc": {"type": "Polygon", "coordinates": [p0]},
        "def": {"type": "Polygon", "coordinates": [p1]},
    })
    assert len(j) == 2


def test_multi_shared_paths_are_connected(spark):
    # :1060 — p0 shares connected paths with p1 AND p2: 4 endpoints, one
    # coincides -> 3
    p0 = _ring(
        (0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (6, 3),
        (6, 4), (0, 4), (0, 0),
    )
    p1 = _ring((1, 0), (1, 1), (2, 1), (2, 0), (1, 0))
    p2 = _ring((2, 1), (2, 2), (3, 2), (3, 1), (2, 1))
    j = junctions(spark, {
        "a": {"type": "Polygon", "coordinates": [p0]},
        "b": {"type": "Polygon", "coordinates": [p1]},
        "c": {"type": "Polygon", "coordinates": [p2]},
    })
    assert len(j) == 3


def test_multi_shared_paths_form_geometrycollection(spark):
    # :1077 — intersection is lines + points; only the line part's
    # endpoints count -> 2
    p0 = _ring(
        (0, 0), (1, 0), (1, 1), (2, 1), (2, 2), (3, 2), (3, 3), (6, 3),
        (6, 4), (0, 4), (0, 0),
    )
    p1 = _ring(
        (1, 0), (1, 1), (2, 1), (2, 2), (3, 2), (4, 2), (5, 3), (6, -1),
        (1, -1), (1, 0),
    )
    j = junctions(spark, {
        "a": {"type": "Polygon", "coordinates": [p0]},
        "b": {"type": "Polygon", "coordinates": [p1]},
    })
    assert len(j) == 2


def test_diagonal_collinear_overlap_vertex_misaligned(spark):
    # Vertex-misaligned collinear overlap on a LONG DIAGONAL: exercises the
    # x-slab segment rasterization (join._rasterize_segments) — the overlap
    # must be found from a shared fine-grid cell without the bbox
    # cross-product blowup. Junctions = endpoints of the overlap piece.
    j = junctions(spark, {
        "long": {"type": "LineString",
                 "coordinates": [[0, 0], [1000, 1000]]},
        "short": {"type": "LineString",
                  "coordinates": [[400, 400], [600, 600]]},
    })
    assert j == {(400.0, 400.0), (600.0, 600.0)}


def test_rasterize_segments_linear_cell_cover(spark):
    # A diagonal segment covering K cells per axis must emit O(K) cell
    # rows (x-slab rasterization), not the O(K^2) bbox cross product.
    from pyspark.sql import functions as F

    from topojson_spark.operators.join import (
        _explode_segments,
        _rasterize_segments,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 1000.0, 1000.0])], "lid long, coords array<double>"
    )
    segs = _explode_segments(df.select("lid", "coords"))
    fine = 1000.0 / 1024
    cells = _rasterize_segments(
        segs, ["lid_a", "aax", "aay", "abx", "aby",
               "ak1", "ak2", "ak3", "ak4"],
        (0.0, 0.0, 1000.0, 1000.0), fine)
    n = cells.count()
    # true cover ~2*1025 cells; ±1-cell padding triples it at most
    assert 1024 <= n <= 8 * 1025
    # and the cover is sound: every true cell along the diagonal is present
    got = {(r["cx"], r["cy"]) for r in cells.select("cx", "cy").collect()}
    for i in range(1025):
        assert (i, i) in got
