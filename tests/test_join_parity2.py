"""Junction-detection parity, part 2: the remainder of the reference's
tests/test_join.py corpus (both the default block, lines 9-615, and the
explicit shared_coords=False block, lines 622-1088 — the reference runs both
with path-connected junctions since its TopoOptions default is
shared_coords=False, prequantize=False).

Skip-list (sandbox-impossible, need GDAL/gpkg fixtures):
- test_join_shared_junctions_in_shared_paths (test_join.py:108) — gpkg
- test_join_shared_segment_partly_start_partly_end_segment (:126) — gpkg
- test_join_non_noded_intersection (:615, :1036) — gpkg
- test_join_super_function_extract (:136) — asserts internal dict key count
"""

import pytest

from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)


def topo(spark, data, **kw):
    return Topology(data, spark=spark, **{**STAGE, **kw})


def junctions(spark, data, **kw):
    return topo(spark, data, **kw).junction_points()


CASES_EMPTY = {
    # test_join.py:351 / :774 — single closed LineString ring
    "single_ring_ABCA_line": {
        "abca": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [1, 1], [0, 0]],
        }
    },
    # :538 / :959 — single Polygon ring
    "ring_ABCA_polygon": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]}
    },
    # :274 / :697 — exact duplicate rings (1,1 apex variant)
    "exact_duplicate_rings_apex": {
        "abca1": {"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [2, 0], [0, 0]]]},
        "abca2": {"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [2, 0], [0, 0]]]},
    },
    # :548 / :969 — exact duplicate rights-triangle rings
    "exact_duplicate_rings_tri": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "abca2": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
    },
    # :559 / :980 — reversed duplicate rings ABCA & ACBA
    "reversed_duplicate_rings_tri": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "acba": {"type": "Polygon", "coordinates": [[[0, 0], [0, 1], [1, 0], [0, 0]]]},
    },
    # :296 / :719 — rotated duplicate rings (apex variant)
    "rotated_duplicate_rings_apex": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [2, 0], [0, 0]]]},
        "bcab": {"type": "Polygon", "coordinates": [[[1, 1], [2, 0], [0, 0], [1, 1]]]},
    },
    # :583 / :1004 — coincident rings ABCA & BACB
    "coincident_rings_ABCA_BACB": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "bacb": {"type": "Polygon", "coordinates": [[[1, 0], [0, 0], [0, 1], [1, 0]]]},
    },
    # :594 / :1015 — rings sharing a single point B
    "coincident_rings_share_point_B": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "dbed": {"type": "Polygon", "coordinates": [[[2, 1], [1, 0], [2, 2], [2, 1]]]},
    },
    # :605 / :1026 — ring and line sharing a single point B
    "ring_and_line_share_point_B": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "dbe": {"type": "LineString", "coordinates": [[2, 1], [1, 0], [2, 2]]},
    },
    # :488 / :908 — line self-intersecting with its start
    "ABACD_self_intersects_start": {
        "abacd": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [0, 0], [3, 0], [4, 0]],
        }
    },
    # :501 / :921 — line self-intersecting with its end
    "ABCDBD_self_intersects_end": {
        "abcdbd": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [4, 0], [3, 0], [4, 0]],
        }
    },
}


CASES_PINNED = {
    # :9-17 — cba + DIRECT line ab (no middle vertex): B is NOT a junction
    "non_junction_point_not_reported": (
        {
            "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
            "ab": {"type": "LineString", "coordinates": [[0, 0], [2, 0]]},
        },
        lambda got: (1.0, 0.0) not in set(got),
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
    # :1049 (issue 178) — ring closure must not force junctions; the one
    # genuinely shared path between the two polygons gives exactly 2
    "issue178_polygons_shared_path": (
        {
            "p0": {
                "type": "Polygon",
                "coordinates": [[
                    [520, 1108], [520, 1111], [531, 1111], [531, 1100],
                    [530, 1100], [530, 1103], [529, 1103], [529, 1105],
                    [524, 1110], [523, 1110], [523, 1108], [520, 1108],
                ]],
            },
            "p1": {
                "type": "Polygon",
                "coordinates": [[
                    [529, 1099], [522, 1107], [522, 1108], [523, 1108],
                    [523, 1110], [524, 1110], [529, 1105], [529, 1103],
                    [530, 1103], [530, 1099], [529, 1099],
                ]],
            },
        },
        lambda got: len(got) == 2,
    ),
    # :1064 — two shared paths with a common junction: 4 - 1 = 3
    "multi_shared_paths_connected": (
        {
            "a": {
                "type": "Polygon",
                "coordinates": [[
                    [0, 0], [1, 0], [1, 1], [2, 1], [2, 2], [3, 2],
                    [3, 3], [6, 3], [6, 4], [0, 4], [0, 0],
                ]],
            },
            "b": {
                "type": "Polygon",
                "coordinates": [[[1, 0], [1, 1], [2, 1], [2, 0], [1, 0]]],
            },
            "c": {
                "type": "Polygon",
                "coordinates": [[[2, 1], [2, 2], [3, 2], [3, 1], [2, 1]]],
            },
        },
        lambda got: len(got) == 3,
    ),
    # :1078 — geometrycollection-shaped intersection (line + points)
    "multi_shared_paths_geometrycollection": (
        {
            "a": {
                "type": "Polygon",
                "coordinates": [[
                    [0, 0], [1, 0], [1, 1], [2, 1], [2, 2], [3, 2],
                    [3, 3], [6, 3], [6, 4], [0, 4], [0, 0],
                ]],
            },
            "b": {
                "type": "Polygon",
                "coordinates": [[
                    [1, 0], [1, 1], [2, 1], [2, 2], [3, 2], [4, 2],
                    [5, 3], [6, -1], [1, -1], [1, 0],
                ]],
            },
        },
        lambda got: len(got) == 2,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES_EMPTY))
def test_no_junctions(spark, name):
    assert junctions(spark, CASES_EMPTY[name]) == []


@pytest.mark.parametrize("name", sorted(CASES_PINNED))
def test_pinned_junctions(spark, name):
    data, want = CASES_PINNED[name]
    got = junctions(spark, data)
    if callable(want):
        assert want(got), f"junctions = {got}"
    else:
        assert set(got) == want


# ---------------------------------------------------------------- options


def test_join_point_bbox(spark):
    # test_join.py:148-152 — bbox over a lone point
    t = topo(spark, [{"type": "Point", "coordinates": [0.5, 0.5]}])
    assert t.bbox == (0.5, 0.5, 0.5, 0.5)


def test_join_prequantize_points_bbox(spark):
    # :155-163 — bbox spans lines AND points under prequantize
    t = topo(
        spark,
        [
            {
                "type": "Polygon",
                "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
            },
            {"type": "Point", "coordinates": [-0.5, 1.5]},
        ],
        prequantize=True,
    )
    assert t.bbox == (-0.5, 0.0, 1.0, 1.5)


def test_join_single_ring_AA_degenerate(spark):
    # :166-171 — degenerate 2-vertex "ring" (unnested) drops cleanly
    t = topo(spark, {"aa": {"type": "Polygon", "coordinates": [[0, 0], [0, 0]]}})
    assert t.junction_points() == []


def test_join_shared_coords_dict(spark):
    # :174-183 — the explicit shared_coords=True case
    got = junctions(
        spark,
        {
            "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
            "ab": {"type": "LineString", "coordinates": [[0, 0], [1, 0]]},
        },
        shared_coords=True,
    )
    assert set(got) == {(0.0, 0.0), (1.0, 0.0)}


def test_join_invalid_multipolygons_prequantize(spark):
    # :187-200 — two invalid (unnested) MultiPolygons, prequantize on
    data = [
        {
            "type": "MultiPolygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        },
        {
            "type": "MultiPolygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        },
    ]
    got = junctions(spark, data, prequantize=True)
    assert got == []