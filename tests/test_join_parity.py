"""Path-connected junction parity: the reference's shared_coords=False test
family (tests/test_join.py:622-1000), re-expressed over the engine.

All use stage defaults (prequantize=False) like `Join(data)` does."""

import pytest

from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)


def junctions(spark, data, **kw):
    t = Topology(data, spark=spark, **{**STAGE, **kw})
    return t.junction_points()


CASES_EMPTY = {
    # name -> data expecting NO junctions
    "ADE_shares_start_with_ABC": {
        "ade": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 1], [2, 1]]},
    },
    "DEC_shares_end": {
        "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        "dec": {"type": "LineString", "coordinates": [[0, 1], [1, 1], [2, 0]]},
    },
    "DBE_single_midpoint": {
        "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        "dbe": {"type": "LineString", "coordinates": [[0, 1], [1, 0], [2, 1]]},
    },
    "ABDE_skips_point_ABCDE": {
        "abcde": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [2, 0], [3, 0], [4, 0]],
        },
        "abde": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [3, 0], [4, 0]],
        },
    },
    "ABDE_skips_point_reversed_EDCBA": {
        "edcba": {
            "type": "LineString",
            "coordinates": [[4, 0], [3, 0], [2, 0], [1, 0], [0, 0]],
        },
        "abde": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [3, 0], [4, 0]],
        },
    },
    "self_intersecting_middle": {
        "abcdbe": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [2, 0], [3, 0], [1, 0], [4, 0]],
        }
    },
    "self_intersect_plus_point_share": {
        "abcdbe": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [2, 0], [3, 0], [1, 0], [4, 0]],
        },
        "fbg": {"type": "LineString", "coordinates": [[0, 1], [1, 0], [2, 1]]},
    },
    "closed_line_no_junction": {
        "abca": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 0], [0, 1], [0, 0]],
        }
    },
    "ring_and_equal_line": {
        "abcaLine": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 1], [2, 0], [0, 0]],
        },
        "abcaPolygon": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 1], [2, 0], [0, 0]]],
        },
    },
    "ring_and_rotated_line": {
        "abcaLine": {
            "type": "LineString",
            "coordinates": [[0, 0], [1, 1], [2, 0], [0, 0]],
        },
        "bcabPolygon": {
            "type": "Polygon",
            "coordinates": [[[1, 1], [2, 0], [0, 0], [1, 1]]],
        },
    },
    "reversed_duplicate_rings": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [2, 0], [0, 0]]]},
        "acba": {"type": "Polygon", "coordinates": [[[0, 0], [2, 0], [1, 1], [0, 0]]]},
    },
    "coincident_rotated_rings": {
        "abca": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [0, 1], [0, 0]]]},
        "bcab": {"type": "Polygon", "coordinates": [[[1, 0], [0, 1], [0, 0], [1, 0]]]},
    },
}

CASES_PINNED = {
    # name -> (data, expected junction set)
    "ABC_extends_BC": (
        {
            "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
            "bc": {"type": "LineString", "coordinates": [[1, 0], [2, 0]]},
        },
        {(1.0, 0.0), (2.0, 0.0)},
    ),
    "ABD_deviates_ABC": (
        {
            "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
            "abd": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [3, 0]]},
        },
        {(0.0, 0.0), (2.0, 0.0)},
    ),
    "ABD_deviates_reversed_CBA": (
        {
            "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
            "abd": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [3, 0]]},
        },
        {(0.0, 0.0), (2.0, 0.0)},
    ),
    "DBC_merges_ABC": (
        {
            "abc": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
            "dbc": {"type": "LineString", "coordinates": [[3, 0], [1, 0], [2, 0]]},
        },
        {(1.0, 0.0), (2.0, 0.0)},
    ),
    "DBC_merges_reversed_CBA": (
        {
            "cba": {"type": "LineString", "coordinates": [[2, 0], [1, 0], [0, 0]]},
            "dbc": {"type": "LineString", "coordinates": [[3, 0], [1, 0], [2, 0]]},
        },
        {(1.0, 0.0), (2.0, 0.0)},
    ),
    "forward_backward_lines": (
        {
            "foo": {
                "type": "LineString",
                "coordinates": [[0, 0], [10, 0], [10, 5], [20, 5]],
            },
            "bar": {
                "type": "LineString",
                "coordinates": [[5, 0], [30, 0], [30, 5], [0, 5]],
            },
        },
        4,  # count only (tests/test_join.py:686-702)
    ),
    "more_than_two_lines": (
        {
            "foo": {"type": "LineString", "coordinates": [[0, 0], [15, 2.5], [30, 5]]},
            "bar": {"type": "LineString", "coordinates": [[0, 0], [15, 2.5], [30, 5]]},
            "baz": {
                "type": "LineString",
                "coordinates": [[0, 0], [10, 0], [10, 5], [20, 5]],
            },
            "qux": {
                "type": "LineString",
                "coordinates": [[5, 0], [30, 0], [30, 5], [0, 5]],
            },
        },
        4,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES_EMPTY))
def test_no_junctions(spark, name):
    assert junctions(spark, CASES_EMPTY[name]) == []


@pytest.mark.parametrize("name", sorted(CASES_PINNED))
def test_pinned_junctions(spark, name):
    data, want = CASES_PINNED[name]
    got = junctions(spark, data)
    if isinstance(want, int):
        assert len(got) == want
    else:
        assert set(got) == want
