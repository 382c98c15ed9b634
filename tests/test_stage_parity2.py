"""Cut / dedup / hashmap parity, part 3: the remaining portable reference
cases (tests/test_cut.py, test_dedup.py, test_hashmap.py) not yet pinned by
test_stage_parity / test_pipeline / test_fixture_parity.

Skip-list (sandbox-impossible, gpkg/shapefile fixtures need GDAL):
- test_cut_border_egypt_sudan (:53), test_cut_nybb_fast_split (:61)
- test_dedup_shared_junctions_in_shared_paths (:85),
  test_dedup_arc_not_shared_arcs_got_deleted (:102),
  test_dedup_no_shared_paths_in_geoms (:119), test_dedup_topology_false (:249)
- test_hashmap_albania_greece (:58 — ported HERE via the geojson twin
  fixture naturalearth_alb_grc.geojson),
  test_hashmap_benin_surrounding_countries (:67),
  test_hashmap_geom_surrounding_many_geometries (:80),
  test_hashmap_shared_arcs_ordering_issues (:96),
  test_hashmap_winding_order_geom_solely_shared_arcs (:152),
  test_hashmap_fiona_gpkg_to_dict (:276),
  test_hashmap_read_multiple_gdf_object_name (:307 — geopandas input; the
  dict multi-object equivalent is pinned by test_topology_multiple_objects)
"""

import json
import re

from pyspark.sql import functions as F

from topojson_spark.functions import kernels as K
from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)

SQUARES = {
    "abcda": {
        "type": "Polygon",
        "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
    },
    "befcb": {
        "type": "Polygon",
        "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]],
    },
}


def topo(spark, data, **kw):
    return Topology(data, spark=spark, **{**STAGE, **kw})


def dup_pairs(t: Topology) -> int:
    rows = t.arcs_cut.select("coords").collect()
    canons = {K.canonical_dup_bytes(K.as_np(r["coords"])) for r in rows}
    return len(rows) - len(canons)


def shared_arcs(t: Topology) -> int:
    return t.arcs.where(F.col("is_shared")).count()


# ---------------------------------------------------------------- cut


def test_cut_overlapping_rings_are_cut(spark):
    # test_cut.py:34-50 — two adjacent squares: each ring rotated to the
    # junction and cut in two (4 split linestrings), the shared border is
    # one duplicate pair
    t = topo(spark, SQUARES)
    assert t.arcs_cut.count() == 4
    assert dup_pairs(t) == 1


def test_cut_super_function_adjacent_squares_gc(spark):
    # test_cut.py:81-92 — same mosaic via a GeometryCollection input (the
    # reference asserts its Cut dict key count; the engine equivalents are
    # the split/dup counts)
    data = {
        "gc": {
            "type": "GeometryCollection",
            "geometries": [
                SQUARES["abcda"],
                SQUARES["befcb"],
            ],
        }
    }
    t = topo(spark, data)
    assert t.arcs_cut.count() == 4
    assert dup_pairs(t) == 1
    assert t.arcs.count() == 3 and shared_arcs(t) == 1


# ---------------------------------------------------------------- dedup


def test_dedup_duplicate_rotated_hole_interior(spark):
    # test_dedup.py:11-31 — a multipolygon hole duplicated (rotated) as a
    # standalone polygon. The reference's find_duplicates (ops.py:939-971)
    # COLUMN-SORTS ring coordinates before hashing, so its ring-duplicate
    # relation is rotation- and direction-invariant: the rotated hole and
    # bar ARE deduplicated into one shared arc (the reference test's own
    # asserts are stage bookkeeping that dedup leaves untouched —
    # bookkeeping_duplicates is reset to [] after popping, and
    # bookkeeping_geoms is extract-level — so they hold either way).
    data = {
        "foo": {
            "type": "MultiPolygon",
            "coordinates": [
                [
                    [[0, 0], [20, 0], [10, 20], [0, 0]],  # CCW
                    [[3, 2], [10, 16], [17, 2], [3, 2]],  # CW
                ],
                [[[6, 4], [14, 4], [10, 12], [6, 4]]],  # CCW
            ],
        },
        "bar": {
            "type": "Polygon",
            "coordinates": [[[17, 2], [3, 2], [10, 16], [17, 2]]],
        },
    }
    t = topo(spark, data)
    assert dup_pairs(t) == 1  # hole (rotated) == bar ring
    assert t.arcs.count() == 3 and shared_arcs(t) == 1
    d = t.to_dict()
    geoms = {g.get("id", i): g for i, g in
             enumerate(d["objects"]["data"]["geometries"])}
    foo = geoms["foo"]["arcs"]
    assert len(foo) == 2 and len(foo[0]) == 2 and len(foo[1]) == 1
    assert len(geoms["bar"]["arcs"]) == 1
    # the hole and bar reference the SAME arc (sign/rotation aside)
    hole_arc = foo[0][1][0]
    bar_arc = geoms["bar"]["arcs"][0][0]
    to_idx = lambda a: a if a >= 0 else ~a
    assert to_idx(hole_arc) == to_idx(bar_arc)


def test_dedup_two_polygon_reversed_shared_arc(spark):
    # test_dedup.py:34-49 — adjacent squares: 3 final arcs, the shared
    # border is one shared arc, each ring stitches from 2 arcs
    t = topo(spark, SQUARES)
    assert t.arcs.count() == 3 and shared_arcs(t) == 1
    d = t.to_dict()
    for g in d["objects"]["data"]["geometries"]:
        assert len(g["arcs"][0]) == 2  # bookkeeping_arcs [[2,0],[1,2]]


def test_dedup_super_function_adjacent_squares_gc(spark):
    # test_dedup.py:128-139 — the GC variant dedups to 3 arcs / 1 shared
    data = {
        "gc": {
            "type": "GeometryCollection",
            "geometries": [SQUARES["abcda"], SQUARES["befcb"]],
        }
    }
    t = topo(spark, data)
    assert t.arcs.count() == 3 and shared_arcs(t) == 1


def _load_issue104_fixture():
    """Pull the inline geojson fixture out of the reference test source
    (tests/test_dedup.py:285-291) instead of duplicating the 4 KB blob."""
    with open("/root/reference/tests/test_dedup.py") as f:
        src = f.read()
    m = re.search(r"geojson\.loads\(\s*'(\{.*?\})'\s*\)", src, re.DOTALL)
    assert m, "issue-104 fixture not found in reference source"
    return json.loads(m.group(1))


def test_dedup_merge_continuous_shared_path(spark):
    # test_dedup.py:285-295 (issue 104 follow-up) — 6 polygons whose holes
    # exactly coincide with the island polygons: 6 final linestrings, no
    # junctions under path-connected detection
    data = _load_issue104_fixture()
    t = topo(spark, data)
    assert t.junction_points() == []
    assert t.arcs.count() == 6


# ---------------------------------------------------------------- hashmap


def test_hashmap_super_function_signed_arcs(spark):
    # test_hashmap.py:109-124 — the adjacent-squares GC pins the EXACT
    # signed arc lists: geoms[0].arcs == [[-3, 0]], geoms[1].arcs == [[1, 2]]
    data = {
        "gc": {
            "type": "GeometryCollection",
            "geometries": [SQUARES["abcda"], SQUARES["befcb"]],
        }
    }
    d = topo(spark, data).to_dict()
    geoms = d["objects"]["data"]["geometries"][0]["geometries"]
    assert geoms[0]["arcs"] == [[-3, 0]]
    assert geoms[1]["arcs"] == [[1, 2]]


def test_hashmap_polygon_single_linestring(spark):
    # test_hashmap.py:190-196
    data = [
        {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        }
    ]
    t = topo(spark, data)
    assert t.arcs.count() == 1


def test_hashmap_linestring_polygon(spark):
    # test_hashmap.py:257-273 — Feature-wrapped LineString + open-ring
    # Polygon (auto-closed): 2 final linestrings
    data = {
        "foo": {
            "type": "Feature",
            "geometry": {
                "type": "LineString",
                "coordinates": [[0.1, 0.2], [0.3, 0.4]],
            },
        },
        "bar": {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[0.5, 0.6], [0.7, 0.8], [0.9, 1.0]]],
            },
        },
    }
    t = topo(spark, data)
    assert t.arcs.count() == 2


def test_hashmap_serializing_holes(spark):
    # test_hashmap.py:286-304 (issues 148/167) — multipolygon with two holes
    # in the first polygon: arcs == [[[0], [1], [2]], [[3]]]
    data = {
        "mp": {
            "type": "MultiPolygon",
            "coordinates": [
                [
                    [[0, 0], [20, 0], [10, 20], [0, 0]],  # CCW
                    [[8, 2], [12, 12], [17, 2], [8, 2]],  # CW
                    [[3, 2], [5, 6], [7, 2], [3, 2]],  # CW
                ],
                [[[10, 3], [15, 3], [12, 9], [10, 3]]],  # CCW
            ],
        }
    }
    d = topo(spark, data).to_dict()
    arcs = d["objects"]["data"]["geometries"][0]["arcs"]
    assert arcs == [[[0], [1], [2]], [[3]]]


def test_hashmap_albania_greece_fixture(spark):
    # test_hashmap.py:58-64 asserts 4 linestrings on its GDAL-only gpkg
    # (whose adjacent borders share vertices, so the common boundary cuts
    # out as a shared arc). The geojson fixture here is NOT that data:
    # its Albania and Greece rings share ZERO coordinates (verified), so
    # no junction/cut/dedup applies and the true output is the 3 uncut
    # rings. The shared-border 4-linestring semantics the gpkg test pins
    # is covered by test_dedup_two_polygon_reversed_shared_arc and the
    # square-pair pipeline tests.
    with open(
        "/root/reference/tests/files_geojson/naturalearth_alb_grc.geojson"
    ) as f:
        data = json.load(f)
    t = topo(spark, data)
    assert t.arcs.count() == 3 and shared_arcs(t) == 0
    d = t.to_dict()
    geoms = d["objects"]["data"]["geometries"]
    assert [g["type"] for g in geoms] == ["Polygon", "MultiPolygon"]
    assert geoms[0]["arcs"] == [[0]]
    assert geoms[1]["arcs"] == [[[1]], [[2]]]
