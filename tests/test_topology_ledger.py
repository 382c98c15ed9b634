"""1:1 disposition ledger for the reference's tests/test_topology.py (the
flagship surface) — completing the cannot-rot discipline across ALL six
reference test files (extract/join/cut/dedup/hashmap ledgers live in
test_extract_parity / test_join_parity_ref / test_stage_ledger).

Ports in this file re-express GDF/shapely inputs as their GeoJSON-dict
analogs where the geometry itself is portable; gpkg/fiona readers and
gdf/alt/widget sinks are skip-listed (GDAL/geopandas/altair absent).
"""

import json
import os
import re

import pytest

from topojson_spark.topology import Topology

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/tests/test_topology.py"
AFRICA = "/root/reference/tests/files_geojson/example_data_africa.geojson"


def _africa():
    with open(AFRICA) as f:
        return json.load(f)


def _rings(geom):
    """Rotation/direction-invariant canonical form of a geometry's rings
    (the discipline of test_fixture_parity._geom_rings, local copy)."""
    def canon(ring):
        pts = [tuple(p) for p in ring]
        if pts[0] == pts[-1]:
            pts = pts[:-1]
        best = None
        for seq in (pts, pts[::-1]):
            for i in range(len(seq)):
                rot = tuple(seq[i:] + seq[:i])
                if best is None or rot < best:
                    best = rot
        return best

    t = geom["type"]
    c = geom["coordinates"]
    if t == "Polygon":
        return ("Polygon", tuple(canon(r) for r in c))
    if t == "MultiPolygon":
        return ("MultiPolygon",
                tuple(tuple(canon(r) for r in p) for p in c))
    return (t, json.dumps(c))


NATURALEARTH = (
    "/root/reference/tests/files_geojson/naturalearth_lowres.geojson"
)


def _naturalearth(pred):
    """FeatureCollection of naturalearth_lowres features whose properties
    pass ``pred`` — the GeoJSON analog of the reference's
    ``geopandas.read_file(static_natural_earth.gpkg)`` + ADMIN/CONTINENT
    filters (same Natural Earth 1:110m countries dataset, 177 features;
    property keys differ: name/continent vs ADMIN/CONTINENT)."""
    with open(NATURALEARTH) as f:
        d = json.load(f)
    return {
        "type": "FeatureCollection",
        "features": [f for f in d["features"] if pred(f["properties"])],
    }


# ---------------------------------------------------------------- ports


def test_topology_computing_topology(spark):
    # reference :112-121 — the same two crossing lines with and without
    # topology detection: 5 arcs cut at junctions vs 2 passthrough arcs
    data = [
        {"type": "LineString", "coordinates": [[4, 0], [2, 2], [0, 0]]},
        {"type": "LineString",
         "coordinates": [[0, 2], [1, 1], [2, 2], [3, 1], [4, 2]]},
    ]
    no_topo = Topology(data, spark=spark, topology=False,
                       prequantize=False).to_dict()
    topo = Topology(data, spark=spark, topology=True,
                    prequantize=False).to_dict()
    assert len(topo["arcs"]) == 5
    assert len(no_topo["arcs"]) == 2


def test_topology_with_arcs_without_linestrings(spark):
    # reference :199-207 — the output dict carries "arcs", never the
    # intermediate "linestrings" bookkeeping key
    data = [
        {"type": "Polygon",
         "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
        {"type": "Polygon",
         "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]]},
    ]
    topo = Topology(data, spark=spark, prequantize=False,
                    topology=True).to_dict()
    assert "linestrings" not in topo.keys()


def test_topology_point_quantized_family(spark):
    # reference :248-297 — exact quantized point coordinates/transforms
    t = Topology(
        [
            {"type": "Polygon",
             "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
            {"type": "Point", "coordinates": [-0.5, 1.5]},
        ],
        spark=spark, topoquantize=True,
    ).to_dict()
    assert len(t["arcs"]) == 1
    assert t["objects"]["data"]["geometries"][1]["coordinates"] == [0, 99999]

    t = Topology([{"type": "Point", "coordinates": [0.5, 0.5]}],
                 spark=spark, topoquantize=True).to_dict()
    assert len(t["arcs"]) == 0

    t = Topology(
        [{"type": "MultiPoint", "coordinates": [[0.5, 0.5], [1.0, 1.0]]}],
        spark=spark, topoquantize=True,
    ).to_dict()
    assert len(t["arcs"]) == 0
    assert t["objects"]["data"]["geometries"][0]["coordinates"] == [
        [0, 0], [99999, 99999]]
    assert t["transform"]["translate"] == [0.5, 0.5]

    t = Topology(
        [{"type": "Polygon",
          "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]}],
        spark=spark, topoquantize=True,
    ).to_dict()
    assert t["transform"]["translate"] == [0.0, 0.0]

    t = Topology(
        [
            {"type": "Point", "coordinates": [0.0, 0.0]},
            {"type": "MultiPoint",
             "coordinates": [[0.5, 0.5], [1.0, 1.0]]},
            {"type": "Point", "coordinates": [1.5, 1.5]},
        ],
        spark=spark, topoquantize=True,
    ).to_dict()
    geoms = t["objects"]["data"]["geometries"]
    assert geoms[0]["coordinates"] == [0, 0]
    assert geoms[2]["coordinates"] == [99999, 99999]


def test_topology_to_geojson_quantized_points_only(spark):
    # reference :389-395
    data = [{"type": "MultiPoint", "coordinates": [[0.5, 0.5], [1.0, 1.0]]}]
    gj = Topology(data, spark=spark, prequantize=False).to_geojson()
    assert gj["type"] == "FeatureCollection"
    assert gj["features"][0]["geometry"]["coordinates"] == [
        [0.5, 0.5], [1.0, 1.0]]


def test_topology_double_toposimplify_points_only(spark):
    # reference :398-407 — quantize+dequantize round-trips points whose
    # coords sit on the grid corners; simplify is a no-op without arcs
    data = [{"type": "MultiPoint", "coordinates": [[0.5, 0.5], [1.0, 1.0]]}]
    topo = Topology(data, spark=spark, prequantize=True)
    gj = topo.toposimplify(1).to_geojson()
    assert gj["type"] == "FeatureCollection"
    coords = gj["features"][0]["geometry"]["coordinates"]
    assert coords[0] == [0.5, 0.5]
    assert coords[1] == [1.0, 1.0]


def test_topology_topoquantize_exact_arc(spark):
    """Reference :446-455 — prequantize 1e4 then topoquantize 1e4, exact
    quantized delta arcs.

    NOTE the reference file defines ``test_topology_topoquantize`` TWICE
    (:446 and :669); pytest collects only the second, so :446 is DEAD CODE
    and its pinned ``arcs[0] == [[9999, 0], [-4999, 9999]]`` is not
    reproducible by the reference's active path either: that value requires
    a junction at (2,2), but B's (1,1)-(2,2) segment is collinear with A's
    (0,0)-(2,2) only at float precision — on the 1e4 integer grid the
    cross-product is 2500 != 0, the shared path vanishes, and both lines
    survive uncut. The exact pin kept here is the uncut arcs' quantized
    delta form, whose FIRST delta [-4999, 9999] still matches the dead
    test byte-for-byte (the quantization grid is the topology bbox, not a
    bbox recomputed from dequantized floats — reference topology.py:418)."""
    data = [
        {"type": "LineString", "coordinates": [[4, 0], [2, 2], [0, 0]]},
        {"type": "LineString",
         "coordinates": [[0, 2], [1, 1], [2, 2], [3, 1], [4, 2]]},
    ]
    tp = Topology(data, spark=spark, prequantize=1e4)
    topo = tp.topoquantize(1e4).to_dict()
    assert topo["transform"]["translate"] == [0.0, 0.0]
    assert topo["arcs"][0] == [[9999, 0], [-4999, 9999], [-5000, -9999]]
    assert topo["arcs"][1] == [
        [0, 9999], [2500, -4999], [2500, 4999], [2499, -4999], [2500, 4999]]
    # the float-precision shared path DOES cut when not prequantized:
    # 5 arcs (pinned in test_topology_computing_topology)


def test_topology_bbox_no_delta_transform(spark):
    # reference :629-638 — re-ingesting a topology must preserve bbox
    data = {
        "foo": {"type": "LineString",
                "coordinates": [[0, 0], [1, 0], [2, 0]]},
        "bar": {"type": "LineString",
                "coordinates": [[0, 0], [1, 0], [2, 0]]},
    }
    topo_1 = Topology(data, spark=spark, object_name="topo_1").to_dict()
    topo_2 = Topology(topo_1, spark=spark, object_name="topo_1").to_dict()
    assert topo_1["bbox"] == topo_2["bbox"]


def test_topology_nested_list_properties(spark):
    # reference :577-616 — list-valued properties survive; to_dict has the
    # four top-level keys (type, objects, bbox, arcs)
    neighbors = ["bi_ssu_2", "bi_ssu_3", "bi_ssu_5", "bi_ssu_9",
                 "bi_ssu_11", "bi_ssu_12", "bi_ssu_13"]
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1],
                                     [0, 0]]],
                },
                "properties": {"name": "abc", "geo.neighbors": neighbors},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1],
                                     [1, 0]]],
                },
                "properties": {"name": "def", "geo.neighbors": neighbors},
            },
        ],
    }
    topo = Topology(fc, spark=spark, prequantize=False).to_dict()
    assert len(topo) == 4
    props = [g.get("properties", {})
             for g in topo["objects"]["data"]["geometries"]]
    assert props[0]["geo.neighbors"] == neighbors


def test_topology_update_bbox_topoquantize_toposimplify(spark):
    # reference :618-626 — africa bbox west edge after topoquantize(10)
    topo = Topology(_africa(), spark=spark)
    bbox = topo.topoquantize(10).to_dict()["bbox"]
    assert round(bbox[0], 1) == -17.6


def test_topology_topoquantize_africa_149_arcs(spark):
    # reference :669-676 — africa at topoquantize=9 collapses to 149 arcs
    topo = Topology(_africa(), spark=spark, topoquantize=9).to_dict()
    assert len(topo["arcs"]) == 149


def test_topology_round_coordinates_geojson(spark):
    # reference :658-666 — to_geojson(decimals=2) rounding after
    # topoquantize(10); the pinned coordinate is feature 0's ring start
    topo = Topology(_africa(), spark=spark)
    gj = topo.topoquantize(10).to_geojson(decimals=2)
    coord_0 = gj["features"][0]["geometry"]["coordinates"][0][0]
    assert coord_0 == [35.85, -2.74]


def test_topology_ignore_index_true_geojson(spark):
    # reference :703-722 — duplicate feature ids + ignore_index=True
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature", "id": "duplicate_id",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1],
                                     [0, 0]]],
                },
            },
            {
                "type": "Feature", "id": "duplicate_id",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1],
                                     [1, 0]]],
                },
            },
        ],
    }
    topo = Topology(fc, spark=spark, ignore_index=True).to_dict()
    ids = [g["id"] for g in topo["objects"]["data"]["geometries"]]
    assert ids == ["feature_0", "feature_1"]


@pytest.mark.parametrize("prequantize", [True, False])
def test_topology_polygon_filled_island_no_junctions(spark, prequantize):
    # reference :42-63 (issue #183) — a polygon exactly filling another's
    # island dedups to TWO arcs and round-trips geometrically
    data = {
        "abcde_fghij": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]],
                [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]],
            ],
        },
        "jihgf": {
            "type": "Polygon",
            "coordinates": [[[2, 1], [2, 2], [1, 2], [1, 1], [2, 1]]],
        },
    }
    topo = Topology(data, spark=spark, prequantize=prequantize,
                    shared_coords=False)
    d = topo.to_dict()
    assert len(d["arcs"]) == 2
    gj = topo.to_geojson()
    got = {str(f["id"]): _rings(f["geometry"]) for f in gj["features"]}
    for key, geom in data.items():
        assert got[key] == _rings(geom), key


def test_topology_polygon_filled_island_with_junctions(spark):
    # reference :68-90 — same, plus a neighbor that shares the outer
    # shell's right edge: FOUR arcs, all geometries round-trip
    data = {
        "abcda_efghie": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [3, 0], [3, 3], [0, 3], [0, 0]],
                [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]],
            ],
        },
        "fghief": {
            "type": "Polygon",
            "coordinates": [[[2, 1], [2, 2], [1, 2], [1, 1], [2, 1]]],
        },
        "b__cb": {
            "type": "Polygon",
            "coordinates": [[[3, 0], [4, 0], [4, 3], [3, 3], [3, 0]]],
        },
    }
    topo = Topology(data, spark=spark, prequantize=False,
                    shared_coords=False)
    d = topo.to_dict()
    assert len(d["arcs"]) == 4
    gj = topo.to_geojson()
    got = {str(f["id"]): _rings(f["geometry"]) for f in gj["features"]}
    for key, geom in data.items():
        assert got[key] == _rings(geom), key


# ---------------------------------------------------------------- ledger

def test_topology_winding_order_options_surface(spark):
    # reference :93-110 (winding_order_TopoOptions + kwarg_vars — the two
    # reference bodies are identical): a single filtered object with
    # winding_order="CW_CCW" serializes one object and the 12-field
    # option surface under to_dict(options=True)
    data = _naturalearth(lambda p: p["name"] == "South Africa")
    topo = Topology(
        data, spark=spark, winding_order="CW_CCW"
    ).to_dict(options=True)
    assert len(topo["objects"]) == 1
    assert len(topo["options"]) == 12
    assert topo["options"]["winding_order"] == "CW_CCW"


def test_topology_prequantization_transform(spark):
    # reference :125-152 (prequantization + _including_delta_encoding —
    # identical bodies): five-country subset, topology=False,
    # prequantize=1e4 -> a transform is emitted; and the arcs really are
    # delta-encoded against that grid (integral values, first vertex
    # inside the 1e4 grid)
    data = _naturalearth(lambda p: p["name"] in (
        "Botswana", "South Africa", "Zimbabwe", "Mozambique", "Zambia"))
    topo = Topology(
        data, spark=spark, topology=False, prequantize=1e4
    ).to_dict()
    assert "transform" in topo.keys()
    a0 = topo["arcs"][0]
    assert all(float(v).is_integer() for xy in a0 for v in xy)
    assert 0 <= a0[0][0] <= 9999 and 0 <= a0[0][1] <= 9999


def test_topology_toposimplify_set_in_options(spark):
    # reference :154-162: construction-time toposimplify option (applied
    # by the engine's constructor post-op pass, reference _topo) keeps
    # the transform; Antarctica from the geojson analog
    data = _naturalearth(lambda p: p["name"] == "Antarctica")
    topo = Topology(
        data, spark=spark, prequantize=True, simplify_with="shapely",
        toposimplify=4,
    ).to_dict()
    assert "transform" in topo.keys()


def test_topology_toposimplify_as_chaining(spark):
    # reference :164-171
    data = _naturalearth(lambda p: p["name"] == "Antarctica")
    topo = Topology(
        data, spark=spark, prequantize=True, simplify_with="shapely"
    )
    topos = topo.toposimplify(2).to_dict()
    assert "transform" in topos.keys()


def test_topology_topoquantize_as_chaining(spark):
    # reference :173-180: unquantized construction, then chained
    # topoquantize introduces the transform
    data = _naturalearth(lambda p: p["name"] == "Antarctica")
    topo = Topology(data, spark=spark, prequantize=False)
    topos = topo.topoquantize(1e2).to_dict()
    assert "transform" in topos.keys()


def test_topology_prequantize_topoquantize_as_chaining(spark):
    # reference :182-189
    data = _naturalearth(lambda p: p["name"] == "Antarctica")
    topo = Topology(data, spark=spark, prequantize=1e6, topology=True)
    topos = topo.topoquantize(1e5).to_dict()
    assert "transform" in topos.keys()


def test_topology_to_svg(spark):
    # reference :191-197: to_svg on Antarctica with prequantize=1e6 +
    # presimplify=50. DOCUMENTED DEVIATION: the reference renders via
    # shapely/IPython display and returns None; this engine has no
    # display dependency, so to_svg returns the SVG document itself —
    # assert it is a well-formed non-empty SVG instead of None
    data = _naturalearth(lambda p: p["name"] == "Antarctica")
    topo = Topology(
        data, spark=spark, prequantize=1e6, presimplify=50, topology=True
    )
    svg = topo.to_svg()
    assert isinstance(svg, str) and svg.startswith("<svg")
    assert "polyline" in svg  # one polyline per arc


def test_topology_to_json_pretty_and_null(spark):
    # reference :424-444: geopandas.GeoDataFrame.from_features over an
    # inline FeatureCollection — fed here as the FeatureCollection dict
    # itself (same features, no geopandas); a None property must
    # serialize as JSON null in pretty mode
    data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"end_date": None},
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]
                    ],
                },
            }
        ],
    }
    topo = Topology(data, spark=spark).to_json(pretty=True)
    assert '"end_date": null' in topo


TOPOLOGY_LEDGER = {
    "test_topology_linestrings_parsed_to_gdf": "skip:to_gdf (geopandas)",
    "test_topology_naturalearth_lowres_defaults":
        "skip:gpkg fixture (GDAL); geojson analog pinned in"
        " test_fixture_parity.test_roundtrip_naturalearth_lowres_geometry_equality",
    "test_topology_polygon_filled_island_no_junctions":
        "here:test_topology_polygon_filled_island_no_junctions",
    "test_topology_polygon_filled_island_with_junctions":
        "here:test_topology_polygon_filled_island_with_junctions",
    "test_topology_winding_order_TopoOptions":
        "here:test_topology_winding_order_options_surface (geojson"
        " naturalearth analog; ported r4)",
    "test_topology_winding_order_kwarg_vars":
        "here:test_topology_winding_order_options_surface (reference body"
        " identical to the TopoOptions variant)",
    "test_topology_computing_topology": "here:test_topology_computing_topology",
    "test_topology_prequantization":
        "here:test_topology_prequantization_transform (geojson analog)",
    "test_topology_prequantization_including_delta_encoding":
        "here:test_topology_prequantization_transform (identical reference"
        " body; exact quantize+delta arc values pinned in"
        " test_fixture_parity.test_topoquantize_exact_delta_arcs)",
    "test_topology_toposimplify_set_in_options":
        "here:test_topology_toposimplify_set_in_options (geojson analog;"
        " needed the r4 constructor post-op pass)",
    "test_topology_toposimplify_as_chaining":
        "here:test_topology_toposimplify_as_chaining (geojson analog)",
    "test_topology_topoquantize_as_chaining":
        "here:test_topology_topoquantize_as_chaining (geojson analog; exact"
        " chaining values also pinned in test_postops.test_topoquantize)",
    "test_topology_prequantize_topoquantize_as_chaining":
        "here:test_topology_prequantize_topoquantize_as_chaining (geojson"
        " analog)",
    "test_topology_to_svg":
        "here:test_topology_to_svg (geojson analog; documented deviation:"
        " returns the SVG string instead of displaying + None)",
    "test_topology_with_arcs_without_linestrings":
        "here:test_topology_with_arcs_without_linestrings",
    "test_topology_widget": "skip:to_widget (viz, out of scope)",
    "test_topology_simplification_vw":
        "skip:gpkg fixture (GDAL); r4 audit: the geojson naturalearth"
        " analog yields different South America arc geometry (arc[0] has"
        " 10 verts, not the gpkg's 4) so the pinned constant is not"
        " portable; VW kernel pinned in test_kernels",
    "test_topology_simplification_dp":
        "skip:gpkg fixture (GDAL); r4 audit: geojson analog arc geometry"
        " differs (see _vw note) — constant not portable; DP kernel"
        " pinned in test_kernels",
    "test_topology_polygon_point": "here:test_topology_point_quantized_family",
    "test_topology_point": "here:test_topology_point_quantized_family",
    "test_topology_multipoint": "here:test_topology_point_quantized_family",
    "test_topology_polygon": "here:test_topology_point_quantized_family",
    "test_topology_point_multipoint":
        "here:test_topology_point_quantized_family",
    "test_topology_to_geojson_nested_geometrycollection":
        "file:test_stage_parity.test_hashmap_nested_geometrycollection_2_levels"
        " (structure; serialization shape asserted on the dict form)",
    "test_topology_to_geojson_polygon_geometrycollection":
        "file:test_stage_parity.test_hashmap_polygon_geometrycollection_mixed",
    "test_topology_to_geojson_linestring_polygon":
        "file:test_stage_parity2.test_hashmap_linestring_polygon",
    "test_topology_to_geojson_polygon_point":
        "file:test_stage_parity.test_hashmap_point_tables",
    "test_topology_to_geojson_singepoint_in_multipoint":
        "file:test_pipeline.test_topology_points (single-point MultiPoint"
        " keeps its nesting)",
    "test_topology_to_geojson_quantized_points_only":
        "here:test_topology_to_geojson_quantized_points_only",
    "test_topology_double_toposimplify_points_only":
        "here:test_topology_double_toposimplify_points_only",
    "test_topology_to_json": "file:test_postops.test_topojson_reingest_roundtrip",
    "test_topology_to_json_pretty_and_null":
        "here:test_topology_to_json_pretty_and_null (FeatureCollection dict"
        " fed directly — same features, no geopandas)",
    "test_topology_topoquantize": "here:test_topology_topoquantize_exact_arc"
        " (+ here:test_topology_topoquantize_africa_149_arcs — the"
        " reference file defines the name twice; both bodies are ported)",
    "test_topology_fiona_gpkg_to_geojson": "skip:fiona/GDAL reader",
    "test_topology_fiona_shapefile_to_geojson": "skip:fiona/GDAL reader",
    "test_topology_topojson_winding_order":
        "skip:shapely MultiLineString input; winding pinned in"
        " test_postops + test_kernels winding_order",
    "test_topology_geojson_winding_order":
        "skip:geopandas GeoDataFrame input; winding pinned in test_postops",
    "test_topology_geodataframe_valid": "skip:gpkg fixture (GDAL)",
    "test_topology_geojson_duplicates":
        "file:test_fixture_parity.test_topology_geojson_duplicates_exact_ring"
        " (+ exact WKT rotation pin in"
        " test_topology_geojson_duplicates_exact_ring_rotation)",
    "test_topology_topoquantization_dups":
        "skip:gpkg fixture (GDAL); r4 audit: geojson analog produces 6"
        " arcs for FR/BE/NL (gpkg pins arcs[6]) — constant not portable",
    "test_topology_topojson_from_file":
        "file:test_fixture_parity.test_topojson_from_file_naturalearth",
    "test_topology_topojson_to_alt": "skip:altair absent (to_alt guarded)",
    "test_topology_topojson_to_alt_int64": "skip:altair absent",
    "test_topology_nested_list_properties":
        "here:test_topology_nested_list_properties",
    "test_topology_update_bbox_topoquantize_toposimplify":
        "here:test_topology_update_bbox_topoquantize_toposimplify",
    "test_topology_bbox_no_delta_transform":
        "here:test_topology_bbox_no_delta_transform",
    "test_topology_toposimplify_on_topojson_data":
        "file:test_fixture_parity.test_topojson_africa_reingest_toposimplify"
        " (re-ingest + toposimplify; gdf validity part needs geopandas)",
    "test_topology_round_coordinates_geojson":
        "here:test_topology_round_coordinates_geojson",
    "test_topology_gdf_keep_index": "skip:gpkg fixture + to_gdf (GDAL)",
    "test_topology_write_multiple_object_json_dict":
        "skip:gpkg fixture (GDAL); multi-object dict output pinned in"
        " test_pipeline.test_topology_multiple_objects",
    "test_topology_ignore_index_true_geojson":
        "here:test_topology_ignore_index_true_geojson",
}


def _repo_test_names() -> set:
    names = set()
    for fn in os.listdir(TESTS_DIR):
        if fn.startswith("test_") and fn.endswith(".py"):
            with open(os.path.join(TESTS_DIR, fn)) as f:
                for name in re.findall(r"^def (test_\w+)", f.read(), re.M):
                    names.add(f"{fn[:-3]}.{name}")
    return names


def test_topology_ledger_enumerates_reference_suite():
    with open(REF) as f:
        ref_names = re.findall(r"^def (test_\w+)", f.read(), re.M)
    # the reference file defines test_topology_topoquantize twice (python
    # keeps the later def; both bodies are ported here) -> compare as sets
    assert sorted(set(ref_names)) == sorted(TOPOLOGY_LEDGER)
    repo = _repo_test_names()
    here = {n for n in re.findall(r"^def (test_\w+)", open(__file__).read(),
                                  re.M)}
    for ref, target in TOPOLOGY_LEDGER.items():
        kind, rest = target.split(":", 1)
        first = rest.split(" ")[0]
        if kind == "here":
            assert first in here, f"{ref} -> {first}"
        elif kind == "file":
            assert first in repo, f"{ref} -> {first}"
        else:
            assert kind == "skip" and rest, ref
