"""Extract-stage parity: the portable tail of the reference's
tests/test_extract.py (cases not already pinned by test_stage_parity /
test_fixture_parity / test_postops). Reference line numbers in comments.

Skip-list (GDAL/shapefile/geopandas-only fixtures):
- test_extract_geopandas_geoseries (:200), _geodataframe (:329)
- test_extract_geo_interface_shapefile (:279), fiona readers (:349, :356)
- gdf/shapefile org-data-untouched variants (:397, :420)
- test_extract_read_multiple_gdf_object_name (:512)
"""

import copy

import pytest
from pyspark.sql import functions as F

from topojson_spark.operators.extract import extract, features_from_mapping
from topojson_spark.options import TopoOptions
from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)


def lines_of(spark, data, **kw):
    opts = TopoOptions(**{**STAGE, **kw})
    feats = features_from_mapping(spark, data, opts)
    lines, points, features = extract(feats, opts, None)
    return lines


def test_extract_linestring_two_objects(spark):
    # :12
    data = {
        "foo": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        "bar": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
    }
    assert lines_of(spark, data).count() == 2


def test_extract_multipolygon_hole_units_and_rings(spark):
    # :23 — 3 bookkeeping units, 4 rings
    data = {
        "foo": {
            "type": "MultiPolygon",
            "coordinates": [
                [
                    [[0, 0], [20, 0], [10, 20], [0, 0]],
                    [[3, 2], [10, 16], [17, 2], [3, 2]],
                ],
                [[[6, 4], [14, 4], [10, 12], [6, 4]]],
                [[[25, 5], [30, 10], [35, 5], [25, 5]]],
            ],
        }
    }
    lines = lines_of(spark, data)
    assert lines.count() == 4
    assert lines.select("unit_seq").distinct().count() == 3


def test_extract_empty_linestring_arcs_none(spark):
    # :45 — empty LineString keeps its object with arcs == None
    data = {"empty_ls": {"type": "LineString", "coordinates": None}}
    t = Topology(data, spark=spark, **STAGE)
    obj = t.to_dict()["objects"]["data"]["geometries"][0]
    assert obj.get("arcs") is None
    assert t.arcs.count() == 0


def test_extract_invalid_polygon_dropped_valid_kept(spark):
    # :53 — bowtie-ish 3-point ring is invalid; the valid one survives
    data = {
        "wrong": {"type": "Polygon",
                  "coordinates": [[[0, 0], [1, 0], [2, 0], [0, 0]]]},
        "valid": {"type": "Polygon",
                  "coordinates": [[[0, 0], [2, 0], [1, 1], [0, 0]]]},
    }
    assert lines_of(spark, data).count() == 1


def test_extract_multilinestring_three_parts(spark):
    # :64
    data = {
        "foo": {
            "type": "MultiLineString",
            "coordinates": [
                [[0.0, 0.0], [1, 1], [3, 3]],
                [[1, 1], [0, 1]],
                [[3, 3], [4, 4], [0, 1]],
            ],
        }
    }
    assert lines_of(spark, data).count() == 3


def test_extract_list_of_geometry_dicts(spark):
    # :230 — plain list input
    data = [
        {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
    ]
    assert lines_of(spark, data).count() == 2


def test_extract_geomcol_multipolygon_polygon_four_rings(spark):
    # :252
    data = {
        "foo": {
            "type": "GeometryCollection",
            "geometries": [
                {
                    "type": "MultiPolygon",
                    "coordinates": [
                        [
                            [[10, 20], [20, 0], [0, 0], [3, 13], [10, 20]],
                            [[3, 2], [10, 16], [17, 2], [3, 2]],
                        ],
                        [[[10, 4], [14, 4], [10, 12], [10, 4]]],
                    ],
                },
                {
                    "type": "Polygon",
                    "coordinates": [[[20, 0], [35, 5], [10, 20], [20, 0]]],
                },
            ],
        }
    }
    assert lines_of(spark, data).count() == 4


def test_extract_single_geometry_dict(spark):
    # :301-:308 analogs — a bare geometry becomes feature_0
    data = {"type": "LineString", "coordinates": [[0, 0], [1, 0], [1, 1]]}
    # a bare dict WITH a type is a mapping in the reference's dict path
    # only when its values are geometries; a real geometry goes through
    # the single-object path
    t = Topology([data], spark=spark, **STAGE)
    assert t.arcs.count() == 1


def test_extract_invalid_dict_item_yields_nothing(spark):
    # :339 — a dict whose values are not geometry objects extracts nothing
    data = {
        "type": "MultiPolygon",
        "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
    }
    assert lines_of(spark, data).count() == 0


def test_extract_dict_org_data_untouched(spark):
    # :369 — the input mapping must not be mutated
    data = {
        "foo": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
        "bar": {"type": "LineString", "coordinates": [[0, 0], [1, 0], [2, 0]]},
    }
    snapshot = copy.deepcopy(data)
    t = Topology(data, spark=spark, **STAGE)
    d = t.to_dict()
    assert data == snapshot
    assert "arcs" not in data["foo"]
    geoms = d["objects"]["data"]["geometries"]
    assert all("arcs" in g for g in geoms)


def test_extract_featurecollection_org_data_untouched(spark):
    # :433 — FeatureCollection input keeps its geometry entries
    data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                },
                "properties": {"name": "abc"},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]],
                },
                "properties": {"name": "def"},
            },
        ],
    }
    snapshot = copy.deepcopy(data)
    Topology(data, spark=spark, **STAGE).to_dict()
    assert data == snapshot


def test_extract_keep_properties_nested(spark):
    # :456 (issue 151) — properties survive, including nested dict values
    data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                },
                "properties": {"name": "abc"},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]],
                },
                "properties": {"name": {"def": "ghi"}},
            },
        ],
    }
    d = Topology(data, spark=spark, **STAGE).to_dict()
    geoms = {g["id"]: g for g in d["objects"]["data"]["geometries"]}
    assert geoms["feature_0"]["properties"]["name"] == "abc"
    assert geoms["feature_1"]["properties"]["name"] == {"def": "ghi"}


# ----------------------------------------------------- round-3 additions


def test_extract_nested_geometrycollection(spark):
    # :81 — 2-level GC; the nested structure survives into objects and the
    # inner linestring resolves to exactly one arc ref
    data = {
        "foo": {
            "type": "GeometryCollection",
            "geometries": [
                {
                    "type": "GeometryCollection",
                    "geometries": [
                        {"type": "LineString",
                         "coordinates": [[0.1, 0.2], [0.3, 0.4]]}
                    ],
                },
                {"type": "Polygon",
                 "coordinates": [[[0.5, 0.6], [0.7, 0.8], [0.9, 1.0]]]},
            ],
        }
    }
    assert lines_of(spark, data).count() == 2
    d = Topology(data, spark=spark, **STAGE).to_dict()
    geoms = d["objects"]["data"]["geometries"][0]["geometries"]
    assert len(geoms[0]["geometries"][0]["arcs"]) == 1


def test_extract_geometrycollection_polygon(spark):
    # :105
    data = {
        "bar": {"type": "Polygon", "coordinates": [[[0, 0], [1, 1], [2, 0]]]},
        "foo": {
            "type": "GeometryCollection",
            "geometries": [
                {"type": "LineString", "coordinates": [[0.1, 0.2], [0.3, 0.4]]}
            ],
        },
    }
    assert lines_of(spark, data).count() == 2


def test_extract_features(spark):
    # :121 — dict of Feature values
    data = {
        "foo": {
            "type": "Feature",
            "geometry": {"type": "LineString",
                         "coordinates": [[0.1, 0.2], [0.3, 0.4]]},
        },
        "bar": {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[0.5, 0.6], [0.7, 0.8], [0.9, 1.0]]],
            },
        },
    }
    assert lines_of(spark, data).count() == 2


def test_extract_featurecollection(spark):
    # :141 — FeatureCollection holding a plain Feature + a GC Feature
    data = {
        "collection": {
            "type": "FeatureCollection",
            "features": [
                {
                    "type": "Feature",
                    "geometry": {"type": "LineString",
                                 "coordinates": [[0.1, 0.2], [0.3, 0.4]]},
                },
                {
                    "type": "Feature",
                    "geometry": {
                        "type": "GeometryCollection",
                        "geometries": [
                            {
                                "type": "Polygon",
                                "coordinates": [
                                    [[0.5, 0.6], [0.7, 0.8], [0.9, 1.0]]
                                ],
                            }
                        ],
                    },
                },
            ],
        }
    }
    lines = lines_of(spark, data)
    assert lines.count() == 2
    assert lines.select("feature_seq").distinct().count() == 2
    d = Topology(data, spark=spark, **STAGE).to_dict()
    objs = {g["id"]: g for g in d["objects"]["data"]["geometries"]}
    assert objs["feature_0"]["type"] == "LineString"
    assert objs["feature_1"]["geometries"][0]["type"] == "Polygon"


def test_extract_points(spark):
    # :288 — list of [polygon, point]: 1 coord row, 1 line row, the point
    # coordinates preserved and serialized under "coordinates"
    data = [
        {"type": "Polygon",
         "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
        {"type": "Point", "coordinates": [0.5, 0.5]},
    ]
    opts = TopoOptions(**STAGE)
    feats = features_from_mapping(spark, data, opts)
    lines, points, features = extract(feats, opts, None)
    assert lines.count() == 1
    pts = points.collect()
    assert len(pts) == 1
    assert (pts[0]["x"], pts[0]["y"]) == (0.5, 0.5)
    d = Topology(data, spark=spark, **STAGE).to_dict()
    geoms = d["objects"]["data"]["geometries"]
    assert "coordinates" in geoms[1]


def test_extract_single_multilinestring(spark):
    # :315 (dict analog of the shapely MultiLineString) — 2 geoms
    data = {
        "foo": {
            "type": "MultiLineString",
            "coordinates": [[[0, 0], [1, 1]], [[-1, 0], [1, 0]]],
        }
    }
    assert lines_of(spark, data).count() == 2


def test_extract_single_multilinestring_list(spark):
    # :322 (list analog)
    data = [{
        "type": "MultiLineString",
        "coordinates": [[[0, 0], [1, 1]], [[-1, 0], [1, 0]]],
    }]
    assert lines_of(spark, data).count() == 2


def test_extract_list_org_data_untouched(spark):
    # :383 (dict-geometry analog of the shapely list) — input not mutated,
    # output objects carry arcs
    data = [
        {"type": "Polygon",
         "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]]},
        {"type": "Polygon",
         "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]]},
    ]
    snapshot = copy.deepcopy(data)
    d = Topology(data, spark=spark, **STAGE).to_dict()
    assert data == snapshot
    geoms = d["objects"]["data"]["geometries"]
    assert all("arcs" in g for g in geoms)


def test_extract_geojson_keep_index(spark):
    # :473 — a feature id is kept, a missing one gets the positional name
    data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "id": "custom_index",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
                },
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]],
                },
            },
        ],
    }
    d = Topology(data, spark=spark, **STAGE).to_dict()
    ids = {g["id"] for g in d["objects"]["data"]["geometries"]}
    assert ids == {"custom_index", "feature_1"}


def test_extract_geojson_keep_index_duplicates(spark):
    # :489 — duplicated feature ids raise IndexError
    feat = {
        "type": "Feature",
        "id": "duplicate_id",
        "geometry": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        },
    }
    data = {"type": "FeatureCollection", "features": [feat, copy.deepcopy(feat)]}
    with pytest.raises(IndexError):
        Topology(data, spark=spark, **STAGE)


# --------------------------------------------------------------- ledger

# 1:1 disposition of EVERY test in /root/reference/tests/test_extract.py —
# same discipline as test_join_parity_ref. "here:<name>" = ported in this
# file, "file:<path>" = pinned elsewhere, "skip:<reason>" = sandbox-
# impossible (GDAL / fiona / shapely / geopandas object inputs).
EXTRACT_LEDGER = {
    "test_extract_linestring": "here:test_extract_linestring_two_objects",
    "test_extract_multipolygon": "here:test_extract_multipolygon_hole_units_and_rings",
    "test_extract_empty_linestring": "here:test_extract_empty_linestring_arcs_none",
    "test_extract_invalid_polygon": "here:test_extract_invalid_polygon_dropped_valid_kept",
    "test_extract_multilinestring": "here:test_extract_multilinestring_three_parts",
    "test_extract_nested_geometrycollection": "here:test_extract_nested_geometrycollection",
    "test_extract_geometrycollection_polygon": "here:test_extract_geometrycollection_polygon",
    "test_extract_features": "here:test_extract_features",
    "test_extract_featurecollection": "here:test_extract_featurecollection",
    "test_extract_geojson_feat_col_geom_col":
        "file:test_fixture_parity.test_extract_feature_collection_fixture",
    "test_extract_geojson_feature_geom_col":
        "file:test_fixture_parity.test_extract_feature_fixture",
    "test_extract_geopandas_geoseries": "skip:geopandas GeoSeries input",
    "test_extract_shapely_geometrycollection": "skip:shapely object input",
    "test_extract_geo_interface_from_list":
        "here:test_extract_list_of_geometry_dicts",
    "test_extract_shapely_geo_interface_from_list": "skip:shapely object input",
    "test_extract_geomcol_multipolygon_polygon":
        "here:test_extract_geomcol_multipolygon_polygon_four_rings",
    "test_extract_geo_interface_shapefile": "skip:shapefile.Reader input",
    "test_extract_points": "here:test_extract_points",
    "test_extract_single_polygon":
        "here:test_extract_single_geometry_dict (dict analog)",
    "test_extract_single_linestring":
        "here:test_extract_single_geometry_dict (dict analog)",
    "test_extract_single_multilinestring":
        "here:test_extract_single_multilinestring (dict analog)",
    "test_extract_single_multilinestring_list":
        "here:test_extract_single_multilinestring_list (dict analog)",
    "test_extract_geopandas_geodataframe": "skip:geopandas GeoDataFrame input",
    "test_extract_invalid_dict_item":
        "here:test_extract_invalid_dict_item_yields_nothing",
    "test_extract_fiona_file": "skip:fiona/GDAL reader",
    "test_extract_fiona_file_gpkg": "skip:fiona/GDAL reader",
    "test_extract_dict_org_data_untouched":
        "here:test_extract_dict_org_data_untouched",
    "test_extract_list_org_data_untouched":
        "here:test_extract_list_org_data_untouched (dict analog)",
    "test_extract_gdf_org_data_untouched": "skip:geopandas GeoDataFrame input",
    "test_extract_shapely_org_data_untouched": "skip:shapely object input",
    "test_extract_shapefile_org_data_untouched": "skip:shapefile.Reader input",
    "test_extract_source_data_modify":
        "here:test_extract_featurecollection_org_data_untouched",
    "test_extract_keep_properties": "here:test_extract_keep_properties_nested",
    "test_extract_geojson_keep_index": "here:test_extract_geojson_keep_index",
    "test_extract_geojson_keep_index_duplicates":
        "here:test_extract_geojson_keep_index_duplicates",
    "test_extract_read_geojson_from_json_dict":
        "file:test_fixture_parity.test_extract_naturalearth_lowres_287_rings",
    "test_extract_read_multiple_gdf_object_name":
        "skip:geopandas GeoDataFrame input",
    "test_extract_read_multiple_gjson_object_name":
        "file:test_fixture_parity (geojson_1+2 multi-object)",
}


def test_extract_ledger_enumerates_reference_suite():
    """The ledger above must cover EXACTLY the reference's extract tests —
    a new reference test (or a typo here) fails this, so the skip-list can
    never silently rot."""
    import re

    with open("/root/reference/tests/test_extract.py") as f:
        ref_names = re.findall(r"^def (test_\w+)", f.read(), re.M)
    assert sorted(ref_names) == sorted(EXTRACT_LEDGER)
    # every ported row names a real test in this repo's suite
    here = {
        v.split(":", 1)[1].split(" ")[0]
        for v in EXTRACT_LEDGER.values()
        if v.startswith("here:")
    }
    import sys

    mod = sys.modules[__name__]
    for name in here:
        assert hasattr(mod, name), name
