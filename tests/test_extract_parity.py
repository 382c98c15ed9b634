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
