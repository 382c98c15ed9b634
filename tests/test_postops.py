"""Post-topology transforms: toposimplify / topoquantize / presimplify,
plus extract bookkeeping parity."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from topojson_spark.topology import Topology

STAGE = dict(prequantize=False, winding_order=None)


def test_topoquantize(spark):
    data = {
        "line": {
            "type": "LineString",
            "coordinates": [[0, 0], [10, 10], [20, 0]],
        }
    }
    t = Topology(data, spark=spark, prequantize=False)
    tq = t.topoquantize(1e4)
    d = tq.to_dict()
    assert "transform" in d
    kx = d["transform"]["scale"][0]
    assert kx == pytest.approx(20 / 9999)
    # delta-encoded integer arcs
    arc = d["arcs"][0]
    assert arc[0] == [0, 0]
    assert all(float(v).is_integer() for pt in arc for v in pt)


def test_toposimplify(spark):
    # a wiggly line collapses to its endpoints under a big epsilon
    coords = [[float(i), 0.001 * ((-1) ** i)] for i in range(10)]
    coords[0][1] = 0.0
    coords[-1][1] = 0.0
    data = {"w": {"type": "LineString", "coordinates": coords}}
    t = Topology(data, spark=spark, prequantize=False)
    ts = t.toposimplify(0.1)
    d = ts.to_dict()
    assert len(d["arcs"][0]) == 2


def test_presimplify(spark):
    coords = [[float(i), 0.001 * ((-1) ** i)] for i in range(10)]
    data = {"w": {"type": "LineString", "coordinates": coords}}
    t = Topology(data, spark=spark, prequantize=False, presimplify=0.1)
    d = t.to_dict()
    assert len(d["arcs"][0]) == 2


def test_extract_bookkeeping_multipolygon(spark):
    # reference tests/test_extract.py:23-41: bookkeeping_geoms [[0,1],[2],[3]]
    data = {
        "foo": {
            "type": "MultiPolygon",
            "coordinates": [
                [
                    [[0, 0], [20, 0], [10, 20], [0, 0]],
                    [[3, 2], [10, 16], [17, 2], [3, 2]],
                ],
                [[[6, 4], [14, 4], [10, 12], [6, 4]]],
            ],
        },
        "bar": {
            "type": "Polygon",
            "coordinates": [[[17, 2], [3, 2], [10, 16], [17, 2]]],
        },
    }
    from topojson_spark.operators.extract import extract, features_from_mapping
    from topojson_spark.options import TopoOptions

    opts = TopoOptions(**STAGE)
    lines, points, feats = extract(
        features_from_mapping(spark, data, opts), opts
    )
    rows = sorted(
        (r["fkey"], r["unit_seq"], r["ring_seq"]) for r in lines.collect()
    )
    # foo: unit 0 = poly with hole (rings 0, 1), unit 1 = island poly;
    # bar: unit 0
    assert rows == [
        ("bar", 0, 0),
        ("foo", 0, 0),
        ("foo", 0, 1),
        ("foo", 1, 0),
    ]


def test_extract_winding_normalization(spark):
    # CW_CCW: exterior clockwise, holes counterclockwise (ops.py:793-838)
    data = {
        "p": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],  # CCW exterior
                [[1, 1], [1, 2], [2, 2], [2, 1], [1, 1]],  # CW hole
            ],
        }
    }
    from topojson_spark.functions import kernels as K
    from topojson_spark.operators.extract import extract, features_from_mapping
    from topojson_spark.options import TopoOptions

    opts = TopoOptions(prequantize=False, winding_order="CW_CCW")
    lines, _, _ = extract(features_from_mapping(spark, data, opts), opts)
    by_ring = {r["ring_seq"]: r["coords"] for r in lines.collect()}
    assert not K.is_ccw(np.array(by_ring[0]).reshape(-1, 2))  # exterior -> CW
    assert K.is_ccw(np.array(by_ring[1]).reshape(-1, 2))  # hole -> CCW


def test_ignore_index_and_featurecollection(spark):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "id": "alpha",
                "geometry": {"type": "Point", "coordinates": [1, 2]},
                "properties": {"name": "a"},
            },
            {
                "id": "beta",
                "geometry": {"type": "Point", "coordinates": [3, 4]},
                "properties": {"name": "b"},
            },
        ],
    }
    t = Topology(fc, spark=spark, prequantize=False)
    ids = {g["id"] for g in t.to_dict()["objects"]["data"]["geometries"]}
    assert ids == {"alpha", "beta"}

    t2 = Topology(fc, spark=spark, prequantize=False, ignore_index=True)
    ids2 = {g["id"] for g in t2.to_dict()["objects"]["data"]["geometries"]}
    assert ids2 == {"feature_0", "feature_1"}


def test_duplicate_feature_ids_raise(spark):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {"id": "x", "geometry": {"type": "Point", "coordinates": [1, 2]},
             "properties": {}},
            {"id": "x", "geometry": {"type": "Point", "coordinates": [3, 4]},
             "properties": {}},
        ],
    }
    with pytest.raises(IndexError):
        Topology(fc, spark=spark, prequantize=False)


def test_topojson_reingest_roundtrip(spark):
    # entry point 2 (reference topology.py:127-132): a finished topology is
    # valid input; pipeline is skipped and outputs are identical
    data = {
        "abc": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        },
        "def": {
            "type": "Polygon",
            "coordinates": [[[1, 0], [2, 0], [2, 1], [1, 1], [1, 0]]],
        },
    }
    t1 = Topology(data, spark=spark)
    j = t1.to_json()
    t2 = Topology(j, spark=spark)
    d1, d2 = t1.to_dict(), t2.to_dict()
    assert d1["arcs"] == d2["arcs"]
    assert d1["objects"] == d2["objects"]
    assert d1["transform"] == d2["transform"]
    # and the geojson export from the re-ingested topology still stitches
    fc = t2.to_geojson()
    assert len(fc["features"]) == 2


def test_to_geojson_validate(spark):
    """validate=True is the reference's assertion gate
    (utils.py:549-553: buffer(0) + assert, original geometry serialized
    either way): valid output passes, degenerate output raises."""
    import numpy as np
    import pytest

    from topojson_spark.topology import (
        Topology,
        _assert_valid_geometry,
        topology_to_geojson,
    )

    data = {
        "a": {
            "type": "Polygon",
            "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
        }
    }
    t = Topology(data, spark=spark, prequantize=False)
    fc = t.to_geojson(validate=True)
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 1

    with pytest.raises(AssertionError, match="not closed"):
        _assert_valid_geometry(
            {"type": "Polygon",
             "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1]]]}
        )
    with pytest.raises(AssertionError, match="zero area"):
        _assert_valid_geometry(
            {"type": "Polygon",
             "coordinates": [[[0, 0], [1, 0], [0, 0], [0, 0]]]}
        )
    with pytest.raises(AssertionError, match="non-finite"):
        _assert_valid_geometry(
            {"type": "LineString",
             "coordinates": [[0, 0], [float("nan"), 1]]}
        )


def test_to_geojson_validate_reference_mode(spark):
    """validate="reference" emulates the reference gate's OBSERVABLE
    behavior (utils.py:549-553 asserts on the buffer(0) REPAIR, which is
    valid-by-construction): degenerate rings pass silently, non-finite
    coordinates still raise. validate="strict"/True raises on both."""
    import pytest

    from topojson_spark.topology import _assert_valid_geometry

    degenerate = {
        "type": "Polygon",
        "coordinates": [[[0, 0], [1, 0], [0, 0], [0, 0]]],
    }
    _assert_valid_geometry(degenerate, mode="reference")  # passes
    with pytest.raises(AssertionError, match="zero area"):
        _assert_valid_geometry(degenerate, mode="strict")
    nonfinite = {
        "type": "LineString",
        "coordinates": [[0, 0], [float("inf"), 1]],
    }
    with pytest.raises(AssertionError, match="non-finite"):
        _assert_valid_geometry(nonfinite, mode="reference")
