"""Parity against the reference's REAL GeoJSON fixtures.

The reference pins behavior on the files in
/root/reference/tests/files_geojson/ (plain JSON — readable without GDAL).
Each test mirrors a reference assertion 1:1:

- mesh2d cut canary 11010        -> reference tests/test_cut.py:72-78
- alb_grc shared-coords cut == 3 -> tests/test_cut.py:122-126
- alb_grc extract units == 3     -> tests/test_extract.py:329-337
- feature_collection extract     -> tests/test_extract.py:178-186
- feature extract                -> tests/test_extract.py:189-197
- naturalearth_lowres 287 rings  -> tests/test_extract.py:504-510
- geojson_1+2 multi-object       -> tests/test_extract.py:528-541
- naturalearth round-trip equality (to_geojson inverse stitch) — the
  geometry-equality discipline of tests/test_topology.py:42-89 applied to
  the largest real fixture.

The reference's bookkeeping_linestrings array (cut.py:229-259) is a padded
2D array: rows = extracted linestrings, cols = max split count, so
``.size == n_lines * max_parts_per_line``.
"""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from topojson_spark.operators.extract import extract, features_from_mapping
from topojson_spark.options import TopoOptions
from topojson_spark.topology import Topology

FIXTURES = "/root/reference/tests/files_geojson"

# stage-level reference tests use raw TopoOptions defaults
STAGE = dict(prequantize=False, winding_order=None)


def load(name: str) -> dict:
    with open(os.path.join(FIXTURES, name)) as f:
        return json.load(f)


def extract_lines(spark, data, **kw):
    opts = TopoOptions(**{**STAGE, **kw})
    feats = features_from_mapping(spark, data, opts)
    lines, points, features = extract(feats, opts, None)
    return lines


# ---------------------------------------------------------------- extract


def test_extract_feature_collection_fixture(spark):
    # tests/test_extract.py:178-186: 1 object, 3 geoms, 3 linestrings
    lines = extract_lines(spark, load("feature_collection.geojson"))
    rows = lines.select("object_name", "feature_seq", "unit_seq").collect()
    assert len(rows) == 3
    assert {r["object_name"] for r in rows} == {"data"}


def test_extract_feature_fixture(spark):
    # tests/test_extract.py:189-197: 3 geoms, 3 linestrings
    lines = extract_lines(spark, load("feature.geojson"))
    assert lines.count() == 3


def test_extract_alb_grc_units(spark):
    # tests/test_extract.py:329-337: 3 bookkeeping_geoms (ALB polygon +
    # GRC multipolygon of 2)
    lines = extract_lines(spark, load("naturalearth_alb_grc.geojson"))
    units = lines.select("feature_seq", "unit_seq").distinct().count()
    assert units == 3


def test_extract_naturalearth_lowres_287_rings(spark):
    # tests/test_extract.py:504-510
    lines = extract_lines(spark, load("naturalearth_lowres.geojson"))
    assert lines.count() == 287


def test_extract_multiple_objects_fixture(spark):
    # tests/test_extract.py:528-541: objects = features of both collections
    g1, g2 = load("geojson_1.json"), load("geojson_2.json")
    t = Topology(
        [g1, g2],
        spark=spark,
        object_name=["gjson_1", "gjson_2"],
        **STAGE,
    )
    feats = t.features.where(~F.col("invalid")).count()
    assert feats == len(g1["features"]) + len(g2["features"])
    objs = t.features.select("object_name").distinct().count()
    assert objs == 2


# ---------------------------------------------------------------- cut


def _bookkeeping_size(t: Topology) -> int:
    """rows * cols of the reference's padded bookkeeping_linestrings."""
    per_line = (
        t.arcs_cut.groupBy("feature_seq", "unit_seq", "ring_seq")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.max("n_parts").alias("max_parts"),
        )
        .collect()[0]
    )
    return int(per_line["n_lines"] * per_line["max_parts"])


def test_cut_mesh2d_canary_11010(spark):
    # tests/test_cut.py:72-78 — the perf/correctness canary: 2202 mesh
    # cells, junction-dense; padded bookkeeping array size must be 11010
    t = Topology(load("mesh2d.geojson"), spark=spark, **STAGE)
    assert _bookkeeping_size(t) == 11010


def test_cut_alb_grc_shared_coords_3(spark):
    # tests/test_cut.py:122-126: shared_coords=True finds no junctions in
    # this pair -> the 3 extracted rings survive uncut
    t = Topology(
        load("naturalearth_alb_grc.geojson"),
        spark=spark,
        shared_coords=True,
        **STAGE,
    )
    assert t.arcs_cut.count() == 3


# ---------------------------------------------------------------- roundtrip


def _drop_on_segment(pts: list) -> list:
    """Remove vertices lying on the chord of their neighbors (within the
    engine's ON_LINE_TOL): the cut stage inserts junction points on lines
    (as the reference's insert_coords_in_line does), which shapely
    ``equals`` treats as equal geometry — mirror that here."""
    arr = np.asarray(pts + [pts[0]], dtype=np.float64)
    keep = [True] * len(pts)
    for i in range(1, len(pts) + 1):
        a, b, c = arr[i - 1], arr[i % len(pts)], arr[(i + 1) % len(pts)]
        ab = c - a
        n = np.hypot(*ab)
        if n == 0:
            continue
        d = abs(ab[0] * (b[1] - a[1]) - ab[1] * (b[0] - a[0])) / n
        inseg = min(a[0], c[0]) - 1e-8 <= b[0] <= max(a[0], c[0]) + 1e-8 and \
            min(a[1], c[1]) - 1e-8 <= b[1] <= max(a[1], c[1]) + 1e-8
        if d < 1e-7 and inseg:
            keep[i % len(pts)] = False
    return [p for p, k in zip(pts, keep) if k]


def _norm_ring(coords) -> tuple:
    """Closed ring -> canonical tuple: drop closure, rotate to min vertex,
    orientation-normalized (shapely ``equals`` semantics: rotation and
    direction do not matter; on-segment vertices do not matter)."""
    pts = [tuple(p) for p in coords]
    if len(pts) > 1 and pts[0] == pts[-1]:
        pts = pts[:-1]
    pts = _drop_on_segment(pts)
    best = None
    for seq in (pts, pts[::-1]):
        m = min(range(len(seq)), key=lambda i: seq[i])
        rot = tuple(seq[m:] + seq[:m])
        if best is None or rot < best:
            best = rot
    return best


def _geom_rings(geom) -> list:
    gt = geom["type"]
    if gt == "Polygon":
        return [sorted(_norm_ring(r) for r in geom["coordinates"])]
    if gt == "MultiPolygon":
        return sorted(
            sorted(_norm_ring(r) for r in poly)
            for poly in geom["coordinates"]
        )
    raise AssertionError(f"unexpected type {gt}")


def test_roundtrip_naturalearth_lowres_geometry_equality(spark):
    """to_geojson must reproduce every input geometry exactly (prequantize
    off), up to ring rotation/direction — the discipline of the reference's
    filled-island round-trip tests applied to the 177-country fixture."""
    data = load("naturalearth_lowres.geojson")
    t = Topology(data, spark=spark, **STAGE)
    out = t.to_geojson()

    want = {}
    for ix, feat in enumerate(data["features"]):
        key = f"feature_{str(ix).zfill(3)}"
        want[key] = _geom_rings(feat["geometry"])

    got = {}
    for feat in out["features"]:
        got[str(feat["id"])] = _geom_rings(feat["geometry"])

    assert set(got) == set(want)
    n_bad = 0
    for k in want:
        if got[k] != want[k]:
            n_bad += 1
    assert n_bad == 0, f"{n_bad}/{len(want)} geometries differ after roundtrip"


def test_topology_geojson_duplicates_exact_ring(spark):
    # tests/test_topology.py:517-527 — p0's reconstructed ring after dedup
    # must be exactly POLYGON ((0 1, 0 0, 1 0, 2 0, 2 1, 1 1, 0 1)):
    # rotation to the junction, winding, and the shared-arc stitch are all
    # pinned by the exact coordinate sequence.
    data = {
        "abc": {
            "type": "Polygon",
            "coordinates": [
                [[0, 0], [0, 1], [1, 1], [2, 1], [2, 0], [1, 0], [0, 0]]
            ],
        },
        "def": {
            "type": "Polygon",
            "coordinates": [[[0, 1], [0, 2], [1, 2], [1, 1], [0, 1]]],
        },
        "ghi": {
            "type": "Polygon",
            "coordinates": [[[1, 0], [2, 0], [2, -1], [1, -1], [1, 0]]],
        },
    }
    t = Topology(data, spark=spark, prequantize=False)
    fc = t.to_geojson()
    by_id = {f["id"]: f for f in fc["features"]}
    ring = by_id["abc"]["geometry"]["coordinates"][0]
    assert ring == [
        [0.0, 1.0], [0.0, 0.0], [1.0, 0.0], [2.0, 0.0],
        [2.0, 1.0], [1.0, 1.0], [0.0, 1.0],
    ]


def test_topojson_from_file_naturalearth(spark):
    # tests/test_topology.py:540-546 — parse a TopoJSON document directly
    import json as _json

    with open(
        "/root/reference/tests/files_topojson/naturalearth.topojson"
    ) as f:
        data = _json.load(f)
    t = Topology(data, spark=spark)
    d = t.to_dict()
    assert len(d["objects"]) == 1
    assert len(d["arcs"]) == 9


def test_topojson_africa_reingest_toposimplify(spark):
    # tests/test_topology.py:551-560 — re-ingest the 173-arc africa
    # topojson and toposimplify; arc count is preserved (simplify never
    # drops arcs), every arc shrinks or keeps its vertex count, endpoints
    # survive (topology preserved)
    import json as _json

    import numpy as np

    with open(
        "/root/reference/tests/files_topojson/naturalearth_lowres_africa"
        ".topojson"
    ) as f:
        data = _json.load(f)
    t = Topology(data, spark=spark, object_name="data")
    before = {
        r["final_idx"]: r["coords"]
        for r in t.arcs.select("final_idx", "coords").collect()
    }
    t2 = t.toposimplify(1)
    after = {
        r["final_idx"]: r["coords"]
        for r in t2.arcs.select("final_idx", "coords").collect()
    }
    assert len(after) == len(before) == 173
    for i, c in after.items():
        b = before[i]
        assert len(c) <= len(b)
        assert c[:2] == b[:2] and c[-2:] == b[-2:]


# ------------------------------------------- exact output serialization


DUP_POLYGONS = {
    # tests/test_topology.py:517-519 (p0/p1/p2, shapely wkt -> plain dicts)
    "abc": {"type": "Polygon",
            "coordinates": [[[0, 0], [0, 1], [1, 1], [2, 1], [2, 0], [1, 0],
                             [0, 0]]]},
    "def": {"type": "Polygon",
            "coordinates": [[[0, 1], [0, 2], [1, 2], [1, 1], [0, 1]]]},
    "ghi": {"type": "Polygon",
            "coordinates": [[[1, 0], [2, 0], [2, -1], [1, -1], [1, 0]]]},
}


def test_topology_geojson_duplicates_exact_ring_rotation(spark):
    """tests/test_topology.py:516-526 pins the EXACT serialized ring of the
    first polygon after topology construction — rotation (fast_split ring
    re-rotation at the junction), stitch order and winding, byte-for-byte:

        p0_wkt == "POLYGON ((0 1, 0 0, 1 0, 2 0, 2 1, 1 1, 0 1))"

    The reference asserts via to_gdf()/wkt; the same coordinates come out
    of to_geojson (to_gdf is a GeoJSON read, topology.py:279-307)."""
    t = Topology(DUP_POLYGONS, spark=spark, prequantize=False)
    gj = t.to_geojson()
    by_id = {f["id"]: f for f in gj["features"]}
    assert by_id["abc"]["geometry"]["coordinates"] == [
        [[0, 1], [0, 0], [1, 0], [2, 0], [2, 1], [1, 1], [0, 1]]
    ]


def test_topoquantize_exact_delta_arcs(spark):
    """Shaped like tests/test_topology.py:530-536 (exact quantized+delta
    arc integers) on a GDAL-free fixture: every arc's serialized int values
    are pinned, and independently re-derived in-test with the reference's
    own formulas (ops.py:613-668 quantize: k = span/(Q-1), (xy-t)/k,
    numpy round half-to-even; ops.py:917-925 delta encoding)."""
    import numpy as np

    t = Topology(DUP_POLYGONS, spark=spark, prequantize=False).topoquantize(50)
    d = t.to_dict()
    assert d["transform"] == {
        "scale": [2 / 49, 3 / 49],
        "translate": [0.0, -1.0],
    }
    assert sorted(d["arcs"]) == sorted(
        [
            [[25, 33], [24, 0], [0, -17]],
            [[25, 16], [-25, 0], [0, 17]],
            [[0, 33], [0, 16], [25, 0], [0, -16]],
            [[25, 33], [-25, 0]],
            [[25, 16], [24, 0]],
            [[49, 16], [0, -16], [-24, 0], [0, 16]],
        ]
    )

    # independent re-derivation, reference formulas end-to-end
    unquant = Topology(DUP_POLYGONS, spark=spark, prequantize=False)
    raw = {
        r["final_idx"]: np.asarray(r["coords"], dtype=np.float64).reshape(-1, 2)
        for r in unquant.arcs.select("final_idx", "coords").collect()
    }
    kx, ky = 2 / 49, 3 / 49
    for i, arc in enumerate(d["arcs"]):
        q = np.round(
            (raw[i] - np.array([0.0, -1.0])) / np.array([kx, ky])
        ).astype(np.int64)
        # consecutive-dup removal after snapping (ops.py:659-666)
        keep = np.insert(np.abs(np.diff(q, axis=0)).sum(axis=1), 0, 1) != 0
        q = q[keep]
        delta = q - np.roll(q, 1, axis=0)
        delta[0] = q[0]
        assert delta.tolist() == arc, f"arc {i}"
