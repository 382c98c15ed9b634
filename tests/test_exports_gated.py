"""Contract tests for the import-gated exports (to_gdf / to_alt).

geopandas and altair are absent in this sandbox BY DESIGN (SURVEY §2.8);
the exports gate on import. These tests pin the two things that can still
rot without the libraries installed:

1. the ImportError surfaces cleanly (no partial side effects), and
2. the GLUE — field extraction, argument plumbing, chained-call protocol —
   is correct, verified against minimal fake modules injected into
   sys.modules that record exactly what the real libraries would receive.

Reference behavior: topojson/core/topology.py:279-343 (to_gdf builds a
GeoDataFrame from the GeoJSON features; to_alt feeds to_dict() to an
InlineData topojson feed and projects identity/reflectY).
"""

import sys
import types

import pytest

from topojson_spark.topology import Topology

DATA = {
    "abc": {
        "type": "Polygon",
        "coordinates": [[[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]]],
    },
    "def": {
        "type": "Polygon",
        "coordinates": [[[2, 0], [4, 0], [4, 2], [2, 2], [2, 0]]],
    },
}


# function-scoped on purpose: conftest's autouse _release_engine_pins
# drops every pinned stage block after each test, so a module-scoped
# Topology would lose its localCheckpoint blocks before the second test
# runs (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND) — release_pins documents the
# pins as "not recomputable afterwards"
@pytest.fixture
def topo(spark):
    return Topology(DATA, spark=spark, prequantize=False)


def test_to_gdf_raises_importerror_without_geopandas(topo):
    assert "geopandas" not in sys.modules
    with pytest.raises(ImportError):
        topo.to_gdf()


def test_to_alt_raises_importerror_without_altair(topo):
    assert "altair" not in sys.modules
    with pytest.raises(ImportError):
        topo.to_alt()


def test_to_gdf_glue_with_fake_geopandas(topo, monkeypatch):
    captured = {}

    class FakeGDF:
        def __init__(self, data, crs=None):
            captured["data"] = data
            captured["crs"] = crs

    fake_gpd = types.ModuleType("geopandas")
    fake_gpd.GeoDataFrame = FakeGDF

    fake_shapely = types.ModuleType("shapely")
    fake_geometry = types.ModuleType("shapely.geometry")
    fake_geometry.shape = lambda geom: ("SHAPE", geom)
    fake_shapely.geometry = fake_geometry

    monkeypatch.setitem(sys.modules, "geopandas", fake_gpd)
    monkeypatch.setitem(sys.modules, "shapely", fake_shapely)
    monkeypatch.setitem(sys.modules, "shapely.geometry", fake_geometry)

    gdf = topo.to_gdf(crs="EPSG:4326")
    assert isinstance(gdf, FakeGDF)
    assert captured["crs"] == "EPSG:4326"

    fc = topo.to_geojson()
    assert captured["data"]["id"] == [f["id"] for f in fc["features"]]
    geoms = captured["data"]["geometry"]
    assert [g[0] for g in geoms] == ["SHAPE"] * len(fc["features"])
    assert [g[1] for g in geoms] == [f["geometry"] for f in fc["features"]]


def test_to_alt_glue_with_fake_altair(topo, monkeypatch):
    calls = {}

    class FakeInlineData:
        def __init__(self, values, format):
            calls["values"] = values
            calls["format"] = format

    class FakeDataFormat:
        def __init__(self, feature, type):
            calls["feature"] = feature
            calls["type"] = type

    class FakeChart:
        def __init__(self, data):
            calls["chart_data"] = data

        def mark_geoshape(self, filled):
            calls["filled"] = filled
            return self

        def encode(self, color=None):
            calls["color"] = color
            return self

        def project(self, type, reflectY):
            calls["project"] = (type, reflectY)
            return self

    fake_alt = types.ModuleType("altair")
    fake_alt.InlineData = FakeInlineData
    fake_alt.DataFormat = FakeDataFormat
    fake_alt.Chart = FakeChart
    monkeypatch.setitem(sys.modules, "altair", fake_alt)

    chart = topo.to_alt(color="properties.x:N")
    assert isinstance(chart, FakeChart)
    # the chart's feed is the topology dict itself, declared as topojson
    assert calls["values"] == topo.to_dict()
    assert calls["type"] == "topojson"
    assert calls["feature"] == topo.options.object_names()[0]
    assert calls["filled"] is False
    assert calls["color"] == "properties.x:N"
    # reference projects identity with Y reflection (screen coords)
    assert calls["project"] == ("identity", True)


def test_to_widget_raises_importerror_without_ipywidgets(topo):
    assert "ipywidgets" not in sys.modules
    with pytest.raises(ImportError):
        topo.to_widget()


def test_to_widget_glue_with_fake_ipywidgets(topo, monkeypatch):
    """Widget glue: slider specs reach the widgets, interact receives the
    refresh callback + fixed topo, and the callback itself drives the
    toposimplify -> topoquantize -> to_alt chain (fake altair)."""
    calls = {}

    class _W:  # base fake widget: records ctor kwargs by class name
        def __init__(self, **kw):
            calls[type(self).__name__] = kw

    class FloatSlider(_W):
        pass

    class FloatLogSlider(_W):
        pass

    class RadioButtons(_W):
        pass

    def interact(func, **kw):
        calls["interact"] = (func, kw)
        return "INTERACT"

    def fixed(v):
        return ("FIXED", v)

    fake_w = types.ModuleType("ipywidgets")
    fake_w.FloatSlider = FloatSlider
    fake_w.FloatLogSlider = FloatLogSlider
    fake_w.RadioButtons = RadioButtons
    fake_w.interact = interact
    fake_w.fixed = fixed
    monkeypatch.setitem(sys.modules, "ipywidgets", fake_w)

    out = topo.to_widget(
        slider_toposimplify={"min": 0, "max": 2, "step": 0.5, "value": 1.0},
        slider_topoquantize={
            "min": 1, "max": 5, "step": 1, "value": 1e4, "base": 10,
        },
    )
    assert out == "INTERACT"
    assert calls["FloatSlider"]["max"] == 2
    assert calls["FloatSlider"]["value"] == 1.0
    assert calls["FloatLogSlider"]["base"] == 10
    assert calls["FloatLogSlider"]["value"] == 1e4
    # reference defaults the toggle to Visvalingam-Whyatt
    assert calls["RadioButtons"]["value"] == "vw"
    func, kw = calls["interact"]
    assert kw["topo"] == ("FIXED", topo)
    assert isinstance(kw["epsilon"], FloatSlider)
    assert isinstance(kw["quant"], FloatLogSlider)
    assert isinstance(kw["algo"], RadioButtons)

    # the callback drives the real post-ops through a fake altair chart
    class FakeChart:
        def __init__(self, data):
            pass

        def mark_geoshape(self, filled):
            return self

        def project(self, type, reflectY):
            calls["projected"] = True
            return self

    fake_alt = types.ModuleType("altair")
    fake_alt.InlineData = lambda values, format: None
    fake_alt.DataFormat = lambda feature, type: None
    fake_alt.Chart = FakeChart
    monkeypatch.setitem(sys.modules, "altair", fake_alt)

    from topojson_spark.topology import _widget_refresh

    chart = _widget_refresh(
        epsilon=0.5, quant=1e4, algo="vw", topo=topo
    )
    assert isinstance(chart, FakeChart) and calls.get("projected")
    # the source topology is never mutated by a slider move (frozen
    # options; deviation from the reference's in-place toggle, which
    # would have flipped this to "vw")
    assert topo.options.simplify_algorithm == "dp"
