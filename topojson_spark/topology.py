"""Topology orchestrator: the user-facing entry point.

Mirrors the reference's ``topojson.Topology`` surface
(/root/reference/topojson/core/topology.py) while executing every stage as
chained DataFrame transformations:

    documents/dict -> extract -> join -> cut -> dedup -> hashmap -> outputs

Stage boundaries are the natural checkpoint/resume points (north rule);
``write_tables``/``read_tables`` persist and re-ingest the arc store the way
the reference re-ingests TopoJSON dicts (topology.py:127-132).
"""

from __future__ import annotations

import copy
import json
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions import kernels as K
from .operators.cut import cut_arcs_wide, cut_stage
from .operators.dedup import dedup_stage
from .operators.extract import (
    extract,
    features_from_documents,
    features_from_mapping,
)
from .operators.hashmap import hashmap_stage
from .operators.join import join_stage
from .options import TopoOptions
from .plans.pin import pin_truncate

COORDS_T = T.ArrayType(T.DoubleType())  # flat interleaved x,y


def _decode_props(props) -> dict:
    """Properties ride the pipeline as map<string,string> with json-encoded
    VALUES (extract._parse_batch), so arbitrary JSON property values —
    nested dicts, numbers, bools (reference issue 151) — round-trip. Legacy
    plain-string values (non-JSON) pass through unchanged."""
    out = {}
    for k, v in (props or {}).items():
        try:
            out[k] = json.loads(v)
        except (json.JSONDecodeError, TypeError):
            out[k] = v
    return out


class Topology:
    """Compute a topology over documents (DataFrame) or driver-side mappings.

    Parameters mirror the reference's Topology kwargs; ``data`` may be:
    - a DataFrame with (doc_id, spans): the interleaved corpus path,
    - a DataFrame with FEATURES_IN_SCHEMA columns,
    - a dict / list / GeoJSON FeatureCollection (driver-side parity path).
    """

    def __init__(
        self,
        data,
        spark: Optional[SparkSession] = None,
        options: Optional[TopoOptions] = None,
        **kwargs,
    ):
        self.options = options or TopoOptions(**kwargs)
        if isinstance(data, str):
            # TopoJSON or GeoJSON text (extract.py:650-674 _extract_string)
            data = json.loads(data)
        if (
            isinstance(data, dict)
            and str(data.get("type", "")).casefold() == "topology"
        ):
            # re-ingest path (topology.py:127-132 + utils.py:359-385):
            # skip extract->hashmap entirely; load the arc store directly
            if spark is None:
                raise ValueError("driver-side input requires a SparkSession")
            self.spark = spark
            self._init_from_topojson(data)
            self._apply_option_postops()
            return
        if isinstance(data, DataFrame):
            self.spark = data.sparkSession
            if "spans" in data.columns:
                features_in = features_from_documents(
                    data, self.options.object_names()[0]
                )
            else:
                # fail fast with the two accepted shapes — a wrong table
                # otherwise dies deep inside an executor UDF batch
                if "geom_json" not in data.columns:
                    raise ValueError(
                        "DataFrame input must be either the interleaved "
                        "corpus documents(doc_id, spans:array<struct<kind,"
                        "text,media_ref,offset>>) (BASELINE input_hint) or "
                        "a features table with a geom_json column; got "
                        f"columns {data.columns}"
                    )
                features_in = data
                if "skip_validate" not in features_in.columns:
                    features_in = features_in.withColumn(
                        "skip_validate", F.lit(False)
                    )
        else:
            if spark is None:
                raise ValueError("driver-side input requires a SparkSession")
            self.spark = spark
            features_in = features_from_mapping(spark, data, self.options)

        self._run(features_in)
        self._apply_option_postops()

    def _apply_option_postops(self) -> None:
        """Construction-time post-ops from options (reference ``_topo``,
        topology.py:597-629): ``toposimplify`` then ``topoquantize`` when
        set as constructor kwargs — same order and same
        double-application semantics as the reference (toposimplify's own
        requantize already uses the topoquantize factor when present, and
        ``_topo`` then runs topoquantize again)."""
        new = self
        tf = self.options.toposimplify_factor
        if tf:
            new = new.toposimplify(tf)
        qf = self.options.topoquant_factor
        if qf:
            new = new.topoquantize(qf)
        if new is not self:
            self.__dict__.update(new.__dict__)

    # ------------------------------------------------------------ re-ingest

    def _init_from_topojson(self, data: dict) -> None:
        """Load a finished topology: arcs stored internally in absolute
        (grid) coordinates; delta re-encoding happens at output time."""
        self.transform = data.get("transform")
        arcs_rows = []
        for i, arc in enumerate(data.get("arcs", [])):
            coords = np.asarray(arc, dtype=np.float64)
            if self.transform is not None:
                coords = coords.cumsum(axis=0)  # delta-decode, keep grid ints
            arcs_rows.append((i, False, K.flat(coords)))
        self.arcs = self.spark.createDataFrame(
            arcs_rows,
            "final_idx long, is_shared boolean, coords array<double>",
        )
        if "bbox" in data:
            self.bbox = tuple(data["bbox"])
        elif self.transform is not None and arcs_rows:
            sc, tr = self.transform["scale"], self.transform["translate"]
            all_pts = np.vstack(
                [K.as_np(a[2]) * np.asarray(sc) + np.asarray(tr)
                 for a in arcs_rows]
            )
            self.bbox = (
                float(all_pts[:, 0].min()), float(all_pts[:, 1].min()),
                float(all_pts[:, 0].max()), float(all_pts[:, 1].max()),
            )
        else:
            self.bbox = None
        self._preresolved_objects = copy.deepcopy(data["objects"])
        self.points = self.spark.createDataFrame(
            [],
            "feature_seq long, fkey string, object_name string, "
            "unit_seq int, pt_seq int, x double, y double",
        )
        self.junctions = None
        self.features = None
        self.refs = None
        self.resolved = None

    # ------------------------------------------------------------ pipeline

    def _run(self, features_in: DataFrame) -> None:
        from .plans.pin import durable_stage_checkpoints

        opts = self.options
        if opts.checkpoint_dir and not features_in.isStreaming:
            # long-job mode: every stage boundary becomes a parquet
            # write/read under checkpoint_dir — survivable across executor
            # AND driver loss, resumable mid-pipeline (checkpoint_resume)
            with durable_stage_checkpoints(
                opts.checkpoint_dir, opts.checkpoint_resume
            ):
                self._run_stages(features_in)
        else:
            self._run_stages(features_in)

    def _run_stages(self, features_in: DataFrame) -> None:
        from .plans.metrics import StageMetrics

        self._preresolved_objects = None
        self.metrics = StageMetrics()
        opts = self.options
        # extract lineage-truncates its unified parse internally: each
        # document's JSON is parsed exactly once across all downstream actions
        lines0, points0, features = extract(features_in, opts, self.metrics)
        self.features = features

        lines, points, bbox, transform, junctions, cell_hint = join_stage(
            lines0, points0, opts
        )
        self.bbox = bbox
        self.transform = transform
        self.points = points.cache()
        if junctions is not None:
            junctions = self.metrics.observe("junctions", junctions)
        self.junctions = junctions.cache() if junctions is not None else None

        cut_bbox = bbox
        if transform is not None and bbox is not None:
            q = opts.quant_factor
            cut_bbox = (0.0, 0.0, q - 1, q - 1)
        parts, line_refs = cut_stage(
            lines, self.junctions, opts.shared_coords, bbox=cut_bbox,
            cell=cell_hint,
        )
        # lazy wide view (reference-shaped cut output) for inspection/tests;
        # the scale path below never materializes coords per feature row
        self.arcs_cut = cut_arcs_wide(parts, line_refs)

        arcs_final, refs_final, pmap = dedup_stage(parts, line_refs)
        # arcs_final arrives pinned from dedup_stage (one store shared by
        # the pmap summary join and every export); observing ABOVE that
        # boundary is required — a CollectMetrics below a checkpoint never
        # publishes — and re-pinning here would double-persist the store
        self.arcs = self.metrics.observe(
            "arcs",
            arcs_final,
            F.count(F.lit(1)).alias("n_arcs"),
            F.sum(F.col("is_shared").cast("int")).alias("n_shared"),
        )
        self.refs = refs_final  # lazy expanded view (export/tests)
        self.resolved = hashmap_stage(line_refs, pmap, self.arcs, opts).cache()

    def stage_metrics(self) -> dict:
        """Per-stage counters observed during the run (north rule): keys
        ``extract`` (n_lines/n_points/n_features/n_invalid), ``junctions``
        (n_rows), ``arcs`` (n_arcs/n_shared). Metrics appear once the stage
        has actually executed — piggybacked on the run's own actions, never
        an extra job."""
        m = getattr(self, "metrics", None)
        return m.snapshot() if m is not None else {}

    # ------------------------------------------------------------ outputs

    def arcs_list(self) -> list:
        """Final arc coordinate arrays ordered by dense arc index;
        delta-encoded ints when prequantized (topology.py:597-606)."""
        rows = self.arcs.select("final_idx", "coords").orderBy("final_idx").collect()
        out = []
        for r in rows:
            c = K.as_np(r["coords"])
            if self.transform is not None:
                out.append(K.delta_encode(c).tolist())
            else:
                out.append(c.tolist())
        return out

    def junction_points(self) -> list:
        if self.junctions is None:
            return []
        return sorted(
            (float(r["jx"]), float(r["jy"])) for r in self.junctions.collect()
        )

    def _collect_resolved(self):
        res = {}
        for r in self.resolved.collect():
            res.setdefault((r["fkey"], r["unit_seq"]), {})[r["ring_seq"]] = [
                int(v) for v in r["signed_arcs"]
            ]
        return res

    def _collect_points(self):
        pts = {}
        for r in self.points.collect():
            pts[(r["fkey"], r["unit_seq"])] = [float(r["x"]), float(r["y"])]
        return pts

    def _instantiate(self, node, fkey, resolved, points):
        """Fill a feature template with resolved arcs (hashmap.py:380-439)."""
        if node is None:
            return None
        gtype = node.get("type")
        if gtype == "GeometryCollection":
            return {
                "type": gtype,
                "geometries": [
                    self._instantiate(g, fkey, resolved, points)
                    for g in node.get("geometries", [])
                ],
            }

        def unit_rings(u):
            rings = resolved.get((fkey, u), {})
            return [rings[k] for k in sorted(rings)]

        if gtype == "LineString":
            units = node.get("arcs")
            if units is None:
                return {"type": gtype, "arcs": None}
            return {"type": gtype, "arcs": unit_rings(units[0])[0]}
        if gtype == "MultiLineString":
            return {
                "type": gtype,
                "arcs": [unit_rings(u)[0] for u in node.get("arcs", [])],
            }
        if gtype == "Polygon":
            units = node.get("arcs")
            if units is None:
                return {"type": gtype, "arcs": None}
            return {"type": gtype, "arcs": unit_rings(units[0])}
        if gtype == "MultiPolygon":
            return {
                "type": gtype,
                "arcs": [unit_rings(u) for u in node.get("arcs", [])],
            }
        if gtype == "Point":
            refs = node.get("coordinates")
            if not refs:
                return {"type": gtype, "coordinates": None}
            return {"type": gtype, "coordinates": points[(fkey, refs[0])]}
        if gtype == "MultiPoint":
            return {
                "type": gtype,
                "coordinates": [
                    points[(fkey, u)] for u in node.get("coordinates", [])
                ],
            }
        return node

    def to_dict(self, options: bool = False) -> dict:
        """Assemble the reference-shaped topology dict (driver-side; the
        output topology is small relative to the input corpus — at full
        scale use write_tables instead).

        ``options=True`` includes the 12-field reference option surface
        under ``"options"`` (reference topology.py:151-167 serializes
        ``vars(self.options)``); engine-level scale knobs are
        deliberately excluded — they are not part of the reference
        contract."""
        if getattr(self, "_preresolved_objects", None) is not None:
            out = {
                "type": "Topology",
                "objects": copy.deepcopy(self._preresolved_objects),
                "bbox": tuple(self.bbox) if self.bbox else (),
                "arcs": self.arcs_list(),
            }
            if self.transform is not None:
                out["transform"] = copy.deepcopy(self.transform)
            if options:
                out["options"] = self._options_dict()
            return out
        resolved = self._collect_resolved()
        points = self._collect_points()
        feats = sorted(
            self.features.where(~F.col("invalid")).collect(),
            key=lambda r: r["feature_seq"],
        )
        names = self.options.object_names()
        multi = len(names) > 1
        # id offsets per object (hashmap.py:105-110)
        offsets = {}
        if multi:
            for r in feats:
                offsets.setdefault(r["object_name"], r["feature_seq"])

        objects = {}
        for name in names:
            geoms = []
            for r in feats:
                if r["object_name"] != name:
                    continue
                template = json.loads(r["template"]) if r["template"] else None
                feat = self._instantiate(template, r["fkey"], resolved, points)
                if feat is None:
                    continue
                if multi:
                    feat["id"] = int(r["feature_seq"]) - int(offsets[name])
                else:
                    key = r["fkey"]
                    feat["id"] = int(key) if key.lstrip("-").isdigit() else key
                feat["properties"] = _decode_props(r["properties"])
                geoms.append(feat)
            objects[name] = {"type": "GeometryCollection", "geometries": geoms}

        out = {
            "type": "Topology",
            "objects": objects,
            "bbox": tuple(self.bbox) if self.bbox else (),
            "arcs": self.arcs_list(),
        }
        if self.transform is not None:
            out["transform"] = copy.deepcopy(self.transform)
        if options:
            out["options"] = self._options_dict()
        return out

    def _options_dict(self) -> dict:
        """The 12 reference-parity option fields, reference kwarg order."""
        o = self.options
        return {
            k: getattr(o, k)
            for k in (
                "topology", "prequantize", "topoquantize", "presimplify",
                "toposimplify", "shared_coords", "prevent_oversimplify",
                "simplify_with", "simplify_algorithm", "winding_order",
                "object_name", "ignore_index",
            )
        }

    def to_json(
        self,
        fp: Optional[str] = None,
        pretty: bool = False,
        options: bool = False,
    ) -> str:
        topo = self.to_dict(options=options)
        txt = json.dumps(topo, indent=2 if pretty else None,
                         separators=None if pretty else (",", ":"))
        if fp:
            with open(fp, "w") as f:
                f.write(txt)
        return txt

    # -------------------------------------------------------- geojson export

    def to_geojson(
        self,
        winding_order: str = "CCW_CW",
        decimals=None,
        validate=False,
    ) -> dict:
        """Inverse query: stitch arcs back into feature coordinates —
        utils.py:500-558 + the coordinate decoder utils.py:105-133.

        ``validate`` picks the output gate (documented DIVERGENCE from the
        reference, made explicit per mode):

        - ``False`` (default): no gate, like the reference default.
        - ``True`` / ``"strict"``: assert structural validity of the RAW
          output (closed >= 4-position non-zero-area rings, finite coords,
          >= 2-position lines). STRICTER than the reference: its gate
          asserts on ``shape(geom).buffer(0)`` OUTPUT (utils.py:549-553),
          i.e. on a repaired copy that is valid-by-construction, so it
          practically never raises; this mode raises on degenerate rings
          the reference silently passes.
        - ``"reference"``: emulate the reference gate's observable
          behavior — only defects buffer(0) cannot repair (non-finite
          coordinates) raise; degenerate rings pass silently."""
        topo = self.to_dict()
        return topology_to_geojson(topo, winding_order=winding_order,
                                   decimals=decimals, validate=validate)

    @property
    def __geo_interface__(self) -> dict:
        """GeoJSON-protocol view (reference topology.py:145-149): the
        protocol is consumed by shapely/geopandas and expects a
        GeoJSON-shaped mapping, so this returns the stitched
        FeatureCollection (serialize_as_geojson in the reference), not the
        Topology dict."""
        return self.to_geojson()

    def to_svg(self, separate: bool = False):
        """Plain-SVG rendering of the arc store (the reference's to_svg,
        topology.py:169-179 + utils.py:414-465, displays shapely SVG; this
        engine has no shapely/display dependency, so it returns the SVG
        document as a string — one polyline path per arc, y-flipped to
        screen coordinates). ``separate=True`` returns one SVG per arc."""
        topo = self.to_dict()
        transform = topo.get("transform")
        arcs = []
        for arc in topo["arcs"]:
            c = np.asarray(arc, dtype=np.float64)
            if transform is not None:
                c = K.delta_decode(
                    c, transform["scale"], transform["translate"]
                )
            arcs.append(c)
        if not arcs:
            return "<svg xmlns='http://www.w3.org/2000/svg'/>"
        allpts = np.vstack(arcs)
        x0, y0 = allpts.min(axis=0)
        x1, y1 = allpts.max(axis=0)
        w, h = max(x1 - x0, 1e-12), max(y1 - y0, 1e-12)

        def svg_doc(arc_list):
            paths = []
            for c in arc_list:
                pts = " ".join(
                    f"{p[0]:.6g},{(y1 - (p[1] - y0)):.6g}" for p in c
                )
                paths.append(
                    f'<polyline points="{pts}" fill="none" '
                    'stroke="#1f77b4" stroke-width="'
                    f"{max(w, h) / 200:.6g}" '"/>'
                )
            return (
                "<svg xmlns='http://www.w3.org/2000/svg' "
                f"viewBox='{x0:.6g} {y0:.6g} {w:.6g} {h:.6g}'>"
                + "".join(paths)
                + "</svg>"
            )

        if separate:
            return [svg_doc([c]) for c in arcs]
        return svg_doc(arcs)

    def to_gdf(self, crs=None, winding_order: str = "CCW_CW"):
        """GeoDataFrame export (topology.py:279-317). Requires geopandas;
        raises ImportError where it isn't installed (this sandbox)."""
        import geopandas  # noqa: F401  (absent here; gated by design)
        from shapely.geometry import shape

        fc = self.to_geojson(winding_order=winding_order)
        gdf = geopandas.GeoDataFrame(
            {
                "id": [f["id"] for f in fc["features"]],
                "geometry": [shape(f["geometry"]) for f in fc["features"]],
            },
            crs=crs,
        )
        return gdf

    def to_alt(self, color=None):
        """Altair chart export (topology.py:319-343). Requires altair."""
        import altair as alt  # noqa: F401  (absent here; gated by design)

        data = alt.InlineData(
            values=self.to_dict(),
            format=alt.DataFormat(feature=self.options.object_names()[0],
                                  type="topojson"),
        )
        chart = alt.Chart(data).mark_geoshape(filled=False)
        if color:
            chart = chart.encode(color=color)
        return chart.project(type="identity", reflectY=True)

    def to_widget(
        self,
        slider_toposimplify=None,
        slider_topoquantize=None,
    ):
        """Interactive ipywidgets sliders driving the toposimplify /
        topoquantize post-ops through the Altair export (reference
        topology.py:345-373 + utils.serialize_as_ipywidgets). Requires
        ipywidgets + altair. Deviation: the reference flips
        ``simplify_with`` to the `simplification` package for slider
        latency; this engine has one (numpy) kernel, so only the
        algorithm toggle is exposed."""
        from ipywidgets import fixed, interact
        import ipywidgets as widgets

        style = {"description_width": "initial"}
        # fresh defaults per call (a mutable default dict would be shared
        # across every Topology in the process)
        ts = slider_toposimplify or {
            "min": 0, "max": 10, "step": 0.01, "value": 0.01,
        }
        tq = slider_topoquantize or {
            "min": 1, "max": 6, "step": 1, "value": 1e5, "base": 10,
        }
        alg = widgets.RadioButtons(
            options=[("Douglas-Peucker", "dp"), ("Visvalingam-Whyatt", "vw")],
            value="vw",
            description="Simplify algorithm",
            disabled=False,
            style=style,
        )
        eps = widgets.FloatSlider(
            min=ts["min"], max=ts["max"], step=ts["step"], value=ts["value"],
            description="Toposimplify Factor", style=style,
        )
        qnt = widgets.FloatLogSlider(
            min=tq["min"], max=tq["max"], step=tq["step"], value=tq["value"],
            base=tq["base"], description="Topoquantize Factor", style=style,
        )
        return interact(
            _widget_refresh, epsilon=eps, quant=qnt, algo=alg,
            topo=fixed(self),
        )

    # -------------------------------------------------------- post-ops

    def toposimplify(self, epsilon: float) -> "Topology":
        """Simplify arcs after topology construction (topology.py:434-552):
        dequantize if needed -> DP/VW per arc -> requantize."""
        algorithm = self.options.simplify_algorithm
        transform = self.transform
        scale = transform["scale"] if transform else None
        translate = transform["translate"] if transform else None

        @F.pandas_udf(COORDS_T)
        def simp(coords: pd.Series) -> pd.Series:
            def run(c):
                arr = K.as_np(c)
                if transform is not None:
                    arr = arr * np.asarray(scale) + np.asarray(translate)
                return K.flat(K.simplify_coords(arr, epsilon, algorithm))

            return coords.map(run)

        new = copy.copy(self)
        new.arcs = self.arcs.withColumn("coords", simp("coords"))
        if transform is not None:
            q = (
                self.options.topoquant_factor
                or self.options.quant_factor
                or 1e5
            )
            # the simp UDF dequantized the arcs inline; points are still in
            # the old grid — move them to world space too before the
            # transform is dropped, or the requantize below would treat
            # grid integers as world coordinates
            sx, sy = scale
            tx, ty = translate
            new.points = self.points.withColumn(
                "x", F.col("x") * F.lit(sx) + F.lit(tx)
            ).withColumn("y", F.col("y") * F.lit(sy) + F.lit(ty))
            new.transform = None
            new = new.topoquantize(q, _already_dequantized=True)
        return new

    def topoquantize(
        self, quant_factor: float, _already_dequantized: bool = False
    ) -> "Topology":
        """(Re-)quantize arcs after construction (topology.py:375-432)."""
        new = copy.copy(self)
        arcs = self.arcs if _already_dequantized or self.transform is None else None
        if arcs is None:
            scale = self.transform["scale"]
            translate = self.transform["translate"]

            @F.pandas_udf(COORDS_T)
            def deq(coords: pd.Series) -> pd.Series:
                return coords.map(
                    lambda c: K.flat(
                        K.as_np(c) * np.asarray(scale) + np.asarray(translate)
                    )
                )

            arcs = self.arcs.withColumn("coords", deq("coords"))

        # points participate too: dequantize them out of the OLD transform
        # (they are stored in the construction grid when prequantized) so
        # the new bbox spans arcs AND points, reference topology.py:375-432
        pts = self.points
        if self.transform is not None:
            osx, osy = self.transform["scale"]
            otx, oty = self.transform["translate"]
            pts = pts.withColumn(
                "x", F.col("x") * F.lit(osx) + F.lit(otx)
            ).withColumn("y", F.col("y") * F.lit(osy) + F.lit(oty))

        # new bbox over dequantized arcs (flat interleaved coords) + points
        from .operators.join import _XS, _YS

        xs = F.expr(_XS)
        ys = F.expr(_YS)
        row = arcs.agg(
            F.min(F.array_min(xs)).alias("x0"),
            F.min(F.array_min(ys)).alias("y0"),
            F.max(F.array_max(xs)).alias("x1"),
            F.max(F.array_max(ys)).alias("y1"),
        ).collect()[0]
        prow = pts.agg(
            F.min("x").alias("x0"), F.min("y").alias("y0"),
            F.max("x").alias("x1"), F.max("y").alias("y1"),
        ).collect()[0]

        def _fold(fn, a, b, fallback):
            vals = [v for v in (a, b) if v is not None]
            return fn(vals) if vals else fallback

        fb = self.bbox or (0.0, 0.0, 0.0, 0.0)
        bbox = (
            _fold(min, row["x0"], prow["x0"], fb[0]),
            _fold(min, row["y0"], prow["y0"], fb[1]),
            _fold(max, row["x1"], prow["x1"], fb[2]),
            _fold(max, row["y1"], prow["y1"], fb[3]),
        )
        # the quantization GRID is the topology's existing bbox (reference
        # topology.py:418 quantizes against output["bbox"] BEFORE updating
        # it) — recomputing it from dequantized arcs shifts the grid by the
        # float error of dequantize and moves pinned arc integers by one.
        # After toposimplify (_already_dequantized) the reference DOES grid
        # on the recomputed bounds of the simplified arcs (:517-520).
        grid = bbox if (_already_dequantized or self.bbox is None) else tuple(
            self.bbox
        )
        kx, ky = K.quantize_factors(grid, quant_factor)

        @F.pandas_udf(COORDS_T)
        def quant(coords: pd.Series) -> pd.Series:
            return coords.map(
                lambda c: K.flat(
                    K.quantize_coords(K.as_np(c), grid, quant_factor)
                )
            )

        from .operators.join import quantize_points

        new.arcs = arcs.withColumn("coords", quant("coords"))
        new.points = quantize_points(pts, grid, quant_factor)
        new.bbox = bbox
        new.transform = {"scale": [kx, ky], "translate": [grid[0], grid[1]]}
        return new

    # -------------------------------------------------------- persistence

    def write_tables(self, path: str) -> None:
        """Checkpoint the five output tables plus per-partition manifests
        (partition_id, n_rows, content_xor) so a resumed job can verify
        integrity before trusting a checkpoint (resume path, north rule)."""
        from .plans.metrics import write_with_manifest

        write_with_manifest(self.arcs, f"{path}/arcs")
        write_with_manifest(self.refs, f"{path}/refs")
        write_with_manifest(self.resolved, f"{path}/resolved")
        write_with_manifest(self.features, f"{path}/features")
        write_with_manifest(self.points, f"{path}/points")
        meta = {
            "bbox": self.bbox,
            "transform": self.transform,
            "object_name": self.options.object_names(),
            "stage_metrics": self.stage_metrics(),
        }
        self.spark.createDataFrame(
            [(json.dumps(meta),)], "meta string"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def read_tables(
    spark: SparkSession, path: str, verify: bool = False, **kwargs
) -> Topology:
    """Resume a topology from checkpointed tables without recomputation —
    the analog of re-ingesting a TopoJSON dict (topology.py:127-132).
    ``verify=True`` recomputes each table's order-insensitive content hash
    and compares it against the manifest written at checkpoint time."""
    if verify:
        from .plans.metrics import verify_manifest

        for t in ("arcs", "refs", "resolved", "features", "points"):
            if not verify_manifest(spark, f"{path}/{t}"):
                raise ValueError(
                    f"checkpoint table {path}/{t} does not match its "
                    "written manifest (lost or corrupted partitions)"
                )
    topo = Topology.__new__(Topology)
    topo.spark = spark
    topo.options = TopoOptions(**kwargs)
    topo.arcs = spark.read.parquet(f"{path}/arcs")
    topo.refs = spark.read.parquet(f"{path}/refs")
    topo.resolved = spark.read.parquet(f"{path}/resolved")
    topo.features = spark.read.parquet(f"{path}/features")
    topo.points = spark.read.parquet(f"{path}/points")
    meta = json.loads(spark.read.parquet(f"{path}/meta").collect()[0]["meta"])
    topo.bbox = tuple(meta["bbox"]) if meta["bbox"] else None
    topo.transform = meta["transform"]
    topo.junctions = None
    return topo


# ---------------------------------------------------------------- geojson


def _decode_arc(tp_arcs: list, arc: int, transform) -> np.ndarray:
    coords = np.asarray(tp_arcs[arc if arc >= 0 else ~arc], dtype=np.float64)
    if transform is not None:
        coords = K.delta_decode(
            coords, transform["scale"], transform["translate"]
        )
    return coords[:: 1 if arc >= 0 else -1]


def _stitch(arcs, tp_arcs, gtype, transform):
    """utils.py:105-133 ``coordinates``: concatenate signed arcs, dropping
    each join vertex (the ``i > 0`` slice), with ring-closure repair."""
    if len(arcs) and isinstance(arcs[0], int):
        parts = []
        for i, arc in enumerate(arcs):
            c = _decode_arc(tp_arcs, arc, transform)
            parts.append(c[i > 0 :])
        coords = np.concatenate(parts).tolist()
        if gtype in ("Polygon", "MultiPolygon"):
            if len(coords) < 3:
                coords.extend([coords[0]])
        elif gtype in ("LineString", "MultiLineString"):
            if len(coords) < 2:
                coords.extend([coords[0]])
        return coords
    return [_stitch(a, tp_arcs, gtype, transform) for a in arcs]


def _geom_from_topo(obj, tp_arcs, transform, point_transform=None):
    """``transform`` decodes arcs (None when tp_arcs are pre-decoded);
    ``point_transform`` always reflects the topology's transform — points
    are stored quantized regardless of how the arcs were handed in."""
    if point_transform is None:
        point_transform = transform
    gtype = obj["type"]
    if gtype == "GeometryCollection":
        return {
            "type": gtype,
            "geometries": [
                _geom_from_topo(g, tp_arcs, transform, point_transform)
                for g in obj["geometries"]
            ],
        }
    if gtype in ("Point", "MultiPoint"):
        coords = obj.get("coordinates")
        if coords is not None and point_transform is not None:
            sc = point_transform["scale"]
            tr = point_transform["translate"]
            arr = np.asarray(coords, dtype=np.float64)
            arr = arr * np.asarray(sc) + np.asarray(tr)
            coords = arr.tolist()
        return {"type": gtype, "coordinates": coords}
    arcs = obj.get("arcs")
    if arcs is None:
        return {"type": gtype, "coordinates": None}
    return {
        "type": gtype,
        "coordinates": _stitch(arcs, tp_arcs, gtype, transform),
    }


def _enforce_winding(geom: dict, order: str) -> dict:
    want_ccw_ext = order == "CCW_CW"

    def fix_poly(rings):
        out = []
        for i, ring in enumerate(rings):
            arr = np.asarray(ring, dtype=np.float64)
            ccw = want_ccw_ext if i == 0 else not want_ccw_ext
            out.append(K.orient_ring(arr, ccw).tolist())
        return out

    gtype = geom["type"]
    if gtype == "Polygon" and geom.get("coordinates"):
        geom["coordinates"] = fix_poly(geom["coordinates"])
    elif gtype == "MultiPolygon" and geom.get("coordinates"):
        geom["coordinates"] = [fix_poly(p) for p in geom["coordinates"]]
    elif gtype == "GeometryCollection":
        geom["geometries"] = [
            _enforce_winding(g, order) for g in geom["geometries"]
        ]
    return geom


def _assert_valid_geometry(geom: dict, mode: str = "strict") -> None:
    """validate gate of serialize_as_geojson (utils.py:549-553).

    The reference computes ``shape(geom).buffer(0)``, asserts the REPAIR is
    valid, then serializes the ORIGINAL geometry either way — i.e. its
    validate option is an assertion gate, not a repair, and because the
    repair is valid-by-construction it practically never raises. Two modes
    (see Topology.to_geojson):

    - ``"strict"``: assert the checkable invariants of the RAW output:
      finite coordinates, rings closed with >= 4 positions and non-zero
      area, lines with >= 2 positions. Stricter than the reference.
    - ``"reference"``: only non-finite coordinates raise (the one defect
      buffer(0) cannot repair), matching the reference gate's observable
      behavior without shapely.

    Raises AssertionError (matching the reference's failure mode) naming
    the defect."""

    def rings(g):
        t, c = g.get("type"), g.get("coordinates")
        if t == "Polygon":
            return c
        if t == "MultiPolygon":
            return [r for poly in c for r in poly]
        return []

    def lines(g):
        t, c = g.get("type"), g.get("coordinates")
        if t == "LineString":
            return [c]
        if t == "MultiLineString":
            return c
        return []

    if geom.get("type") == "GeometryCollection":
        for g in geom.get("geometries", []):
            _assert_valid_geometry(g, mode)
        return
    coords = geom.get("coordinates")
    if coords is not None:
        flat = np.asarray(
            [p for p in _walk_positions(coords)], dtype=np.float64
        )
        assert flat.size == 0 or np.isfinite(flat).all(), (
            "geometry has non-finite coordinates"
        )
    if mode == "reference":
        return
    for ring in rings(geom):
        assert len(ring) >= 4, f"ring has {len(ring)} positions (< 4)"
        assert ring[0] == ring[-1], "ring is not closed"
        area = K.signed_area(np.asarray(ring, dtype=np.float64))
        assert area != 0.0, "ring has zero area"
    for line in lines(geom):
        assert len(line) >= 2, f"linestring has {len(line)} positions (< 2)"


def _walk_positions(coords):
    if coords and isinstance(coords[0], (int, float)):
        yield coords
        return
    for c in coords:
        yield from _walk_positions(c)


def topology_to_geojson(
    topo: dict, objectname: str = None, winding_order: str = "CCW_CW",
    decimals=None, validate=False,
) -> dict:
    """Port of serialize_as_geojson (utils.py:500-558)."""
    transform = topo.get("transform")
    tp_arcs = topo["arcs"]
    names = list(topo["objects"].keys())
    objectname = objectname or names[0]
    if objectname not in topo["objects"]:
        raise LookupError(
            f"'{objectname}' is not an object name in your topojson file"
        )
    features = topo["objects"][objectname]["geometries"]
    # rounding happens at the ARC level on the dequantized arrays, exactly
    # like the reference (utils.py:526-529: np.around(np_arcs) before the
    # stitch; point coordinates are NOT rounded) — feature-level rounding
    # would also break on ragged GeometryCollection nesting
    arc_transform = transform
    if decimals is not None and isinstance(decimals, int):
        decoded = []
        for a in tp_arcs:
            arr = np.asarray(a, dtype=np.float64)
            if transform is not None:
                arr = K.delta_decode(
                    arr, transform["scale"], transform["translate"]
                )
            decoded.append(np.around(arr, decimals=decimals).tolist())
        tp_arcs = decoded
        arc_transform = None
    fc = {"type": "FeatureCollection", "features": []}
    for index, feature in enumerate(features):
        geom = _geom_from_topo(feature, tp_arcs, arc_transform,
                               point_transform=transform)
        geom = _enforce_winding(geom, winding_order)
        if validate:
            _assert_valid_geometry(
                geom, "reference" if validate == "reference" else "strict"
            )
        fc["features"].append(
            {
                "id": feature.get("id", index),
                "type": "Feature",
                "properties": feature.get("properties", {}),
                "geometry": geom,
            }
        )
    return fc


def _widget_refresh(epsilon, quant, algo, topo):
    """Slider callback for Topology.to_widget (reference
    utils.py toposimpquant): re-simplify, re-quantize, re-chart.
    Deviation: TopoOptions is frozen here, so the algorithm toggle goes
    through dataclasses.replace on a shallow copy — the source topology
    is never mutated (the reference mutates options in place)."""
    import dataclasses

    new = copy.copy(topo)
    new.options = dataclasses.replace(
        topo.options, simplify_algorithm=algo
    )
    return new.toposimplify(epsilon).topoquantize(quant).to_alt()
