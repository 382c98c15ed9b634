"""Join stage: bbox -> (presimplify) -> (prequantize) -> junction detection.

Re-expresses /root/reference/topojson/core/join.py:91-231 Spark-first:

- bbox: one global min/max aggregation (ops.py:417-477) with per-line
  vectorized pre-aggregation so nothing explodes.
- prequantize: per-line Arrow UDF applying the exact grid math of
  ops.py:613-671, transform broadcast as literals.
- junctions, coords-connected (``shared_coords=True``, join.py:178-198):
  the sequential neighbor-dict trick reduces to: *a vertex is a junction iff
  it occurs with >= 2 distinct sorted neighbor pairs*. That is one
  explode + two-level groupBy on quantized vertex keys — the north rule's
  "global groupBy on quantized coordinate hashes". Entirely JVM-side.
- junctions, path-connected (``shared_coords=False``, the reference default,
  join.py:200-226): envelope-overlap candidate pairs via a grid-cell
  self-join (replacing the STRtree of ops.py:575-610), per-pair collinear
  overlap + linemerge in an Arrow UDF (replacing shapely
  intersection/linemerge), junctions = endpoints of merged pieces.
"""

from __future__ import annotations

import math
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels as K
from ..options import TopoOptions

COORDS_T = T.ArrayType(T.DoubleType())  # flat interleaved x,y

# flat-coords SQL helpers: x / y streams of an interleaved coords column
_XS = ("if(size(coords) >= 2, transform(sequence(0, (size(coords) div 2) - 1), "
       "i -> coords[2*i]), array())")
_YS = ("if(size(coords) >= 2, transform(sequence(0, (size(coords) div 2) - 1), "
       "i -> coords[2*i + 1]), array())")


# ------------------------------------------------------------ bbox


def compute_bbox_stats(
    lines: DataFrame, points: DataFrame
) -> Tuple[Optional[Tuple], Optional[float]]:
    """One global aggregation returning ((minx, miny, maxx, maxy),
    cell_hint).

    cell_hint is the mean line-envelope extent (max of width/height means).
    The grid-cell self-joins (candidate pairs, junction->line assignment)
    want cells sized like a typical line's envelope: a fixed span/K grid
    degrades to a quadratic per-cell join once the corpus grows denser than
    K^2 cells, while envelope-sized cells keep each line on O(1) cells and
    each cell's occupancy proportional to true local overlap. Same single
    pass as the bbox (ops.py:417-444 analog) — no extra job. Envelopes were
    fused into the extract parse (extract.line_annotations), so this scans
    four doubles per line instead of re-walking the coords arrays.
    """
    lb = lines.select(
        F.col("x0").alias("minx"),
        F.col("y0").alias("miny"),
        F.col("x1").alias("maxx"),
        F.col("y1").alias("maxy"),
    )
    pb = points.select(
        F.col("x").alias("minx"),
        F.col("y").alias("miny"),
        F.col("x").alias("maxx"),
        F.col("y").alias("maxy"),
    )
    row = (
        lb.unionByName(pb)
        .agg(
            F.min("minx").alias("minx"),
            F.min("miny").alias("miny"),
            F.max("maxx").alias("maxx"),
            F.max("maxy").alias("maxy"),
            F.avg(F.col("maxx") - F.col("minx")).alias("avg_w"),
            F.avg(F.col("maxy") - F.col("miny")).alias("avg_h"),
        )
        .collect()[0]
    )
    if row["minx"] is None:
        return None, None
    bbox = (
        float(row["minx"]),
        float(row["miny"]),
        float(row["maxx"]),
        float(row["maxy"]),
    )
    avg = (float(row["avg_w"] or 0.0), float(row["avg_h"] or 0.0))
    if max(avg) <= 0:
        return bbox, None
    return bbox, avg


def compute_bbox(lines: DataFrame, points: DataFrame) -> Optional[Tuple]:
    """(minx, miny, maxx, maxy) over all line vertices and points."""
    return compute_bbox_stats(lines, points)[0]


# ------------------------------------------------------------ per-line UDFs

_ANNOT_T = T.StructType(
    [
        T.StructField("coords", T.ArrayType(T.DoubleType())),
        T.StructField("ldig", T.BinaryType()),
        T.StructField("pdig", T.BinaryType()),
        T.StructField("x0", T.DoubleType()),
        T.StructField("y0", T.DoubleType()),
        T.StructField("x1", T.DoubleType()),
        T.StructField("y1", T.DoubleType()),
    ]
)

_ANNOT_COLS = ["coords", "ldig", "pdig", "x0", "y0", "x1", "y1"]


def _rewrite_lines(lines: DataFrame, fn) -> DataFrame:
    """Apply ``fn: (k,2) array, is_ring -> (k,2) array`` to every line and
    recompute the fused annotations (digests + envelope) in the SAME Arrow
    pass — coord-rewriting stages never add an extra full-corpus round trip
    (extract.line_annotations rationale)."""
    from .extract import line_annotations

    @F.pandas_udf(_ANNOT_T)
    def rw(coords: pd.Series, is_ring: pd.Series) -> pd.DataFrame:
        rows = [
            line_annotations(fn(K.as_np(c), bool(r)), bool(r))
            for c, r in zip(coords, is_ring)
        ]
        return pd.DataFrame(rows, columns=_ANNOT_COLS)

    other = [c for c in lines.columns if c not in _ANNOT_COLS]
    return lines.select(
        *other, rw("coords", "is_ring").alias("_a")
    ).select(*other, *[F.col(f"_a.{c}").alias(c) for c in _ANNOT_COLS])


def presimplify_lines(lines: DataFrame, factor: float, algorithm: str) -> DataFrame:
    """join.py:129-144: simplify raw linestrings before junction detection."""
    return _rewrite_lines(
        lines, lambda a, _r: K.simplify_coords(a, factor, algorithm)
    )


def quantize_lines(lines: DataFrame, bbox: Tuple, quant_factor: float) -> DataFrame:
    """ops.py:641-668 per line; the transform is derived from the global
    bbox (already aggregated) so this stage is narrow."""
    return _rewrite_lines(
        lines, lambda a, _r: K.quantize_coords(a, bbox, quant_factor)
    )


def quantize_points(points: DataFrame, bbox: Tuple, quant_factor: float) -> DataFrame:
    kx, ky = K.quantize_factors(bbox, quant_factor)
    return points.withColumn(
        "x", F.round((F.col("x") - F.lit(bbox[0])) / F.lit(kx)).cast("double")
    ).withColumn(
        "y", F.round((F.col("y") - F.lit(bbox[1])) / F.lit(ky)).cast("double")
    )


# ------------------------------------------------------------ junctions


def junctions_shared_coords(lines: DataFrame) -> DataFrame:
    """Coords-connected junction detection as a pure DataFrame plan.

    Per vertex i the neighbor pair is (coords[i-1], coords[i+1]) with the
    reference's exact wraparound (join.py:188-196: Python negative indexing
    gives prev=last for i=0; next=first for the last vertex). Junction iff
    the vertex has >= 2 distinct sorted neighbor pairs globally.

    Vertex identity is EXACT coordinate equality (the reference keys its
    neighbor dict on raw float tuples, join.py:185-198) — naturalearth-style
    data has near-identical border vertices differing at 1e-13 that must NOT
    merge; Spark groupBy on doubles matches Python dict-key semantics
    (bit equality with -0.0 == 0.0 normalization).
    Returns distinct (jx, jy).
    """
    verts = lines.select(
        F.explode(
            F.expr(
                """
                transform(sequence(0, (size(coords) div 2) - 1), i -> struct(
                  coords[2*i] as x, coords[2*i + 1] as y,
                  array_sort(array(
                    struct(
                      coords[2 * if(i = 0, (size(coords) div 2) - 1, i - 1)] as nx,
                      coords[2 * if(i = 0, (size(coords) div 2) - 1, i - 1) + 1] as ny
                    ),
                    struct(
                      coords[2 * if(i = (size(coords) div 2) - 1, 0, i + 1)] as nx,
                      coords[2 * if(i = (size(coords) div 2) - 1, 0, i + 1) + 1] as ny
                    )
                  )) as neigh
                ))
                """
            )
        ).alias("v")
    ).select("v.x", "v.y", "v.neigh")

    # two-level aggregation: distinct (vertex, neigh) first (map-side
    # combinable), then count distinct neighbor sets per vertex
    per_pair = verts.groupBy("x", "y", "neigh").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_pair.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select(F.col("x").alias("jx"), F.col("y").alias("jy"))
    )


def _with_bbox_cells(lines: DataFrame, bbox: Tuple, cell: float) -> DataFrame:
    """Attach exploded envelope cell ids covering each line's bbox.
    ``lines`` must carry the fused envelope columns (x0, y0, x1, y1)."""
    bx, by = bbox[0], bbox[1]
    return (
        lines.withColumn("_cx0", F.floor((F.col("x0") - F.lit(bx)) / F.lit(cell)))
        .withColumn("_cx1", F.floor((F.col("x1") - F.lit(bx)) / F.lit(cell)))
        .withColumn("_cy0", F.floor((F.col("y0") - F.lit(by)) / F.lit(cell)))
        .withColumn("_cy1", F.floor((F.col("y1") - F.lit(by)) / F.lit(cell)))
        .withColumn("cx", F.explode(F.sequence("_cx0", "_cx1")))
        .withColumn("cy", F.explode(F.sequence("_cy0", "_cy1")))
        .drop("_cx0", "_cx1", "_cy0", "_cy1")
    )


def candidate_pairs(
    lines: DataFrame, bbox: Tuple, cell: Optional[float] = None
) -> DataFrame:
    """Envelope-overlap line pairs (lid_a < lid_b) via grid-cell self-join —
    the distributed replacement for select_unique_combs (ops.py:575-610).

    ``lines`` must carry a unique long ``lid``, ``coords`` and the fused
    envelope columns (x0, y0, x1, y1); the returned frame has
    (lid_a, coords_a, lid_b, coords_b), each pair exactly once.
    """
    if cell is None:
        span = max(bbox[2] - bbox[0], bbox[3] - bbox[1])
        cell = span / 64 if span > 0 else 1.0
    else:
        # never let envelope-sized cells shatter a tiny-extent corpus into
        # a huge cell universe relative to the bbox
        span = max(bbox[2] - bbox[0], bbox[3] - bbox[1])
        if span > 0:
            cell = max(cell, span / 4096)
    # pair enumeration and dedup run over *ids + envelopes only*; the heavy
    # coordinate arrays are joined in once per surviving pair (shuffle bytes
    # stay proportional to the pair list, not to pair-multiplicity x coords).
    # Envelopes come from the fused extract annotations.
    env = lines.select("lid", "x0", "y0", "x1", "y1")
    cells = (
        env.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.floor((F.col("x0") - F.lit(bbox[0])) / F.lit(cell)),
                    F.floor((F.col("x1") - F.lit(bbox[0])) / F.lit(cell)),
                )
            ),
        )
        .withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.floor((F.col("y0") - F.lit(bbox[1])) / F.lit(cell)),
                    F.floor((F.col("y1") - F.lit(bbox[1])) / F.lit(cell)),
                )
            ),
        )
        .select("lid", "cx", "cy", "x0", "y0", "x1", "y1")
    )
    a = cells.select(
        F.col("lid").alias("lid_a"),
        "cx", "cy",
        F.col("x0").alias("ax0"), F.col("y0").alias("ay0"),
        F.col("x1").alias("ax1"), F.col("y1").alias("ay1"),
    )
    b = cells.select(
        F.col("lid").alias("lid_b"),
        "cx", "cy",
        F.col("x0").alias("bx0"), F.col("y0").alias("by0"),
        F.col("x1").alias("bx1"), F.col("y1").alias("by1"),
    )
    pair_ids = (
        a.join(b, on=["cx", "cy"])
        .where(F.col("lid_a") < F.col("lid_b"))
        .where(
            (F.col("ax0") <= F.col("bx1"))
            & (F.col("bx0") <= F.col("ax1"))
            & (F.col("ay0") <= F.col("by1"))
            & (F.col("by0") <= F.col("ay1"))
        )
        .select("lid_a", "lid_b")
        .dropDuplicates(["lid_a", "lid_b"])
    )
    coords_a = lines.select(
        F.col("lid").alias("lid_a"), F.col("coords").alias("coords_a")
    )
    coords_b = lines.select(
        F.col("lid").alias("lid_b"), F.col("coords").alias("coords_b")
    )
    return pair_ids.join(coords_a, on="lid_a").join(coords_b, on="lid_b")


def junctions_path_connected(
    lines_with_lid: DataFrame, bbox: Tuple, cell: Optional[float] = None
) -> DataFrame:
    """Path-connected junction detection (join.py:200-226).

    Candidate pairs -> drop path-equal pairs (shapely ``equals`` analog via
    normalize_path) -> collinear overlap pieces -> linemerge -> endpoints.
    Returns distinct (jx, jy). The path digest (``pdig``) and envelopes were
    fused into the extract parse — no coordinate-carrying UDF pass here.
    """
    # semantics-preserving pre-dedup (join.py:207-210 skips equal pairs, and
    # path-equal copies produce identical intersections with every other
    # line) — one representative per path digest, so exact-duplicate-heavy
    # corpora don't blow up the candidate self-join quadratically
    reps = lines_with_lid.groupBy("pdig").agg(
        F.min("lid").alias("lid"),
        F.first("coords").alias("coords"),
        F.first("x0").alias("x0"),
        F.first("y0").alias("y0"),
        F.first("x1").alias("x1"),
        F.first("y1").alias("y1"),
    )
    # distinct representatives guarantee pdig_a != pdig_b for every pair
    pairs = candidate_pairs(
        reps.select("lid", "coords", "x0", "y0", "x1", "y1"), bbox, cell=cell
    ).select("coords_a", "coords_b")

    out_schema = T.StructType(
        [T.StructField("jx", T.DoubleType()), T.StructField("jy", T.DoubleType())]
    )

    def find(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs, ys = [], []
            for a, b in zip(pdf["coords_a"], pdf["coords_b"]):
                segs = K.line_pair_shared_segments(
                    K.as_np(a),
                    K.as_np(b),
                )
                for chain in K.merge_segments_to_chains(segs):
                    xs.extend((chain[0][0], chain[-1][0]))
                    ys.extend((chain[0][1], chain[-1][1]))
            yield pd.DataFrame({"jx": xs, "jy": ys})

    raw = pairs.mapInPandas(find, schema=out_schema)
    # exact-equality dedup (the reference keeps set() of raw float tuples,
    # join.py:219-226); chain endpoints are copies of input vertices, so
    # bit-exact equality is the right merge key
    return raw.dropDuplicates(["jx", "jy"])


# ------------------------------------------------------------ stage API


def join_stage(
    lines: DataFrame,
    points: DataFrame,
    options: TopoOptions,
):
    """Returns (lines, points, bbox, transform, junctions_df_or_None,
    cell_hint). cell_hint is the typical line-envelope extent in the
    pipeline's working coordinate space (quantized grid units when
    prequantizing) — consumed by every downstream grid-cell join."""
    if options.presimplify_factor:
        lines = presimplify_lines(
            lines, options.presimplify_factor, options.simplify_algorithm
        )

    bbox, avg_wh = compute_bbox_stats(lines, points)
    transform = None
    cell = None
    if avg_wh is not None:
        cell = max(avg_wh)
    if bbox is not None and options.quant_factor:
        kx, ky = K.quantize_factors(bbox, options.quant_factor)
        transform = {"scale": [kx, ky], "translate": [bbox[0], bbox[1]]}
        lines = quantize_lines(lines, bbox, options.quant_factor)
        points = quantize_points(points, bbox, options.quant_factor)
        if avg_wh is not None:
            cell = max(
                avg_wh[0] / kx if kx else 0.0, avg_wh[1] / ky if ky else 0.0
            ) or None

    junctions = None
    if options.topology and bbox is not None:
        if options.shared_coords:
            junctions = junctions_shared_coords(lines)
        else:
            qbbox = bbox
            if transform is not None:
                # lines are now in quantized grid space
                q = options.quant_factor
                qbbox = (0.0, 0.0, q - 1, q - 1)
            lines_lid = lines.withColumn(
                "lid",
                F.xxhash64(
                    F.col("feature_seq"), F.col("unit_seq"), F.col("ring_seq")
                ),
            )
            junctions = junctions_path_connected(lines_lid, qbbox, cell=cell)

    return lines, points, bbox, transform, junctions, cell
