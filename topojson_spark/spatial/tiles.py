"""Raster <-> vector tile assignment (north rule; no reference counterpart).

A *tile* is a cell of the index grid at zoom z (2^z x 2^z over the bbox).

- ``assign_arcs_to_tiles``: vector -> tile. Every arc lands in each tile its
  segments touch (segment-bbox cover, conservative). This is the shard key
  for emitting one quantized/delta-encoded topology per tile at scale.
- ``rasterize_points``: vector -> raster. Per-tile point counts/aggregates
  (a plain groupBy — pure codegen).
- ``raster_to_cells``: raster -> vector. Threshold a per-tile raster back
  into cell polygons (the polygonize seed; cells are the polygons).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import cells as C


def _tile_bounds_cols(z: int, bbox: Tuple):
    n = 1 << z
    w = (bbox[2] - bbox[0]) or 1.0
    h = (bbox[3] - bbox[1]) or 1.0
    return n, w, h


def assign_arcs_to_tiles(arcs: DataFrame, bbox: Tuple, zoom: int) -> DataFrame:
    """arcs(arc_id, coords) -> (arc_id, tile_x, tile_y, tile_id), one row per
    touched tile. Cover = per-segment bbox tiles, unioned per arc — exact for
    axis-aligned lattice data, conservative otherwise."""
    n, w, h = _tile_bounds_cols(zoom, bbox)
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(n - 1))  # noqa: E731
    # arcs carry FLAT interleaved coords (the engine wire format)
    segs = arcs.select(
        "arc_id",
        F.expr(
            "explode(transform(sequence(0, (size(coords) div 2) - 2), "
            "i -> struct(coords[2*i] as ax, coords[2*i + 1] as ay, "
            "coords[2*i + 2] as bx, coords[2*i + 3] as by)))"
        ).alias("seg"),
    ).select(
        "arc_id",
        F.least(F.col("seg.ax"), F.col("seg.bx")).alias("x0"),
        F.greatest(F.col("seg.ax"), F.col("seg.bx")).alias("x1"),
        F.least(F.col("seg.ay"), F.col("seg.by")).alias("y0"),
        F.greatest(F.col("seg.ay"), F.col("seg.by")).alias("y1"),
    )
    tiles = (
        segs.withColumn(
            "tx0", clamp(F.floor((F.col("x0") - F.lit(bbox[0])) / F.lit(w) * n).cast("long"))
        )
        .withColumn(
            "tx1", clamp(F.floor((F.col("x1") - F.lit(bbox[0])) / F.lit(w) * n).cast("long"))
        )
        .withColumn(
            "ty0", clamp(F.floor((F.col("y0") - F.lit(bbox[1])) / F.lit(h) * n).cast("long"))
        )
        .withColumn(
            "ty1", clamp(F.floor((F.col("y1") - F.lit(bbox[1])) / F.lit(h) * n).cast("long"))
        )
        .withColumn("tile_x", F.explode(F.sequence("tx0", "tx1")))
        .withColumn("tile_y", F.explode(F.sequence("ty0", "ty1")))
        .select("arc_id", "tile_x", "tile_y")
        .distinct()
    )
    return tiles.withColumn(
        "tile_id", C.grid_cell_col(F.col("tile_x"), F.col("tile_y"), zoom)
    )


def clip_arcs_to_tiles(arcs: DataFrame, bbox: Tuple, zoom: int) -> DataFrame:
    """Per-tile clipped arc geometry: (arc_id, tile_x, tile_y, tile_id,
    piece_seq, coords) — the step after ``assign_arcs_to_tiles`` that makes
    each tile self-contained (emit one topology per tile without reading
    neighbors).

    Plan shape: the conservative tile assignment self-joins back to the
    arc store on arc_id (coords shuffle once, to the (arc, tile) pairs
    that actually touch), then an Arrow-batched mapInPandas runs the
    BATCHED Liang-Barsky kernel — each Arrow batch's pairs are
    concatenated into one flat coordinate buffer + offsets array and
    clipped in a single numpy pass (kernels.clip_polylines_to_rects_batch;
    no per-pair Python loop — r3's itertuples version became the stage
    bottleneck at high tile fan-out). Interior vertices pass through
    bit-identically and both neighbors of a shared crossing compute the
    identical interpolated point, so cross-tile stitching needs no
    tolerance. At 100 TB the output is written partitioned by tile_id
    (sources/tables.py guidance) so a tile read is partition pruning."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels as K

    n, w, h = _tile_bounds_cols(zoom, bbox)
    cw, ch = w / n, h / n
    asg = assign_arcs_to_tiles(arcs, bbox, zoom).join(
        arcs.select("arc_id", "coords"), "arc_id"
    )
    cols = ["arc_id", "tile_x", "tile_y", "tile_id", "piece_seq", "coords"]

    def clip(it):
        for pdf in it:
            if len(pdf) == 0:
                yield pd.DataFrame({c: [] for c in cols})
                continue
            coords = [
                np.asarray(c, dtype=np.float64) for c in pdf["coords"]
            ]
            lens = np.fromiter(
                (len(c) // 2 for c in coords), dtype=np.int64,
                count=len(coords),
            )
            offsets = np.concatenate(([0], np.cumsum(lens)))
            flat = (
                np.concatenate(coords).reshape(-1, 2)
                if offsets[-1] else np.empty((0, 2))
            )
            tx = pdf["tile_x"].to_numpy(dtype=np.float64)
            ty = pdf["tile_y"].to_numpy(dtype=np.float64)
            rx0 = bbox[0] + tx * cw
            ry0 = bbox[1] + ty * ch
            rects = np.stack([rx0, ry0, rx0 + cw, ry0 + ch], axis=1)
            pair, seq, p_off, out = K.clip_polylines_to_rects_batch(
                flat, offsets, rects
            )
            out_flat = out.ravel()
            pieces = [
                out_flat[2 * p_off[j]: 2 * p_off[j + 1]]
                for j in range(len(pair))
            ]
            yield pd.DataFrame(
                {
                    "arc_id": pdf["arc_id"].to_numpy()[pair],
                    "tile_x": pdf["tile_x"].to_numpy()[pair],
                    "tile_y": pdf["tile_y"].to_numpy()[pair],
                    "tile_id": pdf["tile_id"].to_numpy()[pair],
                    "piece_seq": seq.astype(np.int32),
                    "coords": pieces,
                }
            )

    return asg.mapInPandas(
        clip,
        schema=(
            "arc_id long, tile_x long, tile_y long, tile_id long, "
            "piece_seq int, coords array<double>"
        ),
    )


def rasterize_points(
    points: DataFrame, bbox: Tuple, zoom: int, value_col: str | None = None
) -> DataFrame:
    """points(x, y[, value]) -> per-tile raster (tile_x, tile_y, tile_id,
    n, sum_value?)."""
    n, w, h = _tile_bounds_cols(zoom, bbox)
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(n - 1))  # noqa: E731
    g = points.withColumn(
        "tile_x", clamp(F.floor((F.col("x") - F.lit(bbox[0])) / F.lit(w) * n).cast("long"))
    ).withColumn(
        "tile_y", clamp(F.floor((F.col("y") - F.lit(bbox[1])) / F.lit(h) * n).cast("long"))
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    out = g.groupBy("tile_x", "tile_y").agg(*aggs)
    return out.withColumn(
        "tile_id", C.grid_cell_col(F.col("tile_x"), F.col("tile_y"), zoom)
    )


def tile_pyramid(
    points: DataFrame,
    bbox: Tuple,
    max_zoom: int,
    value_col: str | None = None,
) -> DataFrame:
    """Multi-zoom rollup: points(x, y[, value]) -> (zoom, tile_x, tile_y,
    n[, sum_value]) for every zoom in [0, max_zoom] — the tile-serving
    pyramid in ONE pass.

    Plan shape: leaf assignment at max_zoom is pure codegen column math;
    one groupBy produces the leaf raster; each leaf row then explodes into
    its max_zoom+1 ancestors (parent coords are bit shifts — no joins) and
    a second groupBy folds them. Both shuffles carry only (zoom, x, y,
    partials); partial aggregation collapses the fan-out map-side, so
    shuffle bytes ~= distinct leaf tiles x zoom levels, independent of the
    input point count — at 100 TB the point->leaf reduction does the heavy
    lifting and the pyramid is a rounding error on top.
    """
    leaf = rasterize_points(points, bbox, max_zoom, value_col=value_col)
    lv = F.explode(F.sequence(F.lit(0), F.lit(max_zoom))).alias("zoom")
    exploded = leaf.select("tile_x", "tile_y", "n",
                           *(["sum_value"] if value_col else []), lv)
    aggs = [F.sum("n").alias("n")]
    if value_col:
        aggs.append(F.sum("sum_value").alias("sum_value"))
    return (
        exploded.select(
            "zoom",
            F.expr(f"shiftright(tile_x, {max_zoom} - zoom)").alias("tile_x"),
            F.expr(f"shiftright(tile_y, {max_zoom} - zoom)").alias("tile_y"),
            "n",
            *(["sum_value"] if value_col else []),
        )
        .groupBy("zoom", "tile_x", "tile_y")
        .agg(*aggs)
    )


def raster_to_cells(
    raster: DataFrame, bbox: Tuple, zoom: int, predicate
) -> DataFrame:
    """raster(tile_x, tile_y, ...) rows passing ``predicate`` -> cell polygon
    rings (tile_id, ring array<array<double>>) in world coordinates."""
    n, w, h = _tile_bounds_cols(zoom, bbox)
    cw, ch = w / n, h / n
    x0 = F.lit(bbox[0]) + F.col("tile_x") * F.lit(cw)
    y0 = F.lit(bbox[1]) + F.col("tile_y") * F.lit(ch)
    x1, y1 = x0 + F.lit(cw), y0 + F.lit(ch)
    ring = F.array(
        F.array(x0, y0), F.array(x1, y0), F.array(x1, y1),
        F.array(x0, y1), F.array(x0, y0),
    )
    return (
        raster.where(predicate)
        .withColumn(
            "tile_id", C.grid_cell_col(F.col("tile_x"), F.col("tile_y"), zoom)
        )
        .select("tile_id", ring.alias("ring"))
    )
