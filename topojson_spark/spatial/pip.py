"""Point-in-polygon join (north rule operator; no reference counterpart).

Two-phase plan, the standard distributed PIP design:

1. *coarse*: polygons are covered by index cells (bbox cover at a chosen
   level), points get their containing cell — an equi-join on cell id. The
   cell derivation is pure column math (whole-stage codegen); the join is a
   plain shuffle hash join that AQE can skew-split (coastline-type polygons
   produce hot cells).
2. *exact*: the winding-number test (kernels.points_in_ring) refines the
   candidates inside an Arrow-batched cogrouped applyInPandas.

Polygons are given as rings: polygons(poly_id long, ring_seq int,
coords array<array<double>>) — ring 0 exterior, >0 holes.
Points: points(point_id long, x double, y double).
Result: (point_id, poly_id) — one row per containing polygon.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import kernels as K
from . import cells as C

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("point_id", T.LongType()),
        T.StructField("poly_id", T.LongType()),
    ]
)


def _polygon_cells(polygons: DataFrame, bbox: Tuple, level: int) -> DataFrame:
    """Cover each polygon's bbox with level-`level` cells (exploded)."""
    n = 1 << level
    w = (bbox[2] - bbox[0]) or 1.0
    h = (bbox[3] - bbox[1]) or 1.0
    xs = F.expr("transform(coords, c -> c[0])")
    ys = F.expr("transform(coords, c -> c[1])")
    ext = polygons.where(F.col("ring_seq") == 0)
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(n - 1))  # noqa: E731
    covered = (
        ext.withColumn(
            "_ix0",
            clamp(F.floor((F.array_min(xs) - F.lit(bbox[0])) / F.lit(w) * n).cast("long")),
        )
        .withColumn(
            "_ix1",
            clamp(F.floor((F.array_max(xs) - F.lit(bbox[0])) / F.lit(w) * n).cast("long")),
        )
        .withColumn(
            "_iy0",
            clamp(F.floor((F.array_min(ys) - F.lit(bbox[1])) / F.lit(h) * n).cast("long")),
        )
        .withColumn(
            "_iy1",
            clamp(F.floor((F.array_max(ys) - F.lit(bbox[1])) / F.lit(h) * n).cast("long")),
        )
        .withColumn("_ix", F.explode(F.sequence("_ix0", "_ix1")))
        .withColumn("_iy", F.explode(F.sequence("_iy0", "_iy1")))
        .withColumn("cell", C.grid_cell_col(F.col("_ix"), F.col("_iy"), level))
        .select("poly_id", "cell")
    )
    return covered


def point_in_polygon_join(
    points: DataFrame,
    polygons: DataFrame,
    bbox: Tuple,
    level: int = 8,
) -> DataFrame:
    """(point_id, poly_id) pairs where the point is inside the polygon
    (boundary counts as inside)."""
    pcell = points.withColumn(
        "cell", C.cell_col(F.col("x"), F.col("y"), bbox, level)
    ).select("point_id", "x", "y", "cell")

    poly_cells = _polygon_cells(polygons, bbox, level)
    cand = pcell.join(poly_cells, on="cell").select("point_id", "x", "y", "poly_id")
    # candidates joined back to full ring geometry, grouped per polygon
    cand_geo = cand.join(
        polygons.select("poly_id", "ring_seq", "coords"), on="poly_id"
    )

    def refine(pdf: pd.DataFrame) -> pd.DataFrame:
        poly_id = int(pdf["poly_id"].iloc[0])
        rings = (
            pdf[["ring_seq", "coords"]]
            .drop_duplicates(subset=["ring_seq"])
            .sort_values("ring_seq")
        )
        pts = pdf[["point_id", "x", "y"]].drop_duplicates(subset=["point_id"])
        xy = pts[["x", "y"]].to_numpy(dtype=np.float64)
        inside = None
        for _, rrow in rings.iterrows():
            ring = K.as_np(rrow["coords"])
            mask = K.points_in_ring(xy, ring)
            if rrow["ring_seq"] == 0:
                inside = mask
            else:
                inside = inside & ~mask  # holes punch out
        hit = pts["point_id"].to_numpy()[inside]
        return pd.DataFrame({"point_id": hit, "poly_id": poly_id})

    return cand_geo.groupBy("poly_id").applyInPandas(refine, schema=RESULT_SCHEMA)
