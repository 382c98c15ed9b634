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
    rows_per_bucket: int = 50_000,
    max_refine_buckets: int = 4096,
) -> DataFrame:
    """(point_id, poly_id) pairs where the point is inside the polygon
    (boundary counts as inside).

    Skew design: the exact refine is cogrouped on (poly_id, bucket) where
    bucket = hash(point cell) % n_buckets and n_buckets is ADAPTIVE per
    polygon — ceil(candidate_count / ``rows_per_bucket``), capped at
    ``max_refine_buckets``. The winding test is per-point independent, so a
    continent-sized polygon's candidate set splits across as many tasks as
    its candidate volume warrants, while a parcel-sized polygon stays ONE
    cogroup group (no empty-group overhead). The per-polygon counts are a
    narrow groupBy over the pinned coarse join (the pin also stops the
    coarse join re-executing for the live-bucket distinct and the cogroup
    left side) broadcast back in — bytes are ~16/polygon. Ring coordinates
    travel on the cogroup's right side, replicated only to the
    (poly_id, bucket) pairs that actually hold candidates (a narrow
    distinct + equi-join), never once per candidate row — shuffle bytes are
    points + rings x live_buckets, not points x rings."""
    from ..plans.pin import pin

    pcell = points.withColumn(
        "cell", C.cell_col(F.col("x"), F.col("y"), bbox, level)
    ).select("point_id", "x", "y", "cell")

    poly_cells = _polygon_cells(polygons, bbox, level)
    coarse = pin(
        pcell.join(poly_cells, on="cell").select(
            "point_id", "x", "y", "poly_id", "cell"
        )
    )
    sizes = coarse.groupBy("poly_id").agg(
        F.ceil(F.count(F.lit(1)) / F.lit(rows_per_bucket)).alias("_nb_raw")
    ).select(
        F.col("poly_id").alias("_spoly_id"),
        F.least(
            F.greatest(F.col("_nb_raw"), F.lit(1)),
            F.lit(max_refine_buckets),
        ).cast("int").alias("_n_buckets"),
    )
    cand = (
        coarse.join(
            F.broadcast(sizes), on=F.col("poly_id") == F.col("_spoly_id")
        )
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("cell"), F.col("_n_buckets")).cast("int"),
        )
        .select("point_id", "x", "y", "poly_id", "bucket")
    )
    # replicate each polygon's rings only to the refine buckets that exist;
    # fresh aliases give the cogroup's right side distinct attribute ids
    # (cand and rings_rep would otherwise share lineage -> ambiguous-column)
    live = cand.select(
        F.col("poly_id").alias("rpoly_id"), F.col("bucket").alias("rbucket")
    ).distinct()
    rings_rep = (
        polygons.select("poly_id", "ring_seq", "coords")
        .toDF("poly_id", "ring_seq", "coords")  # fresh attribute ids
        .join(live, on=F.col("poly_id") == F.col("rpoly_id"))
        .select(
            "poly_id",
            F.col("rbucket").alias("bucket"),
            "ring_seq",
            "coords",
        )
    )

    def refine(pts: pd.DataFrame, rings: pd.DataFrame) -> pd.DataFrame:
        if pts.empty or rings.empty:
            return pd.DataFrame({"point_id": [], "poly_id": []}).astype(
                {"point_id": "int64", "poly_id": "int64"}
            )
        poly_id = int(pts["poly_id"].iloc[0])
        rr = (
            rings[["ring_seq", "coords"]]
            .drop_duplicates(subset=["ring_seq"])
            .sort_values("ring_seq")
        )
        pp = pts[["point_id", "x", "y"]].drop_duplicates(subset=["point_id"])
        xy = pp[["x", "y"]].to_numpy(dtype=np.float64)
        inside = None
        for _, rrow in rr.iterrows():
            ring = K.as_np(rrow["coords"])
            mask = K.points_in_ring(xy, ring)
            if rrow["ring_seq"] == 0:
                inside = mask
            else:
                inside = inside & ~mask  # holes punch out
        hit = pp["point_id"].to_numpy()[inside]
        return pd.DataFrame({"point_id": hit, "poly_id": poly_id})

    return (
        cand.groupBy("poly_id", "bucket")
        .cogroup(rings_rep.groupBy("poly_id", "bucket"))
        .applyInPandas(lambda left, right: refine(left, right), schema=RESULT_SCHEMA)
    )


def zonal_stats(
    points: DataFrame,
    polygons: DataFrame,
    bbox: Tuple,
    value_col: str = "value",
    level: int = 8,
    **pip_kwargs,
) -> DataFrame:
    """Zonal statistics: per-polygon aggregates of a point value column —
    (poly_id, n_points, sum_value, min_value, max_value, mean_value).
    The classic raster/vector rollup (mean elevation per watershed, event
    counts per admin region), composed from :func:`point_in_polygon_join`
    so it inherits the cell-index candidate pruning and the adaptive
    skew-bucketed exact refine.

    100 TB design: the PIP join's output is narrow (point_id, poly_id)
    pairs; values join in on point_id (the points table's own key — a
    co-partitionable equi-join) and the final groupBy(poly_id) is
    partial-aggregated map-side, so a continent polygon covering 1e9
    points ships one partial row per task, not 1e9 rows, to the reducer.
    mean is sum/count (one division over exact partials) — for integer
    value columns it is engine-exact.
    """
    hits = point_in_polygon_join(
        points.select("point_id", "x", "y"), polygons, bbox,
        level=level, **pip_kwargs,
    )
    vals = points.select("point_id", F.col(value_col).alias("_v"))
    return (
        hits.join(vals, "point_id")
        .groupBy("poly_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum("_v").alias("sum_value"),
            F.min("_v").alias("min_value"),
            F.max("_v").alias("max_value"),
            (
                F.sum("_v").cast("double") / F.count(F.lit(1))
            ).alias("mean_value"),
        )
    )
