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

    The exactness guard: after the fixed-window rank, any query whose k-th
    candidate distance reaches the window's guaranteed radius
    ``max_rings * min(cell_w, cell_h)`` — or that found fewer than k
    candidates at all — might have a true neighbor just outside the
    window (a point in an unsearched cell is at coordinate gap >=
    (ring_dist - 1) * cell_size, so everything strictly inside the radius
    is provably covered). Those queries re-run through the brute-force
    pass and the two result sets are unioned. The guard stats reuse the
    rank window's qid partitioning (no extra shuffle); the only added
    shuffle is a narrow qid anti-join to locate unsatisfied queries,
    whose population is ~0 when level/max_rings are sized from table
    stats (expected points-per-window >> k).
    """
    n = 1 << level
    cell_w = ((bbox[2] - bbox[0]) or 1.0) / n
    cell_h = ((bbox[3] - bbox[1]) or 1.0) / n
    guaranteed = max_rings * min(cell_w, cell_h)

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
    ranked = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "point_id", "dist", "rank")
    )

    # exactness guard: per-query candidate count + k-th distance, computed
    # with windows over the already-qid-partitioned ranked rows (same
    # exchange as the rank window — no extra shuffle)
    wq = Window.partitionBy("qid")
    guarded = ranked.withColumn("n_found", F.count(F.lit(1)).over(wq)).withColumn(
        "kth_dist", F.max("dist").over(wq)
    )
    exact = (F.col("n_found") >= k) & (F.col("kth_dist") < guaranteed)
    good = guarded.where(exact).select("qid", "point_id", "dist", "rank")
    ok_qids = guarded.where(exact).select("qid").distinct()
    # queries with too-few candidates, an unproven k-th distance, or no
    # candidates at all (absent from `ranked` entirely)
    unsatisfied = queries.join(ok_qids, on="qid", how="left_anti")
    fallback = knn_brute_force(unsatisfied, points, k)
    return good.unionByName(fallback)


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
