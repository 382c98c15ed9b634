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
window; queries the window cannot *prove* exact escalate through doubled
ring radii (each pass only re-runs the unsatisfied residue) and only fall
back to a brute-force pass once the doubled window would cover the whole
grid — so the cross join is bounded to the "dataset smaller than k"
degenerate case.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.pin import pin
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
    metrics=None,
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
    is provably covered). Those queries escalate: re-probe with DOUBLED
    ``max_rings`` (only the unsatisfied residue re-runs), brute force only
    once the doubled window would cover the grid anyway. The guard stats
    reuse the rank window's qid partitioning (no extra shuffle); the
    guarded frame is pinned and counted once, so the good branch, the
    unsatisfied anti-join and the escalation all scan the cached rows
    instead of re-executing the cell join — and when every query is
    provably exact (the common case when level/max_rings are sized from
    table stats) the escalation branch is dropped from the plan entirely.

    Pass a ``plans.metrics.StageMetrics`` as ``metrics`` to surface the
    degradation counters (n_escalations, n_fallback, final_rings): at 100 TB
    a mis-sized level shows up there instead of as a silent slow job.
    """
    n = 1 << level
    cell_w = ((bbox[2] - bbox[0]) or 1.0) / n
    cell_h = ((bbox[3] - bbox[1]) or 1.0) / n

    p = _with_grid(points, "x", "y", bbox, level).select(
        "point_id", F.col("x").alias("px"), F.col("y").alias("py"),
        F.col("ix").alias("pix"), F.col("iy").alias("piy"),
    )

    results = []
    remaining = queries.select("qid", "x", "y")
    rings = max_rings
    n_escalations = 0
    n_fallback = 0
    while True:
        guarded = pin(_window_pass(remaining, p, k, bbox, level, rings))
        exact = (F.col("n_found") >= k) & (
            F.col("kth_dist") < rings * min(cell_w, cell_h)
        )
        results.append(
            guarded.where(exact).select("qid", "point_id", "dist", "rank")
        )
        ok_qids = guarded.where(exact).select("qid").distinct()
        # queries with too-few candidates, an unproven k-th distance, or no
        # candidates at all (absent from `guarded` entirely). The count both
        # drives the loop AND materializes the pin, so every later scan of
        # `guarded` (the good branch, this anti-join, the escalation input)
        # reads cached rows instead of re-running the cell join.
        unsatisfied = remaining.join(ok_qids, on="qid", how="left_anti")
        n_unsat = unsatisfied.count()
        if n_unsat == 0:
            break
        if 2 * rings >= n:
            # a doubled window would cover (nearly) the whole grid: the
            # equi-join degenerates to all-pairs anyway, and the offset
            # table is O(n^2) rows — the explicit brute-force pass over the
            # (tiny by construction) residue is the cheaper exact plan
            n_fallback = n_unsat
            results.append(knn_brute_force(unsatisfied, points, k))
            break
        rings *= 2
        n_escalations += 1
        remaining = unsatisfied
    if metrics is not None:
        metrics.record(
            "knn_join",
            n_escalations=n_escalations,
            n_fallback=n_fallback,
            final_rings=rings,
        )
    out = results[0]
    for extra in results[1:]:
        out = out.unionByName(extra)
    return out


def _window_pass(
    queries: DataFrame, p: DataFrame, k: int, bbox: Tuple, level: int,
    rings: int,
) -> DataFrame:
    """One windowed candidate pass: rank the points within Chebyshev ring
    distance ``rings`` of each query's cell, keep the top k, and attach the
    per-query guard stats (candidate count, k-th distance) with windows over
    the SAME qid exchange as the rank window."""
    n = 1 << level
    q = _with_grid(queries, "x", "y", bbox, level).select(
        "qid", F.col("x").alias("qx"), F.col("y").alias("qy"), "ix", "iy"
    )
    # expand each query to all cells within Chebyshev distance `rings`
    offsets = [(dx, dy) for dx in range(-rings, rings + 1)
               for dy in range(-rings, rings + 1)]
    off_df = queries.sparkSession.createDataFrame(offsets, "dx int, dy int")
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
    wq = Window.partitionBy("qid")
    return ranked.withColumn(
        "n_found", F.count(F.lit(1)).over(wq)
    ).withColumn("kth_dist", F.max("dist").over(wq))


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
