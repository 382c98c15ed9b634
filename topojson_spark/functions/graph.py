"""Pair-graph clustering: near-dup pairs -> cluster ids -> survivors.

The near-dup operators (minhash/simhash/embedding, functions/text.py and
functions/similarity.py) emit candidate PAIRS. A training-data dedup
pipeline needs the transitive closure of those pairs — one CLUSTER id per
document — and then one survivor per cluster. Connected components here is
the alternating large-star / small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round is
two aggregate+join passes shuffling only (node, node) id tuples, and the
edge set provably converges to a forest of depth-1 stars rooted at each
component's minimum id in O(log^2 n) rounds — 2-4 rounds in practice on
near-dup graphs (small dense cliques plus short chains).

100 TB design notes:

- Only ids ever shuffle. Text/vectors stay behind in the pair producers;
  the survivor pass shuffles (doc_id, cluster_id, score) tuples.
- Each round ends at a pin_truncate boundary so downstream plan analysis
  stays O(round), and convergence is detected with a count+hash aggregate
  over the canonical edge set — one action per round, never a collect of
  edges.
- Skewed hubs (one node inside a million-member cluster) are what
  large-star exists for: every larger neighbor is repointed at the
  component min in one round, so a hub's adjacency never concentrates on
  one reducer for more than a round.
- min-id cluster labels are content-determined (no nondeterministic
  ordering), so re-runs and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.pin import pin_truncate


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_out: str = "doc_id",
    cluster_out: str = "cluster_id",
    max_iters: int = 25,
    metrics=None,
) -> DataFrame:
    """Transitive closure of an undirected pair graph.

    Returns one row per node that appears in ``pairs``:
    ``(id_out, cluster_out)`` with ``cluster_out`` = the minimum id in the
    node's connected component under the id column's native ordering (the
    node itself for roots). Nodes never mentioned in ``pairs`` are implicit
    singletons — join with a left outer and ``coalesce``
    (see ``dedup_survivors``).

    Convergence is PROVEN per run, never assumed: the loop must reach the
    star-forest fixed point (or the edge-set fingerprint must stop
    moving) within ``max_iters`` rounds, else it **raises** RuntimeError
    rather than silently emitting labels computed from a non-converged
    edge set — large-star/small-star converges in O(log^2 n) rounds, so
    exhaustion at the default 25 means something is genuinely wrong, and
    wrong cluster ids here would merge/split dedup clusters without any
    other signal. Pass a ``plans.metrics.StageMetrics`` as ``metrics`` to
    additionally record (rounds, converged) per run.
    """
    # pin the pair producer ONCE — nodes and the edge seed both read it;
    # without this a pair plan like minhash LSH would execute twice
    pairs0 = pin_truncate(
        pairs.select(F.col(src).alias("x"), F.col(dst).alias("y"))
    )
    nodes = (
        pairs0.select(F.col("x").alias("n"))
        .union(pairs0.select(F.col("y").alias("n")))
        .distinct()
    )
    # canonical big->small orientation, self-loops dropped; the id type
    # (string or integral) flows through — min/cluster labels follow the
    # column's native ordering
    e = (
        pairs0.where(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
        )
        .distinct()
    )
    e = pin_truncate(e)
    prev_sig = None
    converged = False
    rounds = 0
    for _ in range(max_iters):
        rounds += 1
        # -- large-star: for every node u, point each STRICTLY LARGER
        #    neighbor at m = min(N(u) + {u}). Output stays big->small.
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.min(F.least(F.col("u"), F.col("v"))).alias("m")
        )
        ls = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        ls = pin_truncate(ls)
        # -- small-star: edges are (u > v); point every smaller neighbor
        #    AND u itself at m = min of the smaller neighbors.
        mins2 = ls.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            ls.join(mins2, "u")
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .union(mins2.select(F.col("u").alias("a"), F.col("m").alias("b")))
        )
        e_new = (
            ss.where(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
            )
            .distinct()
        )
        e_new = pin_truncate(e_new)
        # one action per round: edge-set fingerprint (hash folded into
        # [0, 2^31) before summing so ANSI mode can't overflow a long) plus
        # the star-forest stats for the early exit below
        sig_row = e_new.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.pmod(F.xxhash64(F.col("u"), F.col("v")),
                             F.lit(1 << 31))),
                F.lit(0),
            ).alias("h"),
            F.count_distinct(F.col("u")).alias("nu"),
        ).collect()[0]
        sig = (sig_row["n"], sig_row["h"])
        e = e_new
        if sig == prev_sig or sig[0] == 0:
            converged = True
            break
        prev_sig = sig
        if sig_row["n"] == sig_row["nu"]:
            # every member points at exactly one root; if additionally no
            # root is itself a member, the edges are a star forest — the
            # provable fixed point — and the confirming round is skipped
            roots_as_members = e_new.join(
                e_new.select(F.col("u").alias("v")).distinct(),
                on="v",
                how="left_semi",
            )
            if roots_as_members.isEmpty():
                converged = True
                break
    if metrics is not None:
        metrics.record(
            "connected_components", rounds=rounds, converged=converged
        )
    if not converged:
        # exhaustion would mean the final min-label pass runs on a
        # NON-converged edge set — silent wrong cluster ids. Fail loudly.
        raise RuntimeError(
            f"connected_components did not reach the star-forest fixed "
            f"point in max_iters={max_iters} rounds; raise max_iters "
            f"(convergence is O(log^2 n) rounds — exhaustion at the "
            f"default indicates a pathological or adversarial graph)"
        )
    # at the star fixed point every edge is (member, root); roots and
    # isolated-by-dedup nodes label themselves
    labels = e.groupBy("u").agg(F.min("v").alias("c"))
    return (
        nodes.join(labels, nodes["n"] == labels["u"], "left")
        .select(
            F.col("n").alias(id_out),
            F.coalesce(F.col("c"), F.col("n")).alias(cluster_out),
        )
    )


def dedup_survivors(
    documents: DataFrame,
    clusters: DataFrame,
    score: DataFrame = None,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One survivor per near-dup cluster.

    ``clusters`` is ``connected_components`` output; documents absent from
    it are singleton clusters and survive unconditionally. The survivor is
    the highest ``score`` (any one-row-per-doc frame with a ``score``
    column — e.g. a quality metric), ties broken by minimum id; with no
    score, the minimum id wins. Returns ``(id_col, cluster_col)`` of the
    survivors only. Shuffles narrow (id, cluster, score) tuples — document
    text never moves.
    """
    docs = documents.select(id_col)
    lab = docs.join(clusters, id_col, "left").select(
        id_col,
        F.coalesce(F.col(cluster_col), F.col(id_col)).alias(cluster_col),
    )
    if score is not None:
        lab = lab.join(score.select(id_col, "score"), id_col, "left")
        order = [F.desc_nulls_last("score"), F.asc(id_col)]
    else:
        order = [F.asc(id_col)]
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return (
        lab.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(id_col, cluster_col)
    )
