"""Similarity-search tests: brute-force cosine, LSH buckets, IVF assign."""

import numpy as np
import pytest

from topojson_spark.functions import similarity as S


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((100, 16)).astype(float)
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df, vecs


def test_cosine_topk_matches_numpy(emb):
    df, vecs = emb
    q = vecs[0]
    got = S.cosine_topk(df, q.tolist(), 5).collect()
    sims = vecs @ q / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = np.argsort([(-s, i) for i, s in enumerate(sims)], axis=0)
    order = sorted(range(100), key=lambda i: (-sims[i], i))[:5]
    assert [r["vec_id"] for r in got] == order
    assert got[0]["vec_id"] == 0
    assert got[0]["cos_sim"] == pytest.approx(1.0, abs=1e-6)


def test_cosine_topk_plan_is_distributed(emb):
    """The corpus-wide selection must be TakeOrderedAndProject (distributed
    per-partition top-k), not a global single-task Window sort; the rank
    window runs only over the <=k pre-limited rows."""
    df, vecs = emb
    plan = S.cosine_topk(df, vecs[0].tolist(), 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the Window must sit ABOVE the take (over k rows), never below it
    assert plan.index("Window") < plan.index("TakeOrderedAndProject")


def test_lsh_topk_recovers_self(emb):
    df, vecs = emb
    bucketed = S.lsh_bucket_table(df, dim=16, n_planes=6)
    got = S.lsh_topk(bucketed, vecs[7].tolist(), 3, n_planes=6)
    rows = got.collect()
    assert rows and rows[0]["vec_id"] == 7


def test_ivf_assign(emb):
    df, vecs = emb
    cents = [vecs[0].tolist(), vecs[50].tolist()]
    out = {r["vec_id"]: r["centroid_id"] for r in S.ivf_assign(df, cents).collect()}
    assert out[0] == 0 and out[50] == 1
    d0 = ((vecs - vecs[0]) ** 2).sum(1)
    d1 = ((vecs - vecs[50]) ** 2).sum(1)
    want = (d1 < d0).astype(int)
    got = np.array([out[i] for i in range(100)])
    assert (got == want).mean() > 0.99


def test_media_plumbing(spark):
    from topojson_spark.functions.multimodal import (
        extract_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, 8, kind="image")
    feats = extract_features(media).collect()
    assert len(feats) == 8
    assert all(len(r["feat"]) == 64 for r in feats)
    # deterministic: same media id -> same features across runs
    feats2 = extract_features(synth_media(spark, 8, kind="image")).collect()
    assert {r["media_id"]: r["feat"] for r in feats} == {
        r["media_id"]: r["feat"] for r in feats2
    }

    video = synth_media(spark, 3, kind="video")
    plan = frame_sample_plan(video, every_n=10).collect()
    assert {r["frame_ix"] for r in plan} == {0, 10, 20}


def test_ivf_topk_probe_recall(spark):
    """Clustered corpus: with the query sitting in one cluster, probing
    that cluster's inverted list (n_probe=1) recovers the exact top-k,
    identical to brute force — and probing all lists IS brute force."""
    rng = np.random.default_rng(9)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4])
    vecs = np.vstack([
        c + 0.1 * rng.standard_normal((30, 8)) for c in centers
    ])
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = (centers[0] + 0.05).tolist()
    got = S.ivf_topk(df, centers.tolist(), q, k=5, n_probe=1).collect()
    brute = S.cosine_topk(df, q, 5).collect()
    assert [(r["vec_id"], r["rank"]) for r in got] == [
        (r["vec_id"], r["rank"]) for r in brute
    ]
    full = S.ivf_topk(df, centers.tolist(), q, k=5, n_probe=3).collect()
    assert [(r["vec_id"], r["rank"]) for r in full] == [
        (r["vec_id"], r["rank"]) for r in brute
    ]


def test_ivf_persisted_probe_is_partition_pruned(spark, tmp_path):
    """The 100 TB probe path, demonstrated end-to-end: the IVF assignment
    is persisted partitionBy(centroid_id) via sources.tables.write_table,
    the probe reads it back with an isin(probes) filter, and the scan's
    PartitionFilters prove Spark lists ONLY the probed inverted lists —
    n_probe/n_centroids of the store, not a full scan. Results must equal
    the in-memory ivf_topk exactly."""
    from topojson_spark.sources.tables import write_table

    rng = np.random.default_rng(9)
    centers = np.array([[5.0] * 8, [-5.0] * 8, [5.0] * 4 + [-5.0] * 4])
    vecs = np.vstack([
        c + 0.1 * rng.standard_normal((30, 8)) for c in centers
    ])
    rows = [(i, [float(v) for v in vecs[i]]) for i in range(len(vecs))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    store = str(tmp_path / "ivf_store")
    write_table(
        S.ivf_assign(df, centers.tolist()),
        store,
        partition_by=["centroid_id"],
    )
    # one partition directory per inverted list
    import os

    assert sorted(
        d for d in os.listdir(store) if d.startswith("centroid_id=")
    ) == ["centroid_id=0", "centroid_id=1", "centroid_id=2"]

    q = (centers[0] + 0.05).tolist()
    probed = S.ivf_topk_persisted(
        spark, store, centers.tolist(), q, k=5, n_probe=1
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the probe filter reached the scan as a PARTITION filter (directory
    # pruning), not a post-scan predicate over all rows
    assert "PartitionFilters" in plan
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan).group(1)
    assert "centroid_id" in pf, f"probe not pushed to partition level: {pf}"

    want = S.ivf_topk(df, centers.tolist(), q, k=5, n_probe=1).collect()
    got = probed.collect()
    assert [(r["vec_id"], r["rank"]) for r in got] == [
        (r["vec_id"], r["rank"]) for r in want
    ]


def test_netpbm_decode_is_real(spark):
    """P5/P6 payloads take the REAL decode path: exact header parse,
    raster read, and integer BT.601 luminance — verified byte-for-byte
    against hand-built images (no imaging library involved)."""
    import numpy as np

    from topojson_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        _decode_image,
        encode_ppm,
        extract_features,
    )

    # P5 grayscale round-trip: decode(encode(x)) == x
    plane = np.arange(24, dtype=np.uint8).reshape(4, 6) * 10
    assert np.array_equal(_decode_image(encode_ppm(plane), -1, -1), plane)

    # P6 RGB -> integer BT.601 luminance
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)   # 299*255//1000 = 76
    rgb[0, 1] = (0, 255, 0)   # 587*255//1000 = 149
    rgb[1, 0] = (0, 0, 255)   # 114*255//1000 = 29
    rgb[1, 1] = (10, 20, 30)  # (2990+11740+3420)//1000 = 18
    got = _decode_image(encode_ppm(rgb), -1, -1)
    assert got.tolist() == [[76, 149], [29, 18]]

    # comments + arbitrary whitespace in the header parse
    hdr = b"P5 # a comment\n 2\n# another\n 2 255\n" + bytes([1, 2, 3, 4])
    assert _decode_image(hdr, -1, -1).tolist() == [[1, 2], [3, 4]]

    # maxval < 255: samples are FRACTIONS of maxval and must rescale to
    # the 8-bit range (round-half-up), so 15/15 -> 255, 7/15 -> 119
    lo = b"P5 2 2 15\n" + bytes([0, 7, 8, 15])
    assert _decode_image(lo, -1, -1).tolist() == [
        [0, (7 * 255 + 7) // 15], [(8 * 255 + 7) // 15, 255]
    ]
    # P6 low-maxval: rescale precedes the luma step; pure red at maxval 3
    lo6 = b"P6 1 1 3\n" + bytes([3, 0, 0])
    assert _decode_image(lo6, -1, -1).tolist() == [[299 * 255 // 1000]]

    # maxval 0 is malformed
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _decode_image(b"P5 1 1 0\n\x00", -1, -1)

    # end-to-end through the mapInPandas feature op: an 8x8 constant-120
    # P6 image must yield exactly 64 features of 120/255
    const = np.full((8, 8, 3), 120, dtype=np.uint8)
    media = spark.createDataFrame(
        [("ppm_0", "image", bytearray(encode_ppm(const)), (8, 8, None, None))],
        schema=MEDIA_SCHEMA,
    )
    feats = extract_features(media, out_size=8).collect()[0]["feat"]
    assert len(feats) == 64
    assert all(abs(f - 120 / 255) < 1e-6 for f in feats)


# ------------------------------------------------------------------ k-means


def test_kmeans_lloyd_separated_clusters(spark):
    """Two well-separated blobs: Lloyd must converge to them from bad
    seeds (both initial centroids inside blob A, since seeds are the
    smallest ids) and the recomputed centroids must be the blob means."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal((20, 8)) * 0.05 + 5.0
    b = rng.standard_normal((20, 8)) * 0.05 - 5.0
    rows = [(i, [float(v) for v in a[i]]) for i in range(20)]
    rows += [(20 + i, [float(v) for v in b[i]]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned, cents = S.kmeans_lloyd(df, k=2, iters=3)
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    blob_a = {got[i] for i in range(20)}
    blob_b = {got[20 + i] for i in range(20)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    (ca,) = blob_a
    np.testing.assert_allclose(np.asarray(cents[ca]), a.mean(0), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cents[1 - ca]), b.mean(0), atol=1e-4
    )


def test_kmeans_empty_cluster_keeps_seed(spark):
    """A seed no vector prefers keeps its previous centroid instead of
    crashing or collapsing to NaN (documented deviation from the oracle)."""
    rows = [(i, [float(i), 0.0]) for i in range(4)]  # 0,1,2,3 on a line
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # seeds = vecs 0 and 1; push every vector onto seed 1's side
    assigned, cents = S.kmeans_lloyd(
        df, k=2, iters=2, init=[[-100.0, 0.0], [1.5, 0.0]]
    )
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    assert set(got.values()) == {1}
    assert cents[0] == [-100.0, 0.0]  # untouched seed
    assert cents[1] == pytest.approx([1.5, 0.0])  # mean of 0..3


def test_kmeans_init_requires_enough_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        S.kmeans_init(df, k=2)


def test_semantic_dedup_dominated_rule(spark):
    """In-cluster near-identical vectors collapse to the smallest id;
    cross-cluster duplicates are NOT compared (the SemDeDup contract)."""
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.001, 0.0]),   # ~dup of 1, same cluster -> dropped
        (3, [0.0, 1.0, 0.0]),       # same cluster as 1/2, dissimilar
        (4, [-1.0, 0.0, 0.0]),      # other cluster
        (5, [-0.999, -0.001, 0.0]), # ~dup of 4, same cluster -> dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.5, 0.0], [-1.0, -0.5, 0.0]]
    out = S.semantic_dedup(df, centroids=cents, threshold=0.95)
    got = sorted(r["vec_id"] for r in out.collect())
    assert got == [1, 3, 4]


def test_semantic_dedup_via_kmeans_gate_corpus(spark):
    """kmeans-backed clustering on the sf0.001 embeddings: every cluster
    keeps members (the empty-cluster branch must not trigger on gate
    data) and survivors are a subset of the corpus."""
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = df.count()
    assigned, _ = S.kmeans_lloyd(df, k=4, iters=2)
    sizes = assigned.groupBy("centroid_id").count().collect()
    assert len(sizes) == 4 and all(r["count"] > 0 for r in sizes)
    out = S.semantic_dedup(df, k=4, iters=2, threshold=0.4)
    kept = out.count()
    assert 0 < kept <= n


def test_kmeans_rejects_bad_k(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError):
        S.kmeans_init(df, k=0)


def test_semantic_decontaminate_hand_computed(spark):
    from topojson_spark.functions.similarity import semantic_decontaminate

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),      # eval vector
            (2, [0.9, 0.1]),      # near eval -> flagged
            (3, [0.0, 1.0]),      # orthogonal -> clean
            (4, [-1.0, 0.0]),     # opposite -> clean
        ],
        "vec_id long, embedding array<double>",
    )
    ev = emb.where("vec_id = 1")
    out = {r["vec_id"]: r["max_eval_cos"]
           for r in semantic_decontaminate(emb, ev, threshold=0.9).collect()}
    assert set(out) == {1, 2}
    assert out[1] == 1.0
    import math
    assert abs(out[2] - 0.9 / math.hypot(0.9, 0.1)) < 1e-12


def test_semantic_decontaminate_plan_is_broadcast(spark):
    from topojson_spark.functions.similarity import semantic_decontaminate

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        semantic_decontaminate(emb, emb.limit(2))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # eval side broadcast (nested-loop), corpus scored map-side
    assert "BroadcastNestedLoopJoin" in plan
