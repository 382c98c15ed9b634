"""Unit tests for the numpy kernels (no Spark needed).

Pinned values come from the reference's own unit tests where available
(citations into /root/reference/tests/...)."""

import numpy as np
import pytest

from topojson_spark.functions import kernels as K


def test_remove_collinear_points():
    # reference tests/test_ops.py:5-13
    line = np.array([[0, 0], [1, 0], [2, 0], [2, 1], [2, 2], [3, 3]])
    out = K.remove_collinear_points(line)
    assert out.tolist() == [[0, 0], [2, 0], [2, 2], [3, 3]]


def test_quantize_two_squares():
    # two unit squares sharing an edge on a [0,2]x[0,1] bbox, q=1e5
    bbox = (0.0, 0.0, 2.0, 1.0)
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    q = K.quantize_coords(ring, bbox, 1e5)
    kx, ky = K.quantize_factors(bbox, 1e5)
    assert kx == 2 / 99999 and ky == 1 / 99999
    assert q[0].tolist() == [0, 0]
    assert q[1].tolist() == [round(1 / kx), 0]
    # closing coordinate preserved
    assert q[0].tolist() == q[-1].tolist()


def test_quantize_degenerate_keeps_line():
    # a line collapsing to one grid point keeps its coords (ops.py:659-668)
    bbox = (0.0, 0.0, 1000.0, 1000.0)
    line = np.array([[0.0, 0.0], [1e-9, 1e-9]])
    q = K.quantize_coords(line, bbox, 1e2)
    assert len(q) == 2


def test_delta_roundtrip():
    arc = np.array([[3, 4], [5, 6], [5, 9]], dtype=np.int64)
    enc = K.delta_encode(arc.copy())
    assert enc.tolist() == [[3, 4], [2, 2], [0, 3]]
    dec = K.delta_decode(enc, [1.0, 1.0], [0.0, 0.0])
    assert dec.tolist() == arc.tolist()


def test_fast_split_open_line():
    line = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    splitter = K.packed_vertex_keys(np.array([[1.0, 0.0]]))
    parts = K.fast_split(line, splitter, is_ring=False)
    assert [p.tolist() for p in parts] == [[[0, 0], [1, 0]], [[1, 0], [2, 0]]]


def test_fast_split_never_splits_endpoints():
    line = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    splitter = K.packed_vertex_keys(np.array([[0.0, 0.0], [2.0, 0.0]]))
    parts = K.fast_split(line, splitter, is_ring=False)
    assert len(parts) == 1


def test_fast_split_ring_rotation():
    # ring split at one interior junction -> rotated, not split (ops.py:309-315)
    ring = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    splitter = K.packed_vertex_keys(np.array([[1.0, 1.0]]))
    parts = K.fast_split(ring, splitter, is_ring=True)
    assert len(parts) == 1
    assert parts[0][0].tolist() == [1, 1]
    assert parts[0][-1].tolist() == [1, 1]
    assert len(parts[0]) == 5

    # two junctions -> rotate to first, split at second
    splitter2 = K.packed_vertex_keys(np.array([[1.0, 0.0], [0.0, 1.0]]))
    parts2 = K.fast_split(ring, splitter2, is_ring=True)
    assert len(parts2) == 2
    assert parts2[0][0].tolist() == [1, 0]
    assert parts2[-1][-1].tolist() == [1, 0]


def test_canonical_dup_reversed_lines_equal():
    a = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    b = a[::-1].copy()
    assert K.canonical_dup_bytes(a) == K.canonical_dup_bytes(b)


def test_canonical_dup_rotated_ring_equal():
    r1 = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    r2 = np.array([[1, 1], [0, 1], [0, 0], [1, 0], [1, 1]], dtype=float)
    assert K.canonical_dup_bytes(r1) == K.canonical_dup_bytes(r2)
    r3 = r1[::-1].copy()  # reversed winding (tests/test_dedup.py:52-62)
    assert K.canonical_dup_bytes(r1) == K.canonical_dup_bytes(r3)


def test_canonical_dup_distinct():
    a = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    c = np.array([[0, 0], [1, 1], [2, 0]], dtype=float)
    assert K.canonical_dup_bytes(a) != K.canonical_dup_bytes(c)


def test_signed_area_ccw():
    ccw = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=float)
    assert K.signed_area(ccw) == 1.0
    assert K.is_ccw(ccw)
    assert not K.is_ccw(ccw[::-1])


def test_path_equality_reversed_and_collinear():
    # shapely-equals analog: same path with different vertex density is equal
    a = np.array([[0, 0], [2, 0]], dtype=float)
    b = np.array([[2, 0], [1, 0], [0, 0]], dtype=float)
    assert K.normalize_path(a) == K.normalize_path(b)
    c = np.array([[0, 0], [1, 1]], dtype=float)
    assert K.normalize_path(a) != K.normalize_path(c)


def test_path_equality_rotated_ring():
    r1 = np.array([[0, 0], [1, 1], [2, 0], [0, 0]], dtype=float)
    r2 = np.array([[2, 0], [0, 0], [1, 1], [2, 0]], dtype=float)
    assert K.normalize_path(r1) == K.normalize_path(r2)


def test_line_pair_shared_segments_abc_extends_ab():
    # test_join.py:42-52 — junction at (0,0) and (1,0)
    abc = np.array([[0, 0], [1, 0], [2, 0]], dtype=float)
    ab = np.array([[0, 0], [1, 0]], dtype=float)
    segs = K.line_pair_shared_segments(abc, ab)
    chains = K.merge_segments_to_chains(segs)
    assert len(chains) == 1
    ends = {tuple(chains[0][0]), tuple(chains[0][-1])}
    assert ends == {(0.0, 0.0), (1.0, 0.0)}


def test_line_pair_shared_segments_multi():
    # test_join.py:625-645 — 3 overlap chains, 6 junctions
    l1 = np.array([[0, 0], [10, 0], [10, 5], [20, 5]], dtype=float)
    l2 = np.array(
        [[5, 0], [25, 0], [25, 5], [16, 5], [16, 10], [14, 10], [14, 5], [0, 5]],
        dtype=float,
    )
    segs = K.line_pair_shared_segments(l1, l2)
    chains = K.merge_segments_to_chains(segs)
    assert len(chains) == 3
    pts = sorted(tuple(c[i]) for c in chains for i in (0, -1))
    assert pts == [
        (5.0, 0.0),
        (10.0, 0.0),
        (10.0, 5.0),
        (14.0, 5.0),
        (16.0, 5.0),
        (20.0, 5.0),
    ]


def test_point_crossing_produces_no_junction():
    # crossing lines intersect at a point -> no line piece
    l1 = np.array([[0, 0], [2, 2]], dtype=float)
    l2 = np.array([[0, 2], [2, 0]], dtype=float)
    segs = K.line_pair_shared_segments(l1, l2)
    assert len(segs) == 0


def test_merge_lines_chain_and_loop():
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[1, 0], [2, 0]], dtype=float)
    c = np.array([[5, 5], [6, 6]], dtype=float)
    chains = K.merge_lines([a, b, c])
    assert len(chains) == 2
    lens = sorted(len(ch) for ch in chains)
    assert lens == [2, 3]


def test_merge_lines_respects_degree3():
    # three lines meeting at one point must not merge through it
    a = np.array([[0, 0], [1, 0]], dtype=float)
    b = np.array([[1, 0], [2, 0]], dtype=float)
    c = np.array([[1, 0], [1, 1]], dtype=float)
    chains = K.merge_lines([a, b, c])
    assert len(chains) == 3


def test_insert_points_on_line():
    line = np.array([[0, 0], [4, 0]], dtype=float)
    pts = np.array([[1.0, 0.0], [3.0, 0.0], [2.0, 5.0]])
    out = K.insert_points_on_line(line, pts)
    assert out.tolist() == [[0, 0], [1, 0], [3, 0], [4, 0]]


def test_insert_points_existing_vertex_not_duplicated():
    line = np.array([[0, 0], [2, 0], [4, 0]], dtype=float)
    out = K.insert_points_on_line(line, np.array([[2.0, 0.0]]))
    assert out.tolist() == line.tolist()


def test_douglas_peucker():
    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 2], [4, 0]], dtype=float)
    out = K.douglas_peucker(line, 0.1)
    assert out.tolist() == [[0, 0], [2, 0], [3, 2], [4, 0]]


def test_visvalingam():
    line = np.array([[0, 0], [1, 0.01], [2, 0], [3, 2], [4, 0]], dtype=float)
    out = K.visvalingam(line, 0.5)
    assert [0, 0] in out.tolist() and [3, 2] in out.tolist()
    assert [1, 0.01] not in out.tolist()


def test_points_in_ring():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    pts = np.array([[2, 2], [5, 5], [0, 2], [4, 4], [-1, -1]], dtype=float)
    got = K.points_in_ring(pts, ring).tolist()
    assert got == [True, False, True, True, False]


def test_points_in_ring_cw():
    ring = np.array([[0, 0], [0, 4], [4, 4], [4, 0], [0, 0]], dtype=float)
    assert K.points_in_ring(np.array([[2.0, 2.0]]), ring).tolist() == [True]


# ------------------------------------------------- shared_chain_endpoints


def _endpoint_set(segs):
    return set(map(tuple, K.shared_chain_endpoints(np.asarray(segs, float))))


def _exact_set(segs):
    return set(map(tuple, K._chain_endpoints_exact(np.asarray(segs, float))))


def test_chain_endpoints_open_chain():
    segs = [[0, 0, 1, 0], [1, 0, 2, 0], [2, 0, 3, 1]]
    assert _endpoint_set(segs) == {(0.0, 0.0), (3.0, 1.0)}


def test_chain_endpoints_closed_ring_falls_back():
    # triangle: all degrees 2 -> cycle; merge_lines emits its start vertex
    segs = [[0, 0, 1, 0], [1, 0, 0, 1], [0, 1, 0, 0]]
    assert _endpoint_set(segs) == _exact_set(segs)
    assert len(_endpoint_set(segs)) == 1  # closed loop: start == end


def test_chain_endpoints_branch_falls_back():
    # degree-3 vertex at origin
    segs = [[0, 0, 1, 0], [0, 0, 0, 1], [0, 0, -1, 0]]
    assert _endpoint_set(segs) == _exact_set(segs)


def test_chain_endpoints_path_plus_separate_cycle():
    # open chain + disjoint square ring: the cycle component must still be
    # detected (union-find), not masked by the chain's degree-1 vertices
    segs = [
        [0, 0, 1, 0],
        [5, 5, 6, 5], [6, 5, 6, 6], [6, 6, 5, 6], [5, 6, 5, 5],
    ]
    assert _endpoint_set(segs) == _exact_set(segs)
    assert {(0.0, 0.0), (1.0, 0.0)} <= _endpoint_set(segs)


def test_chain_endpoints_fuzz_equivalence():
    rng = np.random.default_rng(7)
    for _ in range(500):
        nv = rng.integers(2, 8)
        verts = rng.integers(0, 5, size=(nv, 2)).astype(float) * 0.5
        pairs = [
            (i, j)
            for i, j in rng.integers(0, nv, size=(rng.integers(1, 10), 2))
            if i != j
        ]
        if not pairs:
            continue
        segs = K._dedupe_segments(
            np.asarray([[*verts[i], *verts[j]] for i, j in pairs])
        )
        assert _endpoint_set(segs) == _exact_set(segs)
