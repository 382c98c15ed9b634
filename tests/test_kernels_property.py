"""Property-based checks (hypothesis) for the pure-numpy kernels — the
bit-exactness layer everything else stands on. No Spark session: these run
hundreds of generated examples per property in milliseconds.

Each property states an algebraic invariant the reference's semantics
imply, so a regression that happens to pass the example-based parity tests
still gets caught here.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from topojson_spark.functions import kernels as K

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def coords_strategy(min_pts=2, max_pts=12):
    return st.lists(
        st.tuples(finite, finite), min_size=min_pts, max_size=max_pts
    ).map(lambda pts: np.asarray(pts, dtype=np.float64))


def ring_strategy(min_pts=3, max_pts=10):
    """Closed rings with >= 3 distinct-ish vertices."""
    return (
        st.lists(st.tuples(finite, finite), min_size=min_pts, max_size=max_pts)
        .map(lambda pts: np.asarray(pts + [pts[0]], dtype=np.float64))
    )


@given(coords_strategy(), st.floats(min_value=2, max_value=1e6))
@settings(max_examples=200, deadline=None)
def test_quantize_delta_roundtrip_exact(coords, qf):
    """delta_encode is exactly invertible on the quantized grid: decoding
    with scale=1/translate=0 reproduces the quantized integers bit-exact,
    and full decoding lands every vertex within one grid step of where the
    quantized point sits."""
    bbox = (
        float(coords[:, 0].min()), float(coords[:, 1].min()),
        float(coords[:, 0].max()), float(coords[:, 1].max()),
    )
    q = K.quantize_coords(coords, bbox, qf)
    enc = K.delta_encode(q)
    dec = K.delta_decode(enc, [1.0, 1.0], [0.0, 0.0])
    assert np.array_equal(dec.astype(np.int64), q)
    kx, ky = K.quantize_factors(bbox, qf)
    world = K.dequantize_coords(q, [kx, ky], [bbox[0], bbox[1]])
    # every dequantized vertex is within half a grid step (+float slop) of
    # SOME input vertex's snap target
    assert world[:, 0].min() >= bbox[0] - kx
    assert world[:, 0].max() <= bbox[2] + kx


@given(coords_strategy(min_pts=2, max_pts=10))
@settings(max_examples=200, deadline=None)
def test_quantize_never_empty_and_dedups(coords):
    """Quantization drops consecutive duplicates but never returns fewer
    than the degenerate-guard minimum (ops.py:641-668 semantics)."""
    bbox = (
        float(coords[:, 0].min()), float(coords[:, 1].min()),
        float(coords[:, 0].max()), float(coords[:, 1].max()),
    )
    q = K.quantize_coords(coords, bbox, 1e4)
    assert len(q) >= 1
    if len(q) > 1:
        dif = np.abs(np.diff(q, axis=0)).sum(axis=1)
        # either consecutive dups are gone, or the whole line snapped to a
        # single grid point and the degenerate guard kept it un-deduped
        # (ops.py:641-668: never collapse a line to one point)
        assert (dif != 0).all() or (dif == 0).all()


@given(ring_strategy())
@settings(max_examples=200, deadline=None)
def test_signed_area_negates_under_reversal(ring):
    # reversal negates area up to shoelace cancellation noise, which scales
    # with the PRODUCT magnitudes (max|coord|^2), not with the area itself
    a = K.signed_area(ring)
    b = K.signed_area(ring[::-1])
    m = float(np.abs(ring).max())
    assert abs(a + b) <= 1e-9 * max(1.0, m * m)


@given(ring_strategy(), st.booleans())
@settings(max_examples=200, deadline=None)
def test_orient_ring_idempotent(ring, ccw):
    o1 = K.orient_ring(ring, ccw)
    o2 = K.orient_ring(o1, ccw)
    # idempotent and correct whenever the area is numerically meaningful.
    # Shoelace cancellation noise scales with max|coord|^2 (a degenerate
    # ring at coordinate magnitude 1e6 can report area ~1e3 of pure
    # round-off), so the meaningful-area guard must scale the same way —
    # near that floor the ccw predicate is not stable and the reference's
    # np.sum-based test wobbles identically.
    m = float(np.abs(ring).max())
    if abs(K.signed_area(ring)) > 1e-9 * max(1.0, m * m):
        assert np.array_equal(o1, o2)
        assert K.is_ccw(o1) == ccw


@given(coords_strategy(min_pts=2, max_pts=12))
@settings(max_examples=200, deadline=None)
def test_canonical_dup_bytes_reversal_invariant(coords):
    """A duplicate arc traversed backwards must canonicalize identically —
    the property duplicate-arc detection rests on (ops.py:961-971)."""
    assert K.canonical_dup_bytes(coords) == K.canonical_dup_bytes(
        coords[::-1]
    )


@given(ring_strategy(min_pts=4, max_pts=10), st.data())
@settings(max_examples=150, deadline=None)
def test_fast_split_conserves_path(ring, data):
    """Splitting at any vertex subset conserves the traversal: pieces chain
    end-to-start, their vertex multiset (minus rejoined endpoints) equals a
    rotation of the input ring, and piece endpoints sit at junctions."""
    n = len(ring) - 1
    k = data.draw(st.integers(min_value=0, max_value=n - 1))
    idx = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=n - 1),
            min_size=k, max_size=k, unique=True,
        )
    )
    junctions = ring[idx] if idx else np.empty((0, 2))
    keys = K.packed_vertex_keys(np.asarray(junctions, dtype=np.float64))
    pieces = K.fast_split(ring, keys, is_ring=True)
    assert len(pieces) >= 1
    # pieces chain: each piece starts where the previous ended
    for a, b in zip(pieces, pieces[1:]):
        assert np.array_equal(a[-1], b[0])
    # closure: the chain ends where it starts
    assert np.array_equal(pieces[0][0], pieces[-1][-1])
    # total vertex count: n unique ring vertices + 1 closure + 1 extra per
    # interior split
    total = sum(len(p) for p in pieces)
    assert total == (n + 1) + (len(pieces) - 1)


@given(coords_strategy(min_pts=3, max_pts=12),
       st.floats(min_value=1e-6, max_value=10.0))
@settings(max_examples=200, deadline=None)
def test_douglas_peucker_contract(coords, eps):
    out = K.douglas_peucker(coords, eps)
    # endpoints preserved, output is a subsequence of the input
    assert np.array_equal(out[0], coords[0])
    assert np.array_equal(out[-1], coords[-1])
    assert len(out) <= len(coords)
    src = {tuple(p) for p in coords}
    assert all(tuple(p) in src for p in out)


@given(st.lists(st.tuples(finite, finite), min_size=1, max_size=40))
@settings(max_examples=150, deadline=None)
def test_points_in_ring_unit_square(pts):
    """Winding test agrees with the closed-form answer on the unit square
    (boundary counts as inside)."""
    ring = np.asarray(
        [[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]], dtype=np.float64
    )
    xy = np.asarray(pts, dtype=np.float64)
    got = K.points_in_ring(xy, ring)
    want = (
        (xy[:, 0] >= 0) & (xy[:, 0] <= 1) & (xy[:, 1] >= 0) & (xy[:, 1] <= 1)
    )
    assert np.array_equal(got, want)


@given(coords_strategy(min_pts=2, max_pts=10))
@settings(max_examples=200, deadline=None)
def test_clip_polyline_contract(coords):
    """Clipped pieces stay inside the rect; every piece vertex is either an
    original vertex or sits on the rect boundary; total length never grows;
    a polyline fully inside returns byte-equal."""
    rect = (-10.0, -10.0, 10.0, 10.0)
    pieces = K.clip_polyline_to_rect(coords, *rect)
    eps = 1e-9 * 1e6
    src = {tuple(p) for p in coords}
    for pc in pieces:
        assert (pc[:, 0] >= rect[0] - eps).all()
        assert (pc[:, 0] <= rect[2] + eps).all()
        assert (pc[:, 1] >= rect[1] - eps).all()
        assert (pc[:, 1] <= rect[3] + eps).all()
        for p in pc:
            on_boundary = (
                abs(p[0] - rect[0]) <= eps or abs(p[0] - rect[2]) <= eps
                or abs(p[1] - rect[1]) <= eps or abs(p[1] - rect[3]) <= eps
            )
            assert tuple(p) in src or on_boundary

    def length(a):
        return float(np.sqrt((np.diff(a, axis=0) ** 2).sum(axis=1)).sum())

    assert sum(length(pc) for pc in pieces) <= length(coords) + 1e-6

    inside = K.clip_polyline_to_rect(
        coords, -2e6, -2e6, 2e6, 2e6
    )
    if len(coords) >= 2 and length(coords) > 0:
        assert len(inside) == 1 and np.array_equal(
            np.asarray(inside[0]), coords[
                np.insert((np.abs(np.diff(coords, axis=0)).sum(axis=1) != 0),
                          0, True)
            ]
        )
