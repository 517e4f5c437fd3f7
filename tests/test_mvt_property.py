"""Property-based checks for the MVT wire codec, the bbox clipper, and
DP simplification (hypothesis) — random structure the unit goldens can't
enumerate."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jpspark.codec import mvt
from jpspark.geom import clip as gclip
from jpspark.geom import simplify as simp
from jpspark.geom import wkb


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_uvarint_roundtrip_stream(vals):
    buf = b"".join(mvt.uvarint(v) for v in vals)
    pos, got = 0, []
    while pos < len(buf):
        v, pos = mvt.read_uvarint(buf, pos)
        got.append(v)
    assert got == vals


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_zigzag_roundtrip_and_ordering(vals):
    for v in vals:
        assert mvt.unzigzag(mvt.zigzag(v)) == v
        assert mvt.zigzag(v) >= 0


@given(
    st.lists(
        st.tuples(st.integers(0, 8191), st.integers(0, 8191)),
        min_size=1,
        max_size=200,
    ),
    st.lists(st.integers(0, 2**50), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_vectorized_features_match_scalar(coords, raw_ids):
    n = min(len(coords), len(raw_ids))
    qx = np.array([c[0] for c in coords[:n]])
    qy = np.array([c[1] for c in coords[:n]])
    ids = np.array(raw_ids[:n])
    fast = mvt.encode_point_features(qx, qy, ids)
    slow = b"".join(
        mvt._ld(
            2,
            mvt.encode_feature(
                mvt.point_geometry(qx[i : i + 1], qy[i : i + 1]),
                mvt.POINT,
                feature_id=int(ids[i]),
            ),
        )
        for i in range(n)
    )
    assert fast == slow


@given(
    st.lists(
        st.tuples(st.integers(-500, 500), st.integers(-500, 500)),
        min_size=3,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=150, deadline=None)
def test_linestring_geometry_roundtrip(pts):
    line = np.array(pts, dtype=np.int64)
    cmds = mvt.linestring_geometry([line])
    parts = mvt.decode_geometry(cmds, mvt.LINESTRING)
    assert len(parts) == 1 and (parts[0] == line).all()


@given(
    st.integers(3, 12),
    st.integers(0, 2**31),
    st.floats(-50, 50),
    st.floats(-50, 50),
    st.floats(1, 80),
)
@settings(max_examples=150, deadline=None)
def test_clip_convex_polygon_area(n_verts, seed, cx, cy, r):
    """Clipping a convex polygon to a box never increases area, keeps all
    vertices inside the box, and an enclosing box is an identity."""
    rng = np.random.default_rng(seed)
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    if len(np.unique(ang)) < 3:
        return
    ring = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    full = abs(wkb.ring_area(np.vstack([ring, ring[:1]])))
    # enclosing box: identity
    c = gclip.clip_ring_bbox(ring, cx - 2 * r, cy - 2 * r, cx + 2 * r, cy + 2 * r)
    assert len(c) == len(ring)
    # half box: area shrinks, result inside the box
    c = gclip.clip_ring_bbox(ring, cx, cy - 2 * r, cx + 2 * r, cy + 2 * r)
    if len(c):
        a = abs(wkb.ring_area(np.vstack([c, c[:1]])))
        assert a <= full + 1e-9
        assert (c[:, 0] >= cx - 1e-9).all()


@given(st.integers(0, 2**31), st.integers(10, 200), st.floats(0.01, 5.0))
@settings(max_examples=100, deadline=None)
def test_dp_invariants_random_walks(seed, n, tol):
    rng = np.random.default_rng(seed)
    pts = np.cumsum(rng.normal(0, 1, (n, 2)), axis=0)
    keep = simp.dp_mask(pts, tol)
    assert keep[0] and keep[-1]
    kept_idx = np.flatnonzero(keep)
    # chord invariant: every dropped vertex within tol of its span's chord
    for a_i, b_i in zip(kept_idx[:-1], kept_idx[1:]):
        a, b = pts[a_i], pts[b_i]
        d = b - a
        L2 = float(d @ d)
        for p in pts[a_i + 1 : b_i]:
            if L2 == 0:
                assert float(np.hypot(*(p - a))) <= tol + 1e-9
            else:
                cross = (p[0] - a[0]) * d[1] - (p[1] - a[1]) * d[0]
                assert abs(float(cross)) / np.sqrt(L2) <= tol + 1e-9
