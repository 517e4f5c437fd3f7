"""Douglas–Peucker line simplification (generalization for vector tiles).

A tile at zoom z cannot resolve detail finer than one pixel of its
extent, so the MVT sink simplifies clipped rings with a tolerance tied to
the pixel size before quantizing — the step tippecanoe performs for the
reference's exported layers. Classic DP: keep a vertex iff its
perpendicular distance to the chord of the current span exceeds ``tol``;
recurse on the split. Deterministic, endpoint-preserving, and the kept
vertices are a SUBSET of the input (no new coordinates are invented, so
downstream bit-exact comparisons survive simplification).

Implementation is an explicit stack (no recursion limits) with NumPy
distance kernels per span — O(n log n) typical, O(n²) worst case like
every DP."""

from __future__ import annotations

import numpy as np


def _perp_dist(pts: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Distance from each point to segment chord a→b (degenerate chord ⇒
    plain Euclidean distance to a)."""
    d = b - a
    L2 = float(d[0] * d[0] + d[1] * d[1])
    if L2 == 0.0:
        dx = pts[:, 0] - a[0]
        dy = pts[:, 1] - a[1]
        return np.sqrt(dx * dx + dy * dy)
    # |cross(b-a, p-a)| / |b-a|
    cross = (pts[:, 0] - a[0]) * d[1] - (pts[:, 1] - a[1]) * d[0]
    return np.abs(cross) / np.sqrt(L2)


def dp_mask(pts: np.ndarray, tol: float) -> np.ndarray:
    """Boolean keep-mask for an OPEN polyline (first/last always kept)."""
    n = len(pts)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    if n <= 2:
        return keep
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = pts[i + 1 : j]
        dist = _perp_dist(seg, pts[i], pts[j])
        k = int(np.argmax(dist))
        if dist[k] > tol:
            m = i + 1 + k
            keep[m] = True
            stack.append((i, m))
            stack.append((m, j))
    return keep


def simplify_polyline(pts: np.ndarray, tol: float) -> np.ndarray:
    return pts[dp_mask(np.asarray(pts, dtype=np.float64), tol)]


def simplify_ring(ring: np.ndarray, tol: float) -> np.ndarray:
    """Simplify a CLOSED ring (first point repeated at the end). Anchors:
    the ring's first vertex and the vertex farthest from it — DP between
    the anchors in both halves. Returns a closed ring; degenerates to
    empty (len 0) if fewer than 3 distinct vertices survive."""
    r = np.asarray(ring, dtype=np.float64)
    closed = len(r) > 1 and (r[0] == r[-1]).all()
    body = r[:-1] if closed else r
    n = len(body)
    if n < 3:
        return r[:0]
    dx = body[:, 0] - body[0, 0]
    dy = body[:, 1] - body[0, 1]
    far = int(np.argmax(dx * dx + dy * dy))
    if far == 0:
        return r[:0]  # all vertices coincide
    m1 = dp_mask(body[: far + 1], tol)
    m2 = dp_mask(np.vstack([body[far:], body[:1]]), tol)
    keep = np.zeros(n, dtype=bool)
    keep[: far + 1] = m1
    keep[far:] |= m2[:-1]
    keep[0] |= m2[-1]
    out = body[keep]
    if len(out) < 3:
        return r[:0]
    return np.vstack([out, out[:1]])


def simplify_multipolygon(buf: bytes, tol: float) -> bytes:
    """Per-ring DP over a WKB multipolygon. A ring that degenerates is
    dropped; a polygon whose EXTERIOR degenerates is dropped whole."""
    from . import wkb

    out = []
    for rings in wkb.parse_multipolygon(bytes(buf)):
        ext = simplify_ring(rings[0], tol)
        if len(ext) == 0:
            continue
        poly = [ext]
        for hole in rings[1:]:
            h = simplify_ring(hole, tol)
            if len(h):
                poly.append(h)
        out.append(poly)
    return wkb.encode_multipolygon(out)
