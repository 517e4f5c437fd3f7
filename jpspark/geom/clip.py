"""Axis-aligned polygon clipping (Sutherland–Hodgman) for tile cutting.

Each MVT tile renders only the part of a polygon inside its (buffered)
bbox, so the tiling sink clips every covering polygon per tile. The clip
region is an axis-aligned rectangle (always convex), which is exactly the
case Sutherland–Hodgman handles without degeneracy: clip the subject ring
against each of the four half-planes in turn. Output rings may contain
collinear boundary runs (normal for S-H); area is exact for the
rectangle∩polygon intersection.
"""

from __future__ import annotations

import numpy as np


def _clip_half_plane(ring: np.ndarray, axis: int, bound: float, keep_ge: bool) -> np.ndarray:
    """One S-H pass: keep the side of ``axis == bound`` given by
    ``keep_ge`` (inside test ``v >= bound`` or ``v <= bound``)."""
    if len(ring) == 0:
        return ring
    v = ring[:, axis]
    inside = v >= bound if keep_ge else v <= bound
    if inside.all():
        return ring
    if not inside.any():
        return ring[:0]
    out = []
    n = len(ring)
    for i in range(n):
        j = (i + 1) % n
        a, b = ring[i], ring[j]
        ia, ib = inside[i], inside[j]
        if ia:
            out.append(a)
        if ia != ib:
            t = (bound - a[axis]) / (b[axis] - a[axis])
            p = a + t * (b - a)
            p[axis] = bound  # exact on the clip edge
            out.append(p)
    return np.array(out, dtype=np.float64)


def clip_ring_bbox(
    ring: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> np.ndarray:
    """Clip an open ring (first point NOT repeated; a closed input ring is
    accepted and de-duplicated) to the rectangle [x0,x1]×[y0,y1]. Returns
    an open ring, possibly empty (fewer than 3 vertices ⇒ empty)."""
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and (r[0] == r[-1]).all():
        r = r[:-1]
    for axis, bound, keep_ge in (
        (0, x0, True), (0, x1, False), (1, y0, True), (1, y1, False)
    ):
        r = _clip_half_plane(r, axis, bound, keep_ge)
        if len(r) < 3:
            return r[:0]
    return r
