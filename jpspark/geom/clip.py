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


def clip_polyline_bbox(
    line: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> list[np.ndarray]:
    """Clip an open polyline to the rectangle [x0,x1]×[y0,y1]
    (Liang–Barsky per segment), reassembling maximal runs: consecutive
    clipped segments that share their connecting endpoint merge into one
    output part, so a polyline that leaves and re-enters the box yields
    multiple parts. Degenerate (point) results are dropped."""
    pts = np.asarray(line, dtype=np.float64)
    parts: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for a, b in zip(pts[:-1], pts[1:]):
        d = b - a
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in (
            (-d[0], a[0] - x0), (d[0], x1 - a[0]),
            (-d[1], a[1] - y0), (d[1], y1 - a[1]),
        ):
            if p == 0.0:
                if q < 0.0:
                    ok = False
                    break
                continue
            r = q / p
            if p < 0.0:
                if r > t1:
                    ok = False
                    break
                t0 = max(t0, r)
            else:
                if r < t0:
                    ok = False
                    break
                t1 = min(t1, r)
        if not ok or t0 > t1:
            if len(cur) >= 2:
                parts.append(cur)
            cur = []
            continue
        ca, cb = a + t0 * d, a + t1 * d
        if cur and np.array_equal(cur[-1], ca):
            cur.append(cb)
        else:
            if len(cur) >= 2:
                parts.append(cur)
            cur = [ca, cb]
    if len(cur) >= 2:
        parts.append(cur)
    out = []
    for p in parts:
        arr = np.array(p)
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
        arr = arr[keep]
        if len(arr) >= 2:
            out.append(arr)
    return out
