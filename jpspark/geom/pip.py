"""Ray-casting point-in-polygon — vectorized NumPy kernel + scalar oracle.

The reference delegates containment to PostGIS ``ST_Contains`` after load
(/root/reference/NOTES.md:96-133 consumption pattern); the north_rule
requires a from-scratch distributed implementation.

Boundary convention (PINNED — golden tables depend on it):
  Even-odd ray casting with a horizontal ray to +x and half-open edges:
  an edge contributes a crossing iff ``(y1 > py) != (y2 > py)`` and the
  intersection x is strictly greater than px. Consequences for an
  axis-aligned rectangle [x0,x1) x [y0,y1): bottom and left edges are
  inside, top and right are outside — identical to the ``floor``
  half-open convention used by the cell index and tile math, so grid
  tilings assign every point to exactly one polygon.
"""

from __future__ import annotations

import numpy as np


def point_in_ring_scalar(px: float, py: float, ring: np.ndarray) -> bool:
    """O(n) scalar oracle — used by property tests and golden generation."""
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py):
            xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xint:
                inside = not inside
    return inside


def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized over points: (P,) bool for one ring of (N,2) vertices."""
    x1 = ring[:, 0]
    y1 = ring[:, 1]
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    px = px[:, None]  # (P,1) vs (N,) edges
    py = py[:, None]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
    crossings = straddle & (px < xint)
    return (crossings.sum(axis=1) % 2).astype(bool)


def points_in_polygon(px: np.ndarray, py: np.ndarray, rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd over exterior + holes (ring 0 exterior)."""
    inside = points_in_ring(px, py, rings[0])
    for hole in rings[1:]:
        inside &= ~points_in_ring(px, py, hole)
    return inside


def points_in_multipolygon(px: np.ndarray, py: np.ndarray, polys: list[list[np.ndarray]]) -> np.ndarray:
    out = np.zeros(len(px), dtype=bool)
    for rings in polys:
        remaining = ~out
        if not remaining.any():
            break
        out[remaining] = points_in_polygon(px[remaining], py[remaining], rings)
    return out


def points_in_ring_blocked(
    px: np.ndarray, py: np.ndarray, ring: np.ndarray, block: int = 1 << 18
) -> np.ndarray:
    """points_in_ring with bounded memory: the (P,N) edge matrix is chunked
    so P*N stays under ``block`` — keeps pandas-UDF batches from blowing up
    on detailed polygons."""
    n = max(1, len(ring))
    step = max(1, block // n)
    out = np.empty(len(px), dtype=bool)
    for i in range(0, len(px), step):
        out[i : i + step] = points_in_ring(px[i : i + step], py[i : i + step], ring)
    return out
