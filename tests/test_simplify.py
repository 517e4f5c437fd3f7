"""Douglas–Peucker simplification: deviation bound, subset/endpoint
invariants, ring handling, the DataFrame op, and MVT integration."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jpspark.geom import simplify as simp
from jpspark.geom import wkb


def _max_deviation(orig: np.ndarray, kept: np.ndarray) -> float:
    """DP's exact invariant: for each pair of CONSECUTIVE retained
    vertices, every original vertex between them (in sequence order) is
    within tol of the infinite line through that pair — the chord the
    span was collapsed against."""
    kept_idx = []
    j = 0
    for i, p in enumerate(orig):
        if j < len(kept) and (p == kept[j]).all():
            kept_idx.append(i)
            j += 1
    assert j == len(kept), "retained vertices must appear in input order"
    worst = 0.0
    for a_i, b_i in zip(kept_idx[:-1], kept_idx[1:]):
        a, b = orig[a_i], orig[b_i]
        d = b - a
        L2 = float(d @ d)
        for p in orig[a_i + 1 : b_i]:
            if L2 == 0:
                worst = max(worst, float(np.hypot(*(p - a))))
            else:
                cross = (p[0] - a[0]) * d[1] - (p[1] - a[1]) * d[0]
                worst = max(worst, abs(float(cross)) / np.sqrt(L2))
    return worst


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dp_deviation_bound_and_subset(seed):
    rng = np.random.default_rng(seed)
    n = 200
    pts = np.cumsum(rng.normal(0, 1, (n, 2)), axis=0)
    for tol in (0.1, 1.0, 5.0):
        kept = simp.simplify_polyline(pts, tol)
        # endpoints preserved, vertices a subset of the input
        assert (kept[0] == pts[0]).all() and (kept[-1] == pts[-1]).all()
        as_set = {tuple(p) for p in pts}
        assert all(tuple(p) in as_set for p in kept)
        # DP guarantee: every dropped vertex within tol of the result
        assert _max_deviation(pts, kept) <= tol + 1e-9
        # idempotent
        again = simp.simplify_polyline(kept, tol)
        assert len(again) == len(kept)


def test_dp_threshold_exact():
    # straight run with sub-tol wiggle: collapses to endpoints
    x = np.linspace(0, 10, 33)
    y = 0.01 * np.sin(np.arange(33))
    pts = np.column_stack([x, y])
    assert len(simp.simplify_polyline(pts, 0.05)) == 2
    # one spike above tol is retained exactly
    y2 = y.copy()
    y2[16] = 1.0
    kept = simp.simplify_polyline(np.column_stack([x, y2]), 0.05)
    assert any((p == [x[16], 1.0]).all() for p in kept)


def test_ring_simplify_closed_and_degenerate():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    dense = []
    for a, b in zip(sq[:-1], sq[1:]):
        for t in np.linspace(0, 1, 10, endpoint=False):
            dense.append(a + t * (b - a))
    dense.append(sq[0])
    ring = np.array(dense)
    out = simp.simplify_ring(ring, 0.5)
    assert (out[0] == out[-1]).all()
    assert len(out) == 5  # the square back
    assert abs(wkb.ring_area(out) - 100) < 1e-9
    # collapse below 3 distinct vertices -> dropped
    flat = np.array([[0, 0], [5, 1e-6], [10, 0], [0, 0]], dtype=float)
    assert len(simp.simplify_ring(flat, 0.1)) == 0


def test_simplify_multipolygon_drops_degenerate_parts():
    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    sliver = np.array([[20, 0], [30, 0.001], [40, 0], [20, 0]], dtype=float)
    buf = wkb.encode_multipolygon([[sq], [sliver]])
    out = wkb.parse_multipolygon(simp.simplify_multipolygon(buf, 0.1))
    assert len(out) == 1 and len(out[0]) == 1
    assert abs(wkb.ring_area(out[0][0]) - 100) < 1e-9


def test_simplify_geoms_op(spark):
    from jpspark.ops import generalize

    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=float)
    dense = []
    for a, b in zip(sq[:-1], sq[1:]):
        for t in np.linspace(0, 1, 25, endpoint=False):
            dense.append(a + t * (b - a))
    dense.append(sq[0])
    df = spark.createDataFrame(
        pd.DataFrame({"gid": [1], "geom": [wkb.encode_multipolygon([[np.array(dense)]])]})
    )
    out = generalize.simplify_geoms(df, 0.5).collect()[0]
    assert out["n_vertices_in"] == 101 and out["n_vertices_out"] == 5
    got = wkb.parse_multipolygon(bytes(out["geom"]))
    assert abs(wkb.ring_area(got[0][0]) - 100) < 1e-9


def test_mvt_polygons_simplify_px(spark):
    """simplify_px strips sub-pixel coastline detail: vertex counts drop
    sharply while the decoded pixel area stays within a pixel-perimeter
    band of the unsimplified area."""
    from jpspark.codec import mvt
    from jpspark.ops import export

    rng = np.random.default_rng(5)
    n = 400
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    r = 8.0 + 0.01 * rng.standard_normal(n)  # degree-scale circle, tiny noise
    ring = np.column_stack([20 + r * np.cos(ang), 20 + r * np.sin(ang)])
    ring = np.vstack([ring, ring[:1]])
    polys = spark.createDataFrame(
        pd.DataFrame({"poly_id": [1], "geom": [wkb.encode_multipolygon([[ring]])]})
    )

    def stats(simplify_px):
        rows = export.mvt_tiles_polygons(
            polys, 4, id_col="poly_id", buffer_px=0, simplify_px=simplify_px
        ).collect()
        nv = area = 0
        for row in rows:
            for f in mvt.decode_tile(bytes(row.bytes))[0]["features"]:
                for rr, a2 in f["geometry"]:
                    nv += len(rr)
                    area += a2 / 2
        return nv, area

    nv0, area0 = stats(0)
    nv1, area1 = stats(8.0)
    assert nv1 < nv0 * 0.35
    assert abs(area1 - area0) / area0 < 0.01
