"""Convex hull — the ST_ConvexHull surface the reference's PostGIS
consumers run over loaded layers (/root/reference/NOTES.md:96-133
consumption pattern), as a distributed two-phase group operator.

Phase 1 folds each Arrow batch into a per-key RUNNING hull INSIDE each
scan partition — a hull of a subset never loses a hull point of the
whole, so partials are a lossless, associative reduction (the classic
hull-of-hulls identity) — and phase 2 merges each group's surviving
candidates into the final hull. Raw points NEVER shuffle: the only
exchange carries per-partition hull vertices (O(partitions * hull size)
per group, not the group's rows), and phase-1 memory is one Arrow batch
plus hull-sized per-key state no matter how hot a group or how fat a
partition — which is what makes a continental point table's
per-municipality hull tractable at 10^12 rows.

The kernel is Andrew's monotone chain (public algorithm) vectorized with
numpy sorting inside Arrow batches; the oracle replays groups with
gift wrapping — a DIFFERENT algorithm — so agreement checks the geometry,
not the implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def convex_hull_xy(xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Indices of the convex hull of (xs, ys) in counter-clockwise order,
    starting from the lexicographically smallest (x, y) vertex. Collinear
    boundary points are dropped (strict hull). Handles degenerate inputs:
    a single point returns itself; collinear sets return the two extreme
    endpoints.

    Round 7 (guide §4.2): the monotone-chain stack loop runs over plain
    Python floats (identical IEEE doubles, ~8x less per-iteration cost
    than NumPy scalar indexing), and inputs past 256 points first pass an
    Akl–Toussaint prefilter — points strictly inside the octagon of the 8
    directional extremes can never be hull vertices, and the 8 half-plane
    tests are one vectorized pass — so the stack loop sees O(boundary)
    candidates instead of every point. Bit-identical output by
    construction (differential-tested against the round-6 kernel over
    random/collinear/duplicate/circle inputs)."""
    pts = np.column_stack([np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)])
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    # dedupe exact coordinate twins (they can never both be vertices)
    p = pts[order]
    keep = np.ones(len(p), dtype=bool)
    keep[1:] = (p[1:] != p[:-1]).any(axis=1)
    order = order[keep]
    p = p[keep]
    n = len(p)
    if n == 1:
        return order[:1]
    if n == 2:
        return order
    sub = np.arange(n)
    if n > 256:
        px, py = p[:, 0], p[:, 1]
        s = px + py
        d = px - py
        ext = np.unique(np.array([
            0, n - 1, np.argmin(py), np.argmax(py),
            np.argmin(s), np.argmax(s), np.argmin(d), np.argmax(d),
        ]))
        ex, ey = px[ext], py[ext]
        cx, cy = ex.mean(), ey.mean()
        oa = np.argsort(np.arctan2(ey - cy, ex - cx))
        ox, oy = ex[oa], ey[oa]
        inside = np.ones(n, dtype=bool)
        m_oct = len(ox)
        for i in range(m_oct):
            ax, ay = ox[i], oy[i]
            bx, by = ox[(i + 1) % m_oct], oy[(i + 1) % m_oct]
            # strict > keeps boundary points: only STRICT interior drops
            inside &= (bx - ax) * (py - ay) - (by - ay) * (px - ax) > 0
        sub = np.flatnonzero(~inside)
        if len(sub) < 3:  # degenerate octagon (collinear layer)
            sub = np.arange(n)
    lx = p[sub, 0].tolist()
    ly = p[sub, 1].tolist()
    m = len(lx)

    def half(idx_range):
        st: list[int] = []
        for i in idx_range:
            xi = lx[i]
            yi = ly[i]
            while len(st) >= 2:
                j = st[-1]
                k2 = st[-2]
                ax = lx[k2]
                ay = ly[k2]
                if (lx[j] - ax) * (yi - ay) - (ly[j] - ay) * (xi - ax) <= 0:
                    st.pop()
                else:
                    break
            st.append(i)
        return st

    lower = half(range(m))
    upper = half(range(m - 1, -1, -1))
    cycle = lower[:-1] + upper[:-1]
    if len(cycle) < 3:  # all collinear: extremes only
        return order[[0, n - 1]]
    return order[sub[np.array(cycle)]]


def group_convex_hulls(
    points: DataFrame,
    key_col: str,
    x_col: str = "x",
    y_col: str = "y",
    area_scale: int = 32768,
) -> DataFrame:
    """Per-group convex hull summary: (key, n_vertices, area_q2,
    perim_q) with ``area_q2`` = twice the hull area quantized to
    ``area_scale`` units (the doubled shoelace sum of binary-fraction
    lattice coords is exact at that scale — no float order can diverge)
    and ``perim_q`` the perimeter quantized at 1/2^20 (the engine's step
    convention).

    Phase 1 is a ``mapInPandas`` over the scan partitions: each Arrow
    batch folds into a per-key RUNNING hull — the map-side combine of
    hulls — so raw points never ride an exchange and kernel memory is
    one batch plus hull-sized per-key state even when a hot group is
    one repeated landmark coordinate. The phase-2 merge therefore
    receives O(partitions * hull size) rows per group —
    bounded by the cluster's partition count, not the batch count — and
    that merge is the only shuffle. Degenerate groups (1-2 distinct
    points) report their actual vertex count with zero area. Rows with
    NULL keys or NULL/NaN coordinates are dropped up front (a NaN
    poisons every cross-product comparison; NULL keys have no hull).
    Float-typed keys additionally drop NaN keys explicitly (round-7
    advice fix): the phase-1 grouping previously lost NaN-keyed rows as
    a pandas-groupby side effect — now it is a documented contract, a
    NaN key has no well-defined group.
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    key_filter = (
        F.col(key_col).isNotNull()
        & F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    if points.schema[key_col].dataType.simpleString() in ("float", "double"):
        key_filter = key_filter & ~F.isnan(F.col(key_col))
    pts = points.select(
        F.col(key_col).alias("k"), x.alias("x"), y.alias("y")
    ).filter(key_filter & ~F.isnan("x") & ~F.isnan("y"))
    ktype = points.schema[key_col].dataType.simpleString()
    partial_schema = f"k {ktype}, x double, y double"

    def partial(batches):
        # per-key running hull candidates for THIS partition, BUFFERED:
        # points accumulate per key and fold into a hull only when the
        # buffer passes ~4096 points (and once at exhaustion) — the fold
        # is associative (hull-of-hulls), so the result is identical to
        # folding every batch, but tiny per-batch groups stop paying a
        # monotone-chain call each. Memory per key stays bounded by the
        # fold threshold; the partition emits one candidate set per key.
        # Round 7: batches group via one stable argsort + boundary scan
        # (pure NumPy) instead of pandas groupby — same chunks in the
        # same order (stable sort preserves within-key row order), at a
        # fraction of the per-batch cost for many-key batches.
        bufs: dict = {}
        counts: dict = {}

        def fold(key):
            chunks = bufs[key]
            xs = np.concatenate([c[0] for c in chunks])
            ys = np.concatenate([c[1] for c in chunks])
            idx = convex_hull_xy(xs, ys)
            bufs[key] = [(xs[idx], ys[idx])]
            counts[key] = len(idx)

        for pdf in batches:
            kk = pdf["k"].to_numpy()
            xx = pdf["x"].to_numpy()
            yy = pdf["y"].to_numpy()
            order = np.argsort(kk, kind="stable")
            ks = kk[order]
            cuts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            ends = np.r_[cuts[1:], len(ks)]
            for s, e in zip(cuts, ends):
                key = ks[s]
                idx = order[s:e]
                bufs.setdefault(key, []).append((xx[idx], yy[idx]))
                counts[key] = counts.get(key, 0) + (e - s)
                if counts[key] > 4096:
                    fold(key)
        # one output frame per partition (round 7): yielding per key sent
        # one ~hull-sized Arrow batch per (key, partition) — thousands of
        # micro-batches across a job — where a single concat costs one.
        keys_out = []
        xs_out = []
        ys_out = []
        for key in bufs:
            fold(key)
            hx, hy = bufs[key][0]
            keys_out.append(np.full(len(hx), key))
            xs_out.append(hx)
            ys_out.append(hy)
        if keys_out:
            yield pd.DataFrame(
                {
                    "k": np.concatenate(keys_out),
                    "x": np.concatenate(xs_out),
                    "y": np.concatenate(ys_out),
                }
            )

    partials = pts.mapInPandas(partial, partial_schema)

    final_schema = f"k {ktype}, n_vertices int, area_q2 long, perim_q long"

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["k"].iloc[0]
        idx = convex_hull_xy(pdf["x"].to_numpy(), pdf["y"].to_numpy())
        hx = pdf["x"].to_numpy()[idx]
        hy = pdf["y"].to_numpy()[idx]
        m = len(idx)
        if m < 3:
            area2 = 0.0
        else:
            area2 = float(
                np.sum(hx * np.roll(hy, -1) - np.roll(hx, -1) * hy)
            )
        # the closing edge is included for every m: at m == 2 the cycle
        # walks the segment twice (two mirrored steps), at m == 1 the
        # single zero-length edge contributes 0 — no special cases
        steps = np.sqrt(np.diff(np.append(hx, hx[0])) ** 2 + np.diff(np.append(hy, hy[0])) ** 2)
        perim = float(np.sum(np.floor(steps * 1048576.0 + 0.5)))
        return pd.DataFrame(
            {
                "k": [key],
                "n_vertices": [m],
                "area_q2": [int(np.floor(abs(area2) * area_scale + 0.5))],
                "perim_q": [int(perim)],
            }
        )

    out = partials.groupBy("k").applyInPandas(lambda pdf: final(pdf), final_schema)
    return out.select(
        F.col("k").alias(key_col), "n_vertices", "area_q2", "perim_q"
    )
