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
    endpoints."""
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

    def half(idx_range):
        st: list[int] = []
        for i in idx_range:
            while len(st) >= 2:
                ax, ay = p[st[-2]]
                bx, by = p[st[-1]]
                if (bx - ax) * (p[i, 1] - ay) - (by - ay) * (p[i, 0] - ax) <= 0:
                    st.pop()
                else:
                    break
            st.append(i)
        return st

    lower = half(range(n))
    upper = half(range(n - 1, -1, -1))
    cycle = lower[:-1] + upper[:-1]
    if len(cycle) < 3:  # all collinear: extremes only
        return order[[0, n - 1]]
    return order[np.array(cycle)]


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
    """
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    pts = points.select(
        F.col(key_col).alias("k"), x.alias("x"), y.alias("y")
    ).filter(
        F.col("k").isNotNull()
        & F.col("x").isNotNull() & F.col("y").isNotNull()
        & ~F.isnan("x") & ~F.isnan("y")
    )
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
            for key, g in pdf.groupby("k", sort=False):
                xs, ys = g["x"].to_numpy(), g["y"].to_numpy()
                bufs.setdefault(key, []).append((xs, ys))
                counts[key] = counts.get(key, 0) + len(xs)
                if counts[key] > 4096:
                    fold(key)
        for key in bufs:
            fold(key)
            hx, hy = bufs[key][0]
            yield pd.DataFrame({"k": key, "x": hx, "y": hy})

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
