"""Viterbi map-matching: assign each GPS track to road lines with a
switch penalty — the trajectory operator Spark has no built-in for.

Emission costs (point -> nearest distance per candidate line) are pure
Column algebra over a broadcast segment table; the sequential DP is the
one genuinely stateful-per-track step, so it runs as ``applyInPandas``
over track groups (the engine's custom-operator escape hatch: Arrow
batches in, one numpy DP per group, fixed-width rows out). Exchange
weight: one shuffle of (track, i, line, emission) quadruples — double +
three small ints, never coordinates or geometry.

DP recurrence (classic HMM map-matching, e.g. Newson & Krumm 2009,
simplified to a constant switch cost):

    dp[0]    = emission[0]
    dp[i][l] = emission[i][l] + min(dp[i-1][l], min(dp[i-1]) + switch_cost)

The reported cost is quantized via floor(x * 1e6 + 0.5) so the DuckDB
oracle (a recursive CTE carrying the dp vector as a LIST, stepped with a
list comprehension) replays it integer-exactly; the argmin line uses
first-index tie-breaking in both engines.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def line_emissions(
    points: DataFrame,
    segments: DataFrame,
    track_col: str = "user_id",
    idx_col: str = "i",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per (track point, candidate line) emission cost: the minimum
    clamped-projection distance over the line's segments. Same kernel as
    geom.linear.snap_to_segments (kept expression-identical so oracles
    replay bit-for-bit); min() is order-independent, so the per-line
    reduce needs no quantization."""
    px, py = F.col(x_col), F.col(y_col)
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    len2 = dx * dx + dy * dy
    t = F.when(len2 == 0.0, F.lit(0.0)).otherwise(
        F.least(
            F.greatest(((px - F.col("ax")) * dx + (py - F.col("ay")) * dy) / len2, F.lit(0.0)),
            F.lit(1.0),
        )
    )
    cand = points.crossJoin(F.broadcast(segments)).select(
        F.col(track_col),
        F.col(idx_col),
        "line_id",
        (F.col("ax") + t * dx).alias("_sx"),
        (F.col("ay") + t * dy).alias("_sy"),
        px.alias("_px"),
        py.alias("_py"),
    )
    ddx = F.col("_px") - F.col("_sx")
    ddy = F.col("_py") - F.col("_sy")
    return (
        cand.withColumn("dist", F.sqrt(ddx * ddx + ddy * ddy))
        .groupBy(track_col, idx_col, "line_id")
        .agg(F.min("dist").alias("emission"))
    )


def map_match(
    points: DataFrame,
    segments: DataFrame,
    switch_cost: float = 0.25,
    track_col: str = "user_id",
    idx_col: str = "i",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Viterbi-match each track against the candidate lines; returns one
    row per track: (track, n_pts, cost_u6, best_line). ``cost_u6`` is the
    optimal path cost in 1e-6 units (floor(x*1e6+0.5)); ``best_line`` the
    final line of the optimal path, first-index tie-break."""
    em = line_emissions(points, segments, track_col, idx_col, x_col, y_col)
    lam = float(switch_cost)
    schema = T.StructType(
        [
            T.StructField(track_col, T.LongType()),
            T.StructField("n_pts", T.IntegerType()),
            T.StructField("cost_u6", T.LongType()),
            T.StructField("best_line", T.LongType()),
        ]
    )

    def dp(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = (
            pdf.pivot(index=idx_col, columns="line_id", values="emission")
            .sort_index()
        )
        # columns sorted by line id: argmin index == line rank
        mat = mat.reindex(sorted(mat.columns), axis=1)
        lines = np.asarray(sorted(mat.columns), dtype=np.int64)
        e = mat.to_numpy()
        cur = e[0].copy()
        for row in e[1:]:
            cur = row + np.minimum(cur, cur.min() + lam)
        best = float(cur.min())
        return pd.DataFrame(
            {
                track_col: [int(pdf[track_col].iloc[0])],
                "n_pts": [int(e.shape[0])],
                "cost_u6": [int(math.floor(best * 1e6 + 0.5))],
                "best_line": [int(lines[int(cur.argmin())])],
            }
        )

    return em.groupBy(track_col).applyInPandas(dp, schema)
