"""Linear referencing: snap points to the nearest polyline segment.

The map-matching primitive (GPS trace -> road network, station -> rail
line) the reference's PostGIS consumers express as
``ST_ClosestPoint`` / ``ST_LineLocatePoint`` joins; here it is pure
Column algebra — clamped projection onto each candidate segment, then a
per-point top-1 window — so the whole kernel stays inside whole-stage
codegen with no Python and no geometry objects.

Scale shape: the segment table is the small side (a road network is
O(10^7) rows; points are the 10^12-row fact) — broadcast it and the
fact never shuffles before the per-point top-1 window, which partitions
by the high-cardinality point id. For segment tables past broadcast
size, key both sides by covering grid cell (geom/cell.py) first and
join on the cell — same kernel, bounded candidates per point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def segments_from_vertices(
    vertices: DataFrame,
    line_col: str = "line_id",
    seq_col: str = "seq",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Ordered vertex rows (line, seq, x, y) -> segment rows
    (line, seg_idx, ax, ay, bx, by, seg_len, m_offset) where m_offset is
    the cumulative polyline length before this segment (the linear-
    referencing origin). One keyed window pass (lead + running sum)."""
    w = Window.partitionBy(line_col).orderBy(seq_col)
    seg = (
        vertices.select(
            F.col(line_col).alias("line_id"),
            F.col(seq_col).alias("seg_idx"),
            F.col(x_col).alias("ax"),
            F.col(y_col).alias("ay"),
            F.lead(x_col).over(w).alias("bx"),
            F.lead(y_col).over(w).alias("by"),
        )
        .filter(F.col("bx").isNotNull())
    )
    dx = F.col("bx") - F.col("ax")
    dy = F.col("by") - F.col("ay")
    seg = seg.withColumn("seg_len", F.sqrt(dx * dx + dy * dy))
    w2 = Window.partitionBy("line_id").orderBy("seg_idx")
    return seg.withColumn(
        "m_offset",
        F.coalesce(
            F.sum("seg_len").over(w2.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0.0),
        ),
    )


def snap_to_segments(
    points: DataFrame,
    segments: DataFrame,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Snap each point to its nearest segment (clamped perpendicular
    projection): returns (id, line_id, seg_idx, t, snap_x, snap_y, dist,
    measure). ``measure`` is the distance along the line from its first
    vertex to the snapped point. Ties (equidistant segments — e.g. the
    shared vertex of two adjacent segments) break deterministically on
    (line_id, seg_idx). ``segments`` is broadcast — see module docstring
    for the past-broadcast-size recipe."""
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
        F.col(id_col),
        "line_id",
        "seg_idx",
        t.alias("t"),
        (F.col("ax") + t * dx).alias("snap_x"),
        (F.col("ay") + t * dy).alias("snap_y"),
        px.alias("_px"),
        py.alias("_py"),
        "seg_len",
        "m_offset",
    )
    ddx = F.col("_px") - F.col("snap_x")
    ddy = F.col("_py") - F.col("snap_y")
    cand = cand.withColumn("dist", F.sqrt(ddx * ddx + ddy * ddy)).withColumn(
        "measure", F.col("m_offset") + F.col("t") * F.col("seg_len")
    )
    w = Window.partitionBy(id_col).orderBy("dist", "line_id", "seg_idx")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "line_id", "seg_idx", "t", "snap_x", "snap_y", "dist", "measure")
    )


def track_steps(
    points: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Per-track movement steps: for each point, the planar distance and
    time delta to the track's previous point (ordered by ts, then the
    tie-break columns). One keyed window pass; first point of a track has
    NULL step/dt. ``step_q`` is the step quantized to 1/2^20 units (round
    half-never occurs on binary-fraction lattices) so downstream SUMs are
    integer-exact and order-independent — the float-aggregation rule every
    oracle in this engine follows."""
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    px = F.lag(x_col).over(w)
    py = F.lag(y_col).over(w)
    dx = F.col(x_col) - px
    dy = F.col(y_col) - py
    step = F.sqrt(dx * dx + dy * dy)
    # parquet timestamps arrive as TIMESTAMP_NTZ; the session timezone is
    # pinned UTC, so the cast is an identity re-tag
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return points.withColumn("step", step).withColumn(
        "step_q", F.round(step * F.lit(1048576.0)).cast("long")
    ).withColumn("tus", tus).withColumn(
        "dt_us", tus - F.lag(tus).over(w)
    )


def stay_points(
    points: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    x_col: str = "x",
    y_col: str = "y",
    move_q: int = 262144,
    min_dwell_s: int = 0,
    min_pts: int = 1,
    coord_scale: int = 1048576,
) -> DataFrame:
    """Stay-point detection: maximal runs of consecutive track points
    whose step from the previous point stays below ``move_q`` (in the
    1/2^20 step_q units of ``track_steps``), kept when the run dwells at
    least ``min_dwell_s`` seconds and has at least ``min_pts`` points.
    The GPS-trace "where did it stop" primitive (Li et al. 2008 stay
    points; the reference's consumers run the PostGIS analog over
    station/facility layers, /root/reference/NOTES.md:96-133).

    Implementation: one keyed window pass computes steps
    (``track_steps``), a second window over the SAME partitioning (so
    Catalyst plans ONE exchange) assigns segment ids as the running
    count of move events (a track's first point and every step >=
    ``move_q`` start a new segment), then a groupBy on (key, segment) —
    whose key prefix matches the window partitioning — rolls up. All
    outputs are integer-exact: centroid is returned as quantized
    coordinate SUMS (``sum_xq``/``sum_yq`` at ``coord_scale`` units)
    plus ``n_pts`` so no float division order can diverge.

    Scale shape: one shuffle on the track key total; segments are
    bounded by the per-track point count; nothing leaves codegen.
    """
    st = track_steps(points, key_col, ts_col, order_cols, x_col, y_col)
    w = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    is_move = F.when(
        F.col("step_q").isNull() | (F.col("step_q") >= move_q), F.lit(1)
    ).otherwise(F.lit(0))
    seg = st.withColumn("seg", F.sum(is_move).over(w))
    out = (
        seg.groupBy(key_col, "seg")
        .agg(
            F.count("*").alias("n_pts"),
            F.sum(F.round(F.col(x_col) * coord_scale).cast("long")).alias("sum_xq"),
            F.sum(F.round(F.col(y_col) * coord_scale).cast("long")).alias("sum_yq"),
            F.min("tus").alias("t_start_us"),
            F.max("tus").alias("t_end_us"),
        )
        .withColumn(
            "dwell_s",
            ((F.col("t_end_us") - F.col("t_start_us")) / F.lit(1000000)).cast("long"),
        )
    )
    return out.filter(
        (F.col("dwell_s") >= F.lit(min_dwell_s)) & (F.col("n_pts") >= F.lit(min_pts))
    )
