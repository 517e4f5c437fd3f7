"""Grid density / heatmap surface — the "events per mesh cell, smoothed"
rollup downstream consumers run on the reference's mesh layers (land-use
mesh joins, /root/reference/NOTES.md:96-133; mesh-coded tables are the
reference's unit of spatial aggregation). Pure Column algebra end to end:
no Python, no geometry kernel — the cell index is integer floor
arithmetic and the kernel smoothing is a weighted neighbor-offset
explode over the ALREADY-AGGREGATED cell counts.

The 100-TB shape: stage 1 reduces 10^12 points to the occupied-cell set
with map-side partial aggregation (one shuffle on the cell key); stage 2
explodes each aggregated cell by the (2r+1)^2 integer-weighted offsets —
a constant fan-out over the small cell table, never over the raw points
— and re-reduces on the shifted key. Both exchanges carry fixed-width
int rows. Integer triangular weights keep every density value exact, so
the oracle can replay the arithmetic bit-for-bit in SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_density(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    x0: float = 0.0,
    y0: float = 0.0,
    cell: float = 1.0,
    radius: int = 1,
) -> DataFrame:
    """Smoothed point-density per grid cell.

    Each point lands in cell ``(ix, iy) = floor((p - origin) / cell)``;
    counts are then convolved with a separable triangular kernel of the
    given radius: weight ``(radius+1-|dx|) * (radius+1-|dy|)`` for every
    offset in the (2*radius+1)^2 neighborhood (radius=1 is the classic
    4-2-1 smoothing stencil). Returns ``(cx, cy, density)`` for every
    cell receiving weight, density = sum over contributing cells of
    count * weight — integer-exact.

    Pick ``cell`` / ``x0`` / ``y0`` as binary fractions when the inputs
    live on a binary-fraction lattice and the floor is exact (the
    engine-wide determinism rule).
    """
    counts = (
        points.select(
            F.floor((F.col(x_col) - F.lit(x0)) / F.lit(cell)).alias("ix"),
            F.floor((F.col(y_col) - F.lit(y0)) / F.lit(cell)).alias("iy"),
        )
        .groupBy("ix", "iy")
        .agg(F.count("*").alias("cnt"))
    )
    return smooth_counts(counts, radius=radius)


def smooth_counts(counts: DataFrame, radius: int = 1) -> DataFrame:
    """The stencil half of :func:`grid_density`, reusable over any
    (ix, iy, cnt) cell-count frame — e.g. the state table of a streaming
    running count (the stencil is LINEAR, so smoothing the accumulated
    counts equals accumulating smoothed batches)."""
    if radius < 0:
        raise ValueError(f"smooth_counts: radius must be >= 0, got {radius}")
    k = 2 * radius + 1
    spark = counts.sparkSession
    offsets = spark.range(k * k).select(
        (F.col("id") % k - radius).alias("dx"),
        (F.col("id") / k).cast("long").alias("dy_raw"),
    ).select(
        "dx", (F.col("dy_raw") - radius).alias("dy")
    ).select(
        "dx",
        "dy",
        (
            (F.lit(radius + 1) - F.abs(F.col("dx")))
            * (F.lit(radius + 1) - F.abs(F.col("dy")))
        ).alias("wt"),
    )
    return (
        counts.crossJoin(F.broadcast(offsets))
        .groupBy(
            (F.col("ix") + F.col("dx")).alias("cx"),
            (F.col("iy") + F.col("dy")).alias("cy"),
        )
        .agg(F.sum(F.col("cnt") * F.col("wt")).alias("density"))
    )
