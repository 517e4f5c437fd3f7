"""Skew-handling evidence: the shuffle PIP join on a 40%-hot-cell point
distribution (the Tokyo/Osaka scenario from the north_star), unsalted vs
salted, plus the broadcast path (skew-immune by construction).

Usage: python BENCH/run_skew.py  -> writes BENCH/SKEW.md
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from jpspark import fixtures as fx  # noqa: E402
from jpspark.geom import wkb  # noqa: E402
from jpspark.ops import spatial_join as sj  # noqa: E402
from jpspark.session import get_spark  # noqa: E402

N = 3_200_000
HOT_FRAC = 0.4


def skewed_points(spark, cores: int):
    """40% of points land inside one hot polygon's cell (hash-positioned
    within a small box), the rest uniform — the fixture skew recipe at
    bench scale, generated JVM-side."""
    base = spark.range(N).repartition(cores * 4)
    is_hot = (F.col("id") % 10) < int(HOT_FRAC * 10)
    u1 = ((F.col("id") * 2654435761) % 1000000).cast("double") / F.lit(1000000.0)
    u2 = ((F.col("id") * 40503) % 1000000).cast("double") / F.lit(1000000.0)
    # hot box: inside the cell of (139.7, 35.7); cold: full bbox
    lon = F.when(is_hot, F.lit(139.2) + u1 * F.lit(1.0)).otherwise(F.lit(122.0) + u1 * F.lit(32.0))
    lat = F.when(is_hot, F.lit(35.3) + u2 * F.lit(0.8)).otherwise(F.lit(20.0) + u2 * F.lit(26.0))
    return base.select(F.col("id").alias("point_id"), lon.alias("lon"), lat.alias("lat"))


def main():
    spark = get_spark("skew-bench", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    cores = 32
    pts = skewed_points(spark, cores).cache()
    n = pts.count()
    pts.mapInPandas(lambda it: it, pts.schema).count()  # warm workers

    polys_pdf = fx.admin_polygons(500, subdiv=32)
    polys_sdf = spark.createDataFrame(polys_pdf[["全国地方公共団体コード", "geom"]])

    results = {}
    expected = None
    for name, fn in [
        (
            "shuffle_unsalted",
            lambda: sj.pip_join_shuffle(
                pts, polys_sdf, "全国地方公共団体コード", point_id_col="point_id",
                salt_cells=1, settled_cells=None,
            ),
        ),
        (
            "shuffle_salted_x8",
            lambda: sj.pip_join_shuffle(
                pts, polys_sdf, "全国地方公共団体コード", point_id_col="point_id",
                salt_cells=8, settled_cells=None,
            ),
        ),
        (
            "shuffle_salted_x8_settled",
            lambda: sj.pip_join_shuffle(
                pts, polys_sdf, "全国地方公共団体コード", point_id_col="point_id",
                salt_cells=8,  # settled grid on (the round-5 default)
            ),
        ),
        (
            "broadcast",
            lambda: sj.pip_join_broadcast(pts, polys_pdf, "全国地方公共団体コード", out_col="poly_id"),
        ),
    ]:
        best, count = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            count = fn().count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = (best, count)
        if expected is None:
            expected = count
        assert count == expected, f"{name}: {count} != {expected}"
        print(name, round(best, 2), "s", count, "rows")

    md = [
        "# BENCH/SKEW.md — hot-key handling (40% of points in one cell)",
        "",
        f"{n:,} points, {int(HOT_FRAC*100)}% concentrated in one municipality's",
        "cell (the Tokyo scenario); 500 detailed municipalities; local[32],",
        "AQE + skewJoin enabled; min-of-2 timings. All four strategies return",
        f"identical row counts ({expected:,}).",
        "",
        "| strategy | time (s) | notes |",
        "|---|---|---|",
        f"| pip_join_shuffle, no salt | {results['shuffle_unsalted'][0]:.2f} | hot cell -> one reducer's candidate pairs dominate |",
        f"| pip_join_shuffle, salt x8, exact-only | {results['shuffle_salted_x8'][0]:.2f} | hot cell's pairs split across 8 reducers |",
        f"| pip_join_shuffle, salt x8 + settled grid | {results['shuffle_salted_x8_settled'][0]:.2f} | per-polygon interior-cell grid on hot groups (round-5 default) |",
        f"| pip_join_broadcast | {results['broadcast'][0]:.2f} | skew-immune: no shuffle, map-side only |",
        "",
        "Salting replicates the exploded polygon side per salt value and",
        "routes points by crc32(point_id) % n_salt, so the hot cell's exact-",
        "PIP work parallelizes; AQE skew-join additionally splits oversized",
        "post-shuffle partitions. The settled row adds the broadcast path's",
        "interior-cell shortcut to the shuffle kernel: groups with >= 4096",
        "candidates build a single-polygon settled grid and resolve interior",
        "points by gather, so only boundary-cell points ray-cast — the plan a",
        "non-broadcastable 100-TB polygon side must take. The broadcast path",
        "remains preferred whenever the polygon side fits executor memory.",
    ]
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("wrote BENCH/SKEW.md")
    spark.stop()


if __name__ == "__main__":
    main()
