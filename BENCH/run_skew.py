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


def _with_aqe(spark, enabled: bool, fn):
    """Run fn with spark.sql.adaptive.enabled toggled, then restore."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", str(enabled).lower())
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


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
    # ------------------------------------------------------------------
    # kNN shuffle-path ladder (round 6, r5 verdict #3): same hot-cell
    # scenario, now stressing the cell equi-join inside knn_join_shuffle.
    # 800k queries with 40% in one hot res-6 cell; 500 targets with 10%
    # in the same box (facility density tracks population). Unsalted, the
    # hot cell's ~40% of ALL candidate pairs lands on one reducer of the
    # cell join; n_salt=8 routes queries by crc32(query_id)%8 against 8
    # target replicas, splitting the hot cell's pair generation 8 ways.
    pts.unpersist()
    from jpspark.ops import knn as knn_ops  # noqa: E402

    N_KNN = 800_000
    qry = skewed_points(spark, cores).filter(F.col("point_id") < N_KNN).cache()
    nq = qry.count()
    qry.mapInPandas(lambda it: it, qry.schema).count()  # warm workers

    rng = np.random.default_rng(7)
    n_t, hot_t = 500, 50
    t_lon = np.where(
        np.arange(n_t) < hot_t,
        139.2 + rng.random(n_t) * 1.0,
        122.0 + rng.random(n_t) * 32.0,
    )
    t_lat = np.where(
        np.arange(n_t) < hot_t,
        35.3 + rng.random(n_t) * 0.8,
        20.0 + rng.random(n_t) * 26.0,
    )
    tgt_pdf = pd.DataFrame({"ogc_fid": np.arange(n_t, dtype=np.int64), "lon": t_lon, "lat": t_lat})
    tgt_sdf = spark.createDataFrame(tgt_pdf)

    def knn_shuffle(n_salt: int):
        out = knn_ops.knn_join_shuffle(
            qry, tgt_sdf, k=5, query_id_col="point_id", target_id_col="ogc_fid",
            res=6, max_ring=1, guard="flag", n_salt=n_salt,
        )
        r = out.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("query_id", "rank", "target_id")).alias("chk"),
            F.sum(F.col("exact").cast("long")).alias("n_exact"),
        ).collect()[0]
        return int(r.n), int(r.chk), int(r.n_exact)

    knn_results = {}
    knn_expected = None
    for name, fn in [
        ("knn_shuffle_unsalted_noaqe", lambda: _with_aqe(spark, False, lambda: knn_shuffle(1))),
        ("knn_shuffle_unsalted", lambda: knn_shuffle(1)),
        ("knn_shuffle_salted_x8", lambda: knn_shuffle(8)),
    ]:
        best, out = None, None
        for _ in range(2):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        knn_results[name] = (best, out)
        if knn_expected is None:
            knn_expected = out
        assert out == knn_expected, f"{name}: {out} != {knn_expected}"
        print(name, round(best, 2), "s", out)

    # broadcast rung: skew-immune reference (exact everywhere by
    # construction, so rows = n_queries * k regardless of ring bounds)
    best_b = None
    for _ in range(2):
        t0 = time.perf_counter()
        nb = knn_ops.knn_join_broadcast(
            qry, tgt_pdf, k=5, query_id_col="point_id", res=6
        ).count()
        dt = time.perf_counter() - t0
        best_b = dt if best_b is None else min(best_b, dt)
    knn_results["knn_broadcast"] = (best_b, (nb, 0, nb))
    print("knn_broadcast", round(best_b, 2), "s", nb, "rows")

    n_rows, _, n_exact = knn_expected
    knn_md = [
        "",
        "## kNN shuffle path (round 6)",
        "",
        f"{nq:,} queries, 40% in one hot res-6 cell; 500 targets, 10% in the",
        "same box; k=5, max_ring=1, guard=flag. All three shuffle rungs",
        f"return bit-identical results ({n_rows:,} rows, {n_exact:,} guard-exact",
        "queries; asserted on count + xxhash64 checksum).",
        "",
        "| strategy | time (s) | notes |",
        "|---|---|---|",
        f"| knn_join_shuffle, no salt, AQE off | {knn_results['knn_shuffle_unsalted_noaqe'][0]:.2f} | hot cell's pairs on one reducer |",
        f"| knn_join_shuffle, no salt, AQE skew-join | {knn_results['knn_shuffle_unsalted'][0]:.2f} | AQE splits oversized join partitions |",
        f"| knn_join_shuffle, salt x8 | {knn_results['knn_shuffle_salted_x8'][0]:.2f} | crc32(query_id)%8 routing, targets replicated x8 |",
        f"| knn_join_broadcast | {knn_results['knn_broadcast'][0]:.2f} | skew-immune reference ({nb:,} rows; exact by construction) |",
        "",
        "The top-k window after the join partitions by query_id (high",
        "cardinality) and is skew-free in every rung; only the cell join",
        "needs the salt. Salting replicates the (small) target side, so it",
        "is free exactly in the regime where the shuffle path is chosen —",
        "a target set too big to broadcast still explodes only x8.",
    ]
    with open(os.path.join(REPO, "BENCH", "SKEW.md"), "w") as f:
        f.write("\n".join(md) + "\n" + "\n".join(knn_md) + "\n")
    print("wrote BENCH/SKEW.md")
    spark.stop()


if __name__ == "__main__":
    main()
