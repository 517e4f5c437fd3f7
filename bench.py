"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line
{"metric", "value", "unit", "queries", "sf", ...extras}.

Usage:
  python bench.py                    # driver mode (one JSON line)
  python bench.py --master local[8]  # scaling-run mode (see BENCH/)

The flagship pipeline (ingest -> cell encode -> PIP join -> tile assign ->
metrics) runs on points amplified from the events table (x AMPLIFY exact
replicas with distinct ids) so the spatial stages process millions of rows
— enough for stable rows/sec at local[32] — while remaining fully
deterministic and derived from the driver's testdata.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "32"))  # events x32 -> 3.2M points at sf0.1


def amplified_points(spark, sf_dir: str):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    rep = spark.range(AMPLIFY).select(F.col("id").alias("rep"))
    cpus = int(spark.conf.get("spark.sql.shuffle.partitions"))
    pts = (
        ev.crossJoin(rep)
        .select((F.col("event_id") * AMPLIFY + F.col("rep")).alias("point_id"))
        # 4 tasks per core: pipelines Arrow read/compute/write inside each
        # worker and smooths stragglers — measured E(2->8) 0.58 -> 0.96
        .repartition(cpus * 4)
    )
    lon = (
        F.lit(122.0) + F.lit(32.0)
        * ((F.col("point_id") * 2654435761) % 1000000).cast("double") / F.lit(1000000.0)
    )
    lat = (
        F.lit(20.0) + F.lit(26.0)
        * ((F.col("point_id") * 40503) % 1000000).cast("double") / F.lit(1000000.0)
    )
    return pts.select("point_id", lon.alias("lon"), lat.alias("lat"))


def run_bench(master: str | None, sf_dir: str, cpus: int):
    from jpspark import fixtures as fx
    from jpspark.ops import dissolve as dis
    from jpspark.ops import knn as knn_ops
    from jpspark.ops import spatial_join as sj
    from jpspark.ops import tiles as tile_ops
    from jpspark.queries import QUERIES
    from jpspark.session import get_spark

    spark = get_spark("jpspark-bench", master=master, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(10_000_000).select(F.sum("id")).collect()  # JVM/codegen warmup

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1"))

    def timed(name: str, fn):
        best, out = None, None
        for _ in range(repeats):  # min-of-N: the host is virtualized/noisy
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        return out

    pts = amplified_points(spark, sf_dir).cache()
    n_points = pts.count()
    # warm the Python worker pool (imports, Arrow runners) so stage timings
    # measure steady-state throughput, not one-time worker forks — the cold
    # cost would otherwise scale WITH core count and bias the efficiency
    pts.mapInPandas(lambda it: it, pts.schema).count()

    # --- q_pip: flagship ray-casting PIP join (broadcast index, no shuffle
    # of the point side), 500 multipolygon municipalities with detailed
    # 513-vertex boundaries (realistic N03 coastline cost)
    polys = fx.admin_polygons(500, subdiv=128)
    n_assigned = timed(
        "pip_join",
        lambda: sj.pip_join_broadcast(
            pts, polys, "全国地方公共団体コード", out_col="muni"
        )
        .groupBy("muni")
        .count()
        .agg(F.sum("count"))
        .collect()[0][0],
    )
    extras["pip_rows_per_sec"] = round(n_points / timings["pip_join"], 1)

    # --- q_tiles: tile assignment + render manifest + rollup. The tile
    # math is pure JVM codegen, far faster per row than the Python-kernel
    # stages — feed it 4x the points (JVM-side explode, no Python) so its
    # timing is work, not fixed job overhead.
    tile_pts = pts.withColumn(
        "rep2", F.explode(F.array(*[F.lit(i) for i in range(8)]))
    ).withColumn("phash", F.col("point_id") * 8 + F.col("rep2"))
    n_tile_rows = n_points * 8

    def tiles_fn():
        assigned = tile_ops.tile_assign(tile_pts, z=10)
        man = assigned.groupBy("tile_z", "tile_x", "tile_y").agg(F.count("*").alias("n_rows"))
        roll = tile_ops.tile_rollup(assigned, 6, 10)
        return man.count() + roll.count()

    n_tiles = timed("tile_assign", tiles_fn)
    extras["tile_rows_per_sec"] = round(n_tile_rows / timings["tile_assign"], 1)
    extras["tiles_per_sec"] = round(n_tiles / timings["tile_assign"], 1)

    # --- q_knn: exact kNN, 4x events-count queries x 500 facilities
    # (queries carved from the cached amplified points so the query load
    # is independent of AMPLIFY)
    fac = fx.facilities(500, polys)
    knn_frac = max(1, AMPLIFY // 4)  # queries = n_points/4 regardless of amplify
    ev_pts = pts.filter((F.col("point_id") % AMPLIFY) < knn_frac).withColumnRenamed(
        "point_id", "event_id"
    )
    n_knn = ev_pts.count()
    timed(
        "knn_join",
        lambda: knn_ops.knn_join_broadcast(
            ev_pts, fac, k=5, query_id_col="event_id", res=5, as_arrays=True
        ).count(),
    )
    extras["knn_queries_per_sec"] = round(n_knn / timings["knn_join"], 1)

    # --- dissolve 500 multipolygon municipalities -> prefectures
    polys_sdf = spark.createDataFrame(polys[["都道府県名", "geom"]])
    timed("dissolve", lambda: dis.dissolve(polys_sdf, ["都道府県名"]).count())

    # --- image decode: Arrow-batched binary-kernel throughput over the
    # payload table (real codecs; the input_hint hot path)
    from jpspark.ops import multimodal as mm

    imgs = fx.images(500, polys)
    img_sdf = spark.createDataFrame(imgs[["image_id", "bytes", "fmt"]])
    rep_img = spark.range(16).select(F.col("id").alias("rp"))
    img_big = (
        img_sdf.crossJoin(rep_img)
        .withColumn("image_id", F.concat_ws("_", "image_id", F.col("rp").cast("string")))
        .drop("rp")
        .repartition(cpus * 4)
        .cache()
    )
    n_imgs = img_big.count()
    timed("image_decode", lambda: mm.decode_stats(img_big).agg(F.sum("w")).collect())
    extras["decode_imgs_per_sec"] = round(n_imgs / timings["image_decode"], 1)
    img_big.unpersist()

    # --- relational + training-data headliners from the registry
    for name in ("pricing_summary", "fk_broadcast_join", "minhash_lsh_pairs", "ann_topk"):
        q = QUERIES[name]
        timed(name, lambda q=q: q(spark, sf_dir).count())

    pts.unpersist()
    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]),
        "n_points": n_points,
        "n_assigned": int(n_assigned),
        "master": master or f"local[{cpus}]",
        **extras,
    }
    spark.stop()
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    if args.master and args.master.startswith("local[") and args.master[6:-1].isdigit():
        cpus = int(args.master[6:-1])
    result = run_bench(args.master, args.sf_dir, cpus)
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
