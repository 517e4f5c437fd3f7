"""Zonal statistics — aggregate decoded raster pixels per vector polygon.

The raster→vector half of the north_rule's "raster↔vector" surface that
``ops/tiles.py`` doesn't cover: tiles.py assigns *rows* to tiles and rolls
tile counts up; this module reads the pixels *inside* the tiles and
aggregates them over arbitrary vector zones (the classic GIS zonal-stats
operator — per-polygon mean/min/max of an imagery band). The reference
pipeline stops at loading vectors into PostGIS and has no raster analysis
at all (README.md:1-40 scope: "converts JPKSJ data ... into PostGIS");
this is the extension a 100 TB image+caption table needs.

Data model: each row of the raster table is one tile image — georeferenced
purely by its (tile_z, tile_x, tile_y) coordinates in the engine's
equirectangular scheme (ops/tiles.py:7-13) — with pixels in a ``binary``
column + ``fmt`` discriminator (BASELINE input_hint). Pixel (row i, col j)
of a W×H tile covers a half-open ground square; its CENTER is

    lon = LON0 + (gx + 0.5) · (LON1-LON0) / (2^z · W),  gx = tile_x·W + j
    lat = LAT0 + (gy + 0.5) · (LAT1-LAT0) / (2^z · H),  gy = tile_y·H + (H-1-i)

(row 0 is the tile's north edge, as in every image format; gy counts
northward like tile_y). A pixel belongs to a zone iff its center is inside
the polygon — the same convention GDAL's rasterize/zonal tools default to,
and the one that makes zone stats additive across tiles.

100-TB shape: the zones are the SMALL side (a vector layer — thousands of
polygons, not 10^12 rows) and are broadcast as parsed rings; the tile
table NEVER shuffles. One ``mapInArrow`` pass decodes each tile once,
bbox-prunes candidate zones, ray-casts pixel centers with the shared
``geom.pip`` kernel, and emits ONE partial row per zone per batch (not per
pixel, not per tile) — the only exchange carries O(n_zones × n_partitions)
partial-aggregate rows into a final groupBy. Mirrors the aggregate-pushdown
trick that made the PIP count query scale (ops/spatial_join.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..codec import image as img
from ..geom import wkb
from ..geom.cell import LAT0, LAT1, LON0, LON1
from ..geom.pip import PreparedPolygon

#: broadcast budget: zones ride to every executor as parsed float64 rings.
#: ~100k simple polygons ≈ 100 MB — the same order as the PIP join's
#: polygon index budget (DESIGN.md §10 item 2). Raise explicitly if you
#: really mean it.
MAX_ZONES = 100_000


def _collect_zones(zones: DataFrame, zone_id: str, geom_col: str, max_zones: int):
    rows = zones.select(zone_id, geom_col).limit(max_zones + 1).collect()
    if len(rows) > max_zones:
        raise ValueError(
            f"zonal_stats zones side exceeds the broadcast budget "
            f"({max_zones} polygons); pass max_zones= explicitly to raise it "
            f"or pre-dissolve the zone layer"
        )
    out = []
    for r in rows:
        polys = wkb.parse_multipolygon(bytes(r[geom_col]))
        xs = np.concatenate([ring[:, 0] for rings in polys for ring in rings])
        ys = np.concatenate([ring[:, 1] for rings in polys for ring in rings])
        out.append(
            (
                r[zone_id],
                polys,
                (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())),
            )
        )
    return out


def zonal_stats(
    tiles: DataFrame,
    zones: DataFrame,
    *,
    z: int,
    band: int = 0,
    zone_id: str = "zone_id",
    geom_col: str = "geom",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
    max_zones: int = MAX_ZONES,
) -> DataFrame:
    """Per-zone pixel statistics of ``band`` over the raster tile table.

    Returns one row per zone that covers at least one pixel center:
    ``(zone_id, n_px, sum_v, mean_v, min_v, max_v)``. Zones are collected
    and broadcast (bounded by ``max_zones``); tiles stream through a
    single mapInArrow pass with no shuffle — only per-(zone, partition)
    partial aggregates cross the exchange.
    """
    # zones ride as an explicit Spark broadcast (one copy per executor,
    # torrent-distributed), not a task-closure capture
    bc_zones = tiles.sparkSession.sparkContext.broadcast(
        _collect_zones(zones, zone_id, geom_col, max_zones)
    )
    id_dtype = dict(zip(zones.columns, zones.schema))[zone_id].dataType.simpleString()
    sx = (LON1 - LON0) / float((1 << z))  # tile width in degrees
    sy = (LAT1 - LAT0) / float((1 << z))

    src = tiles.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
        F.col(bytes_col).alias("bytes"),
        F.col(fmt_col).alias("fmt"),
    )

    out_schema = pa.schema(
        [
            ("zone_id", pa.from_numpy_dtype(np.int64) if id_dtype == "bigint" else pa.string()),
            ("n_px", pa.int64()),
            ("sum_v", pa.int64()),
            ("min_v", pa.int32()),
            ("max_v", pa.int32()),
        ]
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        prepared = bc_zones.value
        prep_cache: dict = {}  # zone ordinal -> PreparedPolygon (built lazily per worker)
        acc: dict = {}  # zone_id -> [n, sum, min, max]
        for rb in batches:
            txs = rb.column("tile_x").to_numpy()
            tys = rb.column("tile_y").to_numpy()
            bufs = rb.column("bytes")
            fmts = rb.column("fmt")
            for r in range(rb.num_rows):
                tx, ty = int(txs[r]), int(tys[r])
                lon0, lat0 = LON0 + tx * sx, LAT0 + ty * sy
                plane = img.decode(bufs[r].as_py(), fmts[r].as_py())[:, :, band]
                h, w = plane.shape
                # pixel-center grids (row 0 = north ⇒ descending lat)
                lon_c = lon0 + (np.arange(w, dtype=np.float64) + 0.5) * (sx / w)
                lat_c = lat0 + (np.arange(h - 1, -1, -1, dtype=np.float64) + 0.5) * (sy / h)
                flat = None  # lazily flattened mesh, shared across zones
                vals = None
                for zi, (zid, polys, (bx0, by0, bx1, by1)) in enumerate(prepared):
                    if bx1 < lon0 or bx0 >= lon0 + sx or by1 < lat0 or by0 >= lat0 + sy:
                        continue  # bbox prune: zone can't touch this tile
                    if zi not in prep_cache:
                        prep_cache[zi] = PreparedPolygon(polys)
                    if flat is None:
                        gx, gy = np.meshgrid(lon_c, lat_c)
                        flat = (gx.ravel(), gy.ravel())
                        vals = plane.ravel()
                    mask = prep_cache[zi].contains(flat[0], flat[1])
                    n = int(mask.sum())
                    if n == 0:
                        continue
                    sel = vals[mask]
                    s = acc.get(zid)
                    if s is None:
                        acc[zid] = [n, int(sel.sum()), int(sel.min()), int(sel.max())]
                    else:
                        s[0] += n
                        s[1] += int(sel.sum())
                        s[2] = min(s[2], int(sel.min()))
                        s[3] = max(s[3], int(sel.max()))
        if acc:
            zids = list(acc)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(zids, type=out_schema.field("zone_id").type),
                    pa.array([acc[k][0] for k in zids], type=pa.int64()),
                    pa.array([acc[k][1] for k in zids], type=pa.int64()),
                    pa.array([acc[k][2] for k in zids], type=pa.int32()),
                    pa.array([acc[k][3] for k in zids], type=pa.int32()),
                ],
                schema=out_schema,
            )

    partials = src.mapInArrow(
        kernel,
        schema=f"zone_id {'bigint' if id_dtype == 'bigint' else 'string'}, "
        "n_px bigint, sum_v bigint, min_v int, max_v int",
    )
    return (
        partials.groupBy("zone_id")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .withColumn(
            "mean_v", F.col("sum_v").cast("double") / F.col("n_px").cast("double")
        )
        .select("zone_id", "n_px", "sum_v", "mean_v", "min_v", "max_v")
    )


def rasterize(
    tile_grid: DataFrame,
    zones: DataFrame,
    *,
    z: int,
    w: int,
    h: int,
    burn_col: str = "burn",
    background: int = 0,
    out_fmt: str = "png",
    zone_id: str = "zone_id",
    geom_col: str = "geom",
    max_zones: int = MAX_ZONES,
) -> DataFrame:
    """Vector→raster burn-in (the inverse of :func:`zonal_stats`): render
    each tile of ``tile_grid`` (rows of ``tile_x, tile_y`` at zoom ``z``)
    as a W×H image whose band-0 pixel value is the ``burn_col`` attribute
    of the zone containing the pixel center, or ``background``. Where
    zones overlap, the MAXIMUM burn value wins — an order-independent rule
    any SQL engine can replay (``GREATEST`` over the zone predicates).
    Bands 1 and 2 are zero.

    Same 100-TB shape as zonal_stats mirrored: zones broadcast, the tile
    grid streams through one mapInArrow pass and never shuffles — at
    10^12 pixels the grid rows are just (x, y) longs fanned out of a
    ``spark.range``, and each task renders its tiles independently.
    """
    rows = zones.select(zone_id, geom_col, burn_col).limit(max_zones + 1).collect()
    if len(rows) > max_zones:
        raise ValueError(
            f"rasterize zones side exceeds the broadcast budget ({max_zones}); "
            f"pass max_zones= explicitly to raise it"
        )
    parsed = []
    for r in rows:
        polys = wkb.parse_multipolygon(bytes(r[geom_col]))
        xs = np.concatenate([ring[:, 0] for rings in polys for ring in rings])
        ys = np.concatenate([ring[:, 1] for rings in polys for ring in rings])
        parsed.append(
            (
                int(r[burn_col]),
                polys,
                (float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())),
            )
        )
    bc = tile_grid.sparkSession.sparkContext.broadcast(parsed)
    sx = (LON1 - LON0) / float(1 << z)
    sy = (LAT1 - LAT0) / float(1 << z)
    src = tile_grid.select(
        F.col("tile_x").cast("long").alias("tile_x"),
        F.col("tile_y").cast("long").alias("tile_y"),
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        zones_p = bc.value
        prep: dict = {}
        for rb in batches:
            txs = rb.column("tile_x").to_numpy()
            tys = rb.column("tile_y").to_numpy()
            bufs = []
            for r in range(rb.num_rows):
                tx, ty = int(txs[r]), int(tys[r])
                lon0, lat0 = LON0 + tx * sx, LAT0 + ty * sy
                lon_c = lon0 + (np.arange(w, dtype=np.float64) + 0.5) * (sx / w)
                lat_c = lat0 + (np.arange(h - 1, -1, -1, dtype=np.float64) + 0.5) * (sy / h)
                band = np.full((h, w), background, dtype=np.uint8)
                flat = None
                for zi, (burn, polys, (bx0, by0, bx1, by1)) in enumerate(zones_p):
                    if bx1 < lon0 or bx0 >= lon0 + sx or by1 < lat0 or by0 >= lat0 + sy:
                        continue
                    if zi not in prep:
                        prep[zi] = PreparedPolygon(polys)
                    if flat is None:
                        gx, gy = np.meshgrid(lon_c, lat_c)
                        flat = (gx.ravel(), gy.ravel())
                    mask = prep[zi].contains(flat[0], flat[1]).reshape(h, w)
                    np.maximum(band, np.uint8(burn) * mask, out=band, where=mask)
                px = np.zeros((h, w, 3), dtype=np.uint8)
                px[:, :, 0] = band
                bufs.append(img.encode(px, out_fmt))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(txs, type=pa.int64()),
                    pa.array(tys, type=pa.int64()),
                    pa.array([z] * rb.num_rows, type=pa.int32()),
                    pa.array([w] * rb.num_rows, type=pa.int32()),
                    pa.array([h] * rb.num_rows, type=pa.int32()),
                    pa.array([out_fmt] * rb.num_rows, type=pa.string()),
                    pa.array(bufs, type=pa.binary()),
                ],
                names=["tile_x", "tile_y", "tile_z", "w", "h", "fmt", "bytes"],
            )

    return src.mapInArrow(
        kernel,
        schema="tile_x long, tile_y long, tile_z int, w int, h int, fmt string, bytes binary",
    )
