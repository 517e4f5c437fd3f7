"""Zonal statistics (ops/zonal.py) — the raster→vector direction.

The gate query's DuckDB oracle covers convex zones (rect/triangle/
multipolygon of rects) exhaustively; these tests cover what half-plane SQL
can't: a polygon with a hole, zones entirely off the raster, the broadcast
budget guard, and band selection — each against an independent NumPy
replay of the closed-form fixture pixels."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from jpspark import fixtures as fx
from jpspark.geom import wkb
from jpspark.geom.cell import LAT0, LAT1, LON0, LON1
from jpspark.ops import zonal

Z, TX0, TY0, NX, NY, W, H = 4, 8, 8, 4, 4, 32, 32


def _centers():
    """All pixel centers + band values of the fixture block, by replaying
    the closed form directly (no codec, no Spark)."""
    gx = np.arange(TX0 * W, (TX0 + NX) * W, dtype=np.int64)
    gy = np.arange(TY0 * H, (TY0 + NY) * H, dtype=np.int64)
    sx = (LON1 - LON0) / (1 << Z) / W
    sy = (LAT1 - LAT0) / (1 << Z) / H
    lon = LON0 + (gx + 0.5) * sx
    lat = LAT0 + (gy + 0.5) * sy
    LO, LA = np.meshgrid(lon, lat)
    GX, GY = np.meshgrid(gx, gy)
    bands = fx.raster_pixel(GX, GY)
    return LO.ravel(), LA.ravel(), [b.ravel().astype(np.int64) for b in bands]


def _stats(mask, v):
    sel = v[mask]
    return int(mask.sum()), int(sel.sum()), int(sel.min()), int(sel.max())


@pytest.fixture(scope="module")
def tiles(spark):
    return spark.createDataFrame(fx.raster_tiles(Z, TX0, TY0, NX, NY, W, H)).cache()


def test_zone_with_hole(spark, tiles):
    """A square annulus: outer [10,40)² minus inner hole [20,30)² — pixel
    centers in the hole must NOT count (ray-casting handles the interior
    ring; half-plane SQL could not express this in one predicate)."""
    outer = np.array([[10, 10], [40, 10], [40, 40], [10, 40], [10, 10]], float)
    hole = np.array([[20, 20], [20, 30], [30, 30], [30, 20], [20, 20]], float)
    zones = spark.createDataFrame(
        pd.DataFrame({"zone_id": ["ring"], "geom": [wkb.encode_multipolygon([[outer, hole]])]})
    )
    got = zonal.zonal_stats(tiles, zones, z=Z).collect()[0]
    lo, la, bands = _centers()
    mask = (
        (lo >= 10) & (lo < 40) & (la >= 10) & (la < 40)
        & ~((lo >= 20) & (lo < 30) & (la >= 20) & (la < 30))
    )
    n, s, mn, mx = _stats(mask, bands[0])
    assert (got["n_px"], got["sum_v"], got["min_v"], got["max_v"]) == (n, s, mn, mx)
    assert got["mean_v"] == s / n


def test_band_selection_and_empty_zone(spark, tiles):
    """band=2 aggregates gy%256; a zone fully off the raster yields no row."""
    zones = spark.createDataFrame(
        pd.DataFrame(
            {
                "zone_id": ["strip", "offmap"],
                "geom": [
                    wkb.encode_multipolygon(
                        [[np.array([[0, 0], [90, 0], [90, 3], [0, 3], [0, 0]], float)]]
                    ),
                    wkb.encode_multipolygon(
                        [[np.array([[-170, -80], [-160, -80], [-160, -70], [-170, -70], [-170, -80]], float)]]
                    ),
                ],
            }
        )
    )
    rows = {r["zone_id"]: r for r in zonal.zonal_stats(tiles, zones, z=Z, band=2).collect()}
    assert set(rows) == {"strip"}  # offmap zone emits nothing
    lo, la, bands = _centers()
    mask = (lo >= 0) & (lo < 90) & (la >= 0) & (la < 3)
    n, s, mn, mx = _stats(mask, bands[2])
    r = rows["strip"]
    assert (r["n_px"], r["sum_v"], r["min_v"], r["max_v"]) == (n, s, mn, mx)


def test_zone_budget_guard(spark, tiles):
    zones = spark.createDataFrame(fx.zonal_zones())
    with pytest.raises(Exception, match="broadcast budget"):
        zonal.zonal_stats(tiles, zones, z=Z, max_zones=2).collect()


def test_mixed_formats_agree(spark):
    """The stats are a property of the pixels, not the codec: raw and
    qlossy-free lossless formats must produce identical zone stats."""
    zones = spark.createDataFrame(fx.zonal_zones())
    outs = []
    for fmt in ("png", "raw", "ppm"):
        t = spark.createDataFrame(fx.raster_tiles(Z, TX0, TY0, NX, NY, W, H, fmt=fmt))
        outs.append(
            zonal.zonal_stats(t, zones, z=Z).orderBy("zone_id").toPandas()
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


# ---------------------------------------------------------------- pyramid

def test_tile_pyramid_missing_children(spark):
    """A sparse leaf set: parents record n_children and zero-fill absent
    quadrants; values replayed via the closed form."""
    from jpspark.ops import tiles as tl

    pdf = fx.raster_tiles(Z, TX0, TY0, NX, NY, W, H)
    # keep 3 children of parent (4,4) and 1 child of parent (5,4)
    keep = pdf[
        ((pdf.tile_x.isin([8, 9])) & (pdf.tile_y == 8))
        | ((pdf.tile_x == 8) & (pdf.tile_y == 9))
        | ((pdf.tile_x == 10) & (pdf.tile_y == 8))
    ]
    out = tl.tile_pyramid(spark.createDataFrame(keep), levels=1).toPandas()
    out = out.set_index(["tile_x", "tile_y"])
    assert out.loc[(4, 4), "n_children"] == 3
    assert out.loc[(5, 4), "n_children"] == 1
    # parent (5,4): only child (10,8) = SW quadrant; the rest zero-filled
    from jpspark.codec import image as img

    px = img.decode(bytes(out.loc[(5, 4), "bytes"]), "png")[:, :, 0].astype(np.int64)
    assert px[: H // 2, :].max() == 0 and px[:, W // 2 :].max() == 0  # N+E empty
    gx = 10 * W + np.arange(W, dtype=np.int64)
    gy = 8 * H + np.arange(H, dtype=np.int64)
    GX, GY = np.meshgrid(gx, gy)
    leaf = fx.raster_pixel(GX, GY)[0].astype(np.int64)  # row 0 = gy min here
    # leaf row order: row i has gy = 8H + (H-1-i) -> flip to image order
    leaf_img = leaf[::-1]
    want = (
        leaf_img.reshape(H // 2, 2, W // 2, 2).sum(axis=(1, 3)) // 4
    )
    got_quadrant = px[H // 2 :, : W // 2]
    assert np.array_equal(got_quadrant, want)


def test_tile_pyramid_mixed_sizes_raise(spark):
    from jpspark.ops import tiles as tl

    a = fx.raster_tiles(Z, 8, 8, 1, 1, 32, 32)
    b = fx.raster_tiles(Z, 9, 8, 1, 1, 16, 16)
    both = spark.createDataFrame(pd.concat([a, b], ignore_index=True))
    with pytest.raises(Exception, match="mixed tile sizes"):
        tl.tile_pyramid(both, levels=1).collect()


def test_tile_pyramid_three_levels_full(spark):
    """4×4 block two levels up = 1 tile; a third level halves coords again
    (lone child in the NE/SW of its parent depending on parity)."""
    from jpspark.ops import tiles as tl

    leaves = spark.createDataFrame(fx.raster_tiles(Z, TX0, TY0, NX, NY, W, H))
    out = tl.tile_pyramid(leaves, levels=3).toPandas()
    by_z = out.groupby("tile_z").size().to_dict()
    assert by_z == {3: 4, 2: 1, 1: 1}
    assert (out[out.tile_z == 2].n_children == 4).all()
    assert (out[out.tile_z == 1].n_children == 1).all()


# -------------------------------------------------------------- rasterize

def test_rasterize_zonal_roundtrip(spark):
    """Burn two DISJOINT zones, then run zonal_stats over the burned
    raster with the same zones: every pixel of a zone must carry exactly
    its burn value (min=max=mean=burn), proving rasterize and zonal_stats
    agree on the pixel-center membership convention."""
    from jpspark.ops import zonal

    zones_pdf = pd.DataFrame(
        {
            "zone_id": ["west", "east"],
            "geom": [
                wkb.encode_multipolygon(
                    [[np.array([[5, 5], [25, 5], [25, 25], [5, 25], [5, 5]], float)]]
                ),
                wkb.encode_multipolygon(
                    [[np.array([[60, 10], [85, 10], [85, 40], [60, 40], [60, 10]], float)]]
                ),
            ],
            "burn": [77, 133],
        }
    )
    zones = spark.createDataFrame(zones_pdf)
    grid = spark.createDataFrame(
        pd.DataFrame(
            [(tx, ty) for ty in range(8, 12) for tx in range(8, 12)],
            columns=["tile_x", "tile_y"],
        )
    )
    burned = zonal.rasterize(grid, zones, z=Z, w=W, h=H)
    got = {
        r["zone_id"]: r
        for r in zonal.zonal_stats(burned, zones, z=Z).collect()
    }
    lo, la, _ = _centers()
    n_west = int(((lo >= 5) & (lo < 25) & (la >= 5) & (la < 25)).sum())
    n_east = int(((lo >= 60) & (lo < 85) & (la >= 10) & (la < 40)).sum())
    assert (got["west"]["n_px"], got["west"]["min_v"], got["west"]["max_v"]) == (n_west, 77, 77)
    assert (got["east"]["n_px"], got["east"]["min_v"], got["east"]["max_v"]) == (n_east, 133, 133)
    assert got["west"]["mean_v"] == 77.0 and got["east"]["mean_v"] == 133.0
    # total burned pixels across the raster == n_west + n_east (background 0)
    total = zonal.zonal_stats(
        burned,
        spark.createDataFrame(
            pd.DataFrame(
                {
                    "zone_id": ["all"],
                    "geom": [
                        wkb.encode_multipolygon(
                            [[np.array([[-1, -1], [91, -1], [91, 46], [-1, 46], [-1, -1]], float)]]
                        )
                    ],
                }
            )
        ),
        z=Z,
    ).collect()[0]
    assert total["sum_v"] == 77 * n_west + 133 * n_east


# ------------------------------------------------------------ polygonize

PXW = (LON1 - LON0) / (1 << Z) / W
PXH = (LAT1 - LAT0) / (1 << Z) / H


def _corners(n):
    return np.arange(n + 1, dtype=np.float64)


def test_trace_mask_block_and_hole():
    mask = np.zeros((8, 8), dtype=bool)
    mask[2:4, 3:5] = True  # 2x2 block
    polys, n_edges = zonal._trace_mask(mask, _corners(8), 8.0 - _corners(8), True)
    assert n_edges == 8 and len(polys) == 1 and len(polys[0]) == 1
    assert len(polys[0][0]) == 5  # collapsed rectangle (closed)
    assert abs(wkb.ring_area(polys[0][0]) - 4.0) < 1e-12

    mask = np.zeros((8, 8), dtype=bool)
    mask[1:6, 1:6] = True
    mask[3, 3] = False  # 1-px hole
    polys, n_edges = zonal._trace_mask(mask, _corners(8), 8.0 - _corners(8), True)
    assert n_edges == 20 + 4
    assert len(polys) == 1 and len(polys[0]) == 2  # exterior + hole
    assert abs(wkb.ring_area(polys[0][0]) - 25.0) < 1e-12
    assert abs(wkb.ring_area(polys[0][1]) + 1.0) < 1e-12  # hole CW (negative)


def test_trace_mask_checkerboard_corner():
    """Two diagonal pixels share a corner (degree-2 vertex): rings must
    still close, with total area 2 and 8 boundary edges."""
    mask = np.array([[1, 0], [0, 1]], dtype=bool)
    polys, n_edges = zonal._trace_mask(mask, _corners(2), 2.0 - _corners(2), True)
    assert n_edges == 8
    total = sum(wkb.ring_area(r) for p in polys for r in p)
    assert abs(total - 2.0) < 1e-12
    for p in polys:
        for r in p:
            assert (r[0] == r[-1]).all()  # closed


def test_polygonize_rasterize_roundtrip(spark):
    """rasterize -> polygonize -> boundary dissolve recovers the original
    pixel-aligned rectangles EXACTLY (bit-identical corner coordinates),
    proving the two operators are mutual inverses on the pixel grid and
    that cross-tile seams cancel under dissolve_boundary."""
    from jpspark.ops import dissolve as dis

    # both rects sit on pixel corners (multiples of PXW/PXH from the origin)
    west = (0.0, 0.0, 16 * PXW, 16 * PXH)        # spans tiles (8,8)..(8,8)
    east = (40 * PXW, 8 * PXH, 72 * PXW, 40 * PXH)  # spans 2x2 tiles
    zones_pdf = pd.DataFrame(
        {
            "zone_id": ["west", "east"],
            "geom": [
                wkb.encode_multipolygon(
                    [[np.array([[west[0], west[1]], [west[2], west[1]],
                                [west[2], west[3]], [west[0], west[3]],
                                [west[0], west[1]]])]]
                ),
                wkb.encode_multipolygon(
                    [[np.array([[east[0], east[1]], [east[2], east[1]],
                                [east[2], east[3]], [east[0], east[3]],
                                [east[0], east[1]]])]]
                ),
            ],
            "burn": [77, 133],
        }
    )
    grid = spark.createDataFrame(
        pd.DataFrame(
            [(tx, ty) for ty in range(TY0, TY0 + NY) for tx in range(TX0, TX0 + NX)],
            columns=["tile_x", "tile_y"],
        )
    )
    burned = zonal.rasterize(grid, spark.createDataFrame(zones_pdf), z=Z, w=W, h=H)
    vec = zonal.polygonize(burned, z=Z, collapse=False)
    merged = dis.dissolve(vec, ["zone_value"], boundary=True).collect()
    by_val = {r["zone_value"]: r for r in merged}
    assert set(by_val) == {77, 133}
    for val, rect in ((77, west), (133, east)):
        r = by_val[val]
        # bbox bit-identical to the input rectangle
        assert (r["xmin"], r["ymin"], r["xmax"], r["ymax"]) == rect
        assert r["n_parts"] == 1
        exp_area = (rect[2] - rect[0]) * (rect[3] - rect[1])
        assert abs(r["area"] - exp_area) < 1e-9
    # per-tile pixel counts add up to the rect pixel counts
    npx = {
        int(v): int(n)
        for v, n in vec.groupBy("zone_value").sum("n_px").collect()
    }
    assert npx == {77: 16 * 16, 133: 32 * 32}
