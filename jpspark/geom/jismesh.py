"""JIS X 0410 standard grid-square (地域メッシュ) codes as pure Column
algebra.

The reference's output tables carry these codes as first-class columns —
its attribute mapping renames shapefile fields like ``G04a_001`` to
``3次メッシュコード`` (3rd-level mesh code, /root/reference/README.md:176)
and its downloader keys per-mesh archives by the ``mmmm`` mesh-code file
segment (/root/reference/src/loader/mapping.rs:22). This module computes
the codes from coordinates (and back) instead of trusting them as opaque
strings, so a 10^12-row geotagged image table can derive, validate, or
repartition by mesh at scan speed.

Levels (all from the public JIS X 0410 definition):
  1st  (80 km, 4 digits):  lat band = floor(lat*1.5), lon band = floor(lon)-100
  2nd  (10 km, 6 digits):  8x8 subdivision of a 1st-level square
  3rd  ( 1 km, 8 digits):  10x10 subdivision of a 2nd-level square
  half (500 m, 9 digits):  3rd-level quadrant digit 1=SW 2=SE 3=NW 4=NE

Everything is floor/multiply arithmetic on doubles: with coordinates on a
binary-fraction lattice every intermediate is exact, and on arbitrary
coordinates Spark and any IEEE-754 SQL engine agree bit-for-bit as long
as the oracle replays the same operation order. No Python in the hot
path; codes are LongType so downstream joins/groupBys shuffle on a
compact integer key.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _parts(lat: Column, lon: Column) -> dict[str, Column]:
    t = lat * 1.5  # latitude in 1st-level units (2/3 deg per band)
    a1 = F.floor(t)
    frac1 = t - a1
    q = F.floor(frac1 * 8)
    frac2 = frac1 * 8 - q
    r = F.floor(frac2 * 10)
    frac3 = frac2 * 10 - r
    half_i = F.floor(frac3 * 2)

    u = F.floor(lon)
    lon1 = u - 100
    g1 = lon - u
    v = F.floor(g1 * 8)
    g2 = g1 * 8 - v
    w = F.floor(g2 * 10)
    g3 = g2 * 10 - w
    half_j = F.floor(g3 * 2)
    return {
        "a1": a1, "lon1": lon1, "q": q, "v": v,
        "r": r, "w": w, "half_i": half_i, "half_j": half_j,
    }


def mesh1(lat: Column, lon: Column) -> Column:
    """1st-level (80 km) mesh code, 4 digits."""
    p = _parts(lat, lon)
    return (p["a1"] * 100 + p["lon1"]).cast("long")


def mesh2(lat: Column, lon: Column) -> Column:
    """2nd-level (10 km) mesh code, 6 digits."""
    p = _parts(lat, lon)
    return ((p["a1"] * 100 + p["lon1"]) * 100 + p["q"] * 10 + p["v"]).cast("long")


def mesh3(lat: Column, lon: Column) -> Column:
    """3rd-level (1 km) mesh code, 8 digits — the code the reference's
    mapped tables carry per row."""
    p = _parts(lat, lon)
    return (
        ((p["a1"] * 100 + p["lon1"]) * 100 + p["q"] * 10 + p["v"]) * 100
        + p["r"] * 10
        + p["w"]
    ).cast("long")


def mesh_half(lat: Column, lon: Column) -> Column:
    """Half (500 m) mesh code, 9 digits: 3rd-level code plus quadrant
    digit 1=SW 2=SE 3=NW 4=NE."""
    p = _parts(lat, lon)
    quad = p["half_i"] * 2 + p["half_j"] + 1
    return (
        (
            ((p["a1"] * 100 + p["lon1"]) * 100 + p["q"] * 10 + p["v"]) * 100
            + p["r"] * 10
            + p["w"]
        )
        * 10
        + quad
    ).cast("long")


def mesh3_bounds(code: Column) -> list[Column]:
    """Inverse of mesh3: [lat_lo, lon_lo, lat_hi, lon_hi] of the 1 km
    square. Canonical operation order — any oracle must replay it
    verbatim (the /1.5 is IEEE-correctly-rounded identically everywhere,
    but only for an identical expression tree)."""
    a1 = F.floor(code / 1000000)
    lon1 = F.floor(code / 10000) % 100
    q = F.floor(code / 1000) % 10
    v = F.floor(code / 100) % 10
    r = F.floor(code / 10) % 10
    w = code % 10
    lat_lo = (a1 + q * 0.125 + r * 0.0125) / 1.5
    lon_lo = lon1 + 100 + v * 0.125 + w * 0.0125
    lat_hi = (a1 + q * 0.125 + (r + 1) * 0.0125) / 1.5
    lon_hi = lon1 + 100 + v * 0.125 + (w + 1) * 0.0125
    return [
        lat_lo.alias("lat_lo"),
        lon_lo.alias("lon_lo"),
        lat_hi.alias("lat_hi"),
        lon_hi.alias("lon_hi"),
    ]
