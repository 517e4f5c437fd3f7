"""Great-circle (spherical) measures as pure Column algebra.

The engine's planar measures (geom_area/centroid in queries' geo_measures)
serve projected CRS data the way the reference's PostGIS tables do; this
module adds the geographic-CRS counterpart — haversine distance and
initial bearing on the WGS84 mean sphere — for lat/lon payloads like the
geotagged image table (the reference loads EPSG:4612/6668 layers whose
consumers routinely ask "how far", /root/reference/NOTES.md:96-133).

All trig runs JVM-side inside whole-stage codegen. sin/cos/atan2 are
within 1 ulp across IEEE libms rather than bit-identical, so results are
rounded (1e-4 of a km / a degree leaves >=10 orders of magnitude of
headroom); any SQL oracle must replay the same formula shape and
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine form — well-conditioned at
    small angles where the spherical law of cosines loses digits),
    rounded to 1e-4 km (10 cm)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1)
    dl = F.radians(lon2 - lon1)
    a = (
        F.sin(dp / 2) * F.sin(dp / 2)
        + F.cos(p1) * F.cos(p2) * F.sin(dl / 2) * F.sin(dl / 2)
    )
    # near-antipodal points can push a past 1.0 by a few ulp, which would
    # make sqrt(1 - a) NaN — clamp (oracles must replay the least())
    a = F.least(a, F.lit(1.0))
    d = 2 * F.atan2(F.sqrt(a), F.sqrt(1 - a)) * EARTH_RADIUS_KM
    return F.round(d, 4)


def initial_bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing from point 1 to point 2, degrees in
    [0, 360), rounded to 1e-4 deg."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dl = F.radians(lon2 - lon1)
    y = F.sin(dl) * F.cos(p2)
    x = F.cos(p1) * F.sin(p2) - F.sin(p1) * F.cos(p2) * F.cos(dl)
    deg = F.degrees(F.atan2(y, x))
    # the trailing % 360.0 runs AFTER rounding: a bearing of 359.99997
    # would otherwise round up to 360.0, violating the [0, 360) contract
    return F.round((deg + 360.0) % 360.0, 4) % 360.0
