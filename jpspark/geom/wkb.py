"""WKB geometry codec — NumPy parsing, no GDAL/shapely dependency.

The reference stores geometry as PostGIS ``geometry(MULTI*, srid)`` columns
produced by ``ogr2ogr -nlt PROMOTE_TO_MULTI``
(/root/reference/src/loader/gdal.rs:126-127, :236-251). Our engine carries
geometry as standard little-endian WKB in a Spark ``BinaryType`` column and
always promotes to MULTI at write time for parity (SURVEY F9).

Supported types: Point(1), LineString(2), Polygon(3), MultiPoint(4),
MultiLineString(5), MultiPolygon(6). Coordinates are 2-D float64.

Internal in-memory form for kernels:
  polygon      -> list[np.ndarray (N,2)]  (ring 0 exterior, rest holes)
  multipolygon -> list[polygon]
  multipoint   -> np.ndarray (N,2)
"""

from __future__ import annotations

import struct

import numpy as np

_LE = 1
POINT, LINESTRING, POLYGON, MULTIPOINT, MULTILINESTRING, MULTIPOLYGON = 1, 2, 3, 4, 5, 6


class _Reader:
    __slots__ = ("buf", "off")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def byte(self) -> int:
        b = self.buf[self.off]
        self.off += 1
        return b

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.off)
        self.off += 4
        return v

    def coords(self, n: int) -> np.ndarray:
        a = np.frombuffer(self.buf, dtype="<f8", count=2 * n, offset=self.off).reshape(n, 2)
        self.off += 16 * n
        return a.astype(np.float64)


def _read_header(r: _Reader) -> int:
    order = r.byte()
    if order != _LE:
        raise ValueError("big-endian WKB not supported")
    gtype = r.u32()
    gtype &= 0xFF  # strip any EWKB/Z flags
    return gtype


def _read_ring(r: _Reader) -> np.ndarray:
    return r.coords(r.u32())


def _read_polygon_body(r: _Reader) -> list[np.ndarray]:
    return [_read_ring(r) for _ in range(r.u32())]


def parse(buf: bytes):
    """Parse one WKB blob -> (geom_type, payload).

    payload: POINT -> (2,) array; MULTIPOINT -> (N,2); LINESTRING -> (N,2);
    MULTILINESTRING -> list[(N,2)]; POLYGON -> list[ring]; MULTIPOLYGON ->
    list[list[ring]].
    """
    r = _Reader(bytes(buf))
    gtype = _read_header(r)
    if gtype == POINT:
        return gtype, r.coords(1)[0]
    if gtype == LINESTRING:
        return gtype, _read_ring(r)
    if gtype == POLYGON:
        return gtype, _read_polygon_body(r)
    if gtype == MULTIPOINT:
        n = r.u32()
        pts = np.empty((n, 2), dtype=np.float64)
        for i in range(n):
            _read_header(r)
            pts[i] = r.coords(1)[0]
        return gtype, pts
    if gtype == MULTILINESTRING:
        n = r.u32()
        return gtype, [(_read_header(r), _read_ring(r))[1] for _ in range(n)]
    if gtype == MULTIPOLYGON:
        n = r.u32()
        polys = []
        for _ in range(n):
            _read_header(r)
            polys.append(_read_polygon_body(r))
        return gtype, polys
    raise ValueError(f"unsupported WKB type {gtype}")


def parse_multipolygon(buf: bytes) -> list[list[np.ndarray]]:
    """Parse WKB as a multipolygon, promoting a bare POLYGON (F9)."""
    gtype, payload = parse(buf)
    if gtype == POLYGON:
        return [payload]
    if gtype == MULTIPOLYGON:
        return payload
    raise ValueError(f"expected (MULTI)POLYGON, got type {gtype}")


def parse_multipoint(buf: bytes) -> np.ndarray:
    gtype, payload = parse(buf)
    if gtype == POINT:
        return payload.reshape(1, 2)
    if gtype == MULTIPOINT:
        return payload
    raise ValueError(f"expected (MULTI)POINT, got type {gtype}")


# ---------------------------------------------------------------- encoding

def _w_header(parts: list[bytes], gtype: int) -> None:
    parts.append(struct.pack("<BI", _LE, gtype))


def _w_ring(parts: list[bytes], ring: np.ndarray) -> None:
    ring = np.ascontiguousarray(ring, dtype="<f8")
    parts.append(struct.pack("<I", len(ring)))
    parts.append(ring.tobytes())


def encode_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", _LE, POINT, x, y)


def encode_multipoint(pts: np.ndarray) -> bytes:
    pts = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    parts: list[bytes] = []
    _w_header(parts, MULTIPOINT)
    parts.append(struct.pack("<I", len(pts)))
    for x, y in pts:
        parts.append(struct.pack("<BIdd", _LE, POINT, x, y))
    return b"".join(parts)


def encode_linestring(line: np.ndarray) -> bytes:
    parts: list[bytes] = []
    _w_header(parts, LINESTRING)
    _w_ring(parts, np.asarray(line, dtype=np.float64).reshape(-1, 2))
    return b"".join(parts)


def encode_multilinestring(lines: list[np.ndarray]) -> bytes:
    parts: list[bytes] = []
    _w_header(parts, MULTILINESTRING)
    parts.append(struct.pack("<I", len(lines)))
    for line in lines:
        parts.append(encode_linestring(line))
    return b"".join(parts)


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    parts: list[bytes] = []
    _w_header(parts, POLYGON)
    parts.append(struct.pack("<I", len(rings)))
    for ring in rings:
        _w_ring(parts, ring)
    return b"".join(parts)


def encode_multipolygon(polys: list[list[np.ndarray]]) -> bytes:
    parts: list[bytes] = []
    _w_header(parts, MULTIPOLYGON)
    parts.append(struct.pack("<I", len(polys)))
    for rings in polys:
        parts.append(encode_polygon(rings))
    return b"".join(parts)


def promote_to_multi(buf: bytes) -> bytes:
    """POINT->MULTIPOINT, LINESTRING->MULTILINESTRING, POLYGON->MULTIPOLYGON.

    Mirrors ``promote_geometry_type`` (/root/reference/src/loader/gdal.rs:236-251):
    MULTI*/unknown pass through unchanged. Implemented as a header rewrite —
    wrap the original blob under a 1-element MULTI header (type tag +3).
    """
    gtype = struct.unpack_from("<I", buf, 1)[0] & 0xFF
    if gtype in (POINT, LINESTRING, POLYGON):
        return struct.pack("<BII", _LE, gtype + 3, 1) + bytes(buf)
    return bytes(buf)


# ---------------------------------------------------------------- analytics

def multipolygon_bbox(buf: bytes) -> tuple[float, float, float, float]:
    polys = parse_multipolygon(buf)
    ext = np.concatenate([rings[0] for rings in polys])
    return float(ext[:, 0].min()), float(ext[:, 1].min()), float(ext[:, 0].max()), float(ext[:, 1].max())


def ring_area(ring: np.ndarray) -> float:
    """Signed shoelace area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return float(0.5 * np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def multipolygon_area(buf: bytes) -> float:
    """Unsigned area: |exterior| − |holes| per part, summed."""
    total = 0.0
    for rings in parse_multipolygon(buf):
        total += abs(ring_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_area(hole))
    return total


def merge_multipolygons(bufs: list[bytes]) -> bytes:
    """Collect-union of disjoint multipolygons (dissolve A3 for tiling
    inputs): concatenates all parts into one MULTIPOLYGON. For the
    reference's exactly-tiling admin layers (interiors disjoint) this has
    identical point-set semantics to PostGIS ST_Union
    (/root/reference/scripts/ogr_groupby.sh:25-28)."""
    all_polys: list[list[np.ndarray]] = []
    for b in bufs:
        all_polys.extend(parse_multipolygon(b))
    return encode_multipolygon(all_polys)
