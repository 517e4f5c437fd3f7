"""FlatGeobuf (v3) encode/decode — the reference's third export format
(/root/reference/src/loader/gdal.rs:143-167 shells ``ogr2ogr -f
FlatGeobuf``; format list at src/main.rs:53-112).

Implemented from the public spec (flatgeobuf.org): file = 8 magic bytes
``fgb\\x03fgb\\x01`` + size-prefixed Header flatbuffer + optional packed
Hilbert R-tree index + size-prefixed Feature flatbuffers. We write
``index_node_size=0`` (no index block — readers then stream features),
but DO Hilbert-sort the features, which is what makes the format's
spatial streaming effective and matches writer behavior of the canonical
implementations.

Geometry encoding: flat xy double vector; ``ends`` = cumulative vertex
counts per ring; multi-part geometries nest single-part Geometry tables
in ``parts``. Properties: per column ``uint16 column_index`` + value
(scalars little-endian; strings length-prefixed), with the column schema
declared once in the header.
"""

from __future__ import annotations

import struct

import numpy as np

from ..geom import wkb
from . import flatbuf as fb

MAGIC = b"fgb\x03fgb\x01"

# GeometryType enum (spec)
GT_UNKNOWN, GT_POINT, GT_LINESTRING, GT_POLYGON = 0, 1, 2, 3
GT_MULTIPOINT, GT_MULTILINESTRING, GT_MULTIPOLYGON = 4, 5, 6

# ColumnType enum (spec)
CT_BOOL, CT_INT, CT_LONG, CT_DOUBLE, CT_STRING = 2, 5, 7, 10, 11

_WKB_TO_GT = {
    wkb.POINT: GT_POINT,
    wkb.LINESTRING: GT_LINESTRING,
    wkb.POLYGON: GT_POLYGON,
    wkb.MULTIPOINT: GT_MULTIPOINT,
    wkb.MULTILINESTRING: GT_MULTILINESTRING,
    wkb.MULTIPOLYGON: GT_MULTIPOLYGON,
}


# ------------------------------------------------------------------ hilbert

def hilbert_d(x: np.ndarray, y: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert curve distance of grid cells (x, y) on a 2^order grid —
    the classic xy2d bit-swap loop, vectorized."""
    x = x.astype(np.uint32).copy()
    y = y.astype(np.uint32).copy()
    d = np.zeros(len(x), dtype=np.uint64)
    s = np.uint32(1 << (order - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint32)
        ry = ((y & s) > 0).astype(np.uint32)
        d += np.uint64(s) * np.uint64(s) * (3 * rx ^ ry).astype(np.uint64)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        x[flip] = s - 1 - x_f
        y_f = y[flip]
        y[flip] = s - 1 - y_f
        x_s = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = x_s
        s >>= np.uint32(1)
    return d


def hilbert_order(bboxes: np.ndarray, order: int = 16) -> np.ndarray:
    """Sort permutation of features by Hilbert distance of bbox centers
    (bboxes: (n, 4) [xmin, ymin, xmax, ymax])."""
    cx = (bboxes[:, 0] + bboxes[:, 2]) / 2.0
    cy = (bboxes[:, 1] + bboxes[:, 3]) / 2.0
    ex0, ey0 = bboxes[:, 0].min(), bboxes[:, 1].min()
    ex1, ey1 = bboxes[:, 2].max(), bboxes[:, 3].max()
    n = (1 << 16) - 1
    gx = ((cx - ex0) / max(ex1 - ex0, 1e-300) * n).astype(np.uint32)
    gy = ((cy - ey0) / max(ey1 - ey0, 1e-300) * n).astype(np.uint32)
    return np.argsort(hilbert_d(gx, gy), kind="stable")


# ------------------------------------------------------------------ encode

def _build_geometry(b: fb.Builder, geom_wkb: bytes) -> int:
    """Build a Geometry table (slots: ends=0, xy=1, type=6, parts=7)."""
    gtype, payload = wkb.parse(bytes(geom_wkb))

    def leaf(xy: np.ndarray, ends_arr, leaf_type: int) -> int:
        ends_off = (
            b.create_scalar_vector("uint32", [int(e) for e in ends_arr])
            if ends_arr is not None and len(ends_arr) > 1
            else None
        )
        xy_off = b.create_scalar_vector("float64", [float(v) for v in np.asarray(xy).ravel()])
        b.start_table()
        if ends_off:
            b.add_offset(0, ends_off)
        b.add_offset(1, xy_off)
        b.add_scalar(6, "uint8", leaf_type, default=0)
        return b.end_table()

    def multi(parts: list[int], multi_type: int) -> int:
        pv = b.create_offset_vector(parts)
        b.start_table()
        b.add_scalar(6, "uint8", multi_type, default=0)
        b.add_offset(7, pv)
        return b.end_table()

    def polygon(rings) -> int:
        coords = np.vstack(rings)
        ends = np.cumsum([len(r) for r in rings]).astype(np.uint32)
        return leaf(coords, ends, GT_POLYGON)

    if gtype == wkb.POINT:
        return leaf(np.asarray(payload).reshape(1, 2), None, GT_POINT)
    if gtype == wkb.MULTIPOINT:
        return leaf(payload, None, GT_MULTIPOINT)
    if gtype == wkb.LINESTRING:
        return leaf(payload, None, GT_LINESTRING)
    if gtype == wkb.POLYGON:
        return polygon(payload)
    if gtype == wkb.MULTILINESTRING:
        return multi([leaf(line, None, GT_LINESTRING) for line in payload], GT_MULTILINESTRING)
    if gtype == wkb.MULTIPOLYGON:
        return multi([polygon(rings) for rings in payload], GT_MULTIPOLYGON)
    raise ValueError(f"unsupported geometry type {gtype}")


def encode_properties(values: dict, columns: list[tuple[str, int]]) -> bytes:
    """Property blob: uint16 column index + typed value per non-null col."""
    out = bytearray()
    for i, (name, ctype) in enumerate(columns):
        v = values.get(name)
        if v is None or (isinstance(v, float) and np.isnan(v)):
            continue
        out += struct.pack("<H", i)
        if ctype == CT_BOOL:
            out += struct.pack("<B", 1 if v else 0)
        elif ctype == CT_INT:
            out += struct.pack("<i", int(v))
        elif ctype == CT_LONG:
            out += struct.pack("<q", int(v))
        elif ctype == CT_DOUBLE:
            out += struct.pack("<d", float(v))
        elif ctype == CT_STRING:
            enc = str(v).encode("utf-8")
            out += struct.pack("<I", len(enc)) + enc
        else:
            raise ValueError(f"unsupported column type {ctype}")
    return bytes(out)


def _build_column(b: fb.Builder, name: str, ctype: int) -> int:
    name_off = b.create_string(name)
    b.start_table()
    b.add_offset(0, name_off)
    b.add_scalar(1, "uint8", ctype, default=0)
    return b.end_table()


def encode_header(
    name: str,
    geometry_type: int,
    features_count: int,
    columns: list[tuple[str, int]],
    envelope: list[float] | None = None,
    srid: int | None = None,
) -> bytes:
    """Size-prefixed Header flatbuffer. Slots (Header.fbs): name=0,
    envelope=1, geometry_type=2, columns=7, features_count=8,
    index_node_size=9, crs=10."""
    b = fb.Builder()
    crs_off = None
    if srid is not None:
        org_off = b.create_string("EPSG")
        b.start_table()  # Crs: org=0, code=1
        b.add_offset(0, org_off)
        b.add_scalar(1, "int32", int(srid), default=0)
        crs_off = b.end_table()
    col_offs = [_build_column(b, n, t) for n, t in columns]
    cols_off = b.create_offset_vector(col_offs) if col_offs else None
    env_off = (
        b.create_scalar_vector("float64", [float(v) for v in envelope]) if envelope else None
    )
    name_off = b.create_string(name)
    b.start_table()
    b.add_offset(0, name_off)
    if env_off:
        b.add_offset(1, env_off)
    b.add_scalar(2, "uint8", geometry_type, default=0)
    if cols_off:
        b.add_offset(7, cols_off)
    b.add_scalar(8, "uint64", features_count, default=0)
    # index_node_size default is 16; 0 (no index) must be written explicitly
    b.add_scalar(9, "uint16", 0, default=16)
    if crs_off:
        b.add_offset(10, crs_off)
    root = b.end_table()
    return b.finish(root, size_prefixed=True)


def encode_feature(geom_wkb: bytes, props: bytes) -> bytes:
    """Size-prefixed Feature flatbuffer (slots: geometry=0, properties=1)."""
    b = fb.Builder()
    geom_off = _build_geometry(b, geom_wkb)
    prop_off = b.create_bytes(props) if props else None
    b.start_table()
    b.add_offset(0, geom_off)
    if prop_off:
        b.add_offset(1, prop_off)
    root = b.end_table()
    return b.finish(root, size_prefixed=True)


# ------------------------------------------------------------------ decode

def _decode_geometry(g: fb.Table):
    gtype = g.scalar(6, "uint8", 0)
    parts = g.table_vector(7)
    if parts:
        return {"type": gtype, "parts": [_decode_geometry(p) for p in parts]}
    xy = g.scalar_vector(1, "float64")
    ends = g.scalar_vector(0, "uint32")
    coords = np.asarray(xy, dtype=np.float64).reshape(-1, 2)
    if not ends:
        ends = [len(coords)]
    rings, prev = [], 0
    for e in ends:
        rings.append(coords[prev:e])
        prev = e
    return {"type": gtype, "rings": rings}


def decode_properties(blob: bytes, columns: list[tuple[str, int]]) -> dict:
    out = {}
    pos = 0
    while pos < len(blob):
        (i,) = struct.unpack_from("<H", blob, pos)
        pos += 2
        name, ctype = columns[i]
        if ctype == CT_BOOL:
            out[name] = bool(blob[pos])
            pos += 1
        elif ctype == CT_INT:
            (out[name],) = struct.unpack_from("<i", blob, pos)
            pos += 4
        elif ctype == CT_LONG:
            (out[name],) = struct.unpack_from("<q", blob, pos)
            pos += 8
        elif ctype == CT_DOUBLE:
            (out[name],) = struct.unpack_from("<d", blob, pos)
            pos += 8
        elif ctype == CT_STRING:
            (n,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            out[name] = blob[pos : pos + n].decode("utf-8")
            pos += n
        else:
            raise ValueError(f"unsupported column type {ctype}")
    return out


def decode_file(data: bytes) -> dict:
    """Parse a FlatGeobuf byte string -> {header fields, features list}."""
    if data[:8] != MAGIC:
        raise ValueError("not a FlatGeobuf file (bad magic)")
    pos = 8
    (hsize,) = struct.unpack_from("<I", data, pos)
    header = fb.root_table(data[pos : pos + 4 + hsize], size_prefixed=True)
    pos += 4 + hsize
    columns = [
        (c.string(0), c.scalar(1, "uint8", 0)) for c in header.table_vector(7)
    ]
    index_node_size = header.scalar(9, "uint16", 16)
    if index_node_size != 0:
        raise NotImplementedError("index block parsing not implemented (we write none)")
    feats = []
    while pos < len(data):
        (fsize,) = struct.unpack_from("<I", data, pos)
        ft = fb.root_table(data[pos : pos + 4 + fsize], size_prefixed=True)
        geom_t = ft.table(0)
        feats.append(
            {
                "geometry": _decode_geometry(geom_t) if geom_t else None,
                "properties": decode_properties(ft.bytes_vector(1), columns),
            }
        )
        pos += 4 + fsize
    return {
        "name": header.string(0),
        "geometry_type": header.scalar(2, "uint8", 0),
        "features_count": header.scalar(8, "uint64", 0),
        "envelope": header.scalar_vector(1, "float64"),
        "columns": columns,
        "crs_code": (header.table(10).scalar(1, "int32", 0) if header.table(10) else None),
        "features": feats,
    }
