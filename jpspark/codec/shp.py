"""Minimal ESRI Shapefile (.shp) + dBase III (.dbf) codec — from scratch.

The reference never parses shapefiles itself: it shells out to GDAL
(``ogrinfo``/``ogr2ogr``, /root/reference/src/loader/gdal.rs:169-212) after
unzipping. This module closes SURVEY S5's by-design gap so the engine's
ZIP->union pipeline can run end-to-end on actual shapefile bytes with no
native dependency. Formats per the public specs (ESRI Shapefile Technical
Description 1998; dBase III header layout):

.shp: 100-byte header (big-endian file code 9994 at 0, BE file length in
16-bit words at 24, LE version 1000 at 28, LE shape type at 32, LE bbox
doubles at 36), then records of [BE record number, BE content length]
followed by LE content (shape type + payload).

.dbf: 32-byte header (version 0x03, LE record count at 4, LE header size
at 8, LE record size at 10), then 32-byte field descriptors (11-byte
name, 1-byte type C/N/F/L/D, length at 16, decimal count at 17) until the
0x0D terminator, then fixed-width records each prefixed by a deletion
flag byte.

Geometry mapping mirrors ``-nlt PROMOTE_TO_MULTI``: Point->MULTIPOINT is
left to the caller (wkb.promote_to_multi); Polygon records map rings by
winding (clockwise = outer starts a new polygon, counter-clockwise = hole
attached to the current outer — the standard shapefile convention).

The write_* functions exist to generate test fixtures and goldens; tests
also assert spec'd byte positions directly so the parser is validated
against the format, not just against our writer.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from ..geom import wkb

SHP_FILE_CODE = 9994
SHP_VERSION = 1000

SHAPE_NULL, SHAPE_POINT, SHAPE_POLYLINE, SHAPE_POLYGON, SHAPE_MULTIPOINT = 0, 1, 3, 5, 8


# --------------------------------------------------------------------- .shp

def _ring_is_cw(ring: np.ndarray) -> bool:
    """Shoelace: negative signed area = clockwise = shapefile outer ring."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.sum((x[1:] - x[:-1]) * (y[1:] + y[:-1]))) > 0.0


def _polygon_record_to_wkb(parts: list[np.ndarray]) -> bytes:
    """Group rings into polygons by winding order (spec: outers CW, holes
    CCW; holes follow their outer in well-formed files)."""
    polys: list[list[np.ndarray]] = []
    for ring in parts:
        if _ring_is_cw(ring) or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    return wkb.encode_multipolygon(polys)


def parse_shp(buf: bytes) -> list[tuple[int, bytes | None]]:
    """Parse .shp bytes -> [(record_number, WKB or None for null shapes)].

    Type mapping: Point->POINT, MultiPoint->MULTIPOINT, PolyLine->
    MULTILINESTRING, Polygon->MULTIPOLYGON (winding-grouped rings);
    PROMOTE_TO_MULTI for the point types is applied downstream where the
    layer mapping asks for it (wkb.promote_to_multi)."""
    if len(buf) < 100:
        raise ValueError("not a shapefile: shorter than the 100-byte header")
    (file_code,) = struct.unpack_from(">i", buf, 0)
    if file_code != SHP_FILE_CODE:
        raise ValueError(f"not a shapefile: file code {file_code} != {SHP_FILE_CODE}")
    (file_len_words,) = struct.unpack_from(">i", buf, 24)
    (version,) = struct.unpack_from("<i", buf, 28)
    if version != SHP_VERSION:
        raise ValueError(f"unsupported shapefile version {version}")
    end = min(file_len_words * 2, len(buf))
    out: list[tuple[int, bytes | None]] = []
    pos = 100
    while pos + 8 <= end:
        recno, content_words = struct.unpack_from(">ii", buf, pos)
        pos += 8
        content = buf[pos : pos + content_words * 2]
        pos += content_words * 2
        (stype,) = struct.unpack_from("<i", content, 0)
        if stype == SHAPE_NULL:
            out.append((recno, None))
        elif stype == SHAPE_POINT:
            x, y = struct.unpack_from("<dd", content, 4)
            out.append((recno, wkb.encode_point(x, y)))
        elif stype == SHAPE_MULTIPOINT:
            (n,) = struct.unpack_from("<i", content, 36)
            pts = np.frombuffer(content, dtype="<f8", count=2 * n, offset=40).reshape(-1, 2)
            out.append((recno, wkb.encode_multipoint(pts)))
        elif stype in (SHAPE_POLYLINE, SHAPE_POLYGON):
            n_parts, n_points = struct.unpack_from("<ii", content, 36)
            starts = list(struct.unpack_from(f"<{n_parts}i", content, 44))
            coords = np.frombuffer(
                content, dtype="<f8", count=2 * n_points, offset=44 + 4 * n_parts
            ).reshape(-1, 2)
            bounds = starts + [n_points]
            rings = [coords[bounds[i] : bounds[i + 1]].copy() for i in range(n_parts)]
            if stype == SHAPE_POLYGON:
                out.append((recno, _polygon_record_to_wkb(rings)))
            else:
                out.append((recno, wkb.encode_multilinestring(rings)))
        else:
            raise ValueError(f"unsupported shape type {stype}")
    return out


def write_shp(geoms: list[bytes]) -> bytes:
    """Fixture writer: encode WKB geometries (POINT / MULTIPOINT /
    MULTIPOLYGON / MULTILINESTRING) as a .shp byte string."""
    records = []
    shape_type = SHAPE_NULL
    bbox = [np.inf, np.inf, -np.inf, -np.inf]

    def upd_bbox(pts: np.ndarray):
        bbox[0] = min(bbox[0], float(pts[:, 0].min()))
        bbox[1] = min(bbox[1], float(pts[:, 1].min()))
        bbox[2] = max(bbox[2], float(pts[:, 0].max()))
        bbox[3] = max(bbox[3], float(pts[:, 1].max()))

    for i, g in enumerate(geoms):
        gtype, payload = wkb.parse(bytes(g))
        if gtype == wkb.POINT:
            shape_type = SHAPE_POINT
            content = struct.pack("<i", SHAPE_POINT) + struct.pack(
                "<dd", float(payload[0]), float(payload[1])
            )
            upd_bbox(np.asarray(payload).reshape(1, 2))
        elif gtype == wkb.MULTIPOINT:
            shape_type = SHAPE_MULTIPOINT
            pts = np.asarray(payload)
            upd_bbox(pts)
            content = (
                struct.pack("<i", SHAPE_MULTIPOINT)
                + struct.pack("<4d", pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max())
                + struct.pack("<i", len(pts))
                + pts.astype("<f8").tobytes()
            )
        elif gtype == wkb.MULTIPOLYGON:
            shape_type = SHAPE_POLYGON
            rings = []
            for poly in payload:
                for j, r in enumerate(poly):
                    r = np.asarray(r)
                    # enforce spec winding: outer CW, holes CCW
                    cw = _ring_is_cw(r)
                    if (j == 0 and not cw) or (j > 0 and cw):
                        r = r[::-1]
                    rings.append(r)
            coords = np.vstack(rings)
            upd_bbox(coords)
            starts, acc = [], 0
            for r in rings:
                starts.append(acc)
                acc += len(r)
            content = (
                struct.pack("<i", SHAPE_POLYGON)
                + struct.pack(
                    "<4d", coords[:, 0].min(), coords[:, 1].min(),
                    coords[:, 0].max(), coords[:, 1].max(),
                )
                + struct.pack("<ii", len(rings), len(coords))
                + struct.pack(f"<{len(rings)}i", *starts)
                + coords.astype("<f8").tobytes()
            )
        else:
            raise ValueError(f"write_shp: unsupported WKB type {gtype}")
        records.append(struct.pack(">ii", i + 1, len(content) // 2) + content)

    body = b"".join(records)
    total_words = (100 + len(body)) // 2
    header = struct.pack(">i", SHP_FILE_CODE) + b"\x00" * 20
    header += struct.pack(">i", total_words)
    header += struct.pack("<ii", SHP_VERSION, shape_type)
    header += struct.pack("<4d", *bbox)
    header += struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # Z/M ranges
    assert len(header) == 100
    return header + body


# --------------------------------------------------------------------- .dbf

def parse_dbf_fields(buf: bytes) -> list[tuple[str, str, int, int]]:
    """Field descriptors: [(name, type_char, length, decimals)]."""
    fields = []
    pos = 32
    while pos < len(buf) and buf[pos] != 0x0D:
        raw_name = buf[pos : pos + 11].split(b"\x00", 1)[0]
        ftype = chr(buf[pos + 11])
        flen = buf[pos + 16]
        fdec = buf[pos + 17]
        fields.append((raw_name.decode("ascii", errors="replace"), ftype, flen, fdec))
        pos += 32
    return fields


def parse_dbf(buf: bytes, encoding: str | None = None) -> pd.DataFrame:
    """Parse .dbf bytes to a typed DataFrame. ``encoding`` applies to C
    (character) cells; None runs the CP932-first detect chain over the
    raw cells — parity with the reference's SHAPE_ENCODING handling
    (gdal.rs:337-356)."""
    (n_records,) = struct.unpack_from("<I", buf, 4)
    (header_size,) = struct.unpack_from("<H", buf, 8)
    (record_size,) = struct.unpack_from("<H", buf, 10)
    fields = parse_dbf_fields(buf)
    raw_rows: list[list[bytes]] = []
    pos = header_size
    for _ in range(n_records):
        rec = buf[pos : pos + record_size]
        pos += record_size
        if not rec or rec[0] == 0x2A:  # deletion flag '*'
            continue
        cells, off = [], 1
        for _, _, flen, _ in fields:
            cells.append(rec[off : off + flen])
            off += flen
        raw_rows.append(cells)
    if encoding is None:
        from ..ops.text import detect_encoding

        samples = [c for row in raw_rows[:64] for c in row]
        encoding = detect_encoding(samples) if samples else "utf-8"
    cols: dict[str, list] = {}
    for j, (name, ftype, _, fdec) in enumerate(fields):
        vals: list = []
        for row in raw_rows:
            s = row[j].decode(encoding, errors="replace").strip()
            if ftype == "C" or ftype == "D":
                vals.append(s if s else None)
            elif ftype in ("N", "F"):
                if not s:
                    vals.append(None)
                elif ftype == "F" or fdec > 0 or "." in s:
                    vals.append(float(s))
                else:
                    vals.append(int(s))
            elif ftype == "L":
                vals.append(None if s in ("", "?") else s in ("Y", "y", "T", "t"))
            else:
                vals.append(s)
        cols[name] = vals
    pdf = pd.DataFrame(cols)
    # stabilize dtypes for Spark inference (None-only numeric cols -> float)
    for name, ftype, _, fdec in fields:
        if ftype in ("N", "F"):
            pdf[name] = pd.to_numeric(pdf[name])
            if ftype == "N" and fdec == 0 and pdf[name].notna().all():
                pdf[name] = pdf[name].astype("int64")
    return pdf


def write_dbf(pdf: pd.DataFrame, encoding: str = "cp932") -> bytes:
    """Fixture writer: DataFrame -> .dbf bytes (C for strings, N for
    numbers; fixed widths sized to the data)."""
    fields = []
    encoded: dict[str, list[bytes]] = {}
    for c in pdf.columns:
        series = pdf[c]
        if pd.api.types.is_integer_dtype(series):
            cells = [str(v).encode("ascii") for v in series]
            fields.append((c, "N", max([len(b) for b in cells] + [1]), 0))
        elif pd.api.types.is_float_dtype(series):
            cells = [f"{v:.6f}".encode("ascii") for v in series]
            fields.append((c, "N", max([len(b) for b in cells] + [1]), 6))
        else:
            cells = [("" if v is None else str(v)).encode(encoding) for v in series]
            fields.append((c, "C", max([len(b) for b in cells] + [1]), 0))
        encoded[c] = cells
    record_size = 1 + sum(f[2] for f in fields)
    header_size = 32 + 32 * len(fields) + 1
    out = bytearray()
    out += struct.pack("<BBBB", 0x03, 24, 1, 1)  # version + dummy date
    out += struct.pack("<IHH", len(pdf), header_size, record_size)
    out += b"\x00" * 20
    for name, ftype, flen, fdec in fields:
        nm = name.encode("ascii", errors="replace")[:10]
        out += nm + b"\x00" * (11 - len(nm))
        out += ftype.encode("ascii")
        out += b"\x00" * 4
        out += struct.pack("<BB", flen, fdec)
        out += b"\x00" * 14
    out += b"\x0d"
    for i in range(len(pdf)):
        out += b"\x20"
        for (name, ftype, flen, _), _c in zip(fields, pdf.columns):
            cell = encoded[name][i]
            if ftype == "N":
                out += cell.rjust(flen, b" ")
            else:
                out += cell.ljust(flen, b" ")
    out += b"\x1a"
    return bytes(out)
