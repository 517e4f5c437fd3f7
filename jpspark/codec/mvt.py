"""Mapbox Vector Tile (MVT) 2.1 encoder/decoder, from scratch off the
public specification (https://github.com/mapbox/vector-tile-spec/tree/master/2.1
— the ``vector_tile.proto`` message layout and §4.3's geometry command
encoding). No protobuf library: the wire format (varints, zigzag, tags,
length-delimited fields) is implemented directly, like codec/flatbuf.py
does for FlatBuffers.

The reference pipeline gets vector tiles by exporting FlatGeobuf and
shelling out to tippecanoe (/root/reference/NOTES.md:118-133); this codec
is the engine-native replacement: each (z, x, y) tile serializes
independently, so the sink is embarrassingly parallel — the opposite
shape from the bounded single-writer FlatGeobuf export.

Message layout (proto field numbers from vector_tile.proto):

  Tile:    layers = 3 (repeated message)
  Layer:   version = 15 (varint, MUST be 2), name = 1 (string),
           features = 2 (repeated message), keys = 3 (repeated string),
           values = 4 (repeated message), extent = 5 (varint, default 4096)
  Feature: id = 1 (varint), tags = 2 (packed varint),
           type = 3 (varint: 1 POINT, 2 LINESTRING, 3 POLYGON),
           geometry = 4 (packed uint32 command stream)
  Value:   exactly one of string_value = 1, float_value = 2,
           double_value = 3, int_value = 4, uint_value = 5,
           sint_value = 6, bool_value = 7

Geometry command stream (§4.3): CommandInteger = (id & 0x7) | (count << 3)
with MoveTo = 1, LineTo = 2, ClosePath = 7; parameters are zigzag-encoded
deltas from the cursor, in integer tile coordinates where (0, 0) is the
tile's top-left and Y grows DOWN (screen axes). Polygon rings: exterior
rings must have positive shoelace area in those screen axes, interior
rings negative (§4.3.3.3); ClosePath is implicit — the first point is not
repeated.
"""

from __future__ import annotations

import struct

import numpy as np

EXTENT = 4096

MOVE_TO, LINE_TO, CLOSE_PATH = 1, 2, 7
POINT, LINESTRING, POLYGON = 1, 2, 3

# ---------------------------------------------------------- wire format


def uvarint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1  # proto int64 semantics: two's complement, 10 bytes
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _tag(field: int, wire_type: int) -> bytes:
    return uvarint((field << 3) | wire_type)


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _tag(field, 2) + uvarint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    """Varint field (wire type 0)."""
    return _tag(field, 0) + uvarint(value)


# ------------------------------------------------------------- Value msg


def encode_value(v) -> bytes:
    if isinstance(v, bool):  # before int: bool is an int subclass
        return _vi(7, 1 if v else 0)
    if isinstance(v, str):
        return _ld(1, v.encode("utf-8"))
    if isinstance(v, (int, np.integer)):
        return _vi(6, zigzag(int(v)))  # sint64: compact for any sign
    if isinstance(v, (float, np.floating)):
        return _tag(3, 1) + struct.pack("<d", float(v))
    raise TypeError(f"unsupported MVT attribute type: {type(v)}")


def decode_value(buf: bytes):
    key, pos = read_uvarint(buf, 0)
    field, wt = key >> 3, key & 0x7
    if field == 1:
        n, pos = read_uvarint(buf, pos)
        return buf[pos : pos + n].decode("utf-8")
    if field == 3:
        return struct.unpack("<d", buf[pos : pos + 8])[0]
    if field == 2:
        return struct.unpack("<f", buf[pos : pos + 4])[0]
    v, pos = read_uvarint(buf, pos)
    if field == 6:
        return unzigzag(v)
    if field == 7:
        return bool(v)
    if field in (4, 5):
        return v if field == 5 else (v - (1 << 64) if v >> 63 else v)
    raise ValueError(f"unknown Value field {field}")


# ------------------------------------------------------ geometry streams


def _screen_area2(ring: np.ndarray) -> float:
    """Twice the surveyor's-formula area over raw tile coordinates
    (§4.3.3.3): positive defines an EXTERIOR ring — which, with Y down,
    appears clockwise on screen."""
    x, y = ring[:, 0].astype(np.float64), ring[:, 1].astype(np.float64)
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def point_geometry(qx: np.ndarray, qy: np.ndarray) -> list[int]:
    """Single (multi)point feature: one MoveTo with count = n_points,
    parameters as cursor deltas."""
    n = len(qx)
    cmds = [(MOVE_TO & 0x7) | (n << 3)]
    cx = cy = 0
    for x, y in zip(qx, qy):
        cmds.append(zigzag(int(x) - cx))
        cmds.append(zigzag(int(y) - cy))
        cx, cy = int(x), int(y)
    return cmds


def _path(ring: np.ndarray, cx: int, cy: int, close: bool) -> tuple[list[int], int, int]:
    pts = np.asarray(ring, dtype=np.int64)
    if close and len(pts) > 1 and (pts[0] == pts[-1]).all():
        pts = pts[:-1]  # ClosePath is implicit; don't repeat the first point
    cmds = [(MOVE_TO & 0x7) | (1 << 3), zigzag(int(pts[0, 0]) - cx), zigzag(int(pts[0, 1]) - cy)]
    cx, cy = int(pts[0, 0]), int(pts[0, 1])
    n_line = len(pts) - 1
    if n_line:
        cmds.append((LINE_TO & 0x7) | (n_line << 3))
        for x, y in pts[1:]:
            cmds.append(zigzag(int(x) - cx))
            cmds.append(zigzag(int(y) - cy))
            cx, cy = int(x), int(y)
    if close:
        cmds.append((CLOSE_PATH & 0x7) | (1 << 3))
    return cmds, cx, cy


def linestring_geometry(lines: list[np.ndarray]) -> list[int]:
    cmds: list[int] = []
    cx = cy = 0
    for line in lines:
        part, cx, cy = _path(line, cx, cy, close=False)
        cmds += part
    return cmds


def polygon_geometry(rings_signed: list[tuple[np.ndarray, bool]]) -> list[int]:
    """``rings_signed``: (ring, is_exterior) in order — exteriors each
    followed by their interiors (§4.3.4.4 multipolygon layout). Winding is
    corrected here: exterior → positive screen area, interior → negative."""
    cmds: list[int] = []
    cx = cy = 0
    for ring, is_ext in rings_signed:
        r = np.asarray(ring, dtype=np.int64)
        if len(r) > 1 and (r[0] == r[-1]).all():
            r = r[:-1]
        a2 = _screen_area2(r)
        if (a2 > 0) != is_ext and a2 != 0:
            r = r[::-1]
        part, cx, cy = _path(r, cx, cy, close=True)
        cmds += part
    return cmds


def decode_geometry(cmds: list[int], geom_type: int):
    """Replay a command stream to absolute tile coords. Returns a list of
    parts: for POINT one (n,2) array; for LINESTRING one array per path;
    for POLYGON one (ring, screen_area2) tuple per ring."""
    parts = []
    cur: list[list[int]] = []
    cx = cy = 0
    i = 0
    while i < len(cmds):
        cmd = cmds[i]
        op, count = cmd & 0x7, cmd >> 3
        i += 1
        if op == MOVE_TO:
            if cur and geom_type != POINT:
                parts.append(np.array(cur, dtype=np.int64))
                cur = []
            for _ in range(count):
                cx += unzigzag(cmds[i]); cy += unzigzag(cmds[i + 1]); i += 2
                cur.append([cx, cy])
        elif op == LINE_TO:
            for _ in range(count):
                cx += unzigzag(cmds[i]); cy += unzigzag(cmds[i + 1]); i += 2
                cur.append([cx, cy])
        elif op == CLOSE_PATH:
            ring = np.array(cur, dtype=np.int64)
            parts.append((ring, _screen_area2(ring)))
            cur = []
        else:
            raise ValueError(f"bad geometry command id {op}")
    if cur:
        parts.append(np.array(cur, dtype=np.int64))
    return parts


# --------------------------------------------------------- Layer / Tile


def encode_feature(
    geom_cmds: list[int],
    geom_type: int,
    feature_id: int | None = None,
    tags: list[int] | None = None,
) -> bytes:
    body = b""
    if feature_id is not None:
        body += _vi(1, int(feature_id))
    if tags:
        body += _ld(2, b"".join(uvarint(t) for t in tags))
    body += _vi(3, geom_type)
    body += _ld(4, b"".join(uvarint(c) for c in geom_cmds))
    return body


def encode_layer(
    name: str,
    features: list[bytes],
    keys: list[str] = (),
    values: list = (),
    extent: int = EXTENT,
) -> bytes:
    body = _vi(15, 2)  # version MUST be 2 and MUST come first per convention
    body += _ld(1, name.encode("utf-8"))
    for f in features:
        body += _ld(2, f)
    for k in keys:
        body += _ld(3, k.encode("utf-8"))
    for v in values:
        body += _ld(4, encode_value(v))
    body += _vi(5, extent)
    return body


def encode_tile(layers: list[bytes]) -> bytes:
    return b"".join(_ld(3, layer) for layer in layers)


def decode_tile(buf: bytes) -> list[dict]:
    """Full structural decode (for tests and gate verification): returns
    one dict per layer with name/extent/version/keys/values and features
    as {id, type, tags, geometry (decoded absolute parts)}."""
    layers = []
    pos = 0
    while pos < len(buf):
        key, pos = read_uvarint(buf, pos)
        if key >> 3 != 3 or key & 0x7 != 2:
            raise ValueError(f"unexpected Tile field {key >> 3}")
        n, pos = read_uvarint(buf, pos)
        layers.append(_decode_layer(buf[pos : pos + n]))
        pos += n
    return layers


def _decode_layer(buf: bytes) -> dict:
    out = {"name": None, "version": None, "extent": EXTENT,
           "keys": [], "values": [], "features": []}
    pos = 0
    raw_feats = []
    while pos < len(buf):
        key, pos = read_uvarint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            v, pos = read_uvarint(buf, pos)
            if field == 15:
                out["version"] = v
            elif field == 5:
                out["extent"] = v
        elif wt == 2:
            n, pos = read_uvarint(buf, pos)
            chunk = buf[pos : pos + n]
            pos += n
            if field == 1:
                out["name"] = chunk.decode("utf-8")
            elif field == 2:
                raw_feats.append(chunk)
            elif field == 3:
                out["keys"].append(chunk.decode("utf-8"))
            elif field == 4:
                out["values"].append(decode_value(chunk))
        else:
            raise ValueError(f"unexpected wire type {wt} in Layer")
    for fb in raw_feats:
        out["features"].append(_decode_feature(fb))
    return out


def _decode_feature(buf: bytes) -> dict:
    f = {"id": None, "tags": [], "type": None, "geometry": None, "raw_cmds": None}
    pos = 0
    while pos < len(buf):
        key, pos = read_uvarint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            v, pos = read_uvarint(buf, pos)
            if field == 1:
                f["id"] = v
            elif field == 3:
                f["type"] = v
        elif wt == 2:
            n, pos = read_uvarint(buf, pos)
            end = pos + n
            vals = []
            while pos < end:
                v, pos = read_uvarint(buf, pos)
                vals.append(v)
            if field == 2:
                f["tags"] = vals
            elif field == 4:
                f["raw_cmds"] = vals
        else:
            raise ValueError(f"unexpected wire type {wt} in Feature")
    if f["raw_cmds"] is not None and f["type"] is not None:
        f["geometry"] = decode_geometry(f["raw_cmds"], f["type"])
    return f


# --------------------------------------- vectorized point-feature encoding

def _uvarint_cols(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Column-wise varint encoding: (bytes[n, maxlen], lens[n]). Group k
    of value v is its bits 7k..7k+6, MSB-flagged while more groups follow."""
    vals = np.asarray(vals, dtype=np.uint64)
    lens = np.ones(len(vals), dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        lens += (v != 0).astype(np.int64)
        v >>= np.uint64(7)
    maxlen = int(lens.max()) if len(vals) else 1
    out = np.zeros((len(vals), maxlen), dtype=np.uint8)
    for k in range(maxlen):
        grp = ((vals >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        more = (k < lens - 1).astype(np.uint8) << 7
        out[:, k] = grp | more
    return out, lens


def _scatter(flat: np.ndarray, pos: np.ndarray, cols: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Write variable-length byte columns at per-row positions; returns
    positions advanced past what was written."""
    for k in range(cols.shape[1]):
        m = lens > k
        flat[pos[m] + k] = cols[m, k]
    return pos + lens


def encode_point_features(qx: np.ndarray, qy: np.ndarray, ids: np.ndarray) -> bytes:
    """All of a tile's single-point Features, each framed as a Layer
    ``features`` field (tag 0x12 + length), in ONE vectorized pass — no
    per-feature Python. Wire-identical to the scalar path
    (``_ld(2, encode_feature(point_geometry(...), POINT, id))``), which
    the differential test pins. Requires non-negative ids and
    0 <= q < 2^20 (any practical extent)."""
    n = len(qx)
    if n == 0:
        return b""
    zx_cols, zx_len = _uvarint_cols(np.asarray(qx, np.int64) << 1)  # zigzag(q>=0)
    zy_cols, zy_len = _uvarint_cols(np.asarray(qy, np.int64) << 1)
    id_cols, id_len = _uvarint_cols(np.asarray(ids, np.int64))
    geom_len = 1 + zx_len + zy_len                      # cmd byte 9 + deltas
    feat_len = (1 + id_len) + 2 + (2 + geom_len)        # id fld + type + geom fld
    if int(feat_len.max()) >= 128:
        raise ValueError("feature too large for 1-byte length prefix")
    total = int((2 + feat_len).sum())                   # 0x12 + len + body
    flat = np.zeros(total, dtype=np.uint8)
    pos = np.zeros(n, dtype=np.int64)
    pos[1:] = np.cumsum(2 + feat_len)[:-1]
    flat[pos] = 0x12
    flat[pos + 1] = feat_len.astype(np.uint8)
    p = pos + 2
    flat[p] = 0x08                                      # Feature.id
    p = _scatter(flat, p + 1, id_cols, id_len)
    flat[p] = 0x18                                      # Feature.type = POINT
    flat[p + 1] = POINT
    flat[p + 2] = 0x22                                  # Feature.geometry
    flat[p + 3] = geom_len.astype(np.uint8)
    flat[p + 4] = 9                                     # MoveTo, count 1
    p = _scatter(flat, p + 5, zx_cols, zx_len)
    _scatter(flat, p, zy_cols, zy_len)
    return flat.tobytes()
