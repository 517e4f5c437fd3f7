"""Minimal FlatBuffers wire-format builder + reader (from scratch).

Implements exactly the subset the FlatGeobuf sink needs: tables with
scalar/offset fields, strings, scalar vectors, offset vectors, and
size-prefixed roots. The wire format is public (google/flatbuffers
internals documentation): buffers build back-to-front; a table starts
with an int32 soffset to its vtable (vtable_pos = table_pos - soffset in
file order); a vtable is uint16[2 + n_slots] = [vtable_bytes, table_bytes,
field offsets from table start (0 = absent)]; strings/vectors are a
uint32 length followed by payload; uoffset fields store the forward
distance from the field location to the target.

The builder keeps offsets as distances from the END of the buffer (the
back-to-front convention), so an object's offset is len(buf) right after
it is written.
"""

from __future__ import annotations

import struct

_SCALAR = {
    "uint8": ("<B", 1),
    "int8": ("<b", 1),
    "bool": ("<B", 1),
    "uint16": ("<H", 2),
    "int16": ("<h", 2),
    "uint32": ("<I", 4),
    "int32": ("<i", 4),
    "uint64": ("<Q", 8),
    "int64": ("<q", 8),
    "float32": ("<f", 4),
    "float64": ("<d", 8),
}


class Builder:
    def __init__(self):
        self.buf = bytearray()
        self.minalign = 1
        self._vt: dict[int, int] | None = None  # slot -> offset-from-end

    # ------------------------------------------------------------ low level
    def _prep(self, size: int, additional: int = 0) -> None:
        if size > self.minalign:
            self.minalign = size
        pad = (-(len(self.buf) + additional)) & (size - 1)
        if pad:
            self.buf[:0] = b"\x00" * pad

    def _prepend(self, fmt: str, size: int, value) -> None:
        self._prep(size)
        self.buf[:0] = struct.pack(fmt, value)

    def offset(self) -> int:
        return len(self.buf)

    # ------------------------------------------------------------- objects
    def create_string(self, s: str) -> int:
        data = s.encode("utf-8")
        self._prep(4, len(data) + 1)
        self.buf[:0] = data + b"\x00"
        self.buf[:0] = struct.pack("<I", len(data))
        return len(self.buf)

    def create_bytes(self, data: bytes) -> int:
        self._prep(4, len(data))
        self.buf[:0] = bytes(data)
        self.buf[:0] = struct.pack("<I", len(data))
        return len(self.buf)

    def create_scalar_vector(self, typ: str, values) -> int:
        fmt, size = _SCALAR[typ]
        payload = b"".join(struct.pack(fmt, v) for v in values)
        self._prep(4, len(payload))
        self._prep(size, len(payload))
        self.buf[:0] = payload
        self.buf[:0] = struct.pack("<I", len(values))
        return len(self.buf)

    def create_offset_vector(self, offsets) -> int:
        self._prep(4, 4 * len(offsets))
        for o in reversed(list(offsets)):
            # uoffset value = location of the field - target offset (both
            # measured from buffer end); location = len(buf) after prepend
            self.buf[:0] = struct.pack("<I", len(self.buf) + 4 - o)
        self.buf[:0] = struct.pack("<I", len(offsets))
        return len(self.buf)

    # -------------------------------------------------------------- tables
    def start_table(self) -> None:
        assert self._vt is None, "nested start_table"
        self._vt = {}
        self._obj_start = len(self.buf)

    def add_scalar(self, slot: int, typ: str, value, default=None) -> None:
        if value is None or value == default:
            return
        fmt, size = _SCALAR[typ]
        self._prepend(fmt, size, value)
        self._vt[slot] = len(self.buf)

    def add_offset(self, slot: int, off: int | None) -> None:
        if not off:
            return
        self._prep(4)
        self.buf[:0] = struct.pack("<I", len(self.buf) + 4 - off)
        self._vt[slot] = len(self.buf)

    def end_table(self) -> int:
        vt = self._vt
        self._vt = None
        # placeholder soffset -> table start
        self._prep(4)
        self.buf[:0] = b"\x00\x00\x00\x00"
        t = len(self.buf)
        n_slots = (max(vt) + 1) if vt else 0
        entries = [(t - vt[i]) if i in vt else 0 for i in range(n_slots)]
        vt_bytes = 4 + 2 * n_slots
        table_bytes = t - self._obj_start  # soffset word + fields + padding
        payload = struct.pack("<HH", vt_bytes, table_bytes) + b"".join(
            struct.pack("<H", e) for e in entries
        )
        self._prep(2, len(payload))
        self.buf[:0] = payload
        v = len(self.buf)
        # patch soffset at table start: stored = v - t (> 0; reader does
        # table_filepos - soffset = vtable_filepos)
        idx = len(self.buf) - t
        self.buf[idx : idx + 4] = struct.pack("<i", v - t)
        return t

    def finish(self, root: int, size_prefixed: bool = False) -> bytes:
        self._prep(self.minalign, 4 + (4 if size_prefixed else 0))
        self.buf[:0] = struct.pack("<I", len(self.buf) + 4 - root)
        if size_prefixed:
            self.buf[:0] = struct.pack("<I", len(self.buf))
        return bytes(self.buf)


# ------------------------------------------------------------------ reader

class Table:
    """Read-side cursor over a flatbuffer table at absolute position pos."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        soffset = struct.unpack_from("<i", data, pos)[0]
        self.vt = pos - soffset
        self.vt_size = struct.unpack_from("<H", data, self.vt)[0]

    def _field(self, slot: int) -> int:
        """Absolute position of field, or 0 if absent."""
        entry = 4 + 2 * slot
        if entry >= self.vt_size:
            return 0
        rel = struct.unpack_from("<H", self.d, self.vt + entry)[0]
        return self.pos + rel if rel else 0

    def scalar(self, slot: int, typ: str, default=None):
        p = self._field(slot)
        if not p:
            return default
        fmt, _ = _SCALAR[typ]
        return struct.unpack_from(fmt, self.d, p)[0]

    def _indirect(self, p: int) -> int:
        return p + struct.unpack_from("<I", self.d, p)[0]

    def string(self, slot: int) -> str | None:
        p = self._field(slot)
        if not p:
            return None
        sp = self._indirect(p)
        n = struct.unpack_from("<I", self.d, sp)[0]
        return self.d[sp + 4 : sp + 4 + n].decode("utf-8")

    def scalar_vector(self, slot: int, typ: str) -> list:
        p = self._field(slot)
        if not p:
            return []
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.d, vp)[0]
        fmt, size = _SCALAR[typ]
        return [struct.unpack_from(fmt, self.d, vp + 4 + i * size)[0] for i in range(n)]

    def bytes_vector(self, slot: int) -> bytes:
        p = self._field(slot)
        if not p:
            return b""
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.d, vp)[0]
        return bytes(self.d[vp + 4 : vp + 4 + n])

    def table(self, slot: int) -> "Table | None":
        p = self._field(slot)
        if not p:
            return None
        return Table(self.d, self._indirect(p))

    def table_vector(self, slot: int) -> list["Table"]:
        p = self._field(slot)
        if not p:
            return []
        vp = self._indirect(p)
        n = struct.unpack_from("<I", self.d, vp)[0]
        out = []
        for i in range(n):
            ep = vp + 4 + i * 4
            out.append(Table(self.d, ep + struct.unpack_from("<I", self.d, ep)[0]))
        return out


def root_table(data: bytes, size_prefixed: bool = False) -> Table:
    base = 4 if size_prefixed else 0
    return Table(data, base + struct.unpack_from("<I", data, base)[0])
