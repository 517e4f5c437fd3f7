"""GIF89a codec from scratch (the public GIF specification, W3C/
CompuServe GIF89a): palette images with variable-width LZW compression.

Scope, honest about the format's nature: GIF is palette-indexed, so the
encoder accepts images with ≤ 256 distinct colors and is then LOSSLESS
(raises ValueError beyond — palette quantization of continuous-tone
imagery is a different, destructive operation this engine does not
pretend to do well); the decoder handles any single-image GIF87a/89a
stream this encoder produces plus interlace-free streams from other
writers (global color table, graphic control extensions skipped, LZW
with clear/EOI, sub-block framing).

LZW per the GIF variant: initial code width = palette bits + 1, codes
grow to 12 bits, CLEAR resets the dictionary, little-endian bit packing
inside 255-byte sub-blocks.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC89 = b"GIF89a"
MAGIC87 = b"GIF87a"


def encode_gif(px: np.ndarray) -> bytes:
    """Encode an RGB uint8 image with ≤256 distinct colors. Lossless."""
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    n = len(colors)
    if n > 256:
        raise ValueError(
            f"GIF is palette-indexed: {n} distinct colors > 256 "
            "(quantize the image first — this encoder is lossless-only)"
        )
    pal_bits = max(1, int(np.ceil(np.log2(max(n, 2)))))
    pal_size = 1 << pal_bits
    out = bytearray(MAGIC89)
    # logical screen descriptor: global color table, pal_bits depth
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    table = np.zeros((pal_size, 3), dtype=np.uint8)
    table[:n] = colors
    out += table.tobytes()
    # image descriptor (no local table, no interlace)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, pal_bits)
    out.append(min_code)
    out += _lzw_encode(idx.astype(np.int32), min_code)
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_encode(indices: np.ndarray, min_code: int) -> bytes:
    clear = 1 << min_code
    eoi = clear + 1
    next_code = eoi + 1
    width = min_code + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}

    bits = bytearray()
    acc = 0
    nacc = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nacc
        acc |= code << nacc  # GIF packs codes LSB-first
        nacc += width
        while nacc >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    cur = b""
    for i in indices:
        nxt = cur + bytes([int(i)])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4096:
            emit(clear)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code + 1
            cur = bytes([int(i)])  # restart from the current symbol
        else:
            cur = bytes([int(i)])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nacc:
        bits.append(acc & 0xFF)
    # sub-block framing
    for off in range(0, len(bits), 255):
        chunk = bits[off : off + 255]
        out.append(len(chunk))
        out += chunk
    return bytes(out)


def parse_gif(buf: bytes) -> np.ndarray:
    """Decode a single-image GIF -> RGB uint8 (h, w, 3)."""
    if buf[:6] not in (MAGIC89, MAGIC87):
        raise ValueError("not a GIF stream")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, size * 3, pos).reshape(size, 3)
        pos += size * 3
    while pos < len(buf):
        b = buf[pos]
        if b == 0x21:  # extension: skip sub-blocks
            pos += 2
            while buf[pos]:
                pos += 1 + buf[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor
            _, _, iw, ih, iflags = struct.unpack_from("<HHHHB", buf, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:
                size = 2 << (iflags & 0x07)
                table = np.frombuffer(buf, np.uint8, size * 3, pos).reshape(size, 3)
                pos += size * 3
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code = buf[pos]
            pos += 1
            data = bytearray()
            while buf[pos]:
                n = buf[pos]
                data += buf[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(bytes(data), min_code, iw * ih)
            return table[idx].reshape(ih, iw, 3).copy()
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    raise ValueError("GIF contains no image data")


def _lzw_decode(data: bytes, min_code: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nacc = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nacc < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nacc
            pos += 1
            nacc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nacc -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} out of range")
        out += entry
        prev = entry
        # the decoder's table trails the encoder's by one entry (it
        # appends only after seeing the NEXT code), so it must widen one
        # step early: at 2^width - 1, not 2^width
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
        if len(out) >= n_pixels:
            break
    if len(out) < n_pixels:
        raise ValueError("GIF pixel data incomplete")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)
