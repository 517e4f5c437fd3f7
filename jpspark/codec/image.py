"""Image codecs — pure NumPy + stdlib zlib, no PIL (absent in this image).

The payload table (BASELINE.json input_hint) carries image bytes in a
``binary`` column with a ``fmt`` discriminator. Four formats:

  raw    — b"RAW1" + w:u16 + h:u16 + RGB uint8 pixels (lossless)
  ppm    — binary P6 PPM (lossless, standard)
  png    — real minimal PNG: 8-bit RGB, filter 0 rows, one zlib IDAT
           (lossless; decodable by any PNG reader)
  qlossy — b"QLS1" + w:u16 + h:u16 + zlib(6-bit-quantized RGB);
           our stand-in lossy codec. Quantization to the bucket midpoint
           gives |err| <= 2 per channel → PSNR ≈ 47 dB > the 40 dB gate.

Per-row fidelity invariants (decoded-pixel allclose / PSNR >= 40 dB for
lossy, caption equality) are enforced by ops/validate + tests.

All encoders/decoders take/return HxWx3 uint8 arrays and are called from
Arrow-batched pandas UDFs (one Python call per row on binary payloads is
unavoidable; the arithmetic inside is vectorized NumPy).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

FORMATS = ("raw", "ppm", "png", "qlossy")
LOSSLESS = ("raw", "ppm", "png")

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_raw(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"RAW1" + struct.pack("<HH", w, h) + px.astype(np.uint8).tobytes()


def decode_raw(buf: bytes) -> np.ndarray:
    if buf[:4] != b"RAW1":
        raise ValueError("bad RAW1 magic")
    w, h = struct.unpack_from("<HH", buf, 4)
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=8).reshape(h, w, 3)


def encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return f"P6\n{w} {h}\n255\n".encode() + px.astype(np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    if buf[:2] != b"P6":
        raise ValueError("bad P6 magic")
    # header: three whitespace-separated tokens after P6 (no comments in our
    # fixtures), then a single whitespace byte, then binary pixels
    idx, tokens = 2, []
    while len(tokens) < 3:
        while buf[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while not buf[idx : idx + 1].isspace():
            idx += 1
        tokens.append(int(buf[start:idx]))
    idx += 1  # single whitespace separating header and raster
    w, h, _maxval = tokens
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=idx).reshape(h, w, 3)


def encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit, color type 2 (RGB)
    raster = px.astype(np.uint8)
    rows = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 1:] = raster.reshape(h, w * 3)  # filter byte 0 per row
    idat = zlib.compress(rows.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode_png(buf: bytes) -> np.ndarray:
    if buf[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    off = 8
    w = h = None
    idat = b""
    while off < len(buf):
        (length,) = struct.unpack_from(">I", buf, off)
        tag = buf[off + 4 : off + 8]
        data = buf[off + 8 : off + 8 + length]
        off += 12 + length
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack_from(">IIBB", data, 0)
            if bits != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
    rows = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    out = np.empty((h, w * 3), dtype=np.uint8)
    prev = np.zeros(w * 3, dtype=np.uint8)
    for r in range(h):
        ftype, line = rows[r, 0], rows[r, 1:]
        if ftype == 0:
            out[r] = line
        elif ftype == 2:  # Up filter (we never emit it, but cheap to support)
            out[r] = (line.astype(np.int16) + prev).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {ftype}")
        prev = out[r]
    return out.reshape(h, w, 3)


_Q_SHIFT = 2  # 6 significant bits; bucket midpoint offset 2


def encode_qlossy(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = (px.astype(np.uint8) >> _Q_SHIFT).astype(np.uint8)
    return b"QLS1" + struct.pack("<HH", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qlossy(buf: bytes) -> np.ndarray:
    if buf[:4] != b"QLS1":
        raise ValueError("bad QLS1 magic")
    w, h = struct.unpack_from("<HH", buf, 4)
    q = np.frombuffer(zlib.decompress(buf[8:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q.astype(np.uint16) << _Q_SHIFT) | 2).astype(np.uint8)


def encode_jpeg(px: np.ndarray) -> bytes:
    """Baseline ITU T.81 JPEG (codec/jpeg.py), quality pinned at 97 so the
    input_hint's PSNR>=40dB lossy contract holds with margin even on the
    noisiest fixture patterns (measured min 42 dB)."""
    from . import jpeg as _jpeg

    return _jpeg.encode_jpeg(px, quality=97)


def decode_jpeg(buf: bytes) -> np.ndarray:
    from . import jpeg as _jpeg

    return _jpeg.decode_jpeg(buf)


def encode_gif(px: np.ndarray) -> bytes:
    """GIF89a with LZW (codec/gif.py) — lossless for palette images
    (<=256 distinct colors; raises beyond, see gif.py)."""
    from . import gif as _gif

    return _gif.encode_gif(px)


def decode_gif(buf: bytes) -> np.ndarray:
    from . import gif as _gif

    return _gif.parse_gif(buf)


_ENC = {"raw": encode_raw, "ppm": encode_ppm, "png": encode_png, "qlossy": encode_qlossy,
        "jpeg": encode_jpeg, "gif": encode_gif}
_DEC = {"raw": decode_raw, "ppm": decode_ppm, "png": decode_png, "qlossy": decode_qlossy,
        "jpeg": decode_jpeg, "gif": decode_gif}


def encode(px: np.ndarray, fmt: str) -> bytes:
    return _ENC[fmt](px)


def decode(buf: bytes, fmt: str) -> np.ndarray:
    return _DEC[fmt](bytes(buf))


def sniff_format(buf: bytes) -> str:
    """Format detection from magic bytes — the codec analog of the
    reference's encoding try-chain (/root/reference/src/loader/gdal.rs:326-408):
    a deterministic first-match-wins probe order."""
    head = bytes(buf[:8])
    if head.startswith(b"RAW1"):
        return "raw"
    if head.startswith(b"P6"):
        return "ppm"
    if head.startswith(_PNG_SIG):
        return "png"
    if head.startswith(b"QLS1"):
        return "qlossy"
    if head.startswith(b"\xff\xd8"):
        return "jpeg"
    if head.startswith(b"GIF8"):
        return "gif"
    raise ValueError("unknown image format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (identical arrays -> inf)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def gray_f64(px: np.ndarray) -> np.ndarray:
    """ITU-R BT.601 luma, float64 HxW."""
    return px[..., 0] * 0.299 + px[..., 1] * 0.587 + px[..., 2] * 0.114


def resize_area_mean(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean resample via an integral image. Each output cell averages
    the input block [y0,y1)x[x0,x1); blocks are forced non-empty (min one
    pixel) so upscaling degrades to nearest-neighbor instead of NaN."""
    h, w = px.shape[:2]
    a = px.astype(np.float64)
    if a.ndim == 2:
        a = a[..., None]
    integ = np.zeros((h + 1, w + 1, a.shape[2]), dtype=np.float64)
    np.cumsum(np.cumsum(a, axis=0), axis=1, out=integ[1:, 1:])
    y0 = (np.arange(out_h) * h) // out_h
    y1 = np.maximum(((np.arange(out_h) + 1) * h) // out_h, y0 + 1)
    x0 = (np.arange(out_w) * w) // out_w
    x1 = np.maximum(((np.arange(out_w) + 1) * w) // out_w, x0 + 1)
    s = (
        integ[y1[:, None], x1[None, :]]
        - integ[y0[:, None], x1[None, :]]
        - integ[y1[:, None], x0[None, :]]
        + integ[y0[:, None], x0[None, :]]
    )
    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :]).astype(np.float64)
    out = s / area[..., None]
    return out[..., 0] if px.ndim == 2 else out
