"""AVI (RIFF) container codec — from scratch.

AVI is the same chunked RIFF layout as WAV (public spec): 'RIFF' size
'AVI ', a 'hdrl' LIST with the main header ('avih', 56 bytes: frame
interval µs, ..., total frames, streams, width, height) and a per-stream
'strl' LIST ('strh' with fccType='vids' + scale/rate, 'strf' =
BITMAPINFOHEADER), then a 'movi' LIST whose '00db'/'00dd' chunks carry the
frames. Supported pixel formats:

* biCompression=0 (BI_RGB): raw bottom-up DIB frames — BGR triples, rows
  padded to 4 bytes; pure struct+NumPy parsing.
* biCompression='MJPG' (round 3): Motion-JPEG — every frame chunk is a
  standalone baseline JPEG stream, decoded by the from-scratch ITU T.81
  codec (codec/jpeg.py). This is the first COMPRESSED video path that is
  real rather than stubbed.

Other compressions (H.264/VP9/...) genuinely need codec libraries absent
from this environment; ``parse_avi`` raises NotImplementedError for
those, and the operator level keeps its stub for them.
"""

from __future__ import annotations

import struct

import numpy as np

BI_RGB = 0
(FOURCC_MJPG,) = struct.unpack("<I", b"MJPG")


def _chunks(buf: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield cid, pos + 8, size
        pos += 8 + size + (size & 1)  # word alignment


def parse_avi(buf: bytes) -> dict:
    """Parse uncompressed AVI -> {width, height, fps, frames: [HxWx3 RGB]}."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    width = height = None
    scale = rate = None
    compression = None
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int):
        nonlocal width, height, scale, rate, compression
        for cid, p, size in _chunks(buf, pos, end):
            if cid == b"LIST":
                walk(p + 4, p + size)  # skip the 4-byte list type
            elif cid == b"avih":
                width, height = struct.unpack_from("<II", buf, p + 32)
            elif cid == b"strh":
                if buf[p : p + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", buf, p + 20)
            elif cid == b"strf":
                (compression,) = struct.unpack_from("<I", buf, p + 16)
            elif cid in (b"00db", b"00dd"):
                frames.append(buf[p : p + size])

    walk(12, len(buf))
    if width is None or not frames:
        raise ValueError("AVI missing avih header or frames")
    fps = (rate / scale) if (rate and scale) else None
    if compression == FOURCC_MJPG:
        from . import jpeg as _jpeg

        out = [_jpeg.decode_jpeg(raw) for raw in frames]
        return {"width": int(width), "height": int(height), "fps": fps, "frames": out}
    if compression not in (BI_RGB, None):
        raise NotImplementedError(
            f"compressed AVI (biCompression={compression}) needs a codec library "
            "(BI_RGB and MJPG decode for real)"
        )
    stride = (width * 3 + 3) & ~3  # DIB rows pad to 4 bytes
    out = []
    for raw in frames:
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * height).reshape(
            height, stride
        )[:, : width * 3]
        bgr = rows.reshape(height, width, 3)[::-1]  # bottom-up -> top-down
        out.append(bgr[:, :, ::-1].copy())  # BGR -> RGB
    return {"width": int(width), "height": int(height), "fps": fps, "frames": out}


def encode_avi(frames: list[np.ndarray], fps: int = 10, codec: str = "rgb") -> bytes:
    """Fixture writer: RGB uint8 frames (HxWx3, same shape) -> AVI bytes.
    ``codec='rgb'``: uncompressed DIB/BI_RGB (bottom-up, 4-byte row
    padding); ``codec='mjpg'``: Motion-JPEG, each frame a baseline JPEG
    from codec/jpeg.py."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    frame_bytes = []
    if codec == "mjpg":
        from . import jpeg as _jpeg

        frame_bytes = [_jpeg.encode_jpeg(np.asarray(f, dtype=np.uint8), 97) for f in frames]
        compression = FOURCC_MJPG
    elif codec == "rgb":
        for f in frames:
            bgr = np.asarray(f, dtype=np.uint8)[:, :, ::-1][::-1]  # RGB->BGR, flip
            padded = np.zeros((h, stride), dtype=np.uint8)
            padded[:, : w * 3] = bgr.reshape(h, w * 3)
            frame_bytes.append(padded.tobytes())
        compression = BI_RGB
    else:
        raise ValueError(f"unsupported codec {codec!r}")

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # µs per frame
        0, 0, 0,
        len(frames), 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps,
                                        0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression, stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", fb) for fb in frame_bytes))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
