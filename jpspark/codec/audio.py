"""RIFF/WAVE PCM codec — from scratch (struct + NumPy, no codec library).

WAV is a chunked RIFF container (public spec): 12-byte header
('RIFF' + size + 'WAVE'), then chunks of [4-byte id, uint32 LE size,
payload]. We parse the 'fmt ' chunk (audio format 1 = integer PCM,
channels, sample rate, bits per sample) and the 'data' chunk. Supported:
PCM 8/16/32-bit integer, any channel count. Compressed formats (format
tag != 1) raise — those genuinely need codec libraries absent from this
environment and stay stubbed at the operator level.

``encode_wav`` exists to build fixtures; tests assert spec'd byte
positions so the parser is validated against the format itself.
"""

from __future__ import annotations

import struct

import numpy as np

_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}
_FULLSCALE = {8: 128.0, 16: 32768.0, 32: 2147483648.0}


def parse_wav(buf: bytes) -> dict:
    """Parse WAV bytes -> {sample_rate, n_channels, bits, samples(float64
    (n, channels) in [-1, 1])}. Raises ValueError on non-RIFF input and
    NotImplementedError on compressed (non-PCM) streams."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_format, n_channels, sample_rate = struct.unpack_from("<HHI", payload, 0)
            (bits,) = struct.unpack_from("<H", payload, 14)
            fmt = (audio_format, n_channels, sample_rate, bits)
        elif cid == b"data":
            data = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt / data chunk")
    audio_format, n_channels, sample_rate, bits = fmt
    if audio_format != 1:
        raise NotImplementedError(
            f"compressed WAV (format tag {audio_format}) needs a codec library"
        )
    if bits not in _DTYPES:
        raise NotImplementedError(f"PCM bit depth {bits} not supported")
    raw = np.frombuffer(data, dtype=_DTYPES[bits])
    raw = raw[: (len(raw) // n_channels) * n_channels].reshape(-1, n_channels)
    if bits == 8:  # 8-bit WAV is unsigned, biased at 128
        samples = (raw.astype(np.float64) - 128.0) / _FULLSCALE[bits]
    else:
        samples = raw.astype(np.float64) / _FULLSCALE[bits]
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "samples": samples,
    }


def encode_wav(samples: np.ndarray, sample_rate: int = 16000, bits: int = 16) -> bytes:
    """Fixture writer: float samples in [-1, 1] (n,) or (n, channels) ->
    PCM WAV bytes."""
    s = np.asarray(samples, dtype=np.float64)
    if s.ndim == 1:
        s = s[:, None]
    n_channels = s.shape[1]
    if bits == 8:
        raw = np.clip(np.round(s * 128.0 + 128.0), 0, 255).astype(np.uint8)
    elif bits == 16:
        raw = np.clip(np.round(s * 32768.0), -32768, 32767).astype("<i2")
    elif bits == 32:
        raw = np.clip(np.round(s * 2147483648.0), -(2**31), 2**31 - 1).astype("<i4")
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    data = raw.tobytes()
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def rms(samples: np.ndarray) -> float:
    """Root-mean-square over all channels of normalized samples."""
    s = np.asarray(samples, dtype=np.float64)
    return float(np.sqrt(np.mean(s * s))) if s.size else 0.0
