"""Codec + pHash + fixture-invariant tests (no Spark)."""

from __future__ import annotations

import numpy as np
import pytest

from jpspark.codec import image as img
from jpspark.codec.phash import hamming64, phash64
from jpspark.fixtures import images, pixel_pattern

RNG = np.random.default_rng(42)


@pytest.mark.parametrize("fmt", img.LOSSLESS)
def test_lossless_roundtrip(fmt):
    px = RNG.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    buf = img.encode(px, fmt)
    assert np.array_equal(img.decode(buf, fmt), px)
    assert img.sniff_format(buf) == fmt


def test_qlossy_psnr_above_gate():
    px = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    buf = img.encode(px, "qlossy")
    out = img.decode(buf, "qlossy")
    assert img.sniff_format(buf) == "qlossy"
    assert np.max(np.abs(out.astype(int) - px.astype(int))) <= 3
    assert img.psnr(px, out) >= 40.0


def test_psnr_identical_inf():
    px = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    assert img.psnr(px, px) == float("inf")


def test_png_is_real_png():
    # verifiable header structure: signature + IHDR first chunk
    px = RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = img.encode(px, "png")
    assert buf[:8] == b"\x89PNG\r\n\x1a\n"
    assert buf[12:16] == b"IHDR"
    assert buf[-8:-4] == b"IEND"


def test_phash_deterministic_and_robust():
    px = pixel_pattern(7, 64, 64)
    h1 = phash64(px)
    assert h1 == phash64(px.copy())
    # lossy re-encode should barely move the hash
    h2 = phash64(img.decode(img.encode(px, "qlossy"), "qlossy"))
    assert int(hamming64(np.array([h1]), np.array([h2]))[0]) <= 4
    # a very different image should be far
    other = pixel_pattern(9000, 64, 64)[:, ::-1][::-1]
    far = phash64(np.ascontiguousarray(255 - other))
    assert int(hamming64(np.array([h1]), np.array([far]))[0]) >= 10


def test_hamming64():
    a = np.array([0, -1, 0x0F], dtype=np.int64)
    b = np.array([0, 0, 0x00], dtype=np.int64)
    assert list(hamming64(a, b)) == [0, 64, 4]


def test_images_fixture_per_row_invariants():
    """The BASELINE.json input_hint gate: decoded pixels allclose
    (PSNR>=40dB for lossy), phash self-consistent, caption well-formed."""
    df = images(60)
    assert list(df.columns) == [
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        "mesh_code", "lon", "lat",
    ]
    for _, row in df.iterrows():
        decoded = img.decode(row["bytes"], row["fmt"])
        assert decoded.shape == (row["h"], row["w"], 3)
        i = int(row["image_id"][3:])
        original = pixel_pattern(i, row["w"], row["h"])
        if row["fmt"] in img.LOSSLESS:
            assert np.array_equal(decoded, original)
        else:
            assert img.psnr(original, decoded) >= 40.0
        assert int(phash64(decoded)) == row["phash"]
        assert f"＃{i}" in row["caption"]


def test_images_fixture_deterministic():
    a = images(25)
    b = images(25)
    assert a["bytes"].equals(b["bytes"])
    assert a["caption"].equals(b["caption"])
    assert np.allclose(a["lon"], b["lon"])


# ------------------------------------------------------------------ FLAC

def test_flac_lossless_roundtrip_cases():
    from jpspark.codec import flac

    rng = np.random.default_rng(0)
    cases = {
        "sine": (0.4 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000) * 32767).astype(np.int16),
        "noise": rng.integers(-3000, 3000, 10000).astype(np.int16),
        "ramp": (np.arange(5000) % 20000 - 10000).astype(np.int16),
        "const": np.full(4096, -123, dtype=np.int16),
        "extremes": np.array([32767, -32768, 0, 1, -1] * 2000, dtype=np.int16),
        "short": np.array([5, -7, 9], dtype=np.int16),
        "stereo": np.column_stack(
            [
                (0.3 * np.sin(2 * np.pi * 200 * np.arange(9000) / 8000) * 32767).astype(np.int16),
                rng.integers(-500, 500, 9000).astype(np.int16),
            ]
        ),
    }
    for name, s in cases.items():
        buf = flac.encode_flac(s, 8000)
        d = flac.parse_flac(buf)
        exp = s if s.ndim == 2 else s[:, None]
        assert (d["samples_int"] == exp).all(), name
        assert d["sample_rate"] == 8000 and d["bits"] == 16


def test_flac_spec_layout_and_compression():
    from jpspark.codec import flac

    sig = (np.arange(6000) % 4000 - 2000).astype(np.int16)  # near-linear: tiny file
    buf = flac.encode_flac(sig, 44100)
    assert buf[:4] == b"fLaC"
    # STREAMINFO: last-metadata flag + type 0, length 34
    assert buf[4] == 0x80 and int.from_bytes(buf[5:8], "big") == 34
    # first frame starts with the 14-bit sync (0xFF, 0b111110xx)
    frame0 = 8 + 34
    assert buf[frame0] == 0xFF and (buf[frame0 + 1] & 0xFC) == 0xF8
    # fixed-predictor residuals collapse a near-linear signal
    assert len(buf) < len(sig) * 2 / 4
    # sample rate from STREAMINFO round-trips
    assert flac.parse_flac(buf)["sample_rate"] == 44100


def test_flac_crc_detects_corruption():
    from jpspark.codec import flac

    sig = (np.sin(np.arange(5000)) * 10000).astype(np.int16)
    buf = bytearray(flac.encode_flac(sig, 16000))
    buf[len(buf) // 2] ^= 0x10
    with pytest.raises(ValueError):
        flac.parse_flac(bytes(buf))
