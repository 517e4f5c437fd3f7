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


# ------------------------------------------------------------------ Y4M

def test_y4m_layout_and_roundtrip_fidelity():
    from jpspark.codec import y4m
    from jpspark.codec.image import psnr

    # gentle-chroma frames: >= 40 dB (the input_hint lossy contract)
    frames = []
    for i in range(5):
        x = np.linspace(0, 64, 32)[None, :]
        yv = np.linspace(0, 64, 16)[:, None]
        f = np.stack(
            [100 + x + 0 * yv, 90 + yv + 0 * x, np.full((16, 32), 80.0 + (i * 10) % 64)],
            axis=-1,
        )
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    buf = y4m.encode_y4m(frames, fps=30)
    assert buf.startswith(b"YUV4MPEG2 W32 H16 F30:1")
    assert buf.count(b"FRAME\n") == 5
    # frame payload size: Y + 2 quarter chroma planes
    hdr = buf.index(b"\n") + 1
    assert len(buf) - hdr == 5 * (6 + 32 * 16 + 2 * 16 * 8)
    d = y4m.parse_y4m(buf)
    assert (d["w"], d["h"], d["fps"], len(d["frames"])) == (32, 16, 30, 5)
    assert all(psnr(a, b) >= 40 for a, b in zip(frames, d["frames"]))
    # steep full-range chroma: bounded degradation (4:2:0 inherent)
    xg = np.linspace(0, 255, 32)[None, :]
    yg = np.linspace(0, 255, 16)[:, None]
    steep = np.clip(
        np.stack([xg + 0 * yg, yg + 0 * xg, np.full((16, 32), 128.0)], axis=-1), 0, 255
    ).astype(np.uint8)
    d2 = y4m.parse_y4m(y4m.encode_y4m([steep]))
    assert 30 <= psnr(steep, d2["frames"][0]) < 40
    # gray (chroma-free) content round-trips near-exactly
    g = np.repeat(RNG.integers(0, 256, (16, 32, 1)), 3, axis=2).astype(np.uint8)
    d3 = y4m.parse_y4m(y4m.encode_y4m([g]))
    assert psnr(g, d3["frames"][0]) >= 45


def test_y4m_errors():
    from jpspark.codec import y4m

    with pytest.raises(ValueError):
        y4m.parse_y4m(b"RIFFxxxx")
    with pytest.raises(ValueError):
        y4m.encode_y4m([np.zeros((15, 32, 3), dtype=np.uint8)])  # odd height
    buf = y4m.encode_y4m([np.zeros((16, 32, 3), dtype=np.uint8)])
    with pytest.raises(ValueError):
        y4m.parse_y4m(buf[:-10])  # truncated frame


# ------------------------------------------------------------------ GIF

def test_gif_lossless_roundtrip_and_guard():
    from jpspark.codec import gif

    rng = np.random.default_rng(3)
    for shape, ncol in (((40, 60), 16), ((64, 64), 250), ((200, 300), 16),
                        ((8, 8), 2), ((301, 17), 7)):
        pal = rng.integers(0, 256, (ncol, 3)).astype(np.uint8)
        im = pal[rng.integers(0, ncol, shape)]
        assert (gif.parse_gif(gif.encode_gif(im)) == im).all(), (shape, ncol)
    with pytest.raises(ValueError):
        gif.encode_gif(rng.integers(0, 256, (64, 64, 3)).astype(np.uint8))
    with pytest.raises(ValueError):
        gif.parse_gif(b"NOTAGIF")


def test_gif_spec_layout_and_dispatch():
    from jpspark.codec import gif

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    im = pal[rng.integers(0, 4, (20, 30))]
    buf = img.encode(im, "gif")
    assert buf[:6] == b"GIF89a"
    assert buf[-1:] == b"\x3b"  # trailer
    import struct
    w, h = struct.unpack_from("<HH", buf, 6)
    assert (w, h) == (30, 20)
    assert img.sniff_format(buf) == "gif"
    assert (img.decode(buf, "gif") == im).all()
    # LZW earns its keep on palette content
    assert len(buf) < im.size


def test_mp3_probe_header_walk():
    """MPEG Layer III probe: frame chain walked by header arithmetic
    (ISO 11172-3 bitrate/samplerate tables), padding bit varies frame
    size, ID3v2 syncsafe prefix skipped, VBR splice detected, garbage
    raises rather than returning zeros."""
    import pytest

    from jpspark.codec import audio as au

    buf = au.encode_mp3_frames(100, 128, 44100, pad_every=3)
    p = au.probe_mp3(buf)
    assert p["n_frames"] == 100 and p["sample_rate"] == 44100 and not p["vbr"]
    assert abs(p["duration_sec"] - 100 * 1152 / 44100) < 1e-9
    # padding bit: every 3rd frame is 1 byte longer
    h0 = au.parse_mp3_frame_header(buf, 0)
    assert h0["frame_bytes"] == (1152 // 8) * 128000 // 44100
    # MPEG-2 (576 samples/frame) + ID3v2 prefix
    id3 = b"ID3" + bytes([4, 0, 0, 0, 0, 0, 10]) + bytes(10)
    p2 = au.probe_mp3(id3 + au.encode_mp3_frames(50, 64, 22050, version=2))
    assert p2["n_frames"] == 50 and abs(p2["duration_sec"] - 50 * 576 / 22050) < 1e-9
    # VBR splice
    p3 = au.probe_mp3(
        au.encode_mp3_frames(20, 64, 44100) + au.encode_mp3_frames(20, 128, 44100)
    )
    assert p3["n_frames"] == 40 and p3["vbr"]
    with pytest.raises(ValueError, match="no valid"):
        au.probe_mp3(b"\x00" * 4096)


def test_adts_probe_header_walk():
    """AAC/ADTS probe: frame_length chain with varying payloads, rdb
    sample multipliers, resync past junk, stop at sample-rate change."""
    from jpspark.codec import audio as au

    buf = au.encode_adts_frames(23, 32000, channels=1, profile=2, rdb=0)
    p = au.probe_adts(buf)
    assert (p["n_frames"], p["sample_rate"], p["channels"], p["profile"]) == (23, 32000, 1, 2)
    assert p["n_samples"] == 23 * 1024
    # rdb=3 -> 4 raw data blocks = 4096 samples/frame
    p2 = au.probe_adts(au.encode_adts_frames(5, 48000, rdb=3))
    assert p2["n_samples"] == 5 * 4096
    # resync over leading junk; trailing junk ignored after the chain
    p3 = au.probe_adts(b"\x12\x34" + au.encode_adts_frames(7, 44100) + b"\xff\x00junk")
    assert p3["n_frames"] == 7
    # sample-rate change = stream boundary
    p4 = au.probe_adts(
        au.encode_adts_frames(9, 48000) + au.encode_adts_frames(9, 24000)
    )
    assert p4["n_frames"] == 9 and p4["sample_rate"] == 48000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        au.probe_adts(b"\x00" * 512)


def test_ogg_opus_probe():
    """Ogg/Opus probe: granule-position duration minus pre-skip, packet
    counting across lacing continuations, CRC verification, EOS layout."""
    from jpspark.codec import audio as au

    buf = au.encode_ogg_opus(41, packet_samples=960, channels=2, pre_skip=312)
    p = au.probe_ogg_opus(buf)
    assert p["channels"] == 2 and p["pre_skip"] == 312
    assert p["n_packets"] == 41 + 2  # OpusHead + OpusTags + audio
    assert p["duration_sec"] == 41 * 960 / 48000
    # 20 ms frames at 1920 samples double the duration
    p2 = au.probe_ogg_opus(au.encode_ogg_opus(41, packet_samples=1920))
    assert p2["duration_sec"] == 2 * p["duration_sec"]
    import pytest as _pytest

    # flip one payload byte -> that page's CRC must catch it
    bad = bytearray(buf)
    bad[-1] ^= 0x01
    with _pytest.raises(ValueError, match="CRC"):
        au.probe_ogg_opus(bytes(bad))
    # truncated final page
    with _pytest.raises(ValueError, match="truncated"):
        au.probe_ogg_opus(buf[:-10])
    # non-Opus first page
    with _pytest.raises(ValueError, match="OpusHead"):
        au.probe_ogg_opus(au._ogg_page(b"xxxx", [4], 0, 1, 0, 2))
