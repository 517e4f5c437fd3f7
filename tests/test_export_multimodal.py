"""Export sinks (S9), multimodal kernels, F8 code lists, A4 metrics."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jpspark import fixtures as fx
from jpspark.codec import image as img
from jpspark.ops import export, multimodal
from jpspark.ops.text import code_list_map_col, parse_code_list


@pytest.fixture(scope="module")
def small_images(spark):
    return spark.createDataFrame(fx.images(40))


def test_write_geoparquet_roundtrip(spark, tmp_path):
    polys = fx.admin_polygons(10)
    sdf = spark.createDataFrame(polys[["ogc_fid", "市区町村名", "geom"]])
    out = str(tmp_path / "gpq")
    export.write_geoparquet(sdf, out)
    sidecar = json.load(open(os.path.join(out, "_geo.json")))
    assert sidecar["primary_column"] == "geom"
    assert sidecar["columns"]["geom"]["crs"] == "EPSG:6668"
    back = spark.read.parquet(out)
    assert back.count() == 10
    assert bytes(back.filter(F.col("ogc_fid") == 1).first()["geom"]) == bytes(
        polys.iloc[0]["geom"]
    )


def test_geojson_features_valid(spark):
    polys = fx.admin_polygons(5)
    sdf = spark.createDataFrame(polys[["市区町村名", "全国地方公共団体コード", "geom"]])
    feats = export.to_geojson_features(sdf).toPandas()["feature"]
    assert len(feats) == 5
    for f in feats:
        obj = json.loads(f)
        assert obj["type"] == "Feature"
        assert obj["geometry"]["type"] == "MultiPolygon"
        ring = obj["geometry"]["coordinates"][0][0]
        assert ring[0] == ring[-1]  # closed
        assert "市区町村名" in obj["properties"]


def test_multimodal_decode_stats(spark, small_images):
    out = multimodal.decode_stats(small_images).toPandas()
    src = small_images.toPandas().set_index("image_id")
    assert len(out) == 40
    for _, r in out.iterrows():
        assert r["w"] == src.loc[r["image_id"], "w"]
        assert r["h"] == src.loc[r["image_id"], "h"]
        assert r["phash_check"] == src.loc[r["image_id"], "phash"]
        assert 0 <= r["mean_luma"] <= 255


def test_multimodal_resize(spark, small_images):
    out = multimodal.resize_images(small_images, 8, 8).toPandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    px = img.decode(bytes(out.iloc[0]["bytes"]), "raw")
    assert px.shape == (8, 8, 3)


def test_multimodal_features_shape_and_determinism(spark, small_images):
    a = multimodal.extract_features(small_images).toPandas().sort_values("image_id")
    b = multimodal.extract_features(small_images).toPandas().sort_values("image_id")
    assert all(len(v) == multimodal.FEATURE_DIM for v in a["embedding"])
    for va, vb in zip(a["embedding"], b["embedding"]):
        assert np.allclose(va, vb)


def test_audio_stub_fake_and_strict(spark):
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["a1"], "bytes": [b"\x01\x02" * 100]})
    )
    out = multimodal.decode_audio_stats(media).toPandas()
    assert out.iloc[0]["sample_rate"] == 16000
    assert out.iloc[0]["n_samples"] == 100
    with pytest.raises(Exception, match="NotImplementedError|audio decode"):
        multimodal.decode_audio_stats(media, strict=True).collect()


def test_wav_codec_spec_and_roundtrip():
    import struct

    from jpspark.codec import audio as aud

    t = np.arange(16000) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    buf = aud.encode_wav(sine, sample_rate=16000, bits=16)
    # spec'd byte positions: RIFF/WAVE magic, fmt tag PCM=1, rate, bits
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WAVE" and buf[12:16] == b"fmt "
    assert struct.unpack_from("<H", buf, 20)[0] == 1  # PCM
    assert struct.unpack_from("<I", buf, 24)[0] == 16000  # sample rate
    assert struct.unpack_from("<H", buf, 34)[0] == 16  # bits
    wav = aud.parse_wav(buf)
    assert wav["sample_rate"] == 16000 and wav["n_channels"] == 1
    assert len(wav["samples"]) == 16000
    # sine RMS = amplitude / sqrt(2), within 16-bit quantization
    assert abs(aud.rms(wav["samples"]) - 0.5 / np.sqrt(2)) < 1e-3
    # stereo + 8-bit round trips too
    st = np.stack([sine, -sine], axis=1)
    wav2 = aud.parse_wav(aud.encode_wav(st, 8000, bits=8))
    assert wav2["n_channels"] == 2 and wav2["sample_rate"] == 8000
    assert np.allclose(wav2["samples"], st, atol=1 / 128)


def test_audio_real_wav_decode_in_operator(spark):
    from jpspark.codec import audio as aud

    t = np.arange(8000) / 8000.0
    sine = 0.25 * np.sin(2 * np.pi * 220 * t)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["w1"], "bytes": [aud.encode_wav(sine, 8000)]})
    )
    # WAV decodes for REAL in both modes (strict included)
    for strict in (False, True):
        out = multimodal.decode_audio_stats(media, strict=strict).toPandas()
        assert out.iloc[0]["sample_rate"] == 8000
        assert out.iloc[0]["n_samples"] == 8000
        assert abs(out.iloc[0]["rms"] - 0.25 / np.sqrt(2)) < 1e-3


def test_avi_codec_spec_and_roundtrip():
    import struct

    from jpspark.codec import video as vid

    frames = [fx.pixel_pattern(i, 18, 12) for i in range(7)]  # w=18: row padding hits
    buf = vid.encode_avi(frames, fps=5)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    assert b"avih" in buf[:64] and b"movi" in buf
    out = vid.parse_avi(buf)
    assert out["width"] == 18 and out["height"] == 12 and out["fps"] == 5.0
    assert len(out["frames"]) == 7
    for got, orig in zip(out["frames"], frames):
        assert np.array_equal(got, orig)  # pixel-exact through BGR/flip/padding
    # compressed AVI must refuse loudly, not return garbage
    bad = bytearray(buf)
    strf_at = buf.index(b"strf")
    struct.pack_into("<I", bad, strf_at + 8 + 16, 0x34363248)  # 'H264' — MJPG is real since r3
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="compressed AVI"):
        vid.parse_avi(bytes(bad))


def test_video_real_avi_demux_in_operator(spark):
    from jpspark.codec import video as vid

    frames = [fx.pixel_pattern(i, 16, 16) for i in range(25)]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["v2"], "bytes": [vid.encode_avi(frames, fps=10)]})
    )
    for strict in (False, True):  # AVI demuxes for real in both modes
        out = multimodal.sample_video_frames(media, every_n=10, strict=strict).toPandas()
        assert list(out["frame_idx"]) == [0, 10, 20]
        px = img.decode(bytes(out.iloc[1]["bytes"]), "raw")
        assert np.array_equal(px, fx.pixel_pattern(10, 16, 16))


def test_video_frame_sampling_fake_container(spark):
    frames = [img.encode(fx.pixel_pattern(i, 16, 16), "raw") for i in range(25)]
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": ["v1"], "bytes": [b"".join(frames)]})
    )
    out = multimodal.sample_video_frames(media, every_n=10).toPandas()
    assert list(out["frame_idx"]) == [0, 10, 20]
    px = img.decode(bytes(out.iloc[1]["bytes"]), "raw")
    assert np.array_equal(px, fx.pixel_pattern(10, 16, 16))


def test_parse_code_list_f8():
    got = parse_code_list(["1:市役所", " 2 : 町村役場 ", "", "nocolon", "1:上書き"])
    assert got == {"1": "上書き", "2": "町村役場"}


def test_code_list_map_col_f8(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"entries": [["1:市役所", "2:役場", "3:a:b", " ", "x"]]})
    )
    out = df.select(code_list_map_col(F.col("entries")).alias("m")).first()["m"]
    assert out == {"1": "市役所", "2": "役場", "3": "a:b"}


def test_observe_metrics_a4(spark):
    from jpspark.manifest import observe_metrics

    df, obs = observe_metrics(spark.range(123))
    df.collect()
    assert obs.get["rows"] == 123


def test_flatgeobuf_sink_feature_budget(spark, tmp_path):
    """Round-3 VERDICT item: the single-file FGB export is driver-side by
    design; a frame over max_features must raise BEFORE toPandas()."""
    from jpspark.geom import wkb as wkb_mod
    from jpspark.ops import export as ex

    g = wkb_mod.encode_multipolygon(
        [[np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])]]
    )
    pdf = pd.DataFrame({"fid": range(50), "geom": [g] * 50})
    sdf = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="exceed max_features"):
        ex.write_flatgeobuf(sdf, str(tmp_path / "t.fgb"), max_features=10)
    out = ex.write_flatgeobuf(sdf, str(tmp_path / "t.fgb"), max_features=50)
    assert out["features_count"] == 50


def test_flac_in_audio_operator(spark):
    from jpspark.codec import flac
    from jpspark.ops import multimodal as mm

    rate = 12000
    t = np.arange(rate) / rate
    pcm = np.clip(np.rint(0.25 * np.sin(2 * np.pi * 440 * t) * 32767), -32768, 32767).astype(np.int16)
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": ["f0"], "bytes": [flac.encode_flac(pcm, rate)]})
    )
    row = mm.decode_audio_stats(df, strict=True).collect()[0]
    assert row.sample_rate == rate and row.n_samples == rate
    assert abs(row.rms - 0.25 / np.sqrt(2)) < 1e-3


def test_channel_sums_hand_golden(spark):
    """channel_sums on a 2x2 raw image with known pixels, plus the
    resize composition: 8x8 upscale of a constant image keeps per-pixel
    values, so thumb sums are 64x the constant."""
    import numpy as np
    import pandas as pd

    from jpspark.codec import image as img
    from jpspark.ops import multimodal as mm

    px = np.array(
        [[[10, 20, 30], [40, 50, 60]], [[70, 80, 90], [100, 110, 120]]],
        dtype=np.uint8,
    )
    const = np.full((4, 4, 3), [5, 6, 7], dtype=np.uint8)
    sdf = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["a", "b"],
                "bytes": [img.encode(px, "raw"), img.encode(const, "raw")],
                "fmt": ["raw", "raw"],
            }
        )
    )
    out = {r.image_id: r for r in mm.channel_sums(sdf).collect()}
    assert out["a"].n_px == 4
    assert (out["a"].r_sum, out["a"].g_sum, out["a"].b_sum) == (220, 260, 300)
    thumb = {r.image_id: r for r in mm.channel_sums(mm.resize_images(sdf, 8, 8, "raw")).collect()}
    assert (thumb["b"].r_sum, thumb["b"].g_sum, thumb["b"].b_sum) == (
        64 * 5, 64 * 6, 64 * 7,
    )
    assert thumb["b"].n_px == 64


def test_augment_images_sums_and_dims(spark):
    """Flip/rot90 are pixel permutations (channel sums invariant, dims
    swap for rot90); the center crop's sums replay from the pattern."""
    import numpy as np

    from jpspark import fixtures as fx
    from jpspark.ops import multimodal as mm

    pdf = fx.images(12)[["image_id", "bytes", "fmt", "w", "h"]]
    sdf = spark.createDataFrame(pdf[["image_id", "bytes", "fmt"]])
    base = {r.image_id: r for r in mm.channel_sums(sdf).collect()}
    rows = mm.augment_images(sdf).collect()
    assert len(rows) == 3 * len(pdf)
    meta = pdf.set_index("image_id")
    for r in rows:
        b = base[r.image_id]
        w0, h0 = int(meta.loc[r.image_id, "w"]), int(meta.loc[r.image_id, "h"])
        if r.op == "hflip":
            assert (r.r_sum, r.g_sum, r.b_sum) == (b.r_sum, b.g_sum, b.b_sum)
            assert (r.w, r.h) == (w0, h0)
        elif r.op == "rot90":
            assert (r.r_sum, r.g_sum, r.b_sum) == (b.r_sum, b.g_sum, b.b_sum)
            assert (r.w, r.h) == (h0, w0)
        else:
            assert r.op == "center_crop"
            assert (r.w, r.h) == (max(w0 // 2, 1), max(h0 // 2, 1))
            assert 0 < r.r_sum < b.r_sum
    # crop sums replay exactly from the deterministic pattern (lossless row)
    ll = pdf[pdf.fmt != "qlossy"].iloc[0]
    px = fx.pixel_pattern(int(ll.image_id[3:]), int(ll.w), int(ll.h))
    ch, cw = int(ll.h) // 2, int(ll.w) // 2
    oy, ox = (int(ll.h) - ch) // 2, (int(ll.w) - cw) // 2
    exp = px[oy : oy + ch, ox : ox + cw].astype(np.int64).reshape(-1, 3).sum(axis=0)
    got = [r for r in rows if r.image_id == ll.image_id and r.op == "center_crop"][0]
    assert (got.r_sum, got.g_sum, got.b_sum) == tuple(int(v) for v in exp)


def test_augment_images_bytes_roundtrip(spark):
    """The emitted raw bytes decode back to the augmented pixels."""
    import numpy as np

    from jpspark import fixtures as fx
    from jpspark.codec import image as img
    from jpspark.ops import multimodal as mm

    pdf = fx.images(4)[["image_id", "bytes", "fmt", "w", "h"]]
    sdf = spark.createDataFrame(pdf[["image_id", "bytes", "fmt"]])
    rows = {(r.image_id, r.op): r for r in mm.augment_images(sdf, ops=("vflip",)).collect()}
    for _, src in pdf.iterrows():
        px = img.decode(bytes(src["bytes"]), src["fmt"])
        r = rows[(src["image_id"], "vflip")]
        back = img.decode(bytes(r.bytes), "raw")
        assert back.shape == (int(src["h"]), int(src["w"]), 3)
        assert np.array_equal(back, px[::-1])


def test_augment_images_rejects_bad_args(spark):
    import pytest

    from jpspark import fixtures as fx
    from jpspark.ops import multimodal as mm

    sdf = spark.createDataFrame(fx.images(2)[["image_id", "bytes", "fmt"]])
    with pytest.raises(ValueError, match="unknown op"):
        mm.augment_images(sdf, ops=("sepia",))
    with pytest.raises(ValueError, match="crop_frac"):
        mm.augment_images(sdf, crop_frac=2.0)
