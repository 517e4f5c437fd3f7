"""Multimodal column operators over opaque binary payloads.

Images are fully real (our own codecs); audio/video decode is STUBBED
behind deterministic fakes / NotImplementedError — the codec libraries are
absent in this environment — but the Spark-side plumbing (schemas,
batching, UDF signatures, partitioning) is real and tested, so swapping a
real decoder in is a one-function change.

All kernels are ``mapInPandas`` over Arrow batches; the session caps
``maxRecordsPerBatch`` so fat binary rows bound executor memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codec import image as img
from ..codec.phash import phash64

FEATURE_DIM = 48  # 16-bin luma histogram + 16 row means + 16 col means


def decode_stats(images: DataFrame) -> DataFrame:
    """Decode each image and emit shape/stats columns — the validation
    scan of the payload table (real decode, no stubs)."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("mean_luma", T.DoubleType()),
            T.StructField("phash_check", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over numpy object arrays: no per-row pandas Series
            # construction (iterrows costs more than the decode for small
            # images)
            for iid, buf, fmt in zip(
                pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()
            ):
                px = img.decode(bytes(buf), fmt)
                g = img.gray_f64(px)  # one luma pass feeds mean AND pHash
                rows.append(
                    (iid, px.shape[1], px.shape[0], fmt,
                     float(g.mean()), int(phash64(px, gray=g)))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema)


def channel_sums(images: DataFrame) -> DataFrame:
    """Exact integer per-channel pixel sums per image — the
    order-independent form of channel statistics (means/histogram
    normalizers derive as sum/n_px downstream, so no float accumulation
    order can ever diverge between engines or partitionings). One decode
    per image, one int64 reduction per channel, all inside the Arrow
    batch; output rows are 5 fixed-width columns, so the exchange weight
    is ~40 B/image regardless of image size."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("n_px", T.LongType()),
            T.StructField("r_sum", T.LongType()),
            T.StructField("g_sum", T.LongType()),
            T.StructField("b_sum", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, buf, fmt in zip(
                pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()
            ):
                px = img.decode(bytes(buf), fmt).astype(np.int64)
                s = px.reshape(-1, px.shape[-1]).sum(axis=0)
                rows.append(
                    (iid, px.shape[0] * px.shape[1], int(s[0]), int(s[1]), int(s[2]))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema)


def resize_images(images: DataFrame, out_w: int, out_h: int, out_fmt: str = "raw") -> DataFrame:
    """Distributed image resize (area-mean, real): re-encodes to out_fmt."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, buf, fmt in zip(
                pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()
            ):
                px = img.decode(bytes(buf), fmt)
                small = np.clip(
                    np.round(img.resize_area_mean(px, out_h, out_w)), 0, 255
                ).astype(np.uint8)
                rows.append((iid, img.encode(small, out_fmt), out_w, out_h, out_fmt))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema)


def extract_features(images: DataFrame) -> DataFrame:
    """Real feature extraction: 48-dim embedding (luma histogram + row/col
    profiles) as array<float> — feeds the similarity/ANN operators."""
    schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for iid, buf, fmt in zip(
                pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()
            ):
                g = img.gray_f64(img.decode(bytes(buf), fmt))
                hist, _ = np.histogram(g, bins=16, range=(0, 256))
                hist = hist / max(g.size, 1)
                rows_p = img.resize_area_mean(g, 16, 1).ravel() / 255.0
                cols_p = img.resize_area_mean(g, 1, 16).ravel() / 255.0
                ids.append(iid)
                vecs.append(np.concatenate([hist, rows_p, cols_p]).astype(np.float32).tolist())
            yield pd.DataFrame({"image_id": ids, "embedding": vecs})

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema)


_AUG_OPS = ("hflip", "vflip", "rot90", "center_crop")


def augment_images(
    images: DataFrame, ops: tuple = ("hflip", "rot90", "center_crop"), crop_frac: float = 0.5
) -> DataFrame:
    """Training-data image augmentation: per input image emit one row per
    requested op — horizontal/vertical mirror, 90-degree CCW rotation,
    center crop (``crop_frac`` of each side, floor'd offsets) — with the
    augmented pixels re-encoded raw plus exact int64 per-channel sums so
    parity is checkable without shipping pixels. Flip/rot90 are pixel
    permutations (sums invariant); the crop's sums are a closed-form
    sub-rectangle reduction — both replayable by an oracle straight from
    the deterministic pixel pattern.

    Scale shape: embarrassingly parallel map over the payload table — no
    shuffle, blobs never ride an exchange; one decode serves all ops for
    the row. Every op is a whole-array numpy view/slice (no per-pixel
    Python)."""
    for o in ops:
        if o not in _AUG_OPS:
            raise ValueError(f"augment_images: unknown op {o!r}; known: {_AUG_OPS}")
    if not 0.0 < crop_frac <= 1.0:
        raise ValueError(
            f"augment_images: crop_frac must be in (0, 1], got {crop_frac}"
        )
    schema = (
        "image_id string, op string, bytes binary, w int, h int, fmt string,"
        " r_sum long, g_sum long, b_sum long"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for iid, buf, fmt in zip(
                pdf["image_id"].to_numpy(), pdf["bytes"].to_numpy(), pdf["fmt"].to_numpy()
            ):
                px = img.decode(bytes(buf), fmt)
                for op in ops:
                    if op == "hflip":
                        out = px[:, ::-1]
                    elif op == "vflip":
                        out = px[::-1]
                    elif op == "rot90":
                        out = np.rot90(px)
                    else:  # center_crop
                        ch = max(int(px.shape[0] * crop_frac), 1)
                        cw = max(int(px.shape[1] * crop_frac), 1)
                        oy = (px.shape[0] - ch) // 2
                        ox = (px.shape[1] - cw) // 2
                        out = px[oy : oy + ch, ox : ox + cw]
                    out = np.ascontiguousarray(out)
                    s = out.astype(np.int64).reshape(-1, out.shape[-1]).sum(axis=0)
                    rows.append(
                        (
                            iid,
                            op,
                            img.encode(out, "raw"),
                            out.shape[1],
                            out.shape[0],
                            "raw",
                            int(s[0]),
                            int(s[1]),
                            int(s[2]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "op", "bytes", "w", "h", "fmt",
                    "r_sum", "g_sum", "b_sum",
                ],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema)


# ------------------------------------------------------------ audio / video

AUDIO_SCHEMA = "media_id string, sample_rate int, n_samples long, rms double"
VIDEO_FRAME_SCHEMA = "media_id string, frame_idx int, bytes binary, w int, h int, fmt string"


def decode_audio_stats(media: DataFrame, strict: bool = False) -> DataFrame:
    """Audio decode: REAL for RIFF/WAVE integer PCM, IMA-ADPCM (round 3,
    pure integer math vectorized across blocks) and FLAC (late round 3,
    codec/flac.py — fixed predictors + Rice coding off RFC 9639, CRC
    verified, lossless). Remaining compressed codecs (mp3/aac/opus/...)
    genuinely require libraries absent from this environment and stay
    STUBBED: strict mode raises NotImplementedError for unknown bytes,
    otherwise a deterministic fake (rate 16 kHz, n_samples = len//2, rms
    from a byte checksum) keeps the downstream plumbing exercisable
    end-to-end."""
    from ..codec import audio as aud
    from ..codec import flac as flc

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"].to_numpy(), pdf["bytes"].to_numpy()):
                b = bytes(buf)
                if b[:4] == b"RIFF":
                    wav = aud.parse_wav(b)  # real decode path
                    rows.append(
                        (mid, wav["sample_rate"], len(wav["samples"]), aud.rms(wav["samples"]))
                    )
                elif b[:4] == flc.MAGIC:
                    fl = flc.parse_flac(b)  # real decode path (lossless)
                    rows.append(
                        (mid, fl["sample_rate"], len(fl["samples"]), aud.rms(fl["samples"]))
                    )
                elif strict:
                    raise NotImplementedError(
                        "audio decode for this container requires a codec library "
                        "not present in this environment; WAV/PCM, IMA-ADPCM and "
                        "FLAC decode for real"
                    )
                else:
                    rows.append(
                        (mid, 16000, len(b) // 2, float((sum(b[:1024]) % 1000) / 1000.0))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "sample_rate", "n_samples", "rms"])

    return media.select("media_id", "bytes").mapInPandas(kernel, AUDIO_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 10, strict: bool = False) -> DataFrame:
    """Video frame sampling: REAL for RIFF/AVI with BI_RGB (uncompressed
    DIB) and — round 3 — MJPG frames (each a baseline JPEG, decoded by the
    from-scratch T.81 codec) AND — late round 3 — YUV4MPEG2 (.y4m,
    codec/y4m.py: BT.601 limited-range + 4:2:0 planar, the rawvideo
    interchange format); sampled frames re-encode as our 'raw' image
    format so the whole image pipeline (decode/resize/features/pHash)
    composes downstream. Remaining compressed codecs (H.264/VP9/...) stay
    STUBBED: strict mode raises for unknown bytes, otherwise the
    deterministic RAW1 fake container keeps the plumbing exercisable."""
    from ..codec import video as vid
    from ..codec import y4m as y4m_codec

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"].to_numpy(), pdf["bytes"].to_numpy()):
                b = bytes(buf)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    avi = vid.parse_avi(b)  # real demux path
                    for idx, frame in enumerate(avi["frames"]):
                        if idx % every_n == 0:
                            rows.append(
                                (mid, idx, img.encode(frame, "raw"),
                                 avi["width"], avi["height"], "raw")
                            )
                    continue
                if b[:9] == y4m_codec.MAGIC:
                    d = y4m_codec.parse_y4m(b)  # real decode path
                    for idx, frame in enumerate(d["frames"]):
                        if idx % every_n == 0:
                            rows.append(
                                (mid, idx, img.encode(frame, "raw"), d["w"], d["h"], "raw")
                            )
                    continue
                if strict:
                    raise NotImplementedError(
                        "compressed video decode requires a codec library not "
                        "present in this environment; uncompressed AVI, MJPEG "
                        "and YUV4MPEG2 decode for real"
                    )
                # fake container: RAW1 frames back-to-back
                off, idx = 0, 0
                while off + 8 <= len(b) and b[off : off + 4] == b"RAW1":
                    import struct

                    w, h = struct.unpack_from("<HH", b, off + 4)
                    size = 8 + w * h * 3
                    if idx % every_n == 0:
                        rows.append((mid, idx, b[off : off + size], w, h, "raw"))
                    off += size
                    idx += 1
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "bytes", "w", "h", "fmt"]
            ) if rows else pd.DataFrame(
                {c: pd.Series(dtype=t) for c, t in
                 [("media_id", object), ("frame_idx", "int32"), ("bytes", object),
                  ("w", "int32"), ("h", "int32"), ("fmt", object)]}
            )

    return media.select("media_id", "bytes").mapInPandas(kernel, VIDEO_FRAME_SCHEMA)
