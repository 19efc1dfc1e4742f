"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with (w, h, fmt)
metadata — exactly the engine's raster convention. This module gives
the generic decode / feature-extract / resize plumbing a training-data
pipeline needs:

- the Spark-side machinery (schemas, Arrow batch shapes, mapInPandas
  signatures, partition-preserving plans) is real and tested;
- the *codec* for external formats (JPEG decode, audio resample,
  video frame-sample) is stubbed: no image/audio library ships in
  this container, so ``decode_external`` raises NotImplementedError
  for unknown formats, and ``fake_feature`` provides a deterministic
  stand-in (first-8-bytes digest of the payload) used by tests. The
  engine's own formats (npy-f64, png16) decode for real via codecs.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])

KNOWN_FMTS = {codecs.FMT_F64, codecs.FMT_PNG16}


def decode_external(payload: bytes, fmt: str) -> np.ndarray:
    """Hook for external codecs (JPEG/WEBP/audio). Deliberately a
    stub in this environment — plug Pillow/libvips here on a real
    cluster."""
    raise NotImplementedError(
        f"no codec for fmt={fmt!r} in this environment (stub; see module docstring)"
    )


def fake_feature(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature: byte-sum digest per stripe."""
    a = np.frombuffer(payload, dtype=np.uint8)
    stripes = np.array_split(a.astype(np.float64), dim)
    return np.array([s.mean() if len(s) else 0.0 for s in stripes], dtype=np.float32)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {k: [] for k in FEATURE_SCHEMA.fieldNames()}
        for row in pdf.itertuples(index=False):
            if row.fmt in KNOWN_FMTS:
                m = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                mean_px = float(m.mean())
            else:
                mean_px = float("nan")  # decode stubbed for external fmts
            out["image_id"].append(row.image_id)
            out["fmt"].append(row.fmt)
            out["n_bytes"].append(len(row.bytes))
            out["mean_px"].append(mean_px)
            out["feature"].append(fake_feature(row.bytes))
        yield pd.DataFrame(out)


def extract_features(images: DataFrame) -> DataFrame:
    """Per-image feature extraction — zero shuffle (mapInPandas over
    the scan), the multimodal analog of nn_fill's plan."""
    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        _extract_batches, FEATURE_SCHEMA
    )


# -------------------------------------------------- resize (REAL path)

RESIZE_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def resize_kernel(m: np.ndarray, out_h: int, out_w: int,
                  method: str = "bilinear") -> np.ndarray:
    """Numpy resize. 'nearest': pixel-center index map (the standard
    half-pixel convention). 'bilinear': separable interpolation with
    edge clamp. Both vectorized; no image library."""
    h, w = m.shape
    if method == "nearest":
        rows = np.clip(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), 0, h - 1)
        cols = np.clip(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), 0, w - 1)
        return m[rows[:, None], cols[None, :]]
    if method != "bilinear":
        raise ValueError(f"unknown resize method {method!r}")
    fy = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    fx = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :]
    # 4-term form with left-to-right addition: bit-identical to the
    # scalar textbook loop (the naive oracle), so phash-pinned
    # fixtures match exactly
    return (m[y0[:, None], x0[None, :]] * (1 - wy) * (1 - wx)
            + m[y0[:, None], x1[None, :]] * (1 - wy) * wx
            + m[y1[:, None], x0[None, :]] * wy * (1 - wx)
            + m[y1[:, None], x1[None, :]] * wy * wx)


def resize_images(images: DataFrame, out_h: int, out_w: int,
                  method: str = "bilinear") -> DataFrame:
    """Batch image resize — REAL (not stubbed) for the engine's own
    formats; zero shuffle (mapInPandas over the scan). External
    formats would decode via the decode_external hook on a real
    cluster."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                m = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt) \
                    if row.fmt in KNOWN_FMTS else decode_external(row.bytes, row.fmt)
                r = resize_kernel(m, out_h, out_w, method)
                out["image_id"].append(row.image_id)
                out["bytes"].append(codecs.encode(r, codecs.FMT_F64))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append(codecs.FMT_F64)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, RESIZE_SCHEMA)


# --------------------------------------- video frame sampling (stack)

# 'stack-f64': the engine's own trivial video container — n_frames
# concatenated row-major f64 rasters. External containers (mp4 etc.)
# go through the decode_external gate.
FMT_STACK = "stack-f64"

FRAME_SCHEMA = T.StructType([
    T.StructField("video_id", T.StringType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def sample_frames(videos: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame sampling: frames 0, n, 2n, … of each video
    payload become image rows (ready for dedup/features/resize).
    One video per task; Arrow batches carry only sampled frames."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in FRAME_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                h, w, n = int(row.h), int(row.w), int(row.n_frames)
                if row.fmt == FMT_STACK:
                    stack = np.frombuffer(row.bytes, dtype="<f8",
                                          count=n * h * w).reshape(n, h, w)
                else:
                    # external container: the hook's decoded frames ARE
                    # the stack (same consumption as resize_images)
                    stack = np.asarray(
                        decode_external(row.bytes, row.fmt),
                        dtype=np.float64).reshape(n, h, w)
                for i in range(0, n, every_n):
                    out["video_id"].append(row.video_id)
                    out["frame_idx"].append(i)
                    out["bytes"].append(codecs.encode(stack[i], codecs.FMT_F64))
                    out["w"].append(w)
                    out["h"].append(h)
                    out["fmt"].append(codecs.FMT_F64)
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "n_frames", "h", "w", "fmt") \
        .mapInPandas(fn, FRAME_SCHEMA)


# ----------------------------------------------- audio resample (PCM)

def resample_audio_kernel(x: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation PCM resample (sample-center convention) —
    the real kernel behind the audio path; container decode (mp3 etc.)
    is the gated step."""
    n_out = int(round(len(x) * rate_out / rate_in))
    if n_out <= 1 or len(x) == 0:
        return x[:n_out].astype(np.float64)
    pos = np.arange(n_out) * (len(x) - 1) / (n_out - 1)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, len(x) - 1)
    frac = pos - i0
    return x[i0] * (1 - frac) + x[i1] * frac


DIGEST_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("mean_px", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])


def image_digest(images: DataFrame) -> DataFrame:
    """Per-image value digest (dims, mean, perceptual hash) — the
    cheap projection used to pin pixel values in oracles and dedup
    stages without shipping payloads further. Zero shuffle."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in DIGEST_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                m = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                out["image_id"].append(row.image_id)
                out["w"].append(int(row.w))
                out["h"].append(int(row.h))
                out["mean_px"].append(float(m.mean()))
                out["phash"].append(codecs.phash64(m))
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt").mapInPandas(
        fn, DIGEST_SCHEMA)
