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
