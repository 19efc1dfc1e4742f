"""Multimodal resize / frame-sample / audio-resample: real kernels on
the engine's own formats (external containers stay gated)."""

import numpy as np
import pytest

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.functions import multimodal as MM


def _naive_bilinear(m, out_h, out_w):
    h, w = m.shape
    out = np.empty((out_h, out_w))
    for i in range(out_h):
        for j in range(out_w):
            fy = (i + 0.5) * h / out_h - 0.5
            fx = (j + 0.5) * w / out_w - 0.5
            y0 = min(max(int(np.floor(fy)), 0), h - 1)
            x0 = min(max(int(np.floor(fx)), 0), w - 1)
            y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
            wy = min(max(fy - y0, 0.0), 1.0)
            wx = min(max(fx - x0, 0.0), 1.0)
            out[i, j] = (m[y0, x0] * (1 - wy) * (1 - wx)
                         + m[y0, x1] * (1 - wy) * wx
                         + m[y1, x0] * wy * (1 - wx)
                         + m[y1, x1] * wy * wx)
    return out


def test_resize_kernel_matches_naive():
    m = np.random.default_rng(3).normal(290, 5, (17, 23))
    got = MM.resize_kernel(m, 9, 31, "bilinear")
    assert np.allclose(got, _naive_bilinear(m, 9, 31), atol=1e-12)
    nn = MM.resize_kernel(m, 34, 46, "nearest")
    assert nn[0, 0] == m[0, 0] and nn.shape == (34, 46)
    # identity resize is exact for both methods
    assert np.array_equal(MM.resize_kernel(m, 17, 23, "nearest"), m)
    assert np.allclose(MM.resize_kernel(m, 17, 23, "bilinear"), m, atol=1e-12)


def test_resize_images_spark(spark):
    m = np.random.default_rng(4).normal(290, 5, (20, 16))
    df = spark.createDataFrame(
        [("a", bytearray(codecs.encode(m, codecs.FMT_F64)), 16, 20,
          codecs.FMT_F64)],
        "image_id string, bytes binary, w int, h int, fmt string")
    rows = MM.resize_images(df, 10, 8).collect()
    got = codecs.decode(bytes(rows[0]["bytes"]), 10, 8, rows[0]["fmt"])
    assert np.allclose(got, MM.resize_kernel(m, 10, 8, "bilinear"))


def test_sample_frames_spark(spark):
    n, h, w = 23, 6, 5
    stack = np.random.default_rng(5).normal(0, 1, (n, h, w))
    df = spark.createDataFrame(
        [("v1", bytearray(stack.astype("<f8").tobytes()), n, h, w,
          MM.FMT_STACK)],
        "video_id string, bytes binary, n_frames int, h int, w int, fmt string")
    rows = MM.sample_frames(df, every_n=10).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 10, 20]
    for r in rows:
        got = codecs.decode(bytes(r["bytes"]), h, w, r["fmt"])
        assert np.array_equal(got, stack[r["frame_idx"]])


def test_sample_frames_external_container_gated(spark):
    df = spark.createDataFrame(
        [("v2", bytearray(b"\x00" * 64), 4, 2, 2, "mp4")],
        "video_id string, bytes binary, n_frames int, h int, w int, fmt string")
    with pytest.raises(Exception, match="no codec"):
        MM.sample_frames(df).collect()


def test_resample_audio_kernel():
    x = np.sin(np.linspace(0, 8 * np.pi, 16000))
    y = MM.resample_audio_kernel(x, 16000, 8000)
    assert len(y) == 8000
    # endpoints preserved by the sample-center convention
    assert y[0] == x[0] and abs(y[-1] - x[-1]) < 1e-12
    # upsample then check the original samples are interpolated closely
    z = MM.resample_audio_kernel(y, 8000, 16000)
    assert np.abs(z - x).max() < 0.01
