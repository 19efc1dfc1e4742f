"""Tiled halo-join NN fill vs the whole-image kernel: identical
wherever the nearest valid pixel lies within the ring-1 window (true
for the generator's blob gaps at tile >= blob radius)."""

import numpy as np
from pyspark.sql import functions as F

from ssgp_toolbox_spark import codecs, generator
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.operators import nn_fill, tiled_fill


def test_tiled_equals_whole_image(spark):
    images = img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=0, n_inputs=3)
    ).filter(F.col("role") == "input").cache()
    whole = {r["image_id"]: bytes(r["bytes"]) for r in nn_fill.nn_fill(images).collect()}
    tiled = {r["image_id"]: (bytes(r["bytes"]), r["unresolved_px"])
             for r in tiled_fill.tiled_nn_fill(images, tile=32).collect()}
    assert whole.keys() == tiled.keys()
    for k, (tb, unresolved) in tiled.items():
        assert unresolved == 0
        a = codecs.decode(whole[k], 109, 62, codecs.FMT_F64)
        b = codecs.decode(tb, 109, 62, codecs.FMT_F64)
        assert np.array_equal(a, b), k


def test_tiled_counts_unresolved(spark):
    """A tile window with zero valid pixels leaves its gaps unfilled
    and reports them."""
    import pandas as pd

    from ssgp_toolbox_spark.sentinels import GAP

    m = np.full((128, 128), GAP)
    m[0, 0] = 290.0  # single valid pixel, far from the opposite corner
    row = generator.image_row("x", "input", "20190901T000000", m, codecs.FMT_F64, 99)
    df = spark.createDataFrame([row], generator.IMAGE_COLUMNS)
    out = tiled_fill.tiled_nn_fill(df, tile=16).collect()[0]
    assert out["unresolved_px"] > 0
    back = codecs.decode(bytes(out["bytes"]), 128, 128, codecs.FMT_F64)
    # gaps near the valid pixel resolved, far corner not
    assert back[1, 1] == 290.0
    assert back[127, 127] == GAP
