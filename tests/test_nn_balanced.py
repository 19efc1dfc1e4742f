"""nn_fill_balanced must be bit-identical to nn_fill and handle the
viability branches."""

import numpy as np
from pyspark.sql import functions as F

from ssgp_toolbox_spark import generator
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.operators import nn_fill, stats


def test_nn_balanced_bit_equals_plain(spark):
    images = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=2, n_inputs=3)
    )).filter(F.col("role") == "input").cache()
    plain = {r["image_id"]: (bytes(r["bytes"]), r["status"], r["filled_px"])
             for r in nn_fill.nn_fill(images).collect()}
    bal = {r["image_id"]: (bytes(r["bytes"]), r["status"], r["filled_px"])
           for r in nn_fill.nn_fill_balanced(images, chunk_px=333).collect()}
    assert plain == bal
