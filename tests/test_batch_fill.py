"""Batched kNN fill (kernels/batch.py) and the skew-balanced operator
must be bit-identical to the per-pixel reference-parity path."""

import numpy as np
import pytest

from ssgp_toolbox_spark import generator
from ssgp_toolbox_spark.kernels import batch as B
from ssgp_toolbox_spark.kernels import frame as FR
from ssgp_toolbox_spark.sentinels import GAP


@pytest.fixture(scope="module")
def scene():
    h, w = 40, 34
    tensor = np.stack([
        generator.make_layer("bf", h, w, t, "history", 0.02) for t in range(10)
    ])
    final = generator.make_layer("bf", h, w, 12, "input", 0.3)
    extra = generator.zone_raster("bf", h, w).astype(float)
    return final, tensor, extra


@pytest.mark.parametrize("config", ["Biome", "Random", "All"])
def test_batched_equals_perpixel(scene, config):
    final, tensor, extra = scene
    slow_m, slow_s = FR.fill_image(final, tensor, extra=extra, method="Knn",
                                   predictor_configuration=config,
                                   hyperparameters="Custom",
                                   params={"n_neighbors": 5}, seed=21)
    fast_m, fast_s = B.fill_image_knn(final, tensor, extra=extra,
                                      predictor_configuration=config,
                                      hyperparameters="Custom",
                                      params={"n_neighbors": 5}, seed=21)
    assert np.array_equal(slow_m, fast_m, equal_nan=True)
    assert len(slow_s) == len(fast_s)
    assert np.allclose(slow_s, fast_s, equal_nan=True)


def test_batched_distance_weights(scene):
    final, tensor, extra = scene
    slow_m, _ = FR.fill_image(final, tensor, extra=extra, method="Knn",
                              predictor_configuration="Biome",
                              hyperparameters="Custom",
                              params={"n_neighbors": 3, "weights": "distance"},
                              seed=4)
    fast_m, _ = B.fill_image_knn(final, tensor, extra=extra,
                                 predictor_configuration="Biome",
                                 hyperparameters="Custom",
                                 params={"n_neighbors": 3, "weights": "distance"},
                                 seed=4)
    # distance weights divide by ||a-b||: the batched path computes it
    # as a²+b²−2ab (matmul) vs the direct (a−b)² sum — last-ulp float
    # differences in 1/d are expected, so allclose not array_equal
    assert np.allclose(slow_m, fast_m, equal_nan=True)


def test_gap_slice_union_equals_whole(scene):
    """Chunked fills (the balanced operator's unit) reassemble to the
    exact whole-image fill — per-pixel seeding guarantees it."""
    final, tensor, extra = scene
    whole, scores = B.fill_image_knn(final, tensor, extra=extra,
                                     predictor_configuration="Biome",
                                     hyperparameters="Custom",
                                     params={"n_neighbors": 5}, seed=7)
    gaps = np.argwhere(final == GAP)
    stitched = final.copy()
    parts = []
    for lo in range(0, len(gaps), 137):
        hi = min(lo + 137, len(gaps))
        part, psc = B.fill_image_knn(final, tensor, extra=extra,
                                     predictor_configuration="Biome",
                                     hyperparameters="Custom",
                                     params={"n_neighbors": 5}, seed=7,
                                     gap_slice=(lo, hi))
        sel = gaps[lo:hi]
        stitched[sel[:, 0], sel[:, 1]] = part[sel[:, 0], sel[:, 1]]
        parts.extend(psc)
    assert np.array_equal(whole, stitched, equal_nan=True)
    assert np.allclose(parts, scores, equal_nan=True)


def test_balanced_operator_bit_equals_plain(spark):
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import gapfill, stats

    images = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=5, n_inputs=2)
    )).cache()
    plain = {r["image_id"]: bytes(r["bytes"]) for r in gapfill.gapfill(
        images, method="Knn", predictor_configuration="Biome",
        hyperparameters="Custom", params={"n_neighbors": 5}).collect()}
    bal = {r["image_id"]: bytes(r["bytes"]) for r in gapfill.gapfill_balanced(
        images, predictor_configuration="Biome",
        params={"n_neighbors": 5}, chunk_px=300).collect()}
    assert plain == bal


def test_balanced_lasso_bit_equals_plain(spark):
    """The chunked path now covers all kernels: Lasso/Custom chunked
    == whole-image (per-pixel seeds + shared CV fold rule)."""
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import gapfill, stats

    images = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=4, n_inputs=1)
    )).cache()
    plain = {r["image_id"]: bytes(r["bytes"]) for r in gapfill.gapfill(
        images, method="Lasso", predictor_configuration="Biome",
        hyperparameters="Custom", params={"alpha": 1.0}).collect()}
    bal = {r["image_id"]: bytes(r["bytes"]) for r in gapfill.gapfill_balanced(
        images, predictor_configuration="Biome", params={"alpha": 1.0},
        method="Lasso", chunk_px=150).collect()}
    assert plain == bal
