"""Tiled kNN gapfill (cell co-partitioned halo windows): equals the
whole-image fill wherever windows contain the biome 40-NN, with a
per-pixel approximation audit."""

import numpy as np
from pyspark.sql import functions as F

from ssgp_toolbox_spark import codecs, generator
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.operators import gapfill, stats, tiled_gapfill
from ssgp_toolbox_spark.sentinels import GAP


def test_tiled_matches_whole_image(spark):
    images = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=5, n_inputs=2)
    )).cache()
    whole = {r["image_id"]: (bytes(r["bytes"]), r["mean_cv_mae"])
             for r in gapfill.gapfill(
                 images, method="Knn", predictor_configuration="Biome",
                 hyperparameters="Custom", params={"n_neighbors": 5}).collect()}
    tiled = {r["image_id"]: (bytes(r["bytes"]), r["mean_cv_mae"])
             for r in tiled_gapfill.tiled_gapfill(
                 images, tile=40, halo=30, params={"n_neighbors": 5}).collect()}
    assert whole.keys() == tiled.keys()
    for k in whole:
        wb, wm = whole[k]
        tb, tm = tiled[k]
        a = codecs.decode(wb, 109, 62, codecs.FMT_F64)
        b = codecs.decode(tb, 109, 62, codecs.FMT_F64)
        same = np.isclose(a, b, equal_nan=True) | ((a == b))
        frac = same.mean()
        # with halo 30 >= typical biome 40-NN radius, agreement is
        # essentially total; small-biome random fallback pixels may
        # differ (window-local sampling) — allow a thin margin
        assert frac > 0.99, (k, frac)
        assert (b == GAP).sum() == 0
        assert np.isfinite(tm)


def test_tiled_memory_bound_structure(spark):
    """Window payload size is bounded by (tile+2*halo)^2 regardless of
    the raster, and the plan shuffles on the tile key."""
    images = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=2, n_inputs=1)
    ))
    out = tiled_gapfill.tiled_gapfill(images, tile=32, halo=16,
                                      params={"n_neighbors": 5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan or "applyInPandas" in plan.lower() \
        or "FlatMapGroups" in plan
    row = out.collect()[0]
    m = codecs.decode(bytes(row["bytes"]), row["h"], row["w"], row["fmt"])
    assert (m == GAP).sum() == 0
