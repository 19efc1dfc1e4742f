"""Gapfill operator (EP1) on Spark: distributed result must equal the
local kernel run with the same per-image seed (determinism/resume
guarantee), branches per reference viability rules."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssgp_toolbox_spark import codecs, generator
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.kernels import frame as frame_kernel
from ssgp_toolbox_spark.operators import gapfill, stats
from ssgp_toolbox_spark.sentinels import GAP


@pytest.fixture(scope="module")
def images(spark):
    df = generator.images_df(spark, sites=("stp",), n_history=6, n_inputs=2)
    return stats.with_stats(img_io.with_id_parts(df)).cache()


def _local_oracle(images_rows, method, config, hp, params):
    hist = sorted(
        (r for r in images_rows if r["role"] == "history"), key=lambda r: r["ts"]
    )
    tensor = np.stack([
        codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"]) for r in hist
    ])
    extra_rows = [r for r in images_rows if r["role"] == "extra"]
    extra = codecs.decode(bytes(extra_rows[0]["bytes"]), extra_rows[0]["h"],
                          extra_rows[0]["w"], extra_rows[0]["fmt"]) if extra_rows else None
    out = {}
    for r in images_rows:
        if r["role"] != "input":
            continue
        final = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
        filled, scores = frame_kernel.fill_image(
            final, tensor, extra=extra, method=method,
            predictor_configuration=config, hyperparameters=hp, params=params,
            seed=gapfill._stable_seed(r["image_id"]),
        )
        out[r["image_id"]] = (filled, scores)
    return out


@pytest.mark.parametrize("config", ["Random", "Biome"])
def test_spark_fill_equals_local_kernel(spark, images, config):
    rows = images.collect()
    expected = _local_oracle(rows, "Knn", config, "Custom", {"n_neighbors": 5})
    got = gapfill.gapfill(images, method="Knn", predictor_configuration=config,
                          hyperparameters="Custom", params={"n_neighbors": 5}).collect()
    filled_rows = [r for r in got if r["status"] == "filled"]
    assert len(filled_rows) == len(expected)
    for r in filled_rows:
        exp_m, exp_scores = expected[r["image_id"]]
        m = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
        assert np.array_equal(m, exp_m), r["image_id"]
        assert (m == GAP).sum() == 0
        if exp_scores:
            assert np.isclose(r["mean_cv_mae"], float(np.mean(exp_scores)))


def test_passthrough_and_nonviable_branches(spark):
    df = generator.images_df(spark, sites=("stp",), n_history=4, n_inputs=1)
    # craft a no-gap input and a nonviable (tiny valid count) input
    import pandas as pd

    from ssgp_toolbox_spark.sentinels import SKIP

    nogap = generator.make_layer("stp", 109, 62, 99, "input", 0.0)
    dead = np.full((109, 62), SKIP)
    dead[0, :50] = 290.0  # 50 valid <= 101
    extra_rows = [
        generator.image_row("stp", "input", "20991231T000000", nogap, codecs.FMT_F64, 0),
        generator.image_row("stp", "input", "20991231T120000", dead, codecs.FMT_F64, 0),
    ]
    df = df.unionByName(spark.createDataFrame(extra_rows, df.schema))
    prepared = stats.with_stats(img_io.with_id_parts(df))
    got = gapfill.gapfill(prepared, method="Knn", hyperparameters="Custom",
                          params={"n_neighbors": 5}).collect()
    by_id = {r["image_id"]: r for r in got}
    assert by_id["stp/input/20991231T000000"]["status"] == "passthrough"
    assert by_id["stp/input/20991231T000000"]["mean_cv_mae"] == 0.0
    # nonviable image excluded entirely (reference 'continue',
    # gapfiller.py:856-861)
    assert "stp/input/20991231T120000" not in by_id


def test_fill_metrics_lineage(spark, images):
    out = gapfill.gapfill(images, method="Knn", hyperparameters="Custom",
                          params={"n_neighbors": 5})
    m = gapfill.fill_metrics(out)
    rows = m.collect()
    assert {"image_id", "status", "filled_px", "mean_cv_mae", "partition_id",
            "computed_at"} <= set(m.columns)
    assert all(r["partition_id"] >= 0 for r in rows)


def test_lasso_kernel_on_spark(spark):
    """Non-batched dispatch path (Lasso/Custom is deterministic CD):
    Spark result == local kernel."""
    df = generator.images_df(spark, sites=("stp",), n_history=5, n_inputs=1)
    images = stats.with_stats(img_io.with_id_parts(df)).cache()
    rows = images.collect()
    expected = _local_oracle(rows, "Lasso", "Random", "Custom", {"alpha": 1.0})
    got = gapfill.gapfill(images, method="Lasso",
                          predictor_configuration="Random",
                          hyperparameters="Custom", params={"alpha": 1.0}).collect()
    for r in got:
        if r["status"] != "filled":
            continue
        exp_m, _ = expected[r["image_id"]]
        m = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
        assert np.allclose(m, exp_m, equal_nan=True)


def test_gridsearch_mode_smoke(spark):
    """RandomGridSearch mode end-to-end on a tiny image (envelope
    check only — stochastic search, FIXTURES.md §4)."""
    import pandas as pd

    small = generator.make_layer("gs", 20, 16, 9, "input", 0.1)
    rows = [generator.image_row("gs", "input", "20190910T000000", small,
                                codecs.FMT_F64, 10)]
    rows += generator.site_rows("gs", n_history=5, n_inputs=0, shape=(20, 16))
    df = spark.createDataFrame(rows, schema=generator.IMAGE_COLUMNS)
    images = stats.with_stats(img_io.with_id_parts(df))
    got = gapfill.gapfill(images, method="Knn",
                          predictor_configuration="Random",
                          hyperparameters="RandomGridSearch",
                          min_valid=50).collect()
    assert len(got) == 1 and got[0]["status"] == "filled"
    m = codecs.decode(bytes(got[0]["bytes"]), 20, 16, codecs.FMT_F64)
    assert (m == -100.0).sum() == 0
    # values within the physical range of the synthetic field
    assert 250 < np.median(m[m > -50]) < 330
