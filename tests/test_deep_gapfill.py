"""Deep-history gapfill: bit-identical to ``gapfill`` while never
materializing a stacked history (operators/deep_gapfill.py). Parity
across kernel dispatches (batched Knn + generic per-pixel) and a
deep-stack run whose per-row Arrow payloads are asserted bounded."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssgp_toolbox_spark import codecs, generator
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.operators import deep_gapfill, gapfill, stats
from ssgp_toolbox_spark.sentinels import GAP


@pytest.fixture(scope="module")
def images(spark):
    df = generator.images_df(spark, sites=("stp",), n_history=6, n_inputs=2)
    return stats.with_stats(img_io.with_id_parts(df)).cache()


def _by_id(rows):
    return {r["image_id"]: r for r in rows}


@pytest.mark.parametrize("method,config,hp,params", [
    ("Knn", "Biome", "Custom", {"n_neighbors": 5}),     # batched core
    ("Knn", "Random", "Custom", {"n_neighbors": 5}),
    ("Lasso", "Biome", "Custom", {"alpha": 1.0}),       # generic core
])
def test_deep_equals_gapfill(spark, images, method, config, hp, params):
    base = _by_id(gapfill.gapfill(
        images, method=method, predictor_configuration=config,
        hyperparameters=hp, params=params).collect())
    deep = _by_id(deep_gapfill.gapfill_deep(
        images, method=method, predictor_configuration=config,
        hyperparameters=hp, params=params, chunk_px=97).collect())
    assert set(deep) == set(base)
    for iid, r in deep.items():
        b = base[iid]
        assert r["status"] == b["status"]
        assert r["filled_px"] == b["filled_px"]
        assert r["phash"] == b["phash"]
        m = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
        e = codecs.decode(bytes(b["bytes"]), b["h"], b["w"], b["fmt"])
        assert np.array_equal(m, e), iid
        if b["status"] == "filled":
            assert np.isclose(r["mean_cv_mae"], b["mean_cv_mae"], equal_nan=True)


def test_deep_gridsearch_parity(spark, images):
    """Grid-search modes route through frame.fill_gathered with the
    per-pixel seed salt — must match gapfill exactly."""
    kw = dict(method="Lasso", predictor_configuration="Biome",
              hyperparameters="RandomGridSearch", params=None)
    base = _by_id(gapfill.gapfill(images, **kw).collect())
    deep = _by_id(deep_gapfill.gapfill_deep(images, chunk_px=64, **kw).collect())
    for iid, r in deep.items():
        m = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
        b = base[iid]
        e = codecs.decode(bytes(b["bytes"]), b["h"], b["w"], b["fmt"])
        assert np.array_equal(m, e), iid


def test_deep_stack_bounded_rows(spark):
    """120-layer history on a small site: runs end-to-end, fills all
    gaps, and the coords/extract row payloads respect the documented
    bound (chunk_px × (C+1) × 8 bytes per value blob) — i.e. nothing
    resembling a stacked history crosses the shuffle."""
    df = generator.images_df(spark, sites=("stp",), n_history=120, n_inputs=1)
    images = stats.with_stats(img_io.with_id_parts(df))

    chunk_px = 128
    n_coord = 42  # Biome: 40-nearest + target + slack is <= 41+1
    coords = deep_gapfill._coords_batches("Biome", chunk_px)
    sel = images.filter(F.col("role") == "input").join(
        F.broadcast(gapfill.pack_extra(images.filter(F.col("role") == "extra"))),
        "site")
    coord_rows = sel.select("image_id", "site", "bytes", "h", "w", "fmt",
                            "extra_layer").mapInPandas(
        coords, deep_gapfill.COORDS_SCHEMA).collect()
    assert coord_rows
    for r in coord_rows:
        assert len(r["keys"]) // 8 <= chunk_px * n_coord
        assert len(r["last_vals"]) == len(r["keys"])
        assert len(r["idx"]) == 4 * r["n_px"] * r["n_pred"]

    out = deep_gapfill.gapfill_deep(
        images, method="Knn", predictor_configuration="Biome",
        hyperparameters="Custom", params={"n_neighbors": 5},
        chunk_px=chunk_px).collect()
    filled = [r for r in out if r["status"] == "filled"]
    assert filled
    for r in filled:
        m = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
        assert (m == GAP).sum() == 0


def test_deep_plan_has_no_history_stacking(spark, images):
    """The physical plan must not collect history layers into rows:
    no `hist_layers` aggregation and no raster `bytes` inside a
    collect_list — the extraction leg ships value vectors only."""
    df = deep_gapfill.gapfill_deep(
        images, method="Knn", predictor_configuration="Biome",
        hyperparameters="Custom", params={"n_neighbors": 5})
    plan = df._jdf.queryExecution().toString()
    assert "hist_layers" not in plan
    assert "collect_list(struct(ts" in plan.replace(", ", ",") or \
           "collect_list" in plan  # layers agg is (ts, vals) structs only
    # the only collect_list aggregations are over extracted vals and
    # chunk deltas — never over a column named bytes
    for line in plan.splitlines():
        if "collect_list" in line:
            assert "bytes" not in line, line
