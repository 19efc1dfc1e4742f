"""Discretizator tests: engine (Spark plan + vectorized kernels) vs
naive oracle transcription — covers collisions, empty buckets,
trailing-bucket drop, skip propagation, sequential median/poly fills
(FIXTURES.md §3)."""

from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import oracles
from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.kernels import timeseries as ts_kernel
from ssgp_toolbox_spark.operators import discretize
from ssgp_toolbox_spark.sentinels import GAP, SKIP

H, W = 6, 5


def _mk(seed, with_gaps=False, with_skip=False):
    rng = np.random.default_rng(seed)
    m = 290 + rng.normal(0, 3, (H, W))
    if with_gaps:
        # seed-dependent position so no pixel is gapped in every bucket
        r, c = seed % (H - 2), seed % (W - 2)
        m[r : r + 2, c : c + 2] = GAP
    if with_skip:
        m[0, 0] = SKIP
    return m


@pytest.fixture(scope="module")
def scene():
    """Irregular timestamps: bucket 0 has 3 layers (collision), bucket
    1 has 1, bucket 2 empty (blank), bucket 3 has 2, trailing bucket
    empty (dropped)."""
    return {
        datetime(2019, 9, 1, 1, 0): _mk(1, with_skip=True),
        # 05:00 wins bucket 0's nearest-to-centroid pick -> give it the
        # skip pixel too so skip propagation is observable in 'None' mode
        datetime(2019, 9, 1, 5, 0): _mk(2, with_gaps=True, with_skip=True),
        datetime(2019, 9, 1, 11, 30): _mk(3),
        datetime(2019, 9, 1, 13, 0): _mk(4, with_gaps=True),
        # bucket 2 (2019-09-02 00:00-12:00) empty
        datetime(2019, 9, 2, 13, 0): _mk(5),
        datetime(2019, 9, 2, 17, 0): _mk(6, with_gaps=True),
        # 2019-09-03 both buckets empty -> blank + trailing dropped
    }


def _layers_df(spark, scene):
    schema = T.StructType([
        T.StructField("site", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ])
    rows = [("s1", k, codecs.encode(m, codecs.FMT_F64), H, W, codecs.FMT_F64)
            for k, m in scene.items()]
    return spark.createDataFrame(rows, schema)


@pytest.mark.parametrize("averaging,filling", [
    ("None", "None"),
    ("simple", "median"),
    ("weighted", "median"),
    ("None", "poly"),
])
def test_discretize_matches_oracle(spark, scene, averaging, filling):
    exp_tensor, exp_centroids = oracles.discretize_oracle(
        scene, 12, averaging, filling, n_neighbors=3, poly_degree=2)
    got = discretize.discretize(
        _layers_df(spark, scene), "12H", averaging, filling,
        n_neighbors=3, poly_degree=2,
    ).orderBy("bucket").collect()
    assert len(got) == len(exp_centroids)
    for i, row in enumerate(got):
        assert row["centroid"] == exp_centroids[i]
        m = codecs.decode(bytes(row["bytes"]), H, W, codecs.FMT_F64)
        assert np.allclose(m, exp_tensor[i], equal_nan=True), f"bucket {i}"


def test_empty_bucket_blank_and_trailing_drop(spark, scene):
    got = discretize.discretize(_layers_df(spark, scene), "12H").orderBy("bucket").collect()
    # grid: 2019-09-01 00:00 .. 2019-09-03 00:00 -> 4 buckets, bucket 2 blank
    assert [r["bucket"] for r in got] == [0, 1, 2, 3]
    blank = codecs.decode(bytes(got[2]["bytes"]), H, W, codecs.FMT_F64)
    # pixel (0,0) is SKIP via skip propagation; everything else GAP
    assert blank[0, 0] == SKIP
    assert (blank.ravel()[1:] == GAP).all() and got[2]["n_layers"] == 0


def test_skip_propagation(spark, scene):
    got = discretize.discretize(
        _layers_df(spark, scene), "12H", "None", "median", n_neighbors=3
    ).orderBy("bucket").collect()
    # pixel (0,0) has SKIP in the layer picked for bucket 0 -> whole series skip
    series = [codecs.decode(bytes(r["bytes"]), H, W, codecs.FMT_F64)[0, 0] for r in got]
    assert all(v == SKIP for v in series)


def test_neighbor_schedule_sequential_semantics():
    """Filled values become known for later gaps (timeseries.py:215-218)."""
    mask = np.array([False, True, True, False, False])
    sched = ts_kernel.neighbor_schedule(mask, 2)
    (g1, n1), (g2, n2) = sched
    assert g1 == 1 and list(n1) == [0, 3]
    assert g2 == 2 and sorted(n2.tolist()) == [1, 3]  # index 1 now known


def test_fill_stack_pattern_vectorization_exact():
    """Pattern-grouped vectorized fill == per-pixel naive loop."""
    rng = np.random.default_rng(0)
    stack = 290 + rng.normal(0, 2, (10, 8, 7))
    stack[2, :4, :] = GAP
    stack[5, :4, :] = GAP
    stack[7, 4:, 2:4] = GAP
    stack[:, 7, 6] = SKIP  # skip column
    for method in ("median", "poly"):
        ours = ts_kernel.fill_stack(stack, method, n_neighbors=3, poly_degree=1)
        flat = stack.reshape(10, -1).copy()
        for c in range(flat.shape[1]):
            s = flat[:, c]
            if (s == SKIP).any():
                flat[:, c] = SKIP
                continue
            gaps = np.flatnonzero(s == GAP)
            for g in gaps:
                known = np.flatnonzero(s != GAP)
                idx = np.argsort(np.abs(known - g), kind="stable")[:3]
                vals = s[known[idx]]
                if method == "median":
                    s[g] = np.nanmedian(vals)
                else:
                    s[g] = np.polyval(np.polyfit(known[idx].astype(float), vals, 1), g)
        assert np.allclose(ours, flat.reshape(stack.shape))


@pytest.mark.parametrize("filling", ["median", "poly"])
def test_tiled_fill_stage_equals_untiled(spark, scene, filling):
    """(site, tile)-keyed temporal fill == whole-site fill, bit-exact
    (the fill is per-pixel; tiling bounds memory, not semantics)."""
    from ssgp_toolbox_spark.operators import discretize as dz

    layers = _layers_df(spark, scene)
    whole = {(r["site"], r["bucket"]): bytes(r["bytes"])
             for r in dz.discretize(layers, "12H", averaging="weighted",
                                    filling_method=filling).collect()}
    tiled = {(r["site"], r["bucket"]): bytes(r["bytes"])
             for r in dz.discretize(layers, "12H", averaging="weighted",
                                    filling_method=filling,
                                    tile=3).collect()}
    assert whole.keys() == tiled.keys()
    for k in whole:
        assert whole[k] == tiled[k], k
