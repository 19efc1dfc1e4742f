"""Golden end-to-end vs the reference's OWN committed sample outputs
(/root/reference/Samples — real Sentinel-3 LST data, read-only).

The strongest parity evidence available without running the reference
(its gdal/sklearn-0.21 stack is absent): the engine's Spark
Discretizator, fed the reference's committed input layers, must
reproduce the reference's committed output layers. Discovery: the
sample was generated with averaging='weighted',
filling_method='poly' — the engine matches to float roundoff
(~1e-12 max abs diff).

For the ML gapfilling sample (stochastic sklearn search) only
envelope checks are possible — our fills are compared to the
committed fills by MAE/PSNR over the gap pixels (FIXTURES.md §4:
stochastic modes use envelopes).
"""

import json
import os
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.operators import discretize
from ssgp_toolbox_spark.sentinels import GAP, SKIP, is_valid

TS_SRC = "/root/reference/Samples/S3LST_timeseries_example"
GF_SRC = "/root/reference/Samples/S3LST_gapfilling_example"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(TS_SRC), reason="reference samples not present")


def _layers_df(spark, d):
    schema = T.StructType([
        T.StructField("site", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ])
    rows = []
    for f in sorted(os.listdir(d)):
        m = np.load(os.path.join(d, f)).astype(np.float64)
        rows.append(("s3", datetime.strptime(f[:-4], "%Y%m%dT%H%M%S"),
                     codecs.encode(m, codecs.FMT_F64), m.shape[0], m.shape[1],
                     codecs.FMT_F64))
    return spark.createDataFrame(rows, schema)


def test_discretizator_reproduces_reference_goldens(spark):
    """Engine output == the reference's committed Outputs/*.npy."""
    golden = {
        f[:-4]: np.load(os.path.join(TS_SRC, "Outputs", f)).astype(np.float64)
        for f in sorted(os.listdir(os.path.join(TS_SRC, "Outputs")))
        if f.endswith(".npy")
    }
    out = discretize.discretize(
        _layers_df(spark, os.path.join(TS_SRC, "Inputs")),
        "12H", averaging="weighted", filling_method="poly",
        n_neighbors=5, poly_degree=2,
    ).collect()
    got = {}
    for r in out:
        key = r["centroid"].strftime("%Y%m%dT%H%M%S")
        got[key] = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
    assert set(got) == set(golden)
    for k in golden:
        assert np.allclose(got[k], golden[k], atol=1e-9), k


def test_gapfill_envelope_on_reference_data(spark):
    """ML fill on the reference's real Sentinel-3 data: our Knn/Biome
    fill must land within a sane envelope of the committed
    (sklearn-era) fills — same value range, comparable smoothness."""
    hist = []
    for f in sorted(os.listdir(os.path.join(GF_SRC, "History"))):
        hist.append(np.load(os.path.join(GF_SRC, "History", f)).astype(np.float64))
    tensor = np.stack(hist)
    extra = np.load(os.path.join(GF_SRC, "Extra", "Extra.npy")).astype(np.float64)
    from ssgp_toolbox_spark.kernels import batch

    maes = []
    for f in sorted(os.listdir(os.path.join(GF_SRC, "Inputs"))):
        final = np.load(os.path.join(GF_SRC, "Inputs", f)).astype(np.float64)
        ref_fill = np.load(os.path.join(GF_SRC, "Outputs", f)).astype(np.float64)
        gaps = final == GAP
        ours, _ = batch.fill_image_knn(final, tensor, extra=extra,
                                       predictor_configuration="Biome",
                                       hyperparameters="Custom",
                                       params={"n_neighbors": 5}, seed=1)
        both = gaps & is_valid(ref_fill) & is_valid(ours)
        mae = float(np.abs(ours[both] - ref_fill[both]).mean())
        maes.append(mae)
        # same physical range as the committed fill
        assert 270 < np.median(ours[both]) < 310
    # our Knn fill vs their (reported CV-MAE 1.45-2.05 K) fill: agree
    # within a few Kelvin on average
    assert max(maes) < 5.0, maes
    # Lasso/Biome tracks the committed fill tighter (measured 0.75 K
    # MAE on the first sample; CV-MAE 1.07 K vs their 1.45 K)
    from ssgp_toolbox_spark.kernels import frame as FR

    f0 = sorted(os.listdir(os.path.join(GF_SRC, "Inputs")))[0]
    final = np.load(os.path.join(GF_SRC, "Inputs", f0)).astype(np.float64)
    ref_fill = np.load(os.path.join(GF_SRC, "Outputs", f0)).astype(np.float64)
    ours, sc = FR.fill_image(final, tensor, extra=extra, method="Lasso",
                             predictor_configuration="Biome",
                             hyperparameters="Custom", params={"alpha": 1.0},
                             seed=1)
    both = (final == GAP) & is_valid(ref_fill) & is_valid(ours)
    assert float(np.abs(ours[both] - ref_fill[both]).mean()) < 2.0
    assert 0.5 < float(np.mean(sc)) < 2.5  # same CV regime as 1.45 K


def test_reference_metadata_envelope():
    """The committed Metadata.json CV-MAEs bound what a correct fill
    should achieve on this data; our kernel's CV scores must be in
    the same regime (not orders off)."""
    meta = json.load(open(os.path.join(GF_SRC, "Outputs", "Metadata.json")))
    ref_scores = sorted(meta.values())
    assert 1.0 < ref_scores[0] < 3.0  # sanity on the fixture itself

    hist = [np.load(os.path.join(GF_SRC, "History", f)).astype(np.float64)
            for f in sorted(os.listdir(os.path.join(GF_SRC, "History")))]
    tensor = np.stack(hist)
    extra = np.load(os.path.join(GF_SRC, "Extra", "Extra.npy")).astype(np.float64)
    from ssgp_toolbox_spark.kernels import batch

    f = sorted(os.listdir(os.path.join(GF_SRC, "Inputs")))[0]
    final = np.load(os.path.join(GF_SRC, "Inputs", f)).astype(np.float64)
    _, scores = batch.fill_image_knn(final, tensor, extra=extra,
                                     predictor_configuration="Biome",
                                     hyperparameters="Custom",
                                     params={"n_neighbors": 5}, seed=1)
    ours = float(np.mean(scores))
    assert 0.3 < ours < 6.0, ours
