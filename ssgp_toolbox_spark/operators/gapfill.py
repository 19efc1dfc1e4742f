"""Flagship operator: per-pixel ML gap fill (reference EP1).

``SimpleSpatialGapfiller.fill_gaps`` (gapfiller.py:801-899) re-planned
for Spark:

reference (eager, per input file)          this engine (one lazy plan)
-----------------------------------       ---------------------------------
re-scan History/ per input (S1)           scan history once, groupBy(site)
                                          → pack sorted temporal stack
load Extra.npy (S3)                       extra layer packed the same way
for file in Inputs/: viability F2/F3      Catalyst filters on stats columns
thread pool over gap pixels               join packed stack to each input
                                          row → **mapInPandas** fill kernel
np.save + Metadata.json (S4/S5)           snapshot append + metrics columns

Shuffle analysis (the 100 TB story): exactly ONE shuffle — the
``groupBy(site)`` that packs each site's history into a single row.
Inputs then stream through a join against that packed side (AQE
auto-broadcasts it when small; with millions of sites it degrades
gracefully to a co-partitioned shuffle join) and the fill itself is a
shuffle-free mapInPandas. Fill cost dominates (CV grid search per gap
pixel), so parallelism scales with input rows, and skew = images with
many gap pixels — handled by the tile path (operators/tiled_fill.py)
which splits hot images into cell-keyed tiles.

Sequential parity mode (``add_outputs=True``, gapfiller.py:788-790 —
layer i's output feeds layer i+1's training set) is a driver loop of
one Spark job per timestamp, as documented in SURVEY.md §3; this
module implements the parallel ``add_outputs=False`` configuration
used by the reference's own Comparison benchmark
(Comparison/Description.md:27).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.kernels import frame as frame_kernel
from ssgp_toolbox_spark.sentinels import GAP

GAPFILL_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("filled_px", T.IntegerType()),
    T.StructField("mean_cv_mae", T.DoubleType()),
])

_LAYER_STRUCT = "array<struct<ts:timestamp,bytes:binary,h:int,w:int,fmt:string>>"


def _stable_seed(image_id: str) -> int:
    return zlib.crc32(image_id.encode()) & 0x7FFFFFFF


def pack_history(history: DataFrame) -> DataFrame:
    """One row per site: chronologically sorted temporal stack
    (reference O1 sort, gapfiller.py:91 + tensor build 846-848).
    This groupBy is the plan's single shuffle."""
    layer = F.struct("ts", "bytes", "h", "w", "fmt")
    return history.groupBy("site").agg(
        F.sort_array(F.collect_list(layer)).alias("hist_layers")
    )


def pack_extra(extras: DataFrame) -> DataFrame:
    layer = F.struct("bytes", "h", "w", "fmt")
    return extras.groupBy("site").agg(F.first(layer).alias("extra_layer"))


def _fill_batches(method, predictor_configuration, hyperparameters, params):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in GAPFILL_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                final = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                tensor = np.stack([
                    codecs.decode(l["bytes"], int(l["h"]), int(l["w"]), l["fmt"])
                    for l in row.hist_layers
                ])
                extra = None
                if predictor_configuration == "Biome":
                    e = row.extra_layer
                    extra = codecs.decode(e["bytes"], int(e["h"]), int(e["w"]), e["fmt"])
                n_gaps = int((final == GAP).sum())
                filled, scores = frame_kernel.fill_image(
                    final, tensor, extra=extra, method=method,
                    predictor_configuration=predictor_configuration,
                    hyperparameters=hyperparameters, params=params,
                    seed=_stable_seed(row.image_id),
                )
                out["image_id"].append(row.image_id)
                out["bytes"].append(codecs.encode(filled, row.fmt))
                out["w"].append(row.w)
                out["h"].append(row.h)
                out["fmt"].append(row.fmt)
                out["caption"].append(row.caption)
                out["phash"].append(codecs.phash64(filled))
                out["status"].append("filled")
                out["filled_px"].append(n_gaps)
                out["mean_cv_mae"].append(
                    float(np.mean(scores)) if scores else float("nan")
                )
            yield pd.DataFrame(out)

    return fn


def gapfill(images: DataFrame, method: str = "Lasso",
            predictor_configuration: str = "Random",
            hyperparameters: str = "RandomGridSearch",
            params: dict | None = None, min_valid: int = 101) -> DataFrame:
    """Fill all ``role='input'`` images of every site. ``images`` must
    carry (site, role, ts) id parts and the stats columns
    (operators.stats.with_stats).

    Output: GAPFILL_SCHEMA; passthrough images (no gaps) come through
    with status='passthrough' and metric 0.0 (gapfiller.py:862-873);
    non-viable images (valid_px <= 101) are *excluded*, like the
    reference's ``continue`` (gapfiller.py:856-861).
    """
    inputs = images.filter(F.col("role") == "input")
    viable = inputs.filter((F.col("valid_px") > min_valid) & (F.col("gap_count") > 0))
    passthrough = inputs.filter(
        (F.col("valid_px") > min_valid) & (F.col("gap_count") == 0)
    )

    hist = pack_history(images.filter(F.col("role") == "history"))
    joined = viable.join(hist, "site")
    if predictor_configuration == "Biome":
        extra = pack_extra(images.filter(F.col("role") == "extra"))
        joined = joined.join(extra, "site")

    keep = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "hist_layers"]
    if predictor_configuration == "Biome":
        keep.append("extra_layer")
    filled = joined.select(*keep).mapInPandas(
        _fill_batches(method, predictor_configuration, hyperparameters, params),
        GAPFILL_SCHEMA,
    )

    pass_df = passthrough.select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
        F.lit("passthrough").alias("status"),
        F.lit(0).alias("filled_px"),
        F.lit(0.0).alias("mean_cv_mae"),
    )
    return filled.unionByName(pass_df)


def fill_metrics(filled: DataFrame) -> DataFrame:
    """Per-image fill metrics + per-partition lineage (north_rule):
    which Spark partition produced each row, for resumable audit.
    Equivalent of the reference's Outputs/Metadata.json (S5,
    gapfiller.py:792-798) as a queryable table."""
    return filled.select(
        "image_id", "status", "filled_px", "mean_cv_mae",
        F.spark_partition_id().alias("partition_id"),
        F.current_timestamp().alias("computed_at"),
    )
