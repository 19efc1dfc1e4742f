"""Cloud-shadow expansion operator (reference preparator stage,
common_functions.py:34-193) — per image, zero shuffle.

The automaton's 10 iterations are *within one image* (no cross-image
dependency), so the whole fixed-point loop runs inside a single
mapInPandas call per image: plan = scan → join per-site biome layer →
Arrow-batched map. (A tiled variant for huge rasters would need one
halo-exchange shuffle per iteration — 10 shuffles — which is why the
per-image path is preferred whenever a raster fits an Arrow batch.)

Determinism: seeded per image_id (CRC32), like the gapfill operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.kernels import cellular as ca
from ssgp_toolbox_spark.operators.gapfill import _stable_seed, pack_extra
from ssgp_toolbox_spark.sentinels import (DEFAULT_SENTINELS, Sentinels,
                                          check_payload_fmt,
                                          resolve_key_values)

CA_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("expanded_px", T.IntegerType()),
])


def _ca_batches(iters: int, sv: Sentinels = DEFAULT_SENTINELS):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in CA_SCHEMA.fieldNames()}
            for row in pdf.itertuples(index=False):
                check_payload_fmt(row.fmt, sv)
                m = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                e = row.extra_layer
                biome = codecs.decode(e["bytes"], int(e["h"]), int(e["w"]), e["fmt"])
                before = int((m == sv.gap).sum())
                expanded = ca.cellular_expand(
                    m, biome, iters=iters, seed=_stable_seed(row.image_id),
                    gap=sv.gap,
                )
                out["image_id"].append(row.image_id)
                out["bytes"].append(codecs.encode(expanded, row.fmt))
                out["w"].append(row.w)
                out["h"].append(row.h)
                out["fmt"].append(row.fmt)
                out["caption"].append(row.caption)
                out["phash"].append(
                    codecs.phash64(expanded, sv.gap, sv.skip, sv.nodata))
                out["expanded_px"].append(
                    int((expanded == sv.gap).sum()) - before)
            yield pd.DataFrame(out)

    return fn


def cloud_expand(images: DataFrame, iters: int = 10,
                 key_values: dict | None = None) -> DataFrame:
    """Expand cloud (gap) boundaries of every ``role='input'`` image
    using the site's biome layer. ``key_values``: sentinel override
    (only the gap code matters to the automaton)."""
    sv = resolve_key_values(key_values)
    inputs = images.filter(F.col("role") == "input")
    extra = pack_extra(images.filter(F.col("role") == "extra"))
    joined = inputs.join(extra, "site")
    keep = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash", "extra_layer"]
    return joined.select(*keep).mapInPandas(_ca_batches(iters, sv), CA_SCHEMA)
