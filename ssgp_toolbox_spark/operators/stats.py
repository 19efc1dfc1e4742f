"""Decode-time per-image sentinel statistics columns.

The reference counts sentinels eagerly per image (gapfiller.py:102-104,
856-863). Here the counts become *columns* computed once in a single
Arrow-vectorized pass, so every downstream viability predicate
(F2 ``valid_px > 101``, F3 ``gap_count == 0``, F4 history quality)
is a plain Catalyst filter — pushed down, partition-prunable and
usable for Iceberg/parquet min-max pruning at 100 TB without touching
pixel payloads again.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.sentinels import (check_payload_fmt,
                                          resolve_key_values, sentinel_stats)

_STATS_SCHEMA = T.StructType([
    T.StructField("gap_count", T.IntegerType()),
    T.StructField("skip_count", T.IntegerType()),
    T.StructField("nodata_count", T.IntegerType()),
    T.StructField("valid_px", T.IntegerType()),
])


def _stats_udf(sv):
    @F.pandas_udf(_STATS_SCHEMA)
    def fn(payload: pd.Series, h: pd.Series, w: pd.Series,
           fmt: pd.Series) -> pd.DataFrame:
        rows = []
        for b, hh, ww, f in zip(payload, h, w, fmt):
            # a custom encoding on a lossy payload would count the
            # DEFAULT codes → gap_count=0 → every image routed to
            # passthrough, bypassing the fill operators' own guard
            check_payload_fmt(f, sv)
            rows.append(sentinel_stats(codecs.decode(b, int(hh), int(ww), f),
                                       sv.gap, sv.skip, sv.nodata))
        return pd.DataFrame(rows)

    return fn


def with_stats(df: DataFrame, key_values: dict | None = None) -> DataFrame:
    """Adds gap_count / skip_count / nodata_count / valid_px columns.

    ``key_values``: optional sentinel override (reference
    gapfiller.py:805/826-828 dict shape) — counts are then computed
    against that encoding, keeping every downstream viability
    predicate consistent."""
    s = _stats_udf(resolve_key_values(key_values))("bytes", "h", "w", "fmt")
    return df.withColumn("_s", s).select("*", "_s.*").drop("_s")


def viability_filters(df: DataFrame, min_valid: int = 101):
    """(viable, passthrough, nonviable) split per reference EP1:
    F2 skip image when valid_px <= 101 (gapfiller.py:856-861),
    F3 copy-through when gap_count == 0 (gapfiller.py:862-873).
    Branches are recombined by the caller with unionByName."""
    viable = df.filter((F.col("valid_px") > min_valid) & (F.col("gap_count") > 0))
    passthrough = df.filter((F.col("valid_px") > min_valid) & (F.col("gap_count") == 0))
    nonviable = df.filter(F.col("valid_px") <= min_valid)
    return viable, passthrough, nonviable
