"""Streaming Discretizator — the reference's time-grid bucketing
(J5/W1/W3) as a Structured Streaming query.

The reference is pure batch (SURVEY.md §2.10), but its
Discretizator's regular-grid bucket assignment with
nearest-to-centroid collision resolution is exactly the shape of a
watermarked tumbling-window aggregation. This module expresses it so
a live feed of arriving image rows lands on the same 12H grid the
batch operator produces:

- ``F.window(ts, '12 hours')`` = the reference's
  ``pd.date_range(freq='12H')`` buckets (timeseries.py:81-92).
  CAVEAT: ``F.window`` anchors buckets at the epoch while the batch
  operator anchors at each site's min-ts midnight — the two gridings
  coincide exactly iff the step divides 24 h (12H/6H/24H all do; an
  irregular step like 7H would need a per-site ``startTime``, which
  Spark only accepts as a constant — use the batch operator there);
- ``F.min_by(payload, struct(|ts − centroid|, ts))`` = the argmin
  nearest-to-centroid pick (timeseries.py:108-123) with the batch
  path's earliest-ts tie-break (argmin over the chronologically
  sorted bucket), computed incrementally as rows arrive;
- ``withWatermark`` bounds state for late layers (the batch reference
  has no lateness concept — files are all on disk — so any watermark
  ≥ the max observed lateness reproduces batch results).

Blank layers for empty buckets and the sequential temporal fills
(A8/A9) are inherently *complete-grid* operations, so they stay in
the batch layer: run ``operators.discretize`` over the landed grid
snapshot (the lambda handoff is one anti-join). Checked in
tests/test_streaming.py: the streaming grid equals the batch
bucketing bit-for-bit on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssgp_toolbox_spark.operators.discretize import parse_step


def streaming_bucket_assign(layers: DataFrame, timestep: str = "12H",
                            watermark: str = "24 hours") -> DataFrame:
    """``layers``: a *streaming* DataFrame with (site, ts, bytes, h,
    w, fmt). Returns one row per (site, window) with the
    nearest-to-centroid layer payload and the bucket's layer count —
    the streaming equivalent of the batch ``discretize`` resolution
    stage in 'None' averaging mode."""
    step_s = parse_step(timestep)
    if 86400 % step_s != 0:
        raise ValueError(
            f"streaming bucketing requires a step dividing 24h (got "
            f"{timestep!r}): F.window anchors at the epoch, the batch "
            "grid at each site's min-ts midnight — they only coincide "
            "for day-dividing steps. Use operators.discretize for "
            "irregular steps.")
    win = F.window(F.col("ts"), f"{step_s} seconds")
    centroid_us = (F.unix_micros(F.col("window.start").cast("timestamp"))
                   + F.lit(int(step_s * 1e6 / 2)).cast("long"))
    dist = F.abs(F.unix_micros(F.col("ts").cast("timestamp")) - centroid_us)
    return (
        layers.withWatermark("ts", watermark)
        .select("site", "ts", "bytes", "h", "w", "fmt", win.alias("window"))
        .withColumn("dist", dist)
        .groupBy("site", "window")
        .agg(
            # (dist, ts) struct ordering = batch argmin's
            # earliest-layer tie-break; min(h/w/fmt) instead of
            # first() for determinism (uniform per site anyway)
            F.min_by("bytes", F.struct("dist", "ts")).alias("bytes"),
            F.min("h").alias("h"), F.min("w").alias("w"),
            F.min("fmt").alias("fmt"),
            F.count("*").alias("n_layers"),
        )
        .select(
            "site",
            F.col("window.start").alias("bucket_start"),
            (F.col("window.start") + F.expr(f"interval {step_s // 2} seconds")
             ).alias("centroid"),
            "bytes", "h", "w", "fmt", "n_layers",
        )
    )
