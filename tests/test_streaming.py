"""Streaming Discretizator: the watermarked tumbling-window bucket
assignment must land the same layers on the same grid as the batch
operator ('None' averaging)."""

import os
from datetime import datetime

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.streaming import discretize_stream

H, W = 6, 5

SCHEMA = T.StructType([
    T.StructField("site", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def _mk(seed):
    return 290 + np.random.default_rng(seed).normal(0, 3, (H, W))


def _rows():
    stamps = [
        datetime(2019, 9, 1, 1, 0), datetime(2019, 9, 1, 5, 0),
        datetime(2019, 9, 1, 13, 0), datetime(2019, 9, 2, 2, 0),
        datetime(2019, 9, 2, 3, 30),
    ]
    return [("s1", t, codecs.encode(_mk(i), codecs.FMT_F64), H, W, codecs.FMT_F64)
            for i, t in enumerate(stamps)]


def test_streaming_buckets_equal_batch(spark, tmp_path):
    rows = _rows()
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # two file drops = two micro-batches
    spark.createDataFrame(rows[:3], SCHEMA).write.parquet(src + "/part1")
    spark.createDataFrame(rows[3:], SCHEMA).write.parquet(src + "/part2")

    stream = spark.readStream.schema(SCHEMA).option(
        "recursiveFileLookup", "true").parquet(src)
    out = discretize_stream.streaming_bucket_assign(stream, "12H")
    q = (out.writeStream.format("memory").queryName("grid_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["site"], r["bucket_start"]): (bytes(r["bytes"]), r["n_layers"])
           for r in spark.sql("select * from grid_stream").collect()}

    # expected, computed in plain python: bucket by 12h windows from
    # the epoch, nearest-to-centroid pick, earliest wins ties
    from collections import defaultdict

    exp = {}

    buckets = defaultdict(list)
    for site, ts, payload, h, w, fmt in rows:
        epoch = datetime(1970, 1, 1)
        b = int((ts - epoch).total_seconds() // 43200)
        buckets[(site, b)].append((ts, payload))
    for (site, b), layers in buckets.items():
        start = datetime(1970, 1, 1).timestamp() + b * 43200
        centroid = start + 21600
        best = min(layers, key=lambda x: (abs(x[0].timestamp() - centroid),
                                          x[0].timestamp()))
        key = (site, datetime.utcfromtimestamp(start))
        exp[key] = (bytes(best[1]), len(layers))

    assert got == exp


def test_stateful_phash_dedup(spark, tmp_path):
    """applyInPandasWithState: state (seen phashes) persists across
    micro-batches; re-delivered and hamming-close images flagged."""
    from ssgp_toolbox_spark.streaming import dedup_stream

    schema = T.StructType([
        T.StructField("site", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("image_id", T.StringType()),
        T.StructField("phash", T.LongType()),
    ])
    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    t0 = datetime(2024, 1, 1)
    # batch 1: two distinct images
    spark.createDataFrame([
        ("s1", t0, "img-a", 1000), ("s1", t0, "img-b", 2000),
    ], schema).coalesce(1).write.parquet(src + "/b1")
    # batch 2: exact redelivery of img-a + near-dup of b (hamming 1) + new
    spark.createDataFrame([
        ("s1", t0, "img-a2", 1000), ("s1", t0, "img-b2", 2001),
        ("s1", t0, "img-c", 5000),
    ], schema).coalesce(1).write.parquet(src + "/b2")

    # one file per trigger -> the two drops really are two
    # micro-batches, so state persistence across batches is exercised
    stream = (spark.readStream.schema(schema)
              .option("recursiveFileLookup", "true")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = dedup_stream.streaming_phash_dedup(
        stream.withWatermark("ts", "1 hour"), hamming_radius=2)
    q = (out.writeStream.format("memory").queryName("dedup_stream")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["image_id"]: r["is_new"]
           for r in spark.sql("select * from dedup_stream").collect()}
    assert got["img-a"] and got["img-b"] and got["img-c"]
    assert not got["img-a2"]          # exact redelivery dropped
    assert not got["img-b2"]          # hamming-1 near-dup dropped


def test_streaming_swath_ingest_equals_batch(spark, tmp_path):
    """The swath ingest operator is a stateless mapInPandas, so the
    SAME code runs under readStream: granules arriving as a stream
    produce exactly the batch rows (continuous-ingest story for the
    north_rule pipeline)."""
    from ssgp_toolbox_spark import generator
    from ssgp_toolbox_spark.operators import swath_ingest as SW

    src = str(tmp_path / "swaths")
    batch_df = generator.swath_archives_df(spark, sites=("stp",), n=2)
    batch_df.write.parquet(src)
    expected = {r["image_id"]: (r["phash"], r["w"], r["h"]) for r in
                SW.ingest_s3_archives(batch_df, generator.SWATH_EXTENT,
                                      *generator.SWATH_RES).collect()}

    stream = spark.readStream.schema(SW.SWATH_SCHEMA).parquet(src)
    out = SW.ingest_s3_archives(stream, generator.SWATH_EXTENT,
                                *generator.SWATH_RES)
    q = (out.writeStream.format("memory").queryName("swath_ingest_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["image_id"]: (r["phash"], r["w"], r["h"]) for r in
           spark.sql("SELECT * FROM swath_ingest_t").collect()}
    assert got == expected


def test_streaming_gapfill_equals_batch(spark, tmp_path):
    """Stream-static gapfill: inputs arriving as a stream against a
    static packed history produce bit-identical rows to the batch
    operator (same kernel closure, same per-image seeds)."""
    from ssgp_toolbox_spark import generator
    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import gapfill, stats
    from ssgp_toolbox_spark.streaming import gapfill_stream

    df = img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=6, n_inputs=2))
    kw = dict(method="Knn", predictor_configuration="Biome",
              hyperparameters="Custom", params={"n_neighbors": 5})
    batch = {r["image_id"]: (r["phash"], r["status"], r["filled_px"])
             for r in gapfill.gapfill(stats.with_stats(df), **kw).collect()}

    src = str(tmp_path / "inputs")
    inputs = df.filter(F.col("role") == "input")
    inputs.write.parquet(src)
    stream = (spark.readStream.schema(inputs.schema).parquet(src))
    out = gapfill_stream.gapfill_stream(stream, df, **kw)
    q = (out.writeStream.format("memory").queryName("gapfill_stream_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {r["image_id"]: (r["phash"], r["status"], r["filled_px"])
           for r in spark.sql("SELECT * FROM gapfill_stream_t").collect()}
    assert got == batch
