"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every SQL-expressible operator of the engine
(SURVEY.md §2 mappings demonstrated on the TPC-H-ish harness tables,
plus the training-data pipeline functions on documents/embeddings);
``oracle_sql()`` carries the DuckDB-equivalent SQL. Raster operators
(gapfill, discretize, cellular automaton, tiling) are exercised on the
deterministic synthetic image table (generator.py) and registered as
rows-only checks — their exact-parity oracles live in tests/ as numpy
transcriptions of the reference.

Float policy: every floating aggregate is rounded (4-6 dp) in BOTH
engines; money sums go through DECIMAL(18,6) so the aggregation is
exact and engine-order-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(c):
    return F.col(c).cast("decimal(18,6)")


# --------------------------------------------------------------------
# relational operator demos (SURVEY.md §2 mappings on harness tables)
# --------------------------------------------------------------------


def q01_pricing_summary(spark, sf):
    """A1/A3/A6 groupBy-agg (TPC-H Q1 shape)."""
    li = _t(spark, sf, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")).cast("double"), 2).alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))).cast("double"), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    return out


def q02_topk_revenue(spark, sf):
    """O2 top-k: 10 highest-revenue orders."""
    li = _t(spark, sf, "lineitem")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,6)") - _dec("l_discount"))).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )
    return rev


def q03_region_revenue(spark, sf):
    """Equi-join chain + broadcast small dims (S3 mapping)."""
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(_dec("o_totalprice")).cast("double"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
        .orderBy("r_name")
    )


def q04_bitflag_decode(spark, sf):
    """F11/F12/C2: two-bit QC policy decode via bitwiseAND."""
    e = _t(spark, sf, "events")
    qc = F.col("event_id").bitwiseAND(F.lit(3))
    quality = (F.when(qc == 0, "ok").when(qc == 1, "gap")
               .when(qc == 2, "skip").otherwise("nodata"))
    return (e.select(quality.alias("quality"))
            .groupBy("quality").agg(F.count("*").alias("n"))
            .orderBy("quality"))


def q05_value_clamp(spark, sf):
    """F13 range clamp: out-of-range -> gap sentinel class."""
    e = _t(spark, sf, "events")
    flag = F.when(~F.col("value").between(5.0, 95.0), "gap").otherwise("valid")
    return (e.groupBy("event_type", flag.alias("flag"))
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("value"), 4).alias("avg_value"))
            .orderBy("event_type", "flag"))


def q06_viability_split(spark, sf):
    """F2/F3 branch split + unionByName recombine."""
    e = _t(spark, sf, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_err"),
    )
    viable = per_user.filter((F.col("n_events") > 5) & (F.col("n_err") > 0)) \
        .withColumn("branch", F.lit("viable"))
    passthrough = per_user.filter((F.col("n_events") > 5) & (F.col("n_err") == 0)) \
        .withColumn("branch", F.lit("passthrough"))
    return (viable.unionByName(passthrough)
            .groupBy("branch").agg(F.count("*").alias("n_users"),
                                   F.sum("n_events").alias("events"))
            .orderBy("branch"))


_BUCKET_ORIGIN = "2024-01-01 00:00:00"
_STEP = 43200  # 12H


def _bucket(col):
    return F.floor((F.unix_timestamp(col) - F.unix_timestamp(F.lit(_BUCKET_ORIGIN))) / _STEP).cast("int")


def q07_time_buckets(spark, sf):
    """J5/W1/A6: 12H tumbling grid incl. empty buckets (blank-layer
    analog) — grid generated declaratively via sequence+explode."""
    e = _t(spark, sf, "events")
    agg = e.groupBy(_bucket(F.col("ts")).alias("bucket")).agg(
        F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    bounds = e.agg(F.max(_bucket(F.col("ts"))).alias("mx"))
    grid = bounds.select(F.explode(F.sequence(F.lit(0), F.col("mx"))).alias("bucket"))
    return (grid.join(agg, "bucket", "left")
            .select("bucket",
                    F.coalesce("n", F.lit(0)).alias("n"),
                    F.coalesce("avg_value", F.lit(-100.0)).alias("avg_value"))
            .orderBy("bucket"))


def q08_nearest_to_centroid(spark, sf):
    """W3: per-bucket row nearest to the bucket centroid
    (microsecond-precision distances so ranks are engine-portable)."""
    e = _t(spark, sf, "events")
    b = _bucket(F.col("ts"))
    origin_us = F.unix_micros(F.lit(_BUCKET_ORIGIN).cast("timestamp"))
    centroid_us = origin_us + ((b + F.lit(0.5)) * _STEP * 1_000_000).cast("long")
    dist = F.abs(F.unix_micros(F.col("ts").cast("timestamp")) - centroid_us)
    w = Window.partitionBy(b).orderBy(dist, F.col("ts"), F.col("event_id"))
    return (e.withColumn("bucket", b).withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("bucket", "event_id",
                    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"))
            .orderBy("bucket"))


def q09_weighted_mean(spark, sf):
    """A7/W4: distance-rank weights n..1 per bucket, weighted mean."""
    e = _t(spark, sf, "events")
    b = _bucket(F.col("ts"))
    origin_us = F.unix_micros(F.lit(_BUCKET_ORIGIN).cast("timestamp"))
    centroid_us = origin_us + ((b + F.lit(0.5)) * _STEP * 1_000_000).cast("long")
    dist = F.abs(F.unix_micros(F.col("ts").cast("timestamp")) - centroid_us)
    w = Window.partitionBy("bucket")
    rnk = Window.partitionBy("bucket").orderBy(F.col("dist"), F.col("ts"), F.col("event_id"))
    df = (e.withColumn("bucket", b).withColumn("dist", dist)
          .withColumn("rank", F.row_number().over(rnk))
          .withColumn("n_in_bucket", F.count("*").over(w))
          .withColumn("weight", F.col("n_in_bucket") - F.col("rank") + 1))
    return (df.groupBy("bucket")
            .agg(F.round(F.sum(F.col("value") * F.col("weight")) / F.sum("weight"), 4).alias("wmean"),
                 F.count("*").alias("n"))
            .orderBy("bucket"))


def q10_amplitude(spark, sf):
    """A4: masked min/max/amplitude per group."""
    e = _t(spark, sf, "events")
    return (e.filter(F.col("value").between(5.0, 95.0))
            .groupBy("event_type")
            .agg(F.round(F.min("value"), 4).alias("vmin"),
                 F.round(F.max("value"), 4).alias("vmax"),
                 F.round(F.max("value") - F.min("value"), 4).alias("amplitude"))
            .orderBy("event_type"))


def q11_utm_zone(spark, sf):
    """C3: UTM EPSG code from lon/lat centroid arithmetic."""
    e = _t(spark, sf, "events")
    lon = (F.col("value") * 3.6) - 180.0
    lat = (F.col("user_id") % 180) - 90.0
    zone = (F.floor((lon + 180.0) / 6.0) % 60 + 1).cast("int")
    epsg = F.when(lat >= 0, zone + 32600).otherwise(zone + 32700)
    return (e.select(epsg.alias("epsg")).groupBy("epsg")
            .agg(F.count("*").alias("n")).orderBy("epsg"))


def q12_cell_index(spark, sf):
    """Tile index arithmetic (tiling.cell_expr) as plain columns."""
    from ssgp_toolbox_spark import tiling

    e = _t(spark, sf, "events")
    df = e.select(((F.col("value") * 3.6) - 180.0).alias("lon"),
                  ((F.col("user_id") % 180) - 90.0).cast("double").alias("lat"))
    return (df.select(tiling.cell_expr("lat", "lon", 5).alias("cell"))
            .groupBy("cell").agg(F.count("*").alias("n"))
            .orderBy("cell"))


def q13_sentinel_counts(spark, sf):
    """A1 sentinel counting as conditional aggregation."""
    e = _t(spark, sf, "events")
    return e.agg(
        F.sum(F.when(F.col("value") < 5.0, 1).otherwise(0)).alias("gap_like"),
        F.sum(F.when(F.col("value") > 95.0, 1).otherwise(0)).alias("skip_like"),
        F.sum(F.when(F.col("value").between(5.0, 95.0), 1).otherwise(0)).alias("valid_px"),
    )


# --------------------------------------------------------------------
# training-data pipeline functions
# --------------------------------------------------------------------


def d01_dedup_exact(spark, sf):
    from ssgp_toolbox_spark.functions import dedup

    return dedup.exact_dedup(_t(spark, sf, "documents")).orderBy("content_hash")


def d02_jaccard_pairs(spark, sf):
    from ssgp_toolbox_spark.functions import dedup

    return dedup.jaccard_pairs(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 100), k=3, threshold=0.05
    ).orderBy("a", "b")


def d03_minhash_lsh(spark, sf):
    from ssgp_toolbox_spark.functions import dedup

    return dedup.minhash_lsh_candidates(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 200),
        k=3, n_hashes=16, bands=8,
    ).orderBy("a", "b")


def d04_simhash(spark, sf):
    from ssgp_toolbox_spark.functions import dedup

    return dedup.simhash(
        _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    ).orderBy("doc_id")


def t01_token_stats(spark, sf):
    from ssgp_toolbox_spark.functions import text

    return text.token_stats(_t(spark, sf, "documents")).orderBy("doc_id")


def t02_lang_id(spark, sf):
    from ssgp_toolbox_spark.functions import text

    return text.lang_id(_t(spark, sf, "documents")).orderBy("doc_id")


def t03_fingerprint(spark, sf):
    from ssgp_toolbox_spark.functions import text

    return text.fingerprint(_t(spark, sf, "documents")).orderBy("doc_id")


def s01_cosine_topk(spark, sf):
    from ssgp_toolbox_spark.functions import simsearch

    emb = _t(spark, sf, "embeddings")
    return simsearch.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5) \
        .orderBy("qid", "rank")


def s02_bucketed_topk(spark, sf):
    from ssgp_toolbox_spark.functions import simsearch

    emb = _t(spark, sf, "embeddings")
    return simsearch.bucketed_topk(emb, emb.filter(F.col("vec_id") < 10), k=5) \
        .orderBy("qid", "rank")


# --------------------------------------------------------------------
# raster operators (rows-only checks: synthetic image table; exact
# parity vs the reference is asserted in tests/ against numpy oracles)
# --------------------------------------------------------------------


def _images(spark, n_history=6, n_inputs=2):
    from ssgp_toolbox_spark import generator
    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import stats

    return stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=n_history,
                            n_inputs=n_inputs)
    ))


def r01_nn_fill(spark, sf):
    from ssgp_toolbox_spark.operators import nn_fill

    imgs = _images(spark)
    return nn_fill.nn_fill(imgs.filter(F.col("role") == "input")) \
        .select("image_id", "status", "filled_px").orderBy("image_id")


def r02_gapfill_biome_knn(spark, sf):
    from ssgp_toolbox_spark.operators import gapfill

    out = gapfill.gapfill(_images(spark), method="Knn",
                          predictor_configuration="Biome",
                          hyperparameters="Custom", params={"n_neighbors": 5})
    return out.select("image_id", "status", "filled_px",
                      F.round("mean_cv_mae", 4).alias("mean_cv_mae")) \
        .orderBy("image_id")


def r03_discretize_weighted(spark, sf):
    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import discretize

    imgs = _images(spark, n_history=8, n_inputs=0)
    layers = imgs.filter(F.col("role") == "history")
    out = discretize.discretize(layers, "12H", averaging="weighted",
                                filling_method="median", n_neighbors=3)
    return out.select("site", "bucket", "n_layers",
                      F.date_format("centroid", "yyyyMMdd'T'HHmmss").alias("centroid_s")) \
        .orderBy("site", "bucket")


def r04_cellular_expand(spark, sf):
    from ssgp_toolbox_spark.operators import cellular

    out = cellular.cloud_expand(_images(spark), iters=2)
    return out.select("image_id", "expanded_px").orderBy("image_id")


def r06_tiled_gapfill(spark, sf):
    """10^12-scale path: cell co-partitioned halo-window kNN fill."""
    from ssgp_toolbox_spark.operators import tiled_gapfill

    out = tiled_gapfill.tiled_gapfill(_images(spark), tile=40, halo=30,
                                      params={"n_neighbors": 5})
    return out.select("image_id", "status", "filled_px").orderBy("image_id")


def r07_sequential_fill(spark, sf):
    """add_outputs=True chaining (driver loop of Spark jobs)."""
    from ssgp_toolbox_spark.operators import gapfill as gf

    out = gf.gapfill_sequential(_images(spark, n_history=4, n_inputs=2),
                                method="Knn",
                                predictor_configuration="Random",
                                hyperparameters="Custom",
                                params={"n_neighbors": 5})
    return out.select("image_id", "status", "filled_px").orderBy("image_id")


def r08_phash_dedup(spark, sf):
    """Perceptual-hash near-dup detection on the image table (the
    input_hint's phash column): hamming-close pairs. The corpus gets
    two planted near-duplicates (tiny valid-pixel perturbations) that
    the DCT hash must recover."""
    import numpy as np

    from ssgp_toolbox_spark import codecs as cx
    from ssgp_toolbox_spark import generator as gen
    from ssgp_toolbox_spark.sentinels import is_valid

    base = gen.make_layer("stp", 109, 62, 3, "history", 0.02)
    near = base.copy()
    near[is_valid(near)] += 0.01
    rows = [
        gen.image_row("stp", "input", "20300101T000000", base, cx.FMT_F64, 0),
        gen.image_row("stp", "input", "20300101T120000", near, cx.FMT_F64, 0),
    ]
    extra_df = spark.createDataFrame(rows, _images(spark).select(
        "image_id", "bytes", "w", "h", "fmt", "caption", "phash").schema)
    imgs = _images(spark).select("image_id", "phash").unionByName(
        extra_df.select("image_id", "phash"))
    a = imgs.select(F.col("image_id").alias("ia"), F.col("phash").alias("pa"))
    b = imgs.select(F.col("image_id").alias("ib"), F.col("phash").alias("pb"))
    pairs = (a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
             .withColumn("hamming", F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))))
             .filter(F.col("hamming") <= 8))
    return pairs.select("ia", "ib", "hamming").orderBy("ia", "ib")


def r05_multimodal_features(spark, sf):
    from ssgp_toolbox_spark.functions import multimodal

    imgs = _images(spark)
    return multimodal.extract_features(imgs).select(
        "image_id", "fmt", "n_bytes", F.round("mean_px", 4).alias("mean_px")
    ).orderBy("image_id")


def q14_ndvi_albedo(spark, sf):
    """Ingest-stage band math (S8/C5/C6/F13): NDVI + Liang albedo
    with clamp-to-gap, over synthetic bands derived from events."""
    from ssgp_toolbox_spark.functions import ingest

    e = _t(spark, sf, "events")
    red = F.col("value") / 100.0
    nir = (F.col("event_id") % 97).cast("double") / 96.0
    b = lambda i: ((F.col("value") * i) % 100.0) / 100.0
    df = e.select(
        F.round(ingest.ndvi(nir, red), 6).alias("ndvi"),
        F.round(ingest.broadband_albedo(b(1), b(2), b(3), b(4), b(5), b(7)), 6).alias("albedo"),
    )
    return df.agg(
        F.count(F.when(F.col("ndvi") == -100.0, 1)).alias("ndvi_clamped"),
        F.round(F.avg(F.when(F.col("ndvi") != -100.0, F.col("ndvi"))), 6).alias("ndvi_avg"),
        F.count(F.when(F.col("albedo") == -100.0, 1)).alias("albedo_clamped"),
        F.round(F.avg(F.when(F.col("albedo") != -100.0, F.col("albedo"))), 6).alias("albedo_avg"),
    )


def q15_qc_policy(spark, sf):
    """Two-bit QC policies 0 vs 1 (F12, MODIS_MOD_MYD_11.py:102-129)."""
    from ssgp_toolbox_spark.functions import ingest

    e = _t(spark, sf, "events")
    return (e.select(ingest.qc_two_bit(F.col("event_id"), 0).alias("lenient"),
                     ingest.qc_two_bit(F.col("event_id"), 1).alias("strict"))
            .groupBy("lenient", "strict").agg(F.count("*").alias("n"))
            .orderBy("lenient", "strict"))


# --------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: Biome-mode kNN gap fill of the synthetic image table
    (runs the full scan→stats→join→Arrow-fill pipeline); sf0.001
    harness tables are touched via q01 to prove the relational path."""
    q01_pricing_summary(spark, "/root/testdata/sf0.001").collect()
    return r02_gapfill_biome_knn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": q01_pricing_summary,
        "q02_topk_revenue": q02_topk_revenue,
        "q03_region_revenue": q03_region_revenue,
        "q04_bitflag_decode": q04_bitflag_decode,
        "q05_value_clamp": q05_value_clamp,
        "q06_viability_split": q06_viability_split,
        "q07_time_buckets": q07_time_buckets,
        "q08_nearest_to_centroid": q08_nearest_to_centroid,
        "q09_weighted_mean": q09_weighted_mean,
        "q10_amplitude": q10_amplitude,
        "q11_utm_zone": q11_utm_zone,
        "q12_cell_index": q12_cell_index,
        "q13_sentinel_counts": q13_sentinel_counts,
        "q14_ndvi_albedo": q14_ndvi_albedo,
        "q15_qc_policy": q15_qc_policy,
        "d01_dedup_exact": d01_dedup_exact,
        "d02_jaccard_pairs": d02_jaccard_pairs,
        "d03_minhash_lsh": d03_minhash_lsh,
        "d04_simhash": d04_simhash,
        "t01_token_stats": t01_token_stats,
        "t02_lang_id": t02_lang_id,
        "t03_fingerprint": t03_fingerprint,
        "s01_cosine_topk": s01_cosine_topk,
        "s02_bucketed_topk": s02_bucketed_topk,
        "r01_nn_fill": r01_nn_fill,
        "r02_gapfill_biome_knn": r02_gapfill_biome_knn,
        "r03_discretize_weighted": r03_discretize_weighted,
        "r04_cellular_expand": r04_cellular_expand,
        "r05_multimodal_features": r05_multimodal_features,
        "r06_tiled_gapfill": r06_tiled_gapfill,
        "r07_sequential_fill": r07_sequential_fill,
        "r08_phash_dedup": r08_phash_dedup,
    }


_H60 = "('0x' || substr(md5({x}), 1, 15))::BIGINT"


def oracle_sql() -> dict[str, str]:
    h60 = _H60
    shingle_cte = """
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents{flt}),
grams AS (
  SELECT doc_id,
         array_to_string(t[i + 1 : i + 3], ' ') AS shingle
  FROM toks, UNNEST(generate_series(0, greatest(len(t) - 3, 0))) AS u(i)
),
dsh AS (SELECT DISTINCT doc_id, shingle FROM grams)
"""
    return {
        "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS sum_disc_price,
  count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY 1, 2 ORDER BY 1, 2
""",
        "q02_topk_revenue": """
SELECT l_orderkey,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 2) AS revenue
FROM lineitem GROUP BY 1 ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
        "q03_region_revenue": """
SELECT r_name,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS revenue,
  count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1 ORDER BY 1
""",
        "q04_bitflag_decode": """
SELECT CASE event_id & 3 WHEN 0 THEN 'ok' WHEN 1 THEN 'gap'
       WHEN 2 THEN 'skip' ELSE 'nodata' END AS quality,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
""",
        "q05_value_clamp": """
SELECT event_type,
       CASE WHEN NOT (value BETWEEN 5.0 AND 95.0) THEN 'gap' ELSE 'valid' END AS flag,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "q06_viability_split": """
WITH per_user AS (
  SELECT user_id, count(*) AS n_events,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
  FROM events GROUP BY 1
), unioned AS (
  SELECT 'viable' AS branch, n_events FROM per_user WHERE n_events > 5 AND n_err > 0
  UNION ALL
  SELECT 'passthrough' AS branch, n_events FROM per_user WHERE n_events > 5 AND n_err = 0
)
SELECT branch, count(*) AS n_users, sum(n_events) AS events
FROM unioned GROUP BY 1 ORDER BY 1
""",
        "q07_time_buckets": """
WITH agg AS (
  SELECT CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 00:00:00') / 43200) AS INT) AS bucket,
         count(*) AS n, round(avg(value), 4) AS avg_value
  FROM events GROUP BY 1
), grid AS (
  SELECT unnest(generate_series(0, (SELECT max(bucket) FROM agg))) AS bucket
)
SELECT g.bucket AS bucket, coalesce(a.n, 0) AS n,
       coalesce(a.avg_value, -100.0) AS avg_value
FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket ORDER BY 1
""",
        "q08_nearest_to_centroid": """
WITH b AS (
  SELECT *, CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 00:00:00') / 43200) AS INT) AS bucket
  FROM events
), d AS (
  SELECT bucket, event_id, ts,
         abs(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')
             - CAST((bucket + 0.5) * 43200 * 1000000 AS BIGINT)) AS dist
  FROM b
)
SELECT bucket, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
FROM d QUALIFY row_number() OVER (PARTITION BY bucket ORDER BY dist, ts, event_id) = 1
ORDER BY bucket
""",
        "q09_weighted_mean": """
WITH b AS (
  SELECT value, event_id, ts,
         CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 00:00:00') / 43200) AS INT) AS bucket,
         abs(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01 00:00:00')
             - CAST((CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 00:00:00') / 43200) AS INT) + 0.5) * 43200 * 1000000 AS BIGINT)) AS dist
  FROM events
), r AS (
  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY dist, ts, event_id) AS rank,
         count(*) OVER (PARTITION BY bucket) AS n_in_bucket
  FROM b
)
SELECT bucket, round(sum(value * (n_in_bucket - rank + 1)) / sum(n_in_bucket - rank + 1), 4) AS wmean,
       count(*) AS n
FROM r GROUP BY 1 ORDER BY 1
""",
        "q10_amplitude": """
SELECT event_type, round(min(value), 4) AS vmin, round(max(value), 4) AS vmax,
       round(max(value) - min(value), 4) AS amplitude
FROM events WHERE value BETWEEN 5.0 AND 95.0 GROUP BY 1 ORDER BY 1
""",
        "q11_utm_zone": """
WITH g AS (
  SELECT (value * 3.6) - 180.0 AS lon,
         CAST(user_id % 180 AS DOUBLE) - 90.0 AS lat
  FROM events
)
SELECT CAST(CASE WHEN lat >= 0
       THEN (CAST(floor((lon + 180.0) / 6.0) AS BIGINT) % 60 + 1) + 32600
       ELSE (CAST(floor((lon + 180.0) / 6.0) AS BIGINT) % 60 + 1) + 32700 END AS INT) AS epsg,
       count(*) AS n
FROM g GROUP BY 1 ORDER BY 1
""",
        "q12_cell_index": """
WITH g AS (
  SELECT (value * 3.6) - 180.0 AS lon,
         CAST(user_id % 180 AS DOUBLE) - 90.0 AS lat
  FROM events
)
SELECT CAST(5 AS BIGINT) * (CAST(1 AS BIGINT) << 59)
     + CAST(least(31, greatest(0, floor((lat + 90.0) / 180.0 * 32))) AS BIGINT) * (CAST(1 AS BIGINT) << 30)
     + CAST(least(63, greatest(0, floor((lon + 180.0) / 360.0 * 64))) AS BIGINT) AS cell,
     count(*) AS n
FROM g GROUP BY 1 ORDER BY 1
""",
        "q13_sentinel_counts": """
SELECT sum(CASE WHEN value < 5.0 THEN 1 ELSE 0 END) AS gap_like,
       sum(CASE WHEN value > 95.0 THEN 1 ELSE 0 END) AS skip_like,
       sum(CASE WHEN value BETWEEN 5.0 AND 95.0 THEN 1 ELSE 0 END) AS valid_px
FROM events
""",
        "q14_ndvi_albedo": """
WITH bands AS (
  SELECT value / 100.0 AS red,
         CAST(event_id % 97 AS DOUBLE) / 96.0 AS nir,
         fmod(value * 1, 100.0) / 100.0 AS b1,
         fmod(value * 2, 100.0) / 100.0 AS b2,
         fmod(value * 3, 100.0) / 100.0 AS b3,
         fmod(value * 4, 100.0) / 100.0 AS b4,
         fmod(value * 5, 100.0) / 100.0 AS b5,
         fmod(value * 7, 100.0) / 100.0 AS b7
  FROM events
), calc AS (
  SELECT
    round(CASE WHEN (nir - red) / (nir + red) BETWEEN -1.0 AND 1.0
          THEN (nir - red) / (nir + red) ELSE -100.0 END, 6) AS ndvi,
    round(CASE WHEN 0.160*b1 + 0.291*b2 + 0.243*b3 + 0.116*b4 + 0.112*b5 + 0.081*b7 - 0.0015 BETWEEN 0.0 AND 1.0
          THEN 0.160*b1 + 0.291*b2 + 0.243*b3 + 0.116*b4 + 0.112*b5 + 0.081*b7 - 0.0015
          ELSE -100.0 END, 6) AS albedo
  FROM bands
)
SELECT count(CASE WHEN ndvi = -100.0 THEN 1 END) AS ndvi_clamped,
       round(avg(CASE WHEN ndvi != -100.0 THEN ndvi END), 6) AS ndvi_avg,
       count(CASE WHEN albedo = -100.0 THEN 1 END) AS albedo_clamped,
       round(avg(CASE WHEN albedo != -100.0 THEN albedo END), 6) AS albedo_avg
FROM calc
""",
        "q15_qc_policy": """
SELECT CASE event_id & 3 WHEN 0 THEN 'ok' WHEN 1 THEN 'ok'
       WHEN 2 THEN 'gap' ELSE 'nodata' END AS lenient,
       CASE event_id & 3 WHEN 0 THEN 'ok' WHEN 1 THEN 'gap'
       WHEN 2 THEN 'skip' ELSE 'nodata' END AS strict,
       count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
        "d01_dedup_exact": f"""
SELECT {h60.format(x='text')} AS content_hash,
       min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1
""",
        "d02_jaccard_pairs": f"""
WITH {shingle_cte.format(flt=' WHERE doc_id < 100')},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM dsh GROUP BY 1),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM dsh x JOIN dsh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT a, b, round(i / (sa.n_sh + sb.n_sh - i), 6) AS jaccard
FROM inter JOIN sizes sa ON a = sa.doc_id JOIN sizes sb ON b = sb.doc_id
WHERE i / (sa.n_sh + sb.n_sh - i) >= 0.05
ORDER BY 1, 2
""",
        "d03_minhash_lsh": f"""
WITH {shingle_cte.format(flt=' WHERE doc_id < 200')},
sig AS (
  SELECT doc_id,
  {', '.join(f"min({h60.format(x=chr(39) + 'seed' + str(i) + '|' + chr(39) + ' || shingle')}) AS mh{i}" for i in range(16))}
  FROM dsh GROUP BY doc_id
),
bands AS (
  {' UNION ALL '.join(
    'SELECT doc_id, ' + str(b) + ' AS band, '
    + h60.format(x="CAST(mh" + str(b * 2) + " AS VARCHAR) || ',' || CAST(mh" + str(b * 2 + 1) + " AS VARCHAR)")
    + ' AS bucket FROM sig' for b in range(8))}
)
SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
FROM bands x JOIN bands y ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id
ORDER BY 1, 2
""",
        "d04_simhash": f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t
  FROM documents WHERE doc_id < 100
), th AS (
  SELECT doc_id, {h60.format(x='t')} AS h FROM tok
), bits AS (
  SELECT doc_id,
  {', '.join(f"sum(((h >> {b}) & 1) * 2 - 1) AS s{b}" for b in range(60))}
  FROM th GROUP BY doc_id
)
SELECT doc_id,
  {' + '.join(f"(CASE WHEN s{b} > 0 THEN CAST(1 AS BIGINT) ELSE 0 END) * CAST({2 ** b} AS BIGINT)" for b in range(60))}
  AS simhash
FROM bits ORDER BY doc_id
""",
        "t01_token_stats": """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, len(toks) AS n_tokens,
  len(list_filter(toks, x -> length(x) > 5)) AS n_long_tokens,
  round(length(text) / len(toks), 6) AS avg_token_len,
  round(len(list_filter(toks, x -> x IN ('the','a','of','and','to'))) / len(toks), 6) AS stop_ratio
FROM t ORDER BY doc_id
""",
        "t02_lang_id": """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, lang,
    len(list_filter(toks, x -> x IN ('der','die','und'))) AS score_de,
    len(list_filter(toks, x -> x IN ('the','a','and'))) AS score_en,
    len(list_filter(toks, x -> x IN ('el','la','de'))) AS score_es,
    len(list_filter(toks, x -> x IN ('le','la','et'))) AS score_fr,
    len(list_filter(toks, x -> x IN ('de','le','he'))) AS score_zh
  FROM t
), ranked AS (
  SELECT doc_id, lang, l AS predicted_lang, CAST(sc AS INT) AS marker_hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, l) AS rn
  FROM s, (VALUES ('de'), ('en'), ('es'), ('fr'), ('zh')) AS langs(l),
  LATERAL (SELECT CASE l WHEN 'de' THEN score_de WHEN 'en' THEN score_en
           WHEN 'es' THEN score_es WHEN 'fr' THEN score_fr ELSE score_zh END AS sc)
)
SELECT doc_id, lang, predicted_lang, marker_hits FROM ranked WHERE rn = 1 ORDER BY doc_id
""",
        "t03_fingerprint": f"""
WITH toks AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, text, array_to_string(t[i + 1 : i + 8], ' ') AS gram
  FROM toks, UNNEST(generate_series(0, greatest(len(t) - 8, 0))) AS u(i)
)
SELECT doc_id, min({h60.format(x='gram')}) AS fingerprint,
       min({h60.format(x='text')}) AS content_hash
FROM grams GROUP BY doc_id ORDER BY doc_id
""",
        "s01_cosine_topk": """
WITH q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS nid, CAST(embedding AS DOUBLE[]) AS ne FROM embeddings),
scored AS (
  SELECT qid, nid,
    round(list_dot_product(qe, ne) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))), 6) AS sim
  FROM q CROSS JOIN c WHERE qid != nid
)
SELECT qid, nid, sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY qid, rank
""",
        "s02_bucketed_topk": """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END) * 2
    + (CASE WHEN embedding[2] > 0 THEN 1 ELSE 0 END) AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS qid, emb AS qe, bucket FROM e WHERE vec_id < 10),
c AS (SELECT vec_id AS nid, emb AS ne, bucket FROM e),
scored AS (
  SELECT qid, nid,
    round(list_dot_product(qe, ne) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ne, ne))), 6) AS sim
  FROM q JOIN c USING (bucket) WHERE qid != nid
)
SELECT qid, nid, sim, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank
  FROM scored
) WHERE rank <= 5 ORDER BY qid, rank
""",
    }
