"""Similarity search over the embeddings table (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products via
  ``zip_with`` + ``aggregate`` (JVM-side, no Python); ranking by
  (rounded similarity desc, neighbor id asc) so results are
  deterministic and engine-portable.
- IVF-style bucketed ANN: the scale path — both sides of the join are
  first coarsely quantized (sign bits of the leading components), and
  only same-bucket pairs are scored. At 10^12 rows the bucket key is
  the shuffle key; probe cost per query drops by the bucket count.
  (An LSH random-hyperplane variant would need shared hyperplane
  randomness; sign-bucketing keeps the oracle SQL-expressible.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def _cast(df: DataFrame) -> DataFrame:
    # float32 → float64 once, so both engines do the arithmetic in f64
    return df.withColumn("emb", F.col("embedding").cast("array<double>"))


def cosine_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (excluding
    itself). ``queries``: (vec_id, embedding) subset."""
    q = _cast(queries).select(F.col("vec_id").alias("qid"), F.col("emb").alias("qe"))
    c = _cast(embeddings).select(F.col("vec_id").alias("nid"), F.col("emb").alias("ne"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 6).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "sim", "rank"))


def sign_bucket(emb_col, n_bits: int = 2):
    b = None
    for i in range(n_bits):
        bit = F.when(F.element_at(emb_col, i + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        b = bit if b is None else b * 2 + bit
    return b


def bucketed_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                  n_bits: int = 2) -> DataFrame:
    """ANN: candidates restricted to the query's sign-bucket — the
    equi-join pre-filter that makes the search linear at scale."""
    q = _cast(queries).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qe"),
        sign_bucket(F.col("emb"), n_bits).alias("bucket"))
    c = _cast(embeddings).select(
        F.col("vec_id").alias("nid"), F.col("emb").alias("ne"),
        sign_bucket(F.col("emb"), n_bits).alias("bucket"))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 6).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "sim", "rank"))
