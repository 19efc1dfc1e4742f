"""Similarity search over the embeddings table (array<float>).

- brute-force cosine top-k: the exactness baseline. Dot products via
  ``zip_with`` + ``aggregate`` (JVM-side, no Python); ranking by
  (rounded similarity desc, neighbor id asc) so results are
  deterministic and engine-portable.
- the ANN family, all with seeded-hyperplane randomness whose 6dp
  literals embed identically in the Spark plan and the DuckDB oracle:
  * ``bucketed_topk`` — single-table multi-bit signature: maximal
    pruning, no recall bar (dedup-style prefilter).
  * ``lsh_topk`` — multi-table random-hyperplane LSH: the recall
    path; candidates = union over tables, shuffle key (table,bucket).
  * ``ivf_topk`` — coarse quantizer (declarative unrolled Lloyd) +
    n_probe nearest cells; broadcast centroid table, cell-local scan.
  At 10^12 rows the bucket/cell key is the shuffle key; probe cost
  per query drops by the bucket count.
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
    """Component-sign bucket (leading ``n_bits`` components). Kept
    only as the trivially-SQL-portable toy key; ``bucketed_topk`` uses
    seeded hyperplane signatures (``lsh_table_keys``) instead."""
    b = None
    for i in range(n_bits):
        bit = F.when(F.element_at(emb_col, i + 1) > 0, F.lit(1)).otherwise(F.lit(0))
        b = bit if b is None else b * 2 + bit
    return b


def hyperplanes(n_bits: int = 16, dim: int = 64, seed: int = 7):
    """Seeded random hyperplanes, rounded to 6dp so the same literal
    constants embed exactly in both the Spark plan and the DuckDB
    oracle SQL."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).round(6)


def lsh_table_keys(emb_col, planes, bits_per_table: int, n_tables: int):
    """Per-table random-hyperplane bucket keys: table t's key packs
    the sign bits of planes [t·b, (t+1)·b). Pure Catalyst (zip_with +
    aggregate per plane) — no Python. Returns an array<int> of
    ``n_tables`` keys."""
    keys = []
    for t in range(n_tables):
        key = None
        for j in range(bits_per_table):
            h = planes[t * bits_per_table + j]
            dot = F.aggregate(
                F.zip_with(emb_col, F.array(*[F.lit(float(v)) for v in h]),
                           lambda x, y: x * y),
                F.lit(0.0), lambda acc, v: acc + v)
            bit = F.when(dot > 0, F.lit(1)).otherwise(F.lit(0))
            key = bit if key is None else key * 2 + bit
        keys.append(key)
    return F.array(*keys)


def lsh_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             bits_per_table: int = 3, n_tables: int = 8,
             seed: int = 7) -> DataFrame:
    """ANN via classic multi-table random-hyperplane LSH: ``n_tables``
    independent ``bits_per_table``-bit signatures; candidates = rows
    sharing ANY table's bucket with the query; exact cosine rank on
    candidates only.

    The 100 TB shape: signatures are one JVM-side projection, the only
    shuffle keys on (table, bucket), fan-out is n_tables× (constant),
    and scoring touches the candidate union instead of the corpus —
    linear, no crossJoin. Recall/pruning trade is corpus-dependent:
    bench.py measures recall@5 vs the brute s01 baseline AND the
    candidate fraction. On the synthetic harness embeddings
    (near-orthogonal, top-1 cosine ≈ 0.4 — a worst case for LSH) the
    defaults measure recall ≈ 0.9 at candidate fraction ≈ 0.66;
    clustered real-world embeddings prune far harder at the same
    recall (raise bits_per_table as neighbor similarity rises)."""
    planes = hyperplanes(bits_per_table * n_tables, seed=seed)
    keys = lambda col: lsh_table_keys(col, planes, bits_per_table, n_tables)
    c = (_cast(embeddings)
         .select(F.col("vec_id").alias("nid"), F.col("emb").alias("ne"),
                 F.posexplode(keys(F.col("emb"))).alias("table", "bucket")))
    q = (_cast(queries)
         .select(F.col("vec_id").alias("qid"), F.col("emb").alias("qe"),
                 F.posexplode(keys(F.col("emb"))).alias("table", "bucket")))
    scored = (
        q.join(c, ["table", "bucket"])
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid",
                F.round(_cosine(F.col("qe"), F.col("ne")), 6).alias("sim"))
        .distinct()  # a pair may collide in several tables
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "sim", "rank"))


def bucketed_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                  n_bits: int = 6, seed: int = 7) -> DataFrame:
    """Single-table coarse ANN: one seeded ``n_bits``-bit random-
    hyperplane signature (2^n_bits buckets); candidates = rows in the
    query's bucket only. This is the maximal-pruning / minimal-recall
    end of the family — one equi-join, no fan-out, probe cost
    ~1/2^n_bits of the corpus — for dedup-style prefilters where a
    miss is cheap. It does NOT hold a recall bar: a single table's
    collision probability decays with (1 - θ/π)^n_bits, so use
    ``lsh_topk`` (multi-table union) or ``ivf_topk`` (coarse
    quantizer + probes) when recall matters. Signature reuses
    ``lsh_table_keys`` with one table so Spark and the SQL oracle
    share the exact hyperplane literals."""
    planes = hyperplanes(n_bits, seed=seed)
    key = lambda col: F.element_at(lsh_table_keys(col, planes, n_bits, 1), 1)
    q = _cast(queries).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qe"),
        key(F.col("emb")).alias("bucket"))
    c = _cast(embeddings).select(
        F.col("vec_id").alias("nid"), F.col("emb").alias("ne"),
        key(F.col("emb")).alias("bucket"))
    scored = (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid", F.round(_cosine(F.col("qe"), F.col("ne")), 6).alias("sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "sim", "rank"))


def _normalize(df: DataFrame, vec_col: str = "emb") -> DataFrame:
    norm = F.sqrt(F.aggregate(F.transform(F.col(vec_col), lambda x: x * x),
                              F.lit(0.0), lambda a, v: a + v))
    return df.withColumn(vec_col, F.transform(
        F.col(vec_col), lambda x: F.round(x / norm, 6)))


def _centroid_dist(vec, cvec):
    # squared L2 on normalized vectors (monotone in cosine), rounded so
    # both engines argmin identical values
    return F.round(F.aggregate(F.zip_with(vec, cvec, lambda a, b: (a - b) * (a - b)),
                               F.lit(0.0), lambda a, v: a + v), 6)


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_cells: int = 16, lloyd_iters: int = 2,
             n_probe: int = 4, train_stride: int = 1) -> DataFrame:
    """IVF ANN — the coarse-quantizer counterpart of ``lsh_topk``.

    The inverted-file index is built DECLARATIVELY so the whole
    operator (training included) is one Catalyst plan with an exact
    SQL mirror: centroids initialize from the ``n_cells`` lowest
    vec_ids, then ``lloyd_iters`` unrolled Lloyd rounds (assign =
    argmin rounded L2 on normalized vectors with (dist, cid)
    tie-break; update = per-dimension mean via posexplode + group-by,
    re-rounded to 6dp) — every step deterministic and
    engine-portable. Search probes the query's ``n_probe`` nearest
    cells and exact-cosine-ranks only those cells' vectors.

    At 10^12 rows: training runs on a sample — ``train_stride`` s
    trains the Lloyd rounds on the deterministic 1/s subsample
    ``vec_id % s == 0`` (every vector is still ASSIGNED and
    searchable; only centroid fitting is subsampled, the standard IVF
    practice). Assignment is one broadcast join + narrow map
    (centroid table is tiny), the index is a (cell → vectors)
    partitioning, and probe cost is n_probe/n_cells of the corpus.
    Bench measures recall vs s01."""
    e = _normalize(_cast(embeddings).select(
        F.col("vec_id").alias("nid"), F.col("emb")))
    train = e.filter(F.col("nid") % train_stride == 0) \
        if train_stride > 1 else e
    # seeds: the n_cells lowest vec_ids regardless of id values
    # (orderBy+limit = distributed TakeOrdered, no global sort
    # shuffle); cid is their dense 0..n_cells-1 rank. Corpus must have
    # >= n_cells rows or the index has fewer cells than requested.
    wseed = Window.orderBy("nid")
    cents = (train.orderBy("nid").limit(n_cells)
             .select((F.row_number().over(wseed) - 1).cast("int").alias("cid"),
                     F.col("emb").alias("cvec")))
    for _ in range(lloyd_iters):
        d = train.crossJoin(F.broadcast(cents)) \
            .withColumn("dist", _centroid_dist(F.col("emb"), F.col("cvec")))
        w = Window.partitionBy("nid").orderBy("dist", "cid")
        assign = (d.withColumn("rn", F.row_number().over(w))
                  .filter(F.col("rn") == 1).select("nid", "cid", "emb"))
        dims = assign.select("cid", F.posexplode("emb").alias("pos", "val"))
        means = dims.groupBy("cid", "pos").agg(F.avg("val").alias("mv"))
        new = (means.groupBy("cid")
               .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pm"))
               .select("cid", F.transform(F.col("pm"), lambda s: F.round(s["mv"], 6))
                       .alias("nvec")))
        # empty-cell guard: a cell whose membership dropped to zero
        # keeps its previous centroid, so the index never silently
        # shrinks below n_cells
        cents = (cents.join(new, "cid", "left")
                 .select("cid", F.coalesce("nvec", "cvec").alias("cvec")))
    # final assignment with the trained centroids
    d = e.crossJoin(F.broadcast(cents)) \
        .withColumn("dist", _centroid_dist(F.col("emb"), F.col("cvec")))
    w = Window.partitionBy("nid").orderBy("dist", "cid")
    index = (d.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") == 1).select("nid", "cid", F.col("emb").alias("ne")))

    q = _normalize(_cast(queries).select(F.col("vec_id").alias("qid"), F.col("emb"))) \
        .select("qid", F.col("emb").alias("qe"))
    qd = q.crossJoin(F.broadcast(cents)) \
        .withColumn("dist", _centroid_dist(F.col("qe"), F.col("cvec")))
    wq = Window.partitionBy("qid").orderBy("dist", "cid")
    probes = (qd.withColumn("rn", F.row_number().over(wq))
              .filter(F.col("rn") <= n_probe).select("qid", "qe", "cid"))

    scored = (probes.join(index, "cid")
              .filter(F.col("qid") != F.col("nid"))
              .select("qid", "nid",
                      F.round(_cosine(F.col("qe"), F.col("ne")), 6).alias("sim")))
    wr = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid"))
    return (scored.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select("qid", "nid", "sim", "rank"))
