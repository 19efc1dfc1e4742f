"""Stage-level profiling harness for the optimization round (guide
§1: measure first, noop-sink isolation). NOT the frozen driver bench —
bench.py is untouched; numbers here are cited in OPTIMIZATION_r06.md.

Usage: python bench_extra.py <probe> [probe...]
Probes: s05, s06, r18, r17, r16, d07, gapfill, jobs
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

T: dict[str, float] = {}


def tic(name):
    T.setdefault(name, 0.0)
    return time.time()


def toc(name, t0):
    T[name] = T.get(name, 0.0) + (time.time() - t0)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def probe_s05(spark):
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark.functions import simsearch as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    spark.sparkContext.setJobDescription("s05: normalize+seeds")
    t0 = tic("s05.normalize_seeds")
    e = S._normalize(S._cast(emb).select(F.col("vec_id").alias("nid"), F.col("emb")))
    from pyspark.sql.window import Window
    wseed = Window.orderBy("nid")
    seed_rows = (e.orderBy("nid").limit(16)
                 .select((F.row_number().over(wseed) - 1).cast("int").alias("cid"),
                         F.col("emb").alias("cvec")).collect())
    cents = [list(r["cvec"]) for r in sorted(seed_rows, key=lambda r: r["cid"])]
    toc("s05.normalize_seeds", t0)

    for it in range(2):
        spark.sparkContext.setJobDescription(f"s05: lloyd iter {it}")
        t0 = tic(f"s05.lloyd_{it}")
        assign = S.ivf_assign(e, cents)
        dims = assign.select("cid", F.posexplode("emb").alias("pos", "val"))
        means = dims.groupBy("cid", "pos").agg(F.avg("val").alias("mv"))
        new_rows = (means.groupBy("cid")
                    .agg(F.array_sort(F.collect_list(F.struct("pos", "mv"))).alias("pm"))
                    .select("cid", F.transform(F.col("pm"), lambda s: F.round(s["mv"], 6)).alias("nvec"))
                    .collect())
        updated = {int(r["cid"]): list(r["nvec"]) for r in new_rows}
        cents = [updated.get(cid, old) for cid, old in enumerate(cents)]
        toc(f"s05.lloyd_{it}", t0)

    import numpy as np
    spark.sparkContext.setJobDescription("s05: pq sample+codebooks")
    t0 = tic("s05.sample_codebooks")
    C = np.ascontiguousarray(cents, dtype=np.float64)
    sample_rows = e.orderBy("nid").limit(100_000).collect()
    X = np.array([list(r["emb"]) for r in sample_rows], dtype=np.float64)
    R = X - C[S._pq_assign_cells(X, C)]
    books = S._pq_train_codebooks(R, 8, 16)
    toc("s05.sample_codebooks", t0)
    model = {"cents": cents, "books": books, "max_closure_cells": 4096,
             "packed": False}

    spark.sparkContext.setJobDescription("s05: encode noop")
    t0 = tic("s05.encode")
    enc = S._pq_encode_udf(S._ship_model(model))(F.col("emb"))
    index = e.select("nid", enc.alias("_e")) \
        .select("nid", F.col("_e.cid").alias("cid"), F.col("_e.codes").alias("codes"))
    noop(index)
    toc("s05.encode", t0)

    spark.sparkContext.setJobDescription("s05: search")
    t0 = tic("s05.search")
    out = S.ivf_pq_search(index, emb, emb.filter(F.col("vec_id") < 10), model,
                          k=5, n_probe=4, rerank=32)
    noop(out)
    toc("s05.search", t0)

    spark.sparkContext.setJobDescription("s05: full query (count)")
    t0 = tic("s05.full_query")
    S.ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=16,
                  lloyd_iters=2, n_probe=4, m=8, pq_ks=16, rerank=32).count()
    toc("s05.full_query", t0)


def probe_s06(spark):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark.functions import simsearch as S

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t0 = tic("s06.build")
    index, model = S.ivf_pq_build(emb, n_cells=16, lloyd_iters=2, m=8, pq_ks=16)
    noop(index)
    toc("s06.build", t0)

    import tempfile, shutil, uuid
    src = tempfile.mkdtemp(prefix="p_s06_src_")
    out = tempfile.mkdtemp(prefix="p_s06_out_")
    try:
        t0 = tic("s06.write_drops")
        for b, cond in ((1, "vec_id < 5"), (2, "vec_id >= 5 AND vec_id < 10")):
            emb.filter(cond).coalesce(1).write.parquet(os.path.join(src, f"b{b}"))
        toc("s06.write_drops", t0)

        t0 = tic("s06.stream")
        from ssgp_toolbox_spark.streaming import simsearch_stream
        index2, model2 = S.ivf_pq_build(emb, n_cells=16, lloyd_iters=2, m=8, pq_ks=16)
        stream = (spark.readStream.schema(emb.schema)
                  .option("recursiveFileLookup", "true")
                  .option("maxFilesPerTrigger", 1).parquet(src))

        def sink(res, batch_id):
            res.write.mode("append").parquet(out)

        q = (simsearch_stream.streaming_ann_serve(
                stream, index2, emb, model2, sink, k=5, n_probe=4, rerank=32)
             .queryName("p_s06_" + uuid.uuid4().hex[:8])
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        toc("s06.stream", t0)

        t0 = tic("s06.read_out")
        spark.read.parquet(out).collect()
        toc("s06.read_out", t0)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)

    t0 = tic("s06.full_query")
    entry.s06_streaming_ann_serve(spark, SF_DIR).count()
    toc("s06.full_query", t0)


def probe_one_batch_search(spark):
    """Cost of ONE search_batch call (the per-micro-batch constant)."""
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark.functions import simsearch as S
    from ssgp_toolbox_spark.streaming import simsearch_stream as SS

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    index, model = S.ivf_pq_build(emb, n_cells=16, lloyd_iters=2, m=8, pq_ks=16)
    noop(index)
    batch = emb.filter("vec_id < 5")
    for i in range(3):
        t0 = tic(f"batch_search.run{i}")
        noop(SS.search_batch(batch, index, emb, model, k=5, n_probe=4, rerank=32))
        toc(f"batch_search.run{i}", t0)


def probe_r18(spark):
    import __spark_entry__ as entry

    for i in range(2):
        t0 = tic(f"r18.full_{i}")
        entry.r18_streaming_dedup(spark, SF_DIR).count()
        toc(f"r18.full_{i}", t0)


def probe_r17(spark):
    import __spark_entry__ as entry

    t0 = tic("r17.full")
    entry.r17_streaming_discretize(spark, SF_DIR).count()
    toc("r17.full", t0)


def probe_r16(spark):
    import __spark_entry__ as entry

    t0 = tic("r16.full")
    entry.r16_streaming_gapfill(spark, SF_DIR).count()
    toc("r16.full", t0)


def probe_d07(spark):
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark.functions import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(F.col("doc_id") < 200)
    t0 = tic("d07.pairs_only")
    pairs = dedup.minhash_lsh_candidates(docs, k=3, n_hashes=16, bands=8)
    noop(pairs)
    toc("d07.pairs_only", t0)

    t0 = tic("d07.star")
    dedup.cluster_pairs_star(pairs, vertices=docs.select("doc_id")).count()
    toc("d07.star", t0)


def probe_gapfill(spark):
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark import generator
    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import deep_gapfill, gapfill, nn_fill, stats

    imgs = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp", "madrid"), n_history=12,
                            n_inputs=8, num_partitions=64, shape=(200, 160))
    )).cache()
    imgs.count()
    warm = imgs.filter(F.col("role") != "input").unionByName(
        imgs.filter(F.col("role") == "input").limit(2))
    gapfill.gapfill_balanced(warm, predictor_configuration="Biome",
                             params={"n_neighbors": 5}, chunk_px=1024) \
        .agg(F.sum("filled_px")).collect()
    for i in range(2):
        t0 = tic(f"gapfill.balanced_{i}")
        gapfill.gapfill_balanced(imgs, predictor_configuration="Biome",
                                 params={"n_neighbors": 5}, chunk_px=1024) \
            .agg(F.sum("filled_px")).collect()
        toc(f"gapfill.balanced_{i}", t0)
    for i in range(2):
        t0 = tic(f"gapfill.deep_{i}")
        deep_gapfill.gapfill_deep(imgs, method="Knn",
                                  predictor_configuration="Biome",
                                  hyperparameters="Custom",
                                  params={"n_neighbors": 5}, chunk_px=1024) \
            .agg(F.sum("filled_px")).collect()
        toc(f"gapfill.deep_{i}", t0)
    for i in range(2):
        t0 = tic(f"gapfill.nn_{i}")
        nn_fill.nn_fill(imgs.filter(F.col("role") == "input")) \
            .agg(F.sum("filled_px")).collect()
        toc(f"gapfill.nn_{i}", t0)


def probe_jobs(spark):
    """Per-job overhead floor: a trivial job, and a 32-task noop."""
    for i in range(3):
        t0 = tic(f"jobs.trivial_{i}")
        spark.range(1).count()
        toc(f"jobs.trivial_{i}", t0)
    for i in range(3):
        t0 = tic(f"jobs.tasks32_{i}")
        spark.range(1000, numPartitions=32).count()
        toc(f"jobs.tasks32_{i}", t0)


PROBES = {
    "s05": probe_s05,
    "s06": probe_s06,
    "batch_search": probe_one_batch_search,
    "r18": probe_r18,
    "r17": probe_r17,
    "r16": probe_r16,
    "d07": probe_d07,
    "gapfill": probe_gapfill,
    "jobs": probe_jobs,
}


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    from ssgp_toolbox_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{CPUS}]")
    for name in sys.argv[1:]:
        PROBES[name](spark)
    print(json.dumps({k: round(v, 3) for k, v in T.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
