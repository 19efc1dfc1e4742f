"""Task-level timing of the balanced-gapfill fill stage: a probe
variant of _chunk_fill_batches that reports per-task python-side
busy time, worker pid, and enter/exit timestamps — separates kernel
CPU, python worker count/reuse, wave structure, and scheduling gaps
from the stage wall."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    os.environ.setdefault("SPARK_GRAFT_CPUS", CPUS)
    import numpy as np
    from pyspark.sql import functions as F

    from ssgp_toolbox_spark import generator
    from ssgp_toolbox_spark.io import images as img_io
    from ssgp_toolbox_spark.operators import gapfill, stats
    from ssgp_toolbox_spark.sentinels import resolve_key_values
    from ssgp_toolbox_spark.session import get_spark

    spark = get_spark("probe_fill_tasks", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    sv = resolve_key_values(None)

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

    inputs = imgs.filter(F.col("role") == "input")
    viable = inputs.filter((F.col("valid_px") > 101) & (F.col("gap_count") > 0))
    import uuid
    hist_rows = gapfill.pack_history(
        imgs.filter(F.col("role") == "history")).collect()
    extra_rows = {
        r["site"]: (bytes(r["extra_layer"]["bytes"]),
                    int(r["extra_layer"]["h"]), int(r["extra_layer"]["w"]),
                    r["extra_layer"]["fmt"])
        for r in gapfill.pack_extra(
            imgs.filter(F.col("role") == "extra")).collect()}
    site_map = {}
    for r in hist_rows:
        layers = [(l["ts"], bytes(l["bytes"]), int(l["h"]), int(l["w"]),
                   l["fmt"]) for l in r["hist_layers"]]
        site_map[r["site"]] = (layers, extra_rows.get(r["site"]))
    input_map = {
        r["image_id"]: (bytes(r["bytes"]), int(r["h"]), int(r["w"]), r["fmt"])
        for r in viable.select("image_id", "bytes", "h", "w", "fmt").collect()}
    bc = sc.broadcast({"gen": uuid.uuid4().hex, "sites": site_map,
                       "inputs": input_map})

    chunk_px = 1024
    n_chunks = F.ceil(F.col("gap_count") / chunk_px).cast("int")
    n_parts = int(os.environ.get("PROBE_NPARTS",
                                 str(max(sc.defaultParallelism * 8, 8))))
    chunks = viable.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    ).repartition(n_parts)

    def probe_fn(batches):
        import pandas as pd
        t_enter = time.time()
        pid = os.getpid()
        rows = 0
        t_kernel = 0.0
        inner = gapfill._chunk_fill_batches(
            bc, "Knn", "Biome", "Custom", {"n_neighbors": 5}, chunk_px, sv)
        for out in inner(batches):
            rows += len(out)
        t_exit = time.time()
        yield pd.DataFrame({"pid": [pid], "rows": [rows],
                            "t_enter": [t_enter], "t_exit": [t_exit]})

    rep = 3
    for i in range(rep):
        t0 = time.time()
        res = chunks.select("image_id", "site", "chunk_id").mapInPandas(
            probe_fn, "pid long, rows long, t_enter double, t_exit double"
        ).collect()
        wall = time.time() - t0
        busy = sum(r["t_exit"] - r["t_enter"] for r in res)
        tmin = min(r["t_enter"] for r in res)
        tmax = max(r["t_exit"] for r in res)
        pids = {r["pid"] for r in res}
        nonempty = sum(1 for r in res if r["rows"] > 0)
        spans = sorted((r["t_enter"] - tmin, r["t_exit"] - tmin)
                       for r in res)
        last_start = max(r["t_enter"] for r in res) - tmin
        print(f"run{i}: wall={wall:.2f} span={tmax-tmin:.2f} "
              f"busy_sum={busy:.2f} tasks={len(res)} nonempty={nonempty} "
              f"workers={len(pids)} last_task_start={last_start:.2f}")
    bc.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
