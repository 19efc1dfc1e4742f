"""SparkSession factory with the engine's tuned defaults.

Settings chosen for the 100 TB target (SURVEY.md §4): AQE on (runtime
skew-join + partition coalescing), Arrow transfer on for the pandas
UDF kernels with a batch size bounded so one batch of decoded rasters
fits executor memory, shuffle partitions sized for the local[32]
sandbox (override on a real cluster via spark-submit --conf).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # one 109×62 f64 raster ≈ 54 KB; 256 rows/batch ≈ 14 MB Arrow batches
    "spark.sql.execution.arrow.maxRecordsPerBatch": "256",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


@contextmanager
def stream_partitions(spark: SparkSession, n: int | None = None):
    """Scale the SHUFFLE partitioning of a bounded streaming run to
    its key cardinality instead of the session's scan parallelism.

    A stateful streaming operator allocates one state-store instance
    per shuffle partition per micro-batch (open + commit + checkpoint
    file each); the session default (sized for relational scans) is
    pure overhead when the stream has a handful of keys. The value is
    a deployment knob, not a local constant: default
    ``$SPARK_GRAFT_STREAM_PARTITIONS`` (8 — comfortably above the
    contract streams' ≤2 sites); production streams keyed on many
    sites raise it (the count is pinned into the checkpoint at the
    first batch, so pick it for the stream's lifetime). Restores the
    session conf afterwards — run the whole bounded stream (start +
    awaitTermination) inside the ``with`` block, because stateful
    planning reads the conf at the FIRST micro-batch, not at
    ``writeStream`` definition time."""
    if n is None:
        n = int(os.environ.get("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    spark.conf.set(key, str(n))
    try:
        yield
    finally:
        spark.conf.set(key, old)


def get_spark(app_name: str = "ssgp-toolbox-spark", master: str | None = None,
              extra_confs: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # one BLAS thread per task: Spark supplies the parallelism; an
    # unpinned OpenBLAS would oversubscribe every core from every
    # Python worker (and silently use the whole box at local[N<cores],
    # wrecking both throughput and any scaling measurement)
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    confs = {**DEFAULT_CONFS, **(extra_confs or {})}
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        confs.setdefault(f"spark.executorEnv.{var}", "1")
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
