"""Image-table storage: partitioned parquet with an Iceberg-style
snapshot manifest.

No Iceberg runtime jar ships in this sandbox, so the table format is
the documented fallback (SURVEY.md §7 design stance): partitioned
parquet plus a tiny JSON manifest per committed snapshot. The
manifest gives the two Iceberg properties the engine relies on:

- **atomic, append-only snapshots** — a write lands in a uniquely
  named subdirectory and only becomes visible when its manifest JSON
  is atomically renamed into ``_snapshots/``; readers union the
  manifests. This is the resumable-checkpoint primitive (north_rule):
  restart = read manifest list, anti-join already-committed image_ids.
- **partition pruning** — data is laid out by ``(site, role)``
  (directory-level) so Catalyst prunes partitions for predicates on
  those columns; per-file min/max stats on ``ts`` come free from
  parquet footers.

On a real cluster with Iceberg available, ``writeTo(...).append()``
replaces this module 1:1 — the operator layer only uses
``load`` / ``append_snapshot`` / ``committed_ids``.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPDIR = "_snapshots"

# image_id = "{site}/{role}/{ts}" (generator.py; reference keys layers
# by filename timestamp, timeseries.py:48)
def with_id_parts(df: DataFrame) -> DataFrame:
    parts = F.split(F.col("image_id"), "/")
    return (
        df.withColumn("site", parts.getItem(0))
        .withColumn("role", parts.getItem(1))
        .withColumn("ts", F.to_timestamp(parts.getItem(2), "yyyyMMdd'T'HHmmss"))
    )


def append_snapshot(df: DataFrame, table_path: str, snapshot_id: str | None = None) -> str:
    """Atomic append: write parquet into a snapshot-unique subdir, then
    publish a manifest. Returns the snapshot id."""
    sid = snapshot_id or f"snap-{int(time.time() * 1000)}-{uuid.uuid4().hex[:8]}"
    data_dir = os.path.join(table_path, "data", sid)
    (with_id_parts(df) if "site" not in df.columns else df).write.mode(
        "errorifexists"
    ).partitionBy("site", "role").parquet(data_dir)
    os.makedirs(os.path.join(table_path, SNAPDIR), exist_ok=True)
    manifest = {"snapshot_id": sid, "data_dir": data_dir, "ts": time.time()}
    tmp = os.path.join(table_path, SNAPDIR, f".{sid}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.rename(tmp, os.path.join(table_path, SNAPDIR, f"{sid}.json"))
    return sid


def snapshots(table_path: str) -> list[dict]:
    d = os.path.join(table_path, SNAPDIR)
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
    return out


def load(spark: SparkSession, table_path: str,
         as_of: str | None = None) -> DataFrame:
    """Union of all committed snapshots (uncommitted data dirs are
    invisible — that is the resume guarantee). ``as_of`` reads the
    table as of a snapshot id — Iceberg-style time travel over the
    manifest list (snapshot ids are time-ordered by construction)."""
    snaps = snapshots(table_path)
    if as_of is not None:
        keep = [s for s in snaps if s["snapshot_id"] <= as_of]
        if not any(s["snapshot_id"] == as_of for s in snaps):
            raise ValueError(f"unknown snapshot {as_of!r}")
        snaps = keep
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {table_path}")
    # each snapshot dir is partition-discovered independently, then
    # unioned — Catalyst still prunes (site, role) per subtree
    out = None
    for s in snaps:
        df = spark.read.parquet(s["data_dir"])
        out = df if out is None else out.unionByName(df)
    return out


def committed_ids(spark: SparkSession, table_path: str) -> DataFrame:
    """image_ids already present — the anti-join side of checkpoint
    resume (SURVEY.md §2.10)."""
    try:
        return load(spark, table_path).select("image_id").distinct()
    except FileNotFoundError:
        from pyspark.sql import types as T

        return spark.createDataFrame(
            [], T.StructType([T.StructField("image_id", T.StringType())])
        )
