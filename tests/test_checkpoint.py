"""Tier-3 resumability (SURVEY.md §5.2): kill after a partial
snapshot, resume, assert no duplicate fills and complete coverage;
lineage columns present."""

import pytest
from pyspark.sql import functions as F

from ssgp_toolbox_spark import generator
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.operators import checkpoint, nn_fill, stats


@pytest.fixture()
def inputs(spark):
    df = generator.images_df(spark, sites=("stp",), n_history=2, n_inputs=3)
    return img_io.with_id_parts(df).filter(F.col("role") == "input").cache()


def test_resume_no_duplicates(spark, inputs, tmp_path):
    table = str(tmp_path / "out")
    compute = lambda df: nn_fill.nn_fill(df)

    # simulate a crash: first run commits only 1 row then "dies"
    first = compute(inputs.limit(1))
    img_io.append_snapshot(checkpoint.with_lineage(first, {"op": "nn"}), table)
    assert img_io.committed_ids(spark, table).count() == 1

    # restart: run_checkpointed picks up the remaining 2, then a third
    # invocation is a no-op
    sids = checkpoint.run_checkpointed(inputs, compute, spark, table, {"op": "nn"})
    assert len(sids) == 1
    again = checkpoint.run_checkpointed(inputs, compute, spark, table, {"op": "nn"})
    assert again == []

    out = img_io.load(spark, table)
    assert out.count() == 3
    assert out.select("image_id").distinct().count() == 3  # no dup fills
    assert {"partition_id", "engine_config"} <= set(out.columns)


def test_batched_checkpoints(spark, inputs, tmp_path):
    table = str(tmp_path / "out_batched")
    sids = checkpoint.run_checkpointed(
        inputs, lambda df: nn_fill.nn_fill(df), spark, table, batch_rows=1
    )
    assert len(sids) == 3  # one snapshot per row
    out = img_io.load(spark, table)
    assert out.count() == 3 and out.select("image_id").distinct().count() == 3


def test_uncommitted_data_invisible(spark, inputs, tmp_path):
    """A write without a published manifest must not be readable —
    the atomicity guarantee resume relies on."""
    import os

    table = str(tmp_path / "out_atomic")
    filled = nn_fill.nn_fill(inputs)
    img_io.append_snapshot(filled.limit(1), table)
    # fake a torn write: data dir exists, no manifest
    orphan = os.path.join(table, "data", "snap-orphan")
    img_io.with_id_parts(filled.limit(2)).write.partitionBy("site", "role").parquet(orphan)
    assert img_io.load(spark, table).count() == 1


def test_gapfill_balanced_checkpointed_bounded(spark, tmp_path):
    """De-drivered balanced path: batches of 1 input per snapshot,
    bit-identical to the one-shot variant, broadcasts released after
    each commit, resume is a no-op."""
    from ssgp_toolbox_spark.operators import gapfill, stats

    df = generator.images_df(spark, sites=("stp",), n_history=4, n_inputs=2)
    imgs = stats.with_stats(img_io.with_id_parts(df)).cache()
    oneshot = {r["image_id"]: (bytes(r["bytes"]), r["filled_px"])
               for r in gapfill.gapfill_balanced(
                   imgs, predictor_configuration="Biome",
                   params={"n_neighbors": 5}).collect()}
    assert gapfill.release_broadcasts() >= 1

    table = str(tmp_path / "gf_ckpt")
    sids = gapfill.gapfill_balanced_checkpointed(
        imgs, table, batch_rows=1, params={"n_neighbors": 5})
    assert len(sids) == 2  # one snapshot per viable input
    assert gapfill._LIVE_BROADCASTS == []  # nothing leaked

    rows = img_io.load(spark, table).collect()
    assert len(rows) == 2
    for r in rows:
        exp_bytes, exp_px = oneshot[r["image_id"]]
        assert bytes(r["bytes"]) == exp_bytes
        assert r["filled_px"] == exp_px
        assert r["engine_config"]  # lineage present

    # resume after completion: nothing remaining, no new snapshots
    assert gapfill.gapfill_balanced_checkpointed(
        imgs, table, batch_rows=1, params={"n_neighbors": 5}) == []
