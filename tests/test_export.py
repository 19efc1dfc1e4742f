"""Export sink round trips (S9 GeoTIFF, S10 netCDF) + the export-job
Spark pattern (encode per image in a pandas UDF)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark.io import export


def test_geotiff_roundtrip():
    m = np.random.default_rng(0).normal(290, 5, (20, 30)).astype(np.float32)
    tif = export.encode_geotiff(m, 300000.0, 6200000.0, 1000.0, 1000.0, 32635)
    back, tags = export.parse_geotiff(tif)
    assert np.array_equal(back, m)
    assert tags == {"min_x": 300000.0, "max_y": 6200000.0, "epsg": 32635}
    assert tif[:4] == b"II\x2a\x00"  # little-endian TIFF magic


def test_netcdf_roundtrip():
    tensor = np.random.default_rng(1).normal(0, 1, (4, 6, 5)).astype(np.float32)
    steps = [f"2019090{i}T060000" for i in range(1, 5)]
    nc = export.encode_netcdf_stack(tensor, steps)
    t2, s2 = export.parse_netcdf_stack(nc)
    assert np.allclose(t2, tensor)
    assert s2 == steps
    assert nc[:4] == b"CDF\x01"


def test_geotiff_export_udf(spark):
    """The export-job shape: pandas UDF encodes tif bytes per row."""
    import pandas as pd

    from ssgp_toolbox_spark import codecs, generator

    @F.pandas_udf(T.BinaryType())
    def to_tif(payload: pd.Series, h: pd.Series, w: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for b, hh, ww, f in zip(payload, h, w, fmt):
            m = codecs.decode(b, int(hh), int(ww), f)
            out.append(export.encode_geotiff(m, 0.0, 0.0, 1000.0, 1000.0, 32635))
        return pd.Series(out)

    df = generator.images_df(spark, sites=("stp",), n_history=1, n_inputs=1)
    rows = df.withColumn("tif", to_tif("bytes", "h", "w", "fmt")).select("image_id", "tif").collect()
    for r in rows:
        back, tags = export.parse_geotiff(bytes(r["tif"]))
        assert back.shape == (109, 62) and tags["epsg"] == 32635


def test_geotiff_partitioned_sink_roundtrip(spark, tmp_path):
    """Distributed sink: N>1 partitions each write their own files
    (no driver collect); every file re-reads bit-identical with
    correct georef, and the manifest matches."""
    import os

    from ssgp_toolbox_spark import codecs, generator
    from ssgp_toolbox_spark.io import images as img_io

    out = str(tmp_path / "tifs")
    imgs = img_io.with_id_parts(generator.images_df(
        spark, sites=("stp", "mad"), n_history=3, n_inputs=1)).repartition(4)
    assert imgs.rdd.getNumPartitions() > 1
    manifest = export.write_geotiff_partitioned(
        imgs, out, 300000.0, 6200000.0, 1000.0, 1000.0, 32635).collect()
    orig = {r["image_id"]: codecs.decode(bytes(r["bytes"]), r["h"], r["w"],
                                         r["fmt"])
            for r in imgs.collect()}
    # 2 sites x (3 history + 1 input + 1 extra biome layer)
    assert len(manifest) == len(orig) == 10
    for row in manifest:
        assert os.path.exists(row["path"])
        with open(row["path"], "rb") as f:
            buf = f.read()
        assert len(buf) == row["n_bytes"]
        back, tags = export.parse_geotiff(buf)
        np.testing.assert_array_equal(
            back, orig[row["image_id"]].astype(np.float32))
        assert tags["epsg"] == 32635 and tags["min_x"] == 300000.0
    assert not any(p.endswith(".tmp") for p in os.listdir(out))


def test_netcdf_partitioned_sink_roundtrip(spark, tmp_path):
    """One classic-CDF stack per site, written executor-side."""
    from ssgp_toolbox_spark import codecs, generator
    from ssgp_toolbox_spark.io import images as img_io

    out = str(tmp_path / "ncs")
    imgs = img_io.with_id_parts(generator.images_df(
        spark, sites=("stp", "mad"), n_history=3, n_inputs=0)) \
        .filter(F.col("role") == "history")
    manifest = {r["site"]: r for r in
                export.write_netcdf_stacks_partitioned(imgs, out).collect()}
    assert set(manifest) == {"stp", "mad"}
    by_site = {}
    for r in imgs.collect():
        by_site.setdefault(r["site"], []).append(r)
    for site, rows in by_site.items():
        rows.sort(key=lambda r: r["image_id"])
        with open(manifest[site]["path"], "rb") as f:
            tensor, steps = export.parse_netcdf_stack(f.read())
        assert manifest[site]["n_layers"] == len(rows) == 3
        assert steps == [r["image_id"].split("/")[-1] for r in rows]
        for i, r in enumerate(rows):
            m = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
            np.testing.assert_array_equal(tensor[i], m.astype(np.float32))


def test_partitioned_sink_manifest_matches_disk_and_names_injective(spark, tmp_path):
    """Manifest phash must equal the phash of the file's CONTENT
    (float32 cast applied before hashing), and the filename escaping
    must be injective — ids that a plain '/'→'_' mapping would
    conflate write distinct files."""
    import os

    from ssgp_toolbox_spark import codecs, generator
    from ssgp_toolbox_spark.io import images as img_io

    out = str(tmp_path / "tifs2")
    imgs = img_io.with_id_parts(generator.images_df(
        spark, sites=("stp",), n_history=1, n_inputs=1))
    # plant two ids that collide under naive '/'->'__' replacement
    base = imgs.limit(1).collect()[0]
    clash = spark.createDataFrame(
        [("a/b__c",) + tuple(base[c] for c in
                             ["bytes", "w", "h", "fmt"]),
         ("a__b/c",) + tuple(base[c] for c in
                             ["bytes", "w", "h", "fmt"])],
        "image_id string, bytes binary, w int, h int, fmt string")
    manifest = export.write_geotiff_partitioned(
        imgs.select("image_id", "bytes", "w", "h", "fmt").unionByName(clash),
        out, 300000.0, 6200000.0, 1000.0, 1000.0, 32635).collect()
    paths = [r["path"] for r in manifest]
    assert len(set(paths)) == len(paths) == 5
    for r in manifest:
        with open(r["path"], "rb") as f:
            back, _tags = export.parse_geotiff(f.read())
        assert codecs.phash64(back.astype(np.float64)) == r["phash"], \
            r["image_id"]


def test_netcdf_tiled_sink_splits_and_reassembles(spark, tmp_path):
    """(site, tile)-keyed variant (round-4 VERDICT #7): a site whose
    stack exceeds the per-task budget splits into one file per tile
    window — per-task memory is layers × tile² regardless of raster
    size — and stitching every tile file back by its manifest
    (row0, col0) reproduces the whole-site stack bit-for-bit."""
    from ssgp_toolbox_spark import codecs, generator
    from ssgp_toolbox_spark.io import images as img_io

    out = str(tmp_path / "ncs_tiled")
    imgs = img_io.with_id_parts(generator.images_df(
        spark, sites=("stp",), n_history=3, n_inputs=0, shape=(30, 20))) \
        .filter(F.col("role") == "history")
    tile = 8  # 30x20 image, 8px tiles -> 4x3 = 12 files for the site
    manifest = export.write_netcdf_stacks_partitioned(
        imgs, out, tile=tile).collect()
    assert len(manifest) == 12
    assert all(r["n_layers"] == 3 for r in manifest)
    # per-file payload bound: n_layers × tile² float32
    assert all(r["n_bytes"] < 3 * tile * tile * 4 + 4096 for r in manifest)

    rows = sorted(imgs.collect(), key=lambda r: r["image_id"])
    h, w = rows[0]["h"], rows[0]["w"]
    expect = np.stack([
        codecs.decode(bytes(r["bytes"]), h, w, r["fmt"]).astype(np.float32)
        for r in rows])
    got = np.full_like(expect, np.nan)
    for mrow in manifest:
        with open(mrow["path"], "rb") as f:
            tensor, steps = export.parse_netcdf_stack(f.read())
        assert steps == [r["image_id"].split("/")[-1] for r in rows]
        th, tw = tensor.shape[1], tensor.shape[2]
        r0, c0 = mrow["row0"], mrow["col0"]
        got[:, r0:r0 + th, c0:c0 + tw] = tensor
    np.testing.assert_array_equal(got, expect)
