"""PIP / zone-rasterization parity: vector zones must reproduce the
Extra raster bit-exactly (FIXTURES.md §2b; north_rule 'tile
assignments exactly'), incl. via the Spark operator, and Biome-mode
gapfill from vector zones must equal Biome-mode from the raster."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ssgp_toolbox_spark import codecs, generator, geometry
from ssgp_toolbox_spark.io import images as img_io
from ssgp_toolbox_spark.operators import gapfill, stats


def test_wkb_roundtrip_pip_square():
    wkb = generator._wkb_multipolygon([(1.0, 1.0, 3.0, 2.0)])
    # note: no boundary points — pixel centers are half-integer while
    # zone edges are integer, so the even-odd rule is never ambiguous
    px = np.array([1.5, 2.5, 0.5, 3.5, 2.5])
    py = np.array([1.5, 1.5, 1.5, 1.5, 2.5])
    got = geometry.points_in_wkb(px, py, wkb)
    assert got.tolist() == [True, True, False, False, False]


def test_rasterize_matches_zone_raster():
    for site, (h, w) in (("stp", (40, 30)), ("vlad", (25, 25))):
        codes = generator.zone_raster(site, h, w)
        rows = generator.zone_runs_wkb(codes)
        back = geometry.rasterize_zones(rows, h, w)
        assert np.array_equal(back, codes.astype(float))


def test_zones_to_extra_spark(spark):
    zones = generator.zones_df(spark, sites=("stp",))
    dims = spark.createDataFrame([("stp", 109, 62)], "site string, h int, w int")
    out = geometry.zones_to_extra(zones, dims).collect()
    assert len(out) == 1
    raster = codecs.decode(bytes(out[0]["bytes"]), 109, 62, codecs.FMT_F64)
    assert np.array_equal(raster, generator.zone_raster("stp", 109, 62).astype(float))


def test_biome_fill_from_vector_equals_raster(spark):
    """Axes A+B tie-in: Biome gapfill with the extra layer derived via
    the PIP join equals Biome gapfill with the generator's raster."""
    images = stats.with_stats(img_io.with_id_parts(
        generator.images_df(spark, sites=("stp",), n_history=5, n_inputs=1)
    )).cache()
    via_raster = {r["image_id"]: bytes(r["bytes"]) for r in gapfill.gapfill(
        images, method="Knn", predictor_configuration="Biome",
        hyperparameters="Custom", params={"n_neighbors": 5}).collect()}

    zones = generator.zones_df(spark, sites=("stp",))
    dims = spark.createDataFrame([("stp", 109, 62)], "site string, h int, w int")
    extra_v = geometry.zones_to_extra(zones, dims).withColumn(
        "image_id", F.concat_ws("/", "site", F.lit("extra"), F.lit("20190901T000000"))
    ).withColumn("role", F.lit("extra")).withColumn(
        "ts", F.to_timestamp(F.lit("2019-09-01"))
    ).withColumn("caption", F.lit("")).withColumn("phash", F.lit(0).cast("long")) \
     .withColumn("gap_count", F.lit(0)).withColumn("skip_count", F.lit(0)) \
     .withColumn("nodata_count", F.lit(0)).withColumn("valid_px", F.lit(109 * 62))
    no_extra = images.filter(F.col("role") != "extra")
    images_v = no_extra.unionByName(extra_v.select(*no_extra.columns))
    via_vector = {r["image_id"]: bytes(r["bytes"]) for r in gapfill.gapfill(
        images_v, method="Knn", predictor_configuration="Biome",
        hyperparameters="Custom", params={"n_neighbors": 5}).collect()}
    assert via_raster == via_vector
