"""Ingest-stage column functions — the engine-side analogs of the
reference's satellite preparators (SURVEY.md S6-S8, F11-F13, C2-C6).

The reference's preparators are gdal/NetCDF/HDF4 pipelines that run
*before* its core; in this engine they are the ingest job that
produces the image table. The per-pixel/per-band arithmetic they
apply is pure column math, so it lives here as Catalyst expressions
(never UDFs):

- two-bit QC policy (MODIS_MOD_MYD_11.py:102-129): last 2 bits of the
  QC word → {ok, gap, skip, NoData}; ``qa_policy`` 0/1 strictness;
- cloud bit flags (S3_L2_LST.py:120-130): ``confidence & 16384``
  (bit 14 = cloud), ``bayes & 2``;
- unit scaling (LST/50, reflectance/10000 — MODIS_MOD_MYD_11.py:146,
  MOD09GA:119);
- NDVI ``(nir-red)/(nir+red)`` with the [-1, 1] clamp-to-gap
  (MOD09GA:142-153);
- Liang-2000 broadband albedo with the [0, 1] clamp
  (MOD09GA:155-173);
- latitude-band swath filter (S3_L2_LST.py:161-172).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ssgp_toolbox_spark.sentinels import GAP, NODATA, SKIP


def qc_two_bit(qc_col: Column, qa_policy: int = 0) -> Column:
    """MODIS QC decode (MODIS_MOD_MYD_11.py:102-129): last two bits of
    the QC word → quality class. policy 0: 0b01 is still usable (gap
    only on 0b10/0b11); policy 1 (strict): any nonzero → gap/worse."""
    bits = qc_col.bitwiseAND(F.lit(3))
    if qa_policy == 0:
        return (F.when(bits == 0, "ok").when(bits == 1, "ok")
                .when(bits == 2, "gap").otherwise("nodata"))
    return (F.when(bits == 0, "ok").when(bits == 1, "gap")
            .when(bits == 2, "skip").otherwise("nodata"))


def cloud_mask(confidence_col: Column, bayes_col: Column) -> Column:
    """Sentinel-3 cloud decision (S3_L2_LST.py:120-130): confidence
    bit 14 OR bayes bit 1 → cloud (gap)."""
    return (confidence_col.bitwiseAND(F.lit(16384)) != 0) | (
        bayes_col.bitwiseAND(F.lit(2)) != 0
    )


def scale_lst(raw: Column) -> Column:
    """MODIS LST: raw/50 Kelvin (MODIS_MOD_MYD_11.py:146,173)."""
    return raw / 50.0


def scale_reflectance(raw: Column) -> Column:
    """MOD09GA reflectance: raw/10000 (MOD09GA:119)."""
    return raw / 10000.0


def ndvi(nir: Column, red: Column) -> Column:
    """NDVI with the reference's out-of-range→gap clamp
    (MOD09GA:142-153). A zero denominator (numpy would give nan/inf,
    ANSI Spark would raise) becomes NULL and falls into the gap
    branch, matching the reference's clamp outcome."""
    denom = nir + red
    v = (nir - red) / F.when(denom != 0, denom)
    return F.when(v.between(-1.0, 1.0), v).otherwise(F.lit(GAP))


def broadband_albedo(b1: Column, b2: Column, b3: Column, b4: Column,
                     b5: Column, b7: Column) -> Column:
    """Liang-2000 shortwave albedo (MOD09GA:155-173) with [0,1]
    clamp-to-gap."""
    a = (0.160 * b1 + 0.291 * b2 + 0.243 * b3 + 0.116 * b4
         + 0.112 * b5 + 0.081 * b7 - 0.0015)
    return F.when(a.between(0.0, 1.0), a).otherwise(F.lit(GAP))


def lat_band_filter(lat: Column, min_y: float, max_y: float,
                    margin: float = 10.0) -> Column:
    """Swath row filter (S3_L2_LST.py:161-172): keep rows within the
    target extent ± margin degrees."""
    return lat.between(min_y - margin, max_y + margin)


def biome_water_to_skip(value: Column, biome: Column) -> Column:
    """biome==0 (water) → skip sentinel (S3_L2_LST.py:141-149)."""
    return F.when(biome == 0, F.lit(SKIP)).otherwise(value)


def flip_vertical(images):
    """C9: decode-time vertical swath flip (reference
    preparators/Sentinel3/S3_L2_LST.py:157-159 — ``np.flip(axis=0)``
    applied to the data and geolocation arrays before warping).
    Payload-level op: mapInPandas over the scan, zero shuffle; phash
    recomputed because pixel layout changes."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ssgp_toolbox_spark import codecs

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in schema.fieldNames()}
            for row in pdf.itertuples(index=False):
                m = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                flipped = np.flip(m, axis=0)
                out["image_id"].append(row.image_id)
                out["bytes"].append(codecs.encode(flipped, row.fmt))
                out["w"].append(row.w)
                out["h"].append(row.h)
                out["fmt"].append(row.fmt)
                out["caption"].append(row.caption)
                out["phash"].append(codecs.phash64(flipped))
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return images.select(*cols).mapInPandas(fn, schema)
