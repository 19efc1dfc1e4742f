"""Sentinel-3 LST swath ingest: archive → flags → flip → lat-band →
geolocated nearest-neighbor warp → input_hint grid rows.

Completes the S6/S7 source chain (SURVEY.md §2.1) that round 1 only
covered at the column-function level. Semantics transcribed from the
reference preparator (S3_L2_LST.py):

- cloud masking BEFORE water masking (order matters — the sea is -inf
  under clouds; S3_L2_LST.py:144-150): confidence_in bit 16384 and
  bayes_in bit 2 → GAP, then biome == 0 → SKIP;
- vertical flip of data + geolocation arrays (C9, S3_L2_LST.py:157-159);
- latitude-band row trim with the ±10° margin: a swath ROW is dropped
  when any of its latitudes falls outside [minY-10, maxY+10]
  (S3_L2_LST.py:162-172);
- UTM target selection from the extent centroid (326NN north / 327NN
  south, S3_L2_LST.py:66-88), corner-projected extent;
- geolocation warp to the UTM grid (the reference shells out to
  gdal.Warp with a GEOLOCATION VRT, S3_L2_LST.py:185-230; no GDAL in
  this sandbox): our warp is the standard drop-in-the-bucket
  nearest resampler — every swath pixel is forward-projected
  (geometry.utm_project, the pyproj-free Snyder series), binned to
  its target cell, and each cell keeps the swath pixel whose
  projected coordinates are nearest to the cell center; empty cells
  get NoData. Exactness is property-tested by round-trip: a grid
  whose cell centers are un-projected to lat/lon (geometry.
  utm_unproject) and warped back reconstructs bit-identically.

Container note: real ESA granules are NetCDF-4/HDF5; io/netcdf.py
reads the classic format and raises a documented gate for HDF5 (no
h5py in the sandbox). The zip layout, variable names, flag algebra,
flip, trim, warp, and Spark plumbing are all real and tested on
classic-format fixtures.

Spark shape: one swath granule per row, mapInPandas — granules are
independent, so ingest is embarrassingly parallel (the 100 TB plan is
a scan + narrow map, no shuffle); downstream grid rows take the
normal gapfill path.
"""

from __future__ import annotations

import io as _io
import zipfile
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ssgp_toolbox_spark import codecs, geometry
from ssgp_toolbox_spark.io import netcdf
from ssgp_toolbox_spark.sentinels import GAP, NODATA, SKIP

# S3 archive member suffixes → the variables each contributes
# (S3_L2_LST.py:101-141)
_S3_MEMBERS = {
    "LST_in.nc": ("LST",),
    "flags_in.nc": ("confidence_in", "bayes_in"),
    "geodetic_in.nc": ("latitude_in", "longitude_in", "elevation_in"),
    "LST_ancillary_ds.nc": ("biome",),
}

CLOUD_CONF_BIT = 16384  # confidence_in summand (S3_L2_LST.py:122-128)
CLOUD_BAYES_BIT = 2     # bayes_in summand (S3_L2_LST.py:130-132)
LAT_MARGIN_DEG = 10.0   # band trim margin (S3_L2_LST.py:163-164)


def utm_code_for_extent(extent: dict) -> tuple[int, dict]:
    """EPSG code from the extent centroid (326NN/327NN) + the extent's
    corners projected into that UTM zone (S3_L2_LST.py:66-88)."""
    min_x, min_y = extent["minX"], extent["minY"]
    max_x, max_y = extent["maxX"], extent["maxY"]
    base = 32700 if (min_y + max_y) / 2 < 0 else 32600
    zone = int(((min_x + max_x) / 2 + 180) / 6.0 % 60) + 1
    south = base == 32700
    x0, y0 = geometry.utm_project(min_x, min_y, zone, south=south)
    x1, y1 = geometry.utm_project(max_x, max_y, zone, south=south)
    return base + zone, {"minX": float(x0), "minY": float(y0),
                         "maxX": float(x1), "maxY": float(y1)}


def clean_s3_swath(lst: np.ndarray, confidence: np.ndarray,
                   bayes: np.ndarray, biome: np.ndarray,
                   lat: np.ndarray, lon: np.ndarray, extent: dict,
                   biomes_instead_lst: bool = False):
    """Flag → sentinel assignment, vertical flip, latitude-band row
    trim. Returns (matrix, lats, lons) ready for the warp."""
    m = np.array(lst, dtype=np.float64, copy=True)
    # clouds FIRST, then water (reference order caveat, lines 144-150)
    m[(confidence.astype(np.int64) & CLOUD_CONF_BIT) != 0] = GAP
    m[(bayes.astype(np.int64) & CLOUD_BAYES_BIT) != 0] = GAP
    m[biome == 0] = SKIP
    if biomes_instead_lst:
        m = np.array(biome, dtype=np.float64, copy=True)
    m = np.flip(m, axis=0)
    lats = np.flip(np.asarray(lat, dtype=np.float64), axis=0)
    lons = np.flip(np.asarray(lon, dtype=np.float64), axis=0)
    hi = extent["maxY"] + LAT_MARGIN_DEG
    lo = extent["minY"] - LAT_MARGIN_DEG
    bad = (lats > hi).any(axis=1) | (lats < lo).any(axis=1)
    keep = ~bad
    return m[keep], lats[keep], lons[keep]


def warp_to_grid(values: np.ndarray, lat: np.ndarray, lon: np.ndarray,
                 utm_code: int, utm_extent: dict, x_res: float,
                 y_res: float, nodata: float = NODATA) -> np.ndarray:
    """Nearest-neighbor geolocation warp: swath (values, lat, lon) →
    regular UTM grid. Cells keep the swath pixel whose projected
    coordinates are nearest to the cell CENTER; untouched cells are
    ``nodata`` (gdal.Warp dstNodata parity, S3_L2_LST.py:226)."""
    zone = utm_code % 100
    south = (utm_code // 100) == 327
    x, y = geometry.utm_project(lon.ravel(), lat.ravel(), zone, south=south)
    v = np.asarray(values, dtype=np.float64).ravel()

    min_x, max_x = utm_extent["minX"], utm_extent["maxX"]
    min_y, max_y = utm_extent["minY"], utm_extent["maxY"]
    w = max(int(np.ceil((max_x - min_x) / x_res)), 1)
    h = max(int(np.ceil((max_y - min_y) / y_res)), 1)

    col = np.floor((x - min_x) / x_res).astype(np.int64)
    row = np.floor((max_y - y) / y_res).astype(np.int64)
    ok = (col >= 0) & (col < w) & (row >= 0) & (row < h)
    col, row, x, y, v = col[ok], row[ok], x[ok], y[ok], v[ok]

    grid = np.full((h, w), nodata, dtype=np.float64)
    if len(v) == 0:
        return grid
    cx = min_x + (col + 0.5) * x_res
    cy = max_y - (row + 0.5) * y_res
    d2 = (x - cx) ** 2 + (y - cy) ** 2
    cell = row * w + col
    order = np.lexsort((d2, cell))  # per cell: nearest-to-center first
    cell_sorted = cell[order]
    first = np.ones(len(cell_sorted), dtype=bool)
    first[1:] = cell_sorted[1:] != cell_sorted[:-1]
    winners = order[first]
    grid.ravel()[cell[winners]] = v[winners]
    return grid


def s3_archive_to_arrays(zip_bytes: bytes) -> dict[str, np.ndarray]:
    """Extract the four S3 NetCDF members from an SEN3 zip archive
    (stdlib zipfile, S3_L2_LST.py:98-114) and read their variables
    (classic format; HDF5 members raise the documented gate)."""
    out: dict[str, np.ndarray] = {}
    with zipfile.ZipFile(_io.BytesIO(zip_bytes)) as zf:
        for member in zf.namelist():
            for suffix, wanted in _S3_MEMBERS.items():
                if member.endswith(suffix):
                    variables, _ = netcdf.read_netcdf(zf.read(member))
                    for nm in wanted:
                        if nm in variables:
                            out[nm] = np.asarray(variables[nm])
    missing = {"LST", "confidence_in", "bayes_in", "latitude_in",
               "longitude_in", "biome"} - set(out)
    if missing:
        raise ValueError(f"S3 archive missing variables: {sorted(missing)}")
    return out


# ---------------------------------------------------------- Spark op

SWATH_SCHEMA = T.StructType([
    T.StructField("site", T.StringType()),
    T.StructField("ts", T.StringType()),          # YYYYmmddTHHMMSS
    T.StructField("archive", T.BinaryType()),     # SEN3 zip payload
])

_OUT_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
])


def ingest_s3_archives(swaths: DataFrame, extent: dict,
                       x_res: float, y_res: float,
                       role: str = "input") -> DataFrame:
    """SEN3 zip rows → cleaned, warped grid rows in the input_hint
    schema. One granule per task; no shuffle (scan + narrow map)."""
    utm_code, utm_extent = utm_code_for_extent(extent)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in _OUT_SCHEMA.fieldNames()}
            for r in pdf.itertuples(index=False):
                arrs = s3_archive_to_arrays(bytes(r.archive))
                m, lats, lons = clean_s3_swath(
                    arrs["LST"], arrs["confidence_in"], arrs["bayes_in"],
                    arrs["biome"], arrs["latitude_in"],
                    arrs["longitude_in"], extent)
                grid = warp_to_grid(m, lats, lons, utm_code, utm_extent,
                                    x_res, y_res)
                out["image_id"].append(f"{r.site}/{role}/{r.ts}")
                out["bytes"].append(codecs.encode(grid, codecs.FMT_F64))
                out["w"].append(grid.shape[1])
                out["h"].append(grid.shape[0])
                out["fmt"].append(codecs.FMT_F64)
                out["caption"].append(
                    f"S3 LST {r.site} {r.ts} EPSG:{utm_code}")
                out["phash"].append(codecs.phash64(grid))
            yield pd.DataFrame(out)

    return swaths.mapInPandas(fn, _OUT_SCHEMA)
