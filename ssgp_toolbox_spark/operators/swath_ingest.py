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


# ------------------------------------------------- MODIS (MOD/MYD 11)

# MODIS sinusoidal sphere radius (the reference's proj4 literal
# '+proj=sinu ... +a=6371007.181 +b=6371007.181', MODIS_MOD_MYD_11.py:154)
MODIS_SPHERE_R = 6371007.181


def modis_quality(qc: np.ndarray, qa_policy: int = 0) -> np.ndarray:
    """Two-bit QC → quality classes 0=OK 1=Gap 2=Skip 3=NoData
    (MODIS_MOD_MYD_11.py:105-129). qa_policy 0 treats '01' (other
    quality) as gap; policy 1 accepts it. srcNodata=-1 semantics:
    -1 rows become NoData (the reference's gdal.Warp srcNodata=-1 →
    dstNodata=-32768 hop, line 164)."""
    q = np.asarray(qc, dtype=np.int64)
    q = np.where(q == -1, -32768, q)
    two = q & 3
    quality = np.zeros(q.shape, dtype=np.int8)
    if qa_policy == 0:
        quality[(two == 1) | (two == 2)] = 1
    else:
        quality[two == 2] = 1
    quality[two == 3] = 2
    quality[q == -32768] = 3
    return quality


def sinusoidal_to_latlon(x, y, radius: float = MODIS_SPHERE_R):
    """Inverse sinusoidal (sphere): lat = y/R, lon = x/(R·cos lat)."""
    lat = np.rad2deg(np.asarray(y, dtype=np.float64) / radius)
    lon = np.rad2deg(np.asarray(x, dtype=np.float64)
                     / (radius * np.cos(np.deg2rad(lat))))
    return lon, lat


def modis_grid_latlon(geotransform, h: int, w: int):
    """Pixel-center lat/lon of a sinusoidal MODIS tile.
    ``geotransform`` is the GDAL 6-tuple (x0, dx, 0, y0, 0, dy<0)."""
    x0, dx, _, y0, _, dy = geotransform
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    x = x0 + (cols + 0.5) * dx
    y = y0 + (rows + 0.5) * dy
    return sinusoidal_to_latlon(x, y)


def prepare_modis_lst(lst_raw: np.ndarray, qc: np.ndarray,
                      qa_policy: int = 0) -> np.ndarray:
    """Scale + sentinel assignment on the SOURCE sinusoidal grid,
    exactly the A1/A2 order (scale /50.0 then quality overrides,
    MODIS_MOD_MYD_11.py:171-177; both stay on the source grid — the
    UTM warp happens last, archive_to_npy:215-216)."""
    quality = modis_quality(qc, qa_policy)
    m = np.asarray(lst_raw, dtype=np.float64) / 50.0
    m[quality == 1] = GAP
    m[quality == 2] = SKIP
    m[quality == 3] = NODATA
    return m


def modis_datetime(file_name: str) -> str:
    """Acquisition timestamp from the MODIS archive name
    (MODIS_MOD_MYD_11.py:31-40): L2 'A%Y%j%H%M', A1/A2 'A%Y%j'."""
    from datetime import datetime as _dt

    parts = file_name.split(".")
    tag = parts[0][-2:]  # 'L2'/'A1'/'A2' suffix of MOD11/MYD11 name
    if tag == "L2":
        return _dt.strptime(parts[1] + parts[2], "A%Y%j%H%M").strftime(
            "%Y%m%dT%H%M%S")
    return _dt.strptime(parts[1], "A%Y%j").strftime("%Y%m%dT%H%M%S")


MODIS_SCHEMA = T.StructType([
    T.StructField("site", T.StringType()),
    T.StructField("file_name", T.StringType()),   # MOD11A1.A2020048...
    T.StructField("lst", T.BinaryType()),          # int16 LE raw LST
    T.StructField("qc", T.BinaryType()),           # int16 LE QC
    T.StructField("h", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("gt", T.ArrayType(T.DoubleType())),  # sinusoidal geotransform
])


def ingest_modis_grids(tiles: DataFrame, extent: dict, x_res: float,
                       y_res: float, qa_policy: int = 0,
                       role: str = "input") -> DataFrame:
    """MODIS A1/A2 tile rows (pre-extracted subdataset arrays — the
    HDF4 container itself is the gated step, like HDF5 for S3) →
    QC-masked, scaled, UTM-warped grid rows in the input_hint schema.
    Same embarrassingly-parallel shape as the S3 ingest."""
    utm_code, utm_extent = utm_code_for_extent(extent)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in _OUT_SCHEMA.fieldNames()}
            for r in pdf.itertuples(index=False):
                h, w = int(r.h), int(r.w)
                lst_raw = np.frombuffer(bytes(r.lst), "<i2").reshape(h, w)
                qc = np.frombuffer(bytes(r.qc), "<i2").reshape(h, w)
                m = prepare_modis_lst(lst_raw, qc, qa_policy)
                lon, lat = modis_grid_latlon(tuple(r.gt), h, w)
                grid = warp_to_grid(m, lat, lon, utm_code, utm_extent,
                                    x_res, y_res)
                ts = modis_datetime(r.file_name)
                out["image_id"].append(f"{r.site}/{role}/{ts}")
                out["bytes"].append(codecs.encode(grid, codecs.FMT_F64))
                out["w"].append(grid.shape[1])
                out["h"].append(grid.shape[0])
                out["fmt"].append(codecs.FMT_F64)
                out["caption"].append(
                    f"MODIS LST {r.site} {ts} EPSG:{utm_code}")
                out["phash"].append(codecs.phash64(grid))
            yield pd.DataFrame(out)

    return tiles.mapInPandas(fn, _OUT_SCHEMA)


# ----------------------------------------------- MOD09GA reflectance

def mod09_quality(qc: np.ndarray, qa_policy: int = 0) -> np.ndarray:
    """Two-bit state QC → quality classes for the reflectance product
    (MODIS_Reflectance_Products_MOD09GA.py:84-110). DIFFERENT mapping
    from the LST products: policy 0 flags '01'/'10' as Gap and keeps
    '11' OK; policy 1 flags only '01'. There is NO skip class;
    qc == -32768 (after the srcNodata=-1 hop, line 130) → NoData."""
    q = np.asarray(qc, dtype=np.int64)
    q = np.where(q == -1, -32768, q)
    two = q & 3
    quality = np.zeros(q.shape, dtype=np.int8)
    if qa_policy == 0:
        quality[(two == 1) | (two == 2)] = 1
    else:
        quality[two == 1] = 1
    quality[q == -32768] = 3
    return quality


def prepare_mod09(bands: dict[int, np.ndarray], qc: np.ndarray,
                  product: str = "ndvi", qa_policy: int = 0) -> np.ndarray:
    """Band math on the SOURCE sinusoidal grid, exactly the MOD09GA
    order (MODIS_Reflectance_Products_MOD09GA.py:112-203): per-band
    /10000 scale, NDVI (b2,b1; lines 145-151) or Liang narrowband→
    broadband albedo (0.160·b1 + 0.291·b2 + 0.243·b3 + 0.116·b4 +
    0.112·b5 + 0.081·b7 − 0.0015; lines 153-173), range clamps to
    GAP, then quality overrides. NDVI zero-denominator pixels
    propagate NaN exactly as the reference's numpy division does."""
    quality = mod09_quality(qc, qa_policy)
    sb = {b: np.asarray(a, dtype=np.float64) / 10000.0
          for b, a in bands.items()}
    if product == "ndvi":
        red, nir = sb[1], sb[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (nir - red) / (nir + red)
        out[out > 1] = GAP
        out[out < -1] = GAP
    elif product == "albedo":
        out = (0.160 * sb[1] + 0.291 * sb[2] + 0.243 * sb[3]
               + 0.116 * sb[4] + 0.112 * sb[5] + 0.081 * sb[7] - 0.0015)
        out[out > 1] = GAP
        out[out < 0] = GAP
    else:
        raise ValueError(f"unknown MOD09 product {product!r}")
    out[quality == 1] = GAP
    out[quality == 3] = NODATA
    return out


MOD09_SCHEMA = T.StructType(
    [T.StructField("site", T.StringType()),
     T.StructField("file_name", T.StringType())]   # MOD09GA.A2019254...
    + [T.StructField(f"b{b}", T.BinaryType()) for b in (1, 2, 3, 4, 5, 7)]
    + [T.StructField("state", T.BinaryType()),     # int16 LE state_1km QC
       T.StructField("h", T.IntegerType()),
       T.StructField("w", T.IntegerType()),
       T.StructField("gt", T.ArrayType(T.DoubleType()))])


def ingest_mod09_grids(tiles: DataFrame, extent: dict, x_res: float,
                       y_res: float, product: str = "ndvi",
                       qa_policy: int = 0,
                       role: str = "input") -> DataFrame:
    """MOD09GA tile rows (pre-extracted subdataset arrays — the HDF4
    container is the gated step, as for A1/A2) → QC-masked NDVI or
    Liang-albedo grids warped to UTM, in the input_hint schema. Same
    embarrassingly-parallel mapInPandas shape as the other ingests:
    one tile per row, zero shuffle."""
    utm_code, utm_extent = utm_code_for_extent(extent)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in _OUT_SCHEMA.fieldNames()}
            for r in pdf.itertuples(index=False):
                h, w = int(r.h), int(r.w)
                bands = {b: np.frombuffer(
                    bytes(getattr(r, f"b{b}")), "<i2").reshape(h, w)
                    for b in (1, 2, 3, 4, 5, 7)}
                qc = np.frombuffer(bytes(r.state), "<i2").reshape(h, w)
                m = prepare_mod09(bands, qc, product, qa_policy)
                lon, lat = modis_grid_latlon(tuple(r.gt), h, w)
                grid = warp_to_grid(m, lat, lon, utm_code, utm_extent,
                                    x_res, y_res)
                ts = modis_datetime(r.file_name)
                out["image_id"].append(f"{r.site}/{role}/{ts}")
                out["bytes"].append(codecs.encode(grid, codecs.FMT_F64))
                out["w"].append(grid.shape[1])
                out["h"].append(grid.shape[0])
                out["fmt"].append(codecs.FMT_F64)
                out["caption"].append(
                    f"MOD09GA {product} {r.site} {ts} EPSG:{utm_code}")
                out["phash"].append(codecs.phash64(grid))
            yield pd.DataFrame(out)

    return tiles.mapInPandas(fn, _OUT_SCHEMA)
