"""Deterministic synthetic image+caption table generator (FIXTURES.md).

Produces the engine's primary correctness corpus: an images table with
the exact ``BASELINE.json.input_hint`` schema
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash bigint)`` plus zone tables (raster Extra layer
and a WKB multipolygon vector table whose rasterization reproduces the
raster exactly — the PIP-parity invariant of FIXTURES.md §2b).

Everything is seeded (numpy default_rng on stable integer seeds
derived from (site, role, index)); no wall clock, no external data.
Pixel semantics mirror the reference (SURVEY.md §1.1): smooth
"temperature" field ≈ N(290, 5) K with spatial+temporal
autocorrelation, in-band sentinels gap/skip/NoData, contiguous seeded
gap blobs at the Comparison gap-size ladder, a fixed "sea" skip
region, NoData border columns.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta

import numpy as np

from ssgp_toolbox_spark import codecs
from ssgp_toolbox_spark.sentinels import GAP, NODATA, SKIP

TS_FMT = "%Y%m%dT%H%M%S"
EPOCH = datetime(2019, 9, 1, 0, 0, 0)

DEFAULT_SITES = {
    # name -> (h, w)  (shapes from reference Comparison/*/actual_matrix)
    "stp": (109, 62),
    "madrid": (110, 88),
    "vlad": (109, 83),
}


def _rng(*keys) -> np.random.Generator:
    seed = zlib_seed = 0
    for k in keys:
        for ch in str(k).encode():
            zlib_seed = (zlib_seed * 131 + ch) % (2**31 - 1)
    seed = zlib_seed
    return np.random.default_rng(seed)


# ------------------------------------------------------------ fields


def temperature_field(site: str, h: int, w: int, t: float) -> np.ndarray:
    """Smooth valid-value field: sin/cos basis over (i, j, t) + seeded
    per-site stationary noise. ~N(290, 5) K, matching the reference's
    observed LST range 280-306 K."""
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    base = (
        290.0
        + 5.0 * np.sin(2 * np.pi * i / h + 0.31 * t)
        + 4.0 * np.cos(2 * np.pi * j / w - 0.17 * t)
        + 2.0 * np.sin(0.5 * t + i * j / (h * w))
    )
    noise = _rng(site, "terrain").normal(0.0, 1.5, size=(h, w))
    return base + noise


def sea_mask(site: str, h: int, w: int) -> np.ndarray:
    """Fixed per-site 'sea' region (~10% of pixels) → SKIP sentinel."""
    rng = _rng(site, "sea")
    ci, cj = rng.uniform(0.1, 0.9) * h, rng.uniform(0.1, 0.9) * w
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    r2 = ((i - ci) / h) ** 2 + ((j - cj) / w) ** 2
    # radius tuned so the disc covers ≈10% of the frame
    return r2 < (0.1 / np.pi)


def nodata_mask(h: int, w: int, border: int = 2) -> np.ndarray:
    m = np.zeros((h, w), dtype=bool)
    m[:, :border] = True
    return m


def gap_blobs(site: str, layer_key: str, h: int, w: int, frac: float,
              eligible: np.ndarray) -> np.ndarray:
    """Contiguous seeded blobs covering ≈``frac`` of the eligible area."""
    rng = _rng(site, layer_key, "gaps")
    target = int(frac * eligible.sum())
    mask = np.zeros((h, w), dtype=bool)
    i = np.arange(h)[:, None]
    j = np.arange(w)[None, :]
    guard = 0
    while (mask & eligible).sum() < target and guard < 200:
        guard += 1
        ci, cj = rng.uniform(0, h), rng.uniform(0, w)
        r = rng.uniform(0.05, 0.35) * min(h, w)
        mask |= ((i - ci) ** 2 + (j - cj) ** 2) < r**2
    return mask & eligible


def make_layer(site: str, h: int, w: int, t_index: int, role: str,
               gap_frac: float) -> np.ndarray:
    m = temperature_field(site, h, w, float(t_index))
    sea = sea_mask(site, h, w)
    nod = nodata_mask(h, w)
    eligible = ~(sea | nod)
    key = f"{role}{t_index}"
    if gap_frac > 0:
        m[gap_blobs(site, key, h, w, gap_frac, eligible)] = GAP
    m[sea] = SKIP
    m[nod] = NODATA
    return m


# ------------------------------------------------------------ zones


def zone_raster(site: str, h: int, w: int, n_zones: int = 12) -> np.ndarray:
    """Seeded Voronoi biome raster: codes 1..n_zones, nearest-seed with
    first-index (lowest zone id) tie-break — contiguous regions. One
    zone is forced tiny (≤41 px) to exercise the reference's random
    fallback branch (gapfiller.py:536-586). Water is its own biome 0,
    like the reference (S3_L2_LST.py:141-149 maps biome==0 → skip) —
    so land pixels never draw sea predictors in Biome mode."""
    rng = _rng(site, "zones")
    seeds = np.stack(
        [rng.uniform(0, h, n_zones), rng.uniform(0, w, n_zones)], axis=1
    )
    i = np.arange(h)[:, None, None]
    j = np.arange(w)[None, :, None]
    d2 = (i - seeds[:, 0]) ** 2 + (j - seeds[:, 1]) ** 2  # (h, w, n)
    codes = np.argmin(d2, axis=2).astype(np.int32) + 1
    # carve a guaranteed-tiny zone: a 5×5 patch with its own code
    pi, pj = int(rng.uniform(0, h - 5)), int(rng.uniform(0, w - 5))
    codes[pi : pi + 5, pj : pj + 5] = n_zones + 1
    codes[sea_mask(site, h, w)] = 0
    return codes


def zone_runs_wkb(codes: np.ndarray) -> list[tuple[int, bytes]]:
    """Vector polygon table: each zone as a WKB MultiPolygon that is
    the exact union of its per-row horizontal-run rectangles in pixel
    coordinates (pixel (r, c) covered by [c, c+1]×[r, r+1]). Pixel
    centers (c+0.5, r+0.5) tested against this geometry reproduce the
    raster bit-exactly — the FIXTURES.md §2b invariant."""
    h, w = codes.shape
    out = []
    for zone in np.unique(codes):
        rects = []
        for r in range(h):
            row = codes[r]
            c = 0
            while c < w:
                if row[c] == zone:
                    c0 = c
                    while c < w and row[c] == zone:
                        c += 1
                    rects.append((float(c0), float(r), float(c), float(r + 1)))
                else:
                    c += 1
        out.append((int(zone), _wkb_multipolygon(rects)))
    return out


def _wkb_multipolygon(rects: list[tuple[float, float, float, float]]) -> bytes:
    # little-endian WKB: MultiPolygon(6) of Polygon(3) with one ring each
    buf = [struct.pack("<BII", 1, 6, len(rects))]
    for x0, y0, x1, y1 in rects:
        ring = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        buf.append(struct.pack("<BIII", 1, 3, 1, len(ring)))
        for x, y in ring:
            buf.append(struct.pack("<dd", x, y))
    return b"".join(buf)


# ------------------------------------------------------------ rows

IMAGE_COLUMNS = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]

GAP_LADDER = [0.04, 0.15, 0.40, 0.96]


def layer_ts(t_index: int, jitter_minutes: int = 0) -> str:
    return (EPOCH + timedelta(hours=12 * t_index, minutes=jitter_minutes)).strftime(TS_FMT)


def image_row(site: str, role: str, ts: str, matrix: np.ndarray, fmt: str,
              gap_pct: int) -> tuple:
    payload = codecs.encode(matrix, fmt)
    h, w = matrix.shape
    caption = f"LST {site} {ts} gap={gap_pct}%"
    # phash computed on the decoded payload so lossless fmt is stable
    ph = codecs.phash64(codecs.decode(payload, h, w, fmt))
    return (f"{site}/{role}/{ts}", payload, int(w), int(h), fmt, caption, ph)


def site_rows(site: str, n_history: int = 24, n_inputs: int = 3,
              fmt: str = codecs.FMT_F64, shape: tuple[int, int] | None = None,
              jitter: bool = False) -> list[tuple]:
    """All image rows for one site: history layers on a 12H grid
    (small seeded jitter when ``jitter`` for Discretizator tests),
    then input layers carrying the gap ladder, then the Extra zone
    raster as ``role='extra'``."""
    h, w = shape or DEFAULT_SITES.get(site, (109, 62))
    rows = []
    for t in range(n_history):
        jm = int(_rng(site, "jit", t).integers(-90, 90)) if jitter else 0
        m = make_layer(site, h, w, t, "history", gap_frac=0.02)
        rows.append(image_row(site, "history", layer_ts(t, jm), m, fmt, 2))
    for k in range(n_inputs):
        t = n_history + k
        frac = GAP_LADDER[k % len(GAP_LADDER)]
        m = make_layer(site, h, w, t, "input", gap_frac=frac)
        rows.append(image_row(site, "input", layer_ts(t), m, fmt, int(frac * 100)))
    codes = zone_raster(site, h, w).astype(np.float64)
    rows.append(image_row(site, "extra", layer_ts(0), codes, codecs.FMT_F64, 0))
    return rows


def zones_vector_rows(site: str, shape: tuple[int, int] | None = None) -> list[tuple]:
    h, w = shape or DEFAULT_SITES.get(site, (109, 62))
    codes = zone_raster(site, h, w)
    return [(site, zone, wkb) for zone, wkb in zone_runs_wkb(codes)]


# ------------------------------------------------------------ Spark DFs


def images_df(spark, sites=("stp",), n_history: int = 24, n_inputs: int = 3,
              fmt: str = codecs.FMT_F64, jitter: bool = False,
              num_partitions: int | None = None,
              shape: tuple[int, int] | None = None):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ])
    rows = []
    for s in sites:
        rows.extend(site_rows(s, n_history, n_inputs, fmt, shape=shape,
                              jitter=jitter))
    # slice to the row count: the default createDataFrame slicing
    # (defaultParallelism) leaves mostly-empty pickled-RDD partitions
    # whose tasks still pay a Python-worker round trip on every
    # evaluation of this frame; per-image parallelism is preserved
    # (one row per slice) and callers that want more repartition.
    n_slices = max(1, min(len(rows),
                          spark.sparkContext.defaultParallelism))
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema)
    return df.repartition(num_partitions) if num_partitions else df


def zones_df(spark, sites=("stp",)):
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("site", T.StringType(), False),
        T.StructField("zone_id", T.IntegerType(), False),
        T.StructField("wkb", T.BinaryType(), False),
    ])
    rows = []
    for s in sites:
        rows.extend(zones_vector_rows(s))
    return spark.createDataFrame(rows, schema)


# ------------------------------------------------------ swath archives

SWATH_EXTENT = {"minX": 29.0, "minY": 59.0, "maxX": 31.0, "maxY": 60.5}
SWATH_RES = (1000.0, 1000.0)


def s3_swath_archive(site: str, t_index: int, h: int = 40, w: int = 32):
    """Deterministic SEN3-style zip: classic-NetCDF members with the
    reference's variable names (S3_L2_LST.py:101-141). The swath's
    lat/lon sit exactly on target-grid cell centers (inverse UTM), so
    the expected warp output is the cleaned grid itself — an exact,
    loop-checkable oracle. Stored UNflipped (the preparator flips,
    C9)."""
    import io as _io
    import zipfile

    from ssgp_toolbox_spark import geometry
    from ssgp_toolbox_spark.io import netcdf
    from ssgp_toolbox_spark.operators import swath_ingest as SW

    code, utm_ext = SW.utm_code_for_extent(SWATH_EXTENT)
    x_res, y_res = SWATH_RES
    utm_ext = dict(utm_ext)
    utm_ext["maxX"] = utm_ext["minX"] + w * x_res
    utm_ext["maxY"] = utm_ext["minY"] + h * y_res
    zone = code % 100

    grid = temperature_field(site, h, w, float(t_index))
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    cx = utm_ext["minX"] + (cols + 0.5) * x_res
    cy = utm_ext["maxY"] - (rows + 0.5) * y_res
    lon, lat = geometry.utm_unproject(cx, cy, zone)

    rng = _rng(site, "swath", t_index)
    conf = np.zeros((h, w), dtype=np.int32)
    bayes = np.zeros((h, w), dtype=np.int16)
    biome = np.ones((h, w), dtype=np.int16)
    conf[rng.random((h, w)) < 0.08] = SW.CLOUD_CONF_BIT + 1
    bayes[rng.random((h, w)) < 0.03] = SW.CLOUD_BAYES_BIT
    biome[sea_mask(site, h, w)] = 0

    buf = _io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("g/LST_in.nc",
                    netcdf.write_netcdf({"LST": np.flip(grid, 0).copy()}))
        zf.writestr("g/flags_in.nc", netcdf.write_netcdf(
            {"confidence_in": np.flip(conf, 0).copy(),
             "bayes_in": np.flip(bayes, 0).copy()}))
        zf.writestr("g/geodetic_in.nc", netcdf.write_netcdf(
            {"latitude_in": np.flip(lat, 0).copy(),
             "longitude_in": np.flip(lon, 0).copy(),
             "elevation_in": np.zeros((h, w))}))
        zf.writestr("g/LST_ancillary_ds.nc",
                    netcdf.write_netcdf({"biome": np.flip(biome, 0).copy()}))
    return buf.getvalue()


def swath_archives_df(spark, sites=("stp",), n: int = 2):
    """Swath-archive rows for the ingest query (SWATH_SCHEMA)."""
    from ssgp_toolbox_spark.operators import swath_ingest as SW

    rows = [(site, layer_ts(t), bytearray(s3_swath_archive(site, t)))
            for site in sites for t in range(n)]
    return spark.createDataFrame(rows, SW.SWATH_SCHEMA)


# MODIS sinusoidal tile fixture: regular sinusoidal grid covering the
# SWATH_EXTENT region (x = R·λ·cosφ, y = R·φ; R = 6371007.181)
MODIS_GT = (1.55e6, 1000.0, 0.0, 6.75e6, 0.0, -1000.0)
MODIS_HW = (200, 250)


def modis_tile(site: str, t_index: int):
    """Deterministic raw (lst_int16, qc_int16) MODIS-like tile."""
    h, w = MODIS_HW
    grid = temperature_field(site, h, w, float(t_index) + 0.5)
    lst_raw = np.round(grid * 50.0).astype(np.int16)
    rng = _rng(site, "modisqc", t_index)
    # two-bit QC classes: mostly 00 (ok), some 01/10 (gaps), 11 (skip)
    qc = rng.choice(np.array([0, 0, 0, 0, 0, 1, 2, 3], dtype=np.int16),
                    size=(h, w))
    qc[rng.random((h, w)) < 0.01] = -1  # srcNodata rows → NoData
    return lst_raw, qc


def modis_tiles_df(spark, sites=("stp",), n: int = 2):
    """MODIS tile rows for the ingest query (MODIS_SCHEMA); file names
    carry the A%Y%j acquisition-date convention (doy 254 = 2019-09-11
    + t)."""
    from ssgp_toolbox_spark.operators import swath_ingest as SW

    rows = []
    for site in sites:
        for t in range(n):
            lst_raw, qc = modis_tile(site, t)
            fname = f"MYD11A1.A2019{254 + t:03d}.h20v03.006.x.hdf"
            rows.append((site, fname, lst_raw.astype("<i2").tobytes(),
                         qc.astype("<i2").tobytes(),
                         MODIS_HW[0], MODIS_HW[1], list(MODIS_GT)))
    return spark.createDataFrame(rows, SW.MODIS_SCHEMA)


MOD09_BANDS = (1, 2, 3, 4, 5, 7)  # the bands the reference products use


def mod09_tile(site: str, t_index: int):
    """Deterministic raw MOD09GA-like subdataset arrays: surface-
    reflectance bands b1..b5,b7 as int16 (reflectance × 1e4) and the
    state_1km QC grid. A few pixels are planted with out-of-physics
    reflectances (negative / >1, both occur in real MOD09 granules)
    so the NDVI/albedo range clamps have discriminating rows."""
    h, w = MODIS_HW
    base = temperature_field(site, h, w, float(t_index) + 0.25)
    norm = (base - base.min()) / (np.ptp(base) + 1e-9)
    bands = {}
    for b in MOD09_BANDS:
        refl = norm * (0.30 + 0.04 * b) + 0.015 * b
        bands[b] = np.round(refl * 10000.0).astype(np.int16)
    # planted clamp triggers (fixed pixels, values set on every band
    # involved so no accidental zero-denominator NDVI pixels)
    for r, c in ((3, 5), (40, 60), (97, 123)):
        bands[1][r, c], bands[2][r, c] = 500, -600       # NDVI > 1
        bands[3][r, c] = bands[4][r, c] = 200
        bands[5][r, c] = bands[7][r, c] = -9000          # albedo < 0
    for r, c in ((7, 11), (55, 81)):
        for b in MOD09_BANDS:
            bands[b][r, c] = 31000                       # albedo > 1
        bands[1][r, c], bands[2][r, c] = -500, 600       # NDVI < -1
    rng = _rng(site, "mod09qc", t_index)
    qc = rng.choice(np.array([0, 0, 0, 0, 0, 1, 2, 3], dtype=np.int16),
                    size=(h, w))
    qc[rng.random((h, w)) < 0.01] = -1  # srcNodata rows → NoData
    return bands, qc


def mod09_tiles_df(spark, sites=("stp",), n: int = 2):
    """MOD09GA tile rows (MOD09_SCHEMA); file names carry the A%Y%j
    acquisition-date convention."""
    from ssgp_toolbox_spark.operators import swath_ingest as SW

    rows = []
    for site in sites:
        for t in range(n):
            bands, qc = mod09_tile(site, t)
            fname = f"MOD09GA.A2019{254 + t:03d}.h20v03.006.x.hdf"
            rows.append((site, fname,
                         *[bands[b].astype("<i2").tobytes()
                           for b in MOD09_BANDS],
                         qc.astype("<i2").tobytes(),
                         MODIS_HW[0], MODIS_HW[1], list(MODIS_GT)))
    return spark.createDataFrame(rows, SW.MOD09_SCHEMA)
