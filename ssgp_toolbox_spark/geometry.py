"""Vector geometry: WKB polygons, point-in-polygon, zone rasterization.

The reference's only vector-zone notion is the integer Extra/biome
raster looked up per pixel (J7, gapfiller.py:503; water mask biome==0,
S3_L2_LST.py:149). This engine upgrades it to a real vector polygon
table ``(site, zone_id, wkb)`` (FIXTURES.md §2b) joined to pixels by
**point-in-polygon** — the axes A+B requirement — while guaranteeing
bit-parity with the raster lookup (the generator's invariant:
rasterize(zones_vector) == zones_raster).

shapely is not available in this sandbox, so WKB parsing (little-
endian Polygon/MultiPolygon) and the even-odd ray-casting test are
implemented here in vectorized numpy. Pixel centers sit at half-
integer coordinates while zone rectangle edges are integers, so no
point ever lies on a boundary and the even-odd rule is unambiguous.

Spark mapping: polygons are small per site → carried to executors as
packed rows (broadcast by AQE in the site join); the PIP evaluation
runs batched inside pandas UDFs, one call per site/tile, never per
pixel-row.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def parse_wkb_polygons(wkb: bytes) -> list[list[np.ndarray]]:
    """→ list of polygons, each a list of rings ((n, 2) float arrays).
    Supports little-endian Polygon and MultiPolygon."""

    def read_polygon(buf: bytes, pos: int):
        if buf[pos] != 1:
            raise ValueError("only little-endian WKB supported")
        (gtype, nrings) = struct.unpack_from("<II", buf, pos + 1)
        if gtype != _WKB_POLYGON:
            raise ValueError(f"expected Polygon, got type {gtype}")
        pos += 9
        rings = []
        for _ in range(nrings):
            (npts,) = struct.unpack_from("<I", buf, pos)
            pos += 4
            pts = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=pos)
            rings.append(pts.reshape(npts, 2).copy())
            pos += npts * 16
        return rings, pos

    if wkb[0] != 1:
        raise ValueError("only little-endian WKB supported")
    (gtype,) = struct.unpack_from("<I", wkb, 1)
    if gtype == _WKB_POLYGON:
        rings, _ = read_polygon(wkb, 0)
        return [rings]
    if gtype == _WKB_MULTIPOLYGON:
        (n,) = struct.unpack_from("<I", wkb, 5)
        pos = 9
        out = []
        for _ in range(n):
            rings, pos = read_polygon(wkb, pos)
            out.append(rings)
        return out
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def points_in_rings(px: np.ndarray, py: np.ndarray,
                    rings: list[np.ndarray]) -> np.ndarray:
    """Even-odd ray casting, vectorized over points. A point is inside
    a polygon if it crosses an odd number of edges over all rings
    (holes handled automatically)."""
    shape = px.shape
    p = px.ravel()[None, :]  # (1, N)
    q = py.ravel()[None, :]
    # gather all edges of all rings: (E, 1) columns broadcast vs points
    xa = np.concatenate([r[:-1, 0] for r in rings])[:, None]
    ya = np.concatenate([r[:-1, 1] for r in rings])[:, None]
    xb = np.concatenate([r[1:, 0] for r in rings])[:, None]
    yb = np.concatenate([r[1:, 1] for r in rings])[:, None]
    cross = (ya > q) != (yb > q)  # (E, N)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (q - ya) / (yb - ya)
        xs = xa + t * (xb - xa)
    hits = cross & (p < xs)
    return (hits.sum(axis=0) % 2 == 1).reshape(shape)


def points_in_wkb(px: np.ndarray, py: np.ndarray, wkb: bytes) -> np.ndarray:
    polys = parse_wkb_polygons(wkb)
    out = np.zeros(px.shape, dtype=bool)
    for rings in polys:
        out |= points_in_rings(px, py, rings)
    return out


def rasterize_zones(zone_rows: list[tuple[int, bytes]], h: int, w: int,
                    fill: float = 0.0) -> np.ndarray:
    """PIP join evaluated densely: zone id per pixel center
    (col+0.5, row+0.5). Lowest zone_id wins overlaps (deterministic
    tie-break). Inverse of generator.zone_runs_wkb."""
    out = np.full((h, w), fill)
    claimed = np.zeros((h, w), dtype=bool)
    py, px = np.mgrid[0:h, 0:w]
    px = px + 0.5
    py = py + 0.5
    for zone_id, wkb in sorted(zone_rows, key=lambda r: r[0]):
        m = points_in_wkb(px, py, wkb) & ~claimed
        out[m] = float(zone_id)
        claimed |= m
    return out


# ------------------------------------------------------------ UTM (C4)

_WGS84_A = 6378137.0
_WGS84_F = 1 / 298.257223563
_K0 = 0.9996


def utm_project(lon, lat, zone: int, south: bool = False):
    """WGS84 → UTM (Transverse Mercator, Snyder series) — the
    reference's pyproj reprojection (C4, S3_L2_LST.py:83-87) without
    pyproj (not in this sandbox). Vectorized numpy; sub-mm agreement
    with the standard series at mid-latitudes.

    Returns (easting, northing) in meters."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    a, f, k0 = _WGS84_A, _WGS84_F, _K0
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    lam0 = np.deg2rad((zone - 1) * 6 - 180 + 3)
    phi = np.deg2rad(lat)
    lam = np.deg2rad(lon)
    sin_p, cos_p, tan_p = np.sin(phi), np.cos(phi), np.tan(phi)
    N = a / np.sqrt(1 - e2 * sin_p**2)
    T = tan_p**2
    C = ep2 * cos_p**2
    A = (lam - lam0) * cos_p
    e4, e6 = e2**2, e2**3
    M = a * (
        (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * np.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * np.sin(4 * phi)
        - (35 * e6 / 3072) * np.sin(6 * phi)
    )
    x = k0 * N * (
        A + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    ) + 500000.0
    y = k0 * (
        M + N * tan_p * (
            A**2 / 2 + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    if south:
        y = y + 10_000_000.0
    return x, y


def utm_unproject(x, y, zone: int, south: bool = False):
    """UTM → WGS84 (inverse Transverse Mercator, Snyder series) — the
    inverse of ``utm_project``: round-trips to < 1e-6 deg (~0.1 m) at
    mid-latitudes (property-tested). Needed to place target-grid cell
    centers back on the swath's lat/lon plane (geoloc warp) without
    pyproj. Returns (lon, lat) in degrees."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    a, f, k0 = _WGS84_A, _WGS84_F, _K0
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    e1 = (1 - np.sqrt(1 - e2)) / (1 + np.sqrt(1 - e2))
    lam0 = np.deg2rad((zone - 1) * 6 - 180 + 3)
    xs = x - 500000.0
    ys = y - 10_000_000.0 if south else y
    M = ys / k0
    mu = M / (a * (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256))
    phi1 = (
        mu
        + (3 * e1 / 2 - 27 * e1**3 / 32) * np.sin(2 * mu)
        + (21 * e1**2 / 16 - 55 * e1**4 / 32) * np.sin(4 * mu)
        + (151 * e1**3 / 96) * np.sin(6 * mu)
        + (1097 * e1**4 / 512) * np.sin(8 * mu)
    )
    sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
    C1 = ep2 * cos1**2
    T1 = tan1**2
    N1 = a / np.sqrt(1 - e2 * sin1**2)
    R1 = a * (1 - e2) / (1 - e2 * sin1**2) ** 1.5
    D = xs / (N1 * k0)
    lat = phi1 - (N1 * tan1 / R1) * (
        D**2 / 2
        - (5 + 3 * T1 + 10 * C1 - 4 * C1**2 - 9 * ep2) * D**4 / 24
        + (61 + 90 * T1 + 298 * C1 + 45 * T1**2 - 252 * ep2 - 3 * C1**2)
        * D**6 / 720
    )
    lon = lam0 + (
        D - (1 + 2 * T1 + C1) * D**3 / 6
        + (5 - 2 * C1 + 28 * T1 - 3 * C1**2 + 8 * ep2 + 24 * T1**2)
        * D**5 / 120
    ) / cos1
    return np.rad2deg(lon), np.rad2deg(lat)


# ------------------------------------------------------------ Spark ops

EXTRA_SCHEMA = T.StructType([
    T.StructField("site", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
])


def zones_to_extra(zones: DataFrame, dims: DataFrame) -> DataFrame:
    """Vector zone table → per-site Extra raster layers (the J7 PIP
    join materialized per site). ``dims``: (site, h, w) per site.
    Plan: pack polygons per site (small), join dims, evaluate PIP in
    one pandas call per site."""
    packed = zones.groupBy("site").agg(
        F.collect_list(F.struct("zone_id", "wkb")).alias("zs")
    ).join(dims, "site")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in pdf.itertuples(index=False):
            h, w = int(r.h), int(r.w)
            raster = rasterize_zones(
                [(z["zone_id"], z["wkb"]) for z in r.zs], h, w
            )
            rows.append({
                "site": r.site,
                "bytes": codecs.encode(raster, codecs.FMT_F64),
                "h": h, "w": w, "fmt": codecs.FMT_F64,
            })
        return pd.DataFrame(rows, columns=EXTRA_SCHEMA.fieldNames())

    return packed.groupBy("site").applyInPandas(fn, EXTRA_SCHEMA)
