"""Swath ingest chain: classic-NetCDF IO round-trip, inverse UTM,
flag/flip/trim semantics, warp exactness (grid → swath → grid), and
the Spark archive-to-grid operator end-to-end."""

import io
import zipfile

import numpy as np
import pytest

from ssgp_toolbox_spark import codecs, geometry
from ssgp_toolbox_spark.io import netcdf
from ssgp_toolbox_spark.operators import swath_ingest as SW
from ssgp_toolbox_spark.sentinels import GAP, NODATA, SKIP

EXTENT = {"minX": 29.0, "minY": 59.0, "maxX": 31.0, "maxY": 60.5}


def test_netcdf_roundtrip_all_types():
    rng = np.random.default_rng(0)
    vars_in = {
        "LST": rng.normal(290, 5, (12, 9)),
        "confidence_in": rng.integers(0, 2 ** 15, (12, 9)).astype(np.int32),
        "bayes_in": rng.integers(0, 4, (12, 9)).astype(np.int16),
        "latitude_in": np.linspace(50, 60, 108).reshape(12, 9),
        "f32": rng.normal(0, 1, (5,)).astype(np.float32),
    }
    out, _ = netcdf.read_netcdf(netcdf.write_netcdf(vars_in))
    for k, v in vars_in.items():
        assert out[k].shape == v.shape
        assert np.allclose(out[k].astype(np.float64), v.astype(np.float64))


def test_netcdf_hdf5_gate():
    with pytest.raises(netcdf.NetCDF4Unsupported):
        netcdf.read_netcdf(b"\x89HDF\r\n\x1a\n" + b"x" * 64)


def test_utm_unproject_roundtrip():
    rng = np.random.default_rng(1)
    lat = rng.uniform(30, 70, 500)
    lon = rng.uniform(24, 30, 500)
    x, y = geometry.utm_project(lon, lat, 35)
    lon2, lat2 = geometry.utm_unproject(x, y, 35)
    assert np.abs(lon2 - lon).max() < 1e-6
    assert np.abs(lat2 - lat).max() < 1e-6


def test_utm_code_for_extent():
    code, utm_ext = SW.utm_code_for_extent(EXTENT)
    assert code == 32636  # centroid lon 30.0 → zone 36, north
    assert utm_ext["minX"] < utm_ext["maxX"]
    assert utm_ext["minY"] < utm_ext["maxY"]
    code_s, _ = SW.utm_code_for_extent(
        {"minX": -70.0, "minY": -35.0, "maxX": -68.0, "maxY": -33.0})
    assert 32700 < code_s < 32761


def test_clean_s3_swath_semantics():
    h, w = 6, 4
    lst = np.full((h, w), 290.0)
    conf = np.zeros((h, w), dtype=np.int32)
    bayes = np.zeros((h, w), dtype=np.int16)
    biome = np.ones((h, w), dtype=np.int16)
    lat = np.tile(np.linspace(62, 57, h)[:, None], (1, w))  # row 0 north
    lon = np.full((h, w), 30.0)
    conf[1, 1] = SW.CLOUD_CONF_BIT + 5     # summand decode
    bayes[2, 2] = SW.CLOUD_BAYES_BIT + 1
    biome[3, 3] = 0
    conf[3, 3] = SW.CLOUD_CONF_BIT        # cloud over sea → SKIP wins
    lat[0, 0] = EXTENT["maxY"] + SW.LAT_MARGIN_DEG + 1  # row 0 trimmed

    m, lats, lons = SW.clean_s3_swath(lst, conf, bayes, biome, lat, lon, EXTENT)
    assert m.shape == (h - 1, w)           # one row trimmed
    # flip: original row i lands at flipped index h-1-i, then row 0 of
    # the FLIPPED stack (= original row 5) survives; trimmed row was
    # original row 0 = flipped index 5
    # trimmed row (original 0) is the LAST flipped index, so kept rows
    # keep their flipped positions: original row i → m[h-1-i]
    assert m[h - 1 - 1, 1] == GAP          # original (1,1) cloud
    assert m[h - 1 - 2, 2] == GAP          # original (2,2) bayes cloud
    assert m[h - 1 - 3, 3] == SKIP         # original (3,3) sea beats cloud
    assert lats[0, 0] < lat[0, 0]


def _grid_swath(h=20, w=16, x_res=1000.0, y_res=1000.0):
    """Synthetic swath whose pixels sit exactly on grid cell centers
    (via inverse projection) — the warp must reconstruct the grid."""
    code, utm_ext = SW.utm_code_for_extent(EXTENT)
    utm_ext = dict(utm_ext)
    utm_ext["maxX"] = utm_ext["minX"] + w * x_res
    utm_ext["maxY"] = utm_ext["minY"] + h * y_res
    zone = code % 100
    rng = np.random.default_rng(7)
    grid = rng.normal(290, 5, (h, w))
    cols, rows = np.meshgrid(np.arange(w), np.arange(h))
    cx = utm_ext["minX"] + (cols + 0.5) * x_res
    cy = utm_ext["maxY"] - (rows + 0.5) * y_res
    lon, lat = geometry.utm_unproject(cx, cy, zone)
    return grid, lat, lon, code, utm_ext, x_res, y_res


def test_warp_roundtrip_exact():
    grid, lat, lon, code, utm_ext, x_res, y_res = _grid_swath()
    got = SW.warp_to_grid(grid, lat, lon, code, utm_ext, x_res, y_res)
    assert got.shape == grid.shape
    assert np.array_equal(got, grid)


def test_warp_nodata_and_nearest_winner():
    grid, lat, lon, code, utm_ext, x_res, y_res = _grid_swath(8, 8)
    # drop half the swath: those cells must become NoData
    keep = np.ones_like(grid, dtype=bool)
    keep[::2, :] = False
    got = SW.warp_to_grid(grid[keep][None, :], lat[keep][None, :],
                          lon[keep][None, :], code, utm_ext, x_res, y_res)
    assert (got[::2, :] == NODATA).all()
    assert np.array_equal(got[1::2, :], grid[1::2, :])
    # two candidates in one cell: nearest to the center wins
    zone = code % 100
    cx = utm_ext["minX"] + 0.5 * x_res
    cy = utm_ext["maxY"] - 0.5 * y_res
    lon_c, lat_c = geometry.utm_unproject(np.array([cx, cx + 0.3 * x_res]),
                                          np.array([cy, cy]), zone)
    got = SW.warp_to_grid(np.array([[111.0, 222.0]]),
                          lat_c[None, :], lon_c[None, :],
                          code, utm_ext, x_res, y_res)
    assert got[0, 0] == 111.0


def _s3_zip(h=20, w=16):
    grid, lat, lon, code, utm_ext, x_res, y_res = _grid_swath(h, w)
    # swath arrays are stored UNflipped: clean flips them (C9)
    lst = np.flip(grid, axis=0).copy()
    conf = np.zeros((h, w), dtype=np.int32)
    bayes = np.zeros((h, w), dtype=np.int16)
    biome = np.ones((h, w), dtype=np.int16)
    conf[2, 3] = SW.CLOUD_CONF_BIT     # → flipped (h-3, 3) cloud gap
    biome[4, 5] = 0                    # → flipped (h-5, 5) sea skip
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("g/LST_in.nc", netcdf.write_netcdf({"LST": lst}))
        zf.writestr("g/flags_in.nc", netcdf.write_netcdf(
            {"confidence_in": conf, "bayes_in": bayes}))
        zf.writestr("g/geodetic_in.nc", netcdf.write_netcdf(
            {"latitude_in": np.flip(lat, 0).copy(),
             "longitude_in": np.flip(lon, 0).copy(),
             "elevation_in": np.zeros((h, w))}))
        zf.writestr("g/LST_ancillary_ds.nc", netcdf.write_netcdf(
            {"biome": biome}))
    expected = grid.copy()
    expected[h - 3, 3] = GAP
    expected[h - 5, 5] = SKIP
    return buf.getvalue(), expected, (x_res, y_res)


def test_ingest_s3_archives_spark(spark):
    payload, expected, (x_res, y_res) = _s3_zip()
    df = spark.createDataFrame(
        [("stp", "20190910T080757", bytearray(payload))], SW.SWATH_SCHEMA)
    out = SW.ingest_s3_archives(df, EXTENT, x_res, y_res).collect()
    assert len(out) == 1
    r = out[0]
    assert r["image_id"] == "stp/input/20190910T080757"
    got = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
    # the fixture's utm extent was widened to the grid — rebuild it the
    # same way the operator does NOT know it, so compare on the
    # operator's own grid: every expected cell value must appear where
    # the warp put it; with cell-centered points the grids agree on
    # the overlapping window
    assert got.shape[0] >= expected.shape[0] - 1
    assert (got != NODATA).sum() == expected.size
    vals_got = np.sort(got[got != NODATA].ravel())
    assert np.array_equal(vals_got, np.sort(expected.ravel()))
    assert (got == GAP).sum() == 1 and (got == SKIP).sum() == 1


def test_engine_matches_naive_oracle():
    """Bit parity: the vectorized warp chain equals the naive
    per-pixel transcription on the generator's archive fixtures."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import oracles

    from ssgp_toolbox_spark import generator

    for t in range(2):
        zb = generator.s3_swath_archive("stp", t)
        naive = oracles.swath_ingest_oracle(
            zb, generator.SWATH_EXTENT, *generator.SWATH_RES)
        arrs = SW.s3_archive_to_arrays(zb)
        m, lats, lons = SW.clean_s3_swath(
            arrs["LST"], arrs["confidence_in"], arrs["bayes_in"],
            arrs["biome"], arrs["latitude_in"], arrs["longitude_in"],
            generator.SWATH_EXTENT)
        code, utm_ext = SW.utm_code_for_extent(generator.SWATH_EXTENT)
        grid = SW.warp_to_grid(m, lats, lons, code, utm_ext,
                               *generator.SWATH_RES)
        assert np.array_equal(grid, naive)


def test_modis_quality_policies():
    qc = np.array([[0, 1, 2, 3, -1, 64 + 1]], dtype=np.int16)
    q0 = SW.modis_quality(qc, qa_policy=0)
    assert q0.tolist() == [[0, 1, 1, 2, 3, 1]]
    q1 = SW.modis_quality(qc, qa_policy=1)
    assert q1.tolist() == [[0, 0, 1, 2, 3, 0]]


def test_sinusoidal_inverse_known_points():
    R = SW.MODIS_SPHERE_R
    lon, lat = SW.sinusoidal_to_latlon(0.0, R * np.deg2rad(60.0))
    assert abs(lat - 60.0) < 1e-9 and abs(lon) < 1e-9
    x = R * np.deg2rad(30.0) * np.cos(np.deg2rad(60.0))
    lon, lat = SW.sinusoidal_to_latlon(x, R * np.deg2rad(60.0))
    assert abs(lon - 30.0) < 1e-9


def test_modis_datetime_parsing():
    assert SW.modis_datetime("MYD11A1.A2019254.h20v03.006.x.hdf") == \
        "20190911T000000"
    assert SW.modis_datetime("MOD11_L2.A2020048.1915.006.x.hdf") == \
        "20200217T191500"


def test_modis_engine_matches_naive_oracle():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import oracles

    from ssgp_toolbox_spark import generator

    for t in range(2):
        lst_raw, qc = generator.modis_tile("stp", t)
        naive = oracles.modis_ingest_oracle(
            lst_raw, qc, generator.MODIS_GT, generator.SWATH_EXTENT,
            *generator.SWATH_RES)
        m = SW.prepare_modis_lst(lst_raw, qc, qa_policy=0)
        lon, lat = SW.modis_grid_latlon(generator.MODIS_GT, *lst_raw.shape)
        code, utm_ext = SW.utm_code_for_extent(generator.SWATH_EXTENT)
        grid = SW.warp_to_grid(m, lat, lon, code, utm_ext,
                               *generator.SWATH_RES)
        assert np.array_equal(grid, naive)
        assert (grid != NODATA).sum() > 0


def test_ingest_modis_grids_spark(spark):
    from ssgp_toolbox_spark import generator

    tiles = generator.modis_tiles_df(spark, sites=("stp",), n=1)
    out = SW.ingest_modis_grids(
        tiles, generator.SWATH_EXTENT, *generator.SWATH_RES).collect()
    assert len(out) == 1
    r = out[0]
    assert r["image_id"] == "stp/input/20190911T000000"
    got = codecs.decode(bytes(r["bytes"]), r["h"], r["w"], r["fmt"])
    assert (got != NODATA).sum() > 0
    assert (got == GAP).sum() > 0 and (got == SKIP).sum() > 0


def test_mod09_quality_policies():
    """MOD09 mapping differs from LST: '11' is OK at policy 0, only
    '01' gaps at policy 1, no skip class (MOD09GA.py:84-110)."""
    qc = np.array([[0, 1, 2, 3, -1, -32768]], dtype=np.int16)
    q0 = SW.mod09_quality(qc, qa_policy=0)
    assert q0.tolist() == [[0, 1, 1, 0, 3, 3]]
    q1 = SW.mod09_quality(qc, qa_policy=1)
    assert q1.tolist() == [[0, 1, 0, 0, 3, 3]]
    assert 2 not in q0 and 2 not in q1


def test_mod09_engine_matches_naive_oracle():
    """prepare_mod09 + warp == the per-pixel naive transcription,
    bit-for-bit, for both products; planted clamp pixels are GAP."""
    import oracles

    from ssgp_toolbox_spark import generator

    bands, qc = generator.mod09_tile("stp", 0)
    for product in ("ndvi", "albedo"):
        m = SW.prepare_mod09(bands, qc, product=product)
        lon, lat = SW.modis_grid_latlon(
            generator.MODIS_GT, *m.shape)
        utm_code, utm_extent = SW.utm_code_for_extent(
            generator.SWATH_EXTENT)
        got = SW.warp_to_grid(
            m, lat, lon, utm_code, utm_extent, *generator.SWATH_RES)
        exp = oracles.mod09_ingest_oracle(
            bands, qc, generator.MODIS_GT, generator.SWATH_EXTENT,
            *generator.SWATH_RES, product=product)
        np.testing.assert_array_equal(got, exp)
    # the planted out-of-range pixels clamp to GAP on the source grid
    m_ndvi = SW.prepare_mod09(bands, qc, product="ndvi")
    m_alb = SW.prepare_mod09(bands, qc, product="albedo")
    for r, c in ((3, 5), (7, 11)):
        assert m_ndvi[r, c] == oracles.GAP
        assert m_alb[r, c] == oracles.GAP
