"""Nearest-neighbor interpolation fill (EP2 of the reference).

Reimplements ``SimpleSpatialGapfiller.nn_interpolation``
(gapfiller.py:901-967) without scipy: for every flagged pixel, take
the value of the nearest valid pixel (Euclidean distance over (row,
col), first-index tie-break). skip/NoData are flattened into the fill
set, filled, then restored from the pristine copy
(gapfiller.py:938-962).

scipy.interpolate.griddata(method='nearest') is a cKDTree 1-NN query;
brute-force with chunking is exact at tile scale (≤256×256 px) and
fully vectorized.
"""

from __future__ import annotations

import numpy as np

from ssgp_toolbox_spark.sentinels import DEFAULT_SENTINELS, Sentinels

MIN_VALID = 10  # reference viability threshold for EP2 (gapfiller.py:924-929)


def nn_fill_values(points: np.ndarray, values: np.ndarray,
                   targets: np.ndarray, chunk: int = 1024,
                   return_d2: bool = False):
    """1-NN lookup over an arbitrary point cloud: nearest of
    ``points`` for each of ``targets``, ties broken by first index
    (stable argmin). O(targets × points) — used for halo-window point
    clouds (tiled_fill) and as the small-scale oracle-compatible path;
    dense rasters use ``nn_lookup_grid`` below. ``return_d2`` also
    returns each target's nearest squared distance (the tiled path's
    exactness bound needs it)."""
    out = np.empty(len(targets), dtype=values.dtype)
    d2min = np.empty(len(targets), dtype=np.float64)
    pts = points.astype(np.float64)
    for s in range(0, len(targets), chunk):
        t = targets[s : s + chunk].astype(np.float64)
        d2 = ((t[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)
        out[s : s + chunk] = values[best]
        d2min[s : s + chunk] = d2[np.arange(len(t)), best]
    return (out, d2min) if return_d2 else out


def _column_nearest(valid: np.ndarray):
    """Per (row, col): nearest valid row in that column above/below
    (vectorized accumulate over rows)."""
    H, W = valid.shape
    idx = np.arange(H)[:, None]
    above = np.maximum.accumulate(np.where(valid, idx, -1), axis=0)
    below = np.minimum.accumulate(np.where(valid, idx, 2 * H)[::-1], axis=0)[::-1]
    return above, below


def nn_lookup_grid(matrix: np.ndarray, valid: np.ndarray,
                   targets: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """Exact grid 1-NN with the same (distance, row-major index)
    tie-break as the brute-force path, in O(W) per target instead of
    O(valid): per-column nearest-valid-row prepass, then for each
    target one sweep over columns with an integer (d², r, c) composite
    key. Bandwidth-light — this is what lets the NN fill scale with
    cores instead of saturating memory.

    Targets are processed in ``chunk``-sized blocks so the (T, W)
    int64 temporaries stay cache-sized: measured ~13× faster than the
    single (27k × W) sweep on a 96%-gap 200×160 raster, per-target
    argmin unchanged → bit-identical output."""
    H, W = matrix.shape
    above, below = _column_nearest(valid)
    out = np.empty(len(targets), dtype=matrix.dtype)
    cols = np.arange(W, dtype=np.int64)[None, :]
    sentinel = np.iinfo(np.int64).max
    for s in range(0, len(targets), chunk):
        t = targets[s : s + chunk]
        tr, tc = t[:, 0], t[:, 1]
        a = above[tr]                       # (t, W)
        b = below[tr]
        d_up = tr[:, None] - a
        d_dn = b - tr[:, None]
        no_up = a < 0
        no_dn = b >= 2 * H
        use_up = (d_up <= d_dn) & ~no_up | no_dn  # tie → smaller row
        rbest = np.where(use_up, a, b)
        dr = np.where(use_up, d_up, d_dn).astype(np.int64)
        dc = tc[:, None] - cols
        d2 = dr * dr + dc * dc
        key = d2 * (H * W) + rbest * W + cols
        key[no_up & no_dn] = sentinel        # empty column
        k = np.argmin(key, axis=1)
        rows_sel = rbest[np.arange(len(t)), k]
        out[s : s + chunk] = matrix[rows_sel, k.astype(np.int64)]
    return out


def nn_interpolate(matrix: np.ndarray,
                   sv: Sentinels = DEFAULT_SENTINELS):
    """Returns (filled matrix, status) where status ∈
    {'filled', 'passthrough', 'not_enough_valid'} mirroring the
    reference's branches (gapfiller.py:920-962)."""
    m = np.asarray(matrix, dtype=np.float64)
    invalid = (m == sv.gap) | (m == sv.skip) | (m == sv.nodata)
    n_valid = int((~invalid).sum())
    if n_valid <= MIN_VALID:
        return m.copy(), "not_enough_valid"
    if (m == sv.gap).sum() == 0:
        return m.copy(), "passthrough"
    work = m.copy()
    # flatten skip/NoData into the fill set (gapfiller.py:942-944)
    work[(work == sv.skip) | (work == sv.nodata)] = sv.gap
    fill_targets = np.argwhere(work == sv.gap)
    work[fill_targets[:, 0], fill_targets[:, 1]] = nn_lookup_grid(
        work, work != sv.gap, fill_targets
    )
    # restore pristine skip/NoData (gapfiller.py:960-962)
    work[m == sv.skip] = sv.skip
    work[m == sv.nodata] = sv.nodata
    return work, "filled"
