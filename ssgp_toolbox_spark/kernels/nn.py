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

from ssgp_toolbox_spark.sentinels import GAP, NODATA, SKIP

MIN_VALID = 10  # reference viability threshold for EP2 (gapfiller.py:924-929)


def nn_fill_values(points: np.ndarray, values: np.ndarray,
                   targets: np.ndarray, chunk: int = 1024) -> np.ndarray:
    """1-NN lookup: nearest of ``points`` for each of ``targets``.
    Ties broken by first index (stable argmin)."""
    out = np.empty(len(targets), dtype=values.dtype)
    pts = points.astype(np.float64)
    for s in range(0, len(targets), chunk):
        t = targets[s : s + chunk].astype(np.float64)
        d2 = ((t[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
        out[s : s + chunk] = values[np.argmin(d2, axis=1)]
    return out


def nn_interpolate(matrix: np.ndarray):
    """Returns (filled matrix, status) where status ∈
    {'filled', 'passthrough', 'not_enough_valid'} mirroring the
    reference's branches (gapfiller.py:920-962)."""
    m = np.asarray(matrix, dtype=np.float64)
    invalid = (m == GAP) | (m == SKIP) | (m == NODATA)
    n_valid = int((~invalid).sum())
    if n_valid <= MIN_VALID:
        return m.copy(), "not_enough_valid"
    if (m == GAP).sum() == 0:
        return m.copy(), "passthrough"
    work = m.copy()
    # flatten skip/NoData into the fill set (gapfiller.py:942-944)
    work[(work == SKIP) | (work == NODATA)] = GAP
    fill_targets = np.argwhere(work == GAP)
    valid_pts = np.argwhere(work != GAP)
    vals = work[valid_pts[:, 0], valid_pts[:, 1]]
    work[fill_targets[:, 0], fill_targets[:, 1]] = nn_fill_values(
        valid_pts, vals, fill_targets
    )
    # restore pristine skip/NoData (gapfiller.py:960-962)
    work[m == SKIP] = SKIP
    work[m == NODATA] = NODATA
    return work, "filled"
