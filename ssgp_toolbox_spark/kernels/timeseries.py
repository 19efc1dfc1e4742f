"""Temporal-stack kernels for the Discretizator (reference EP3).

Reimplements the semantics of ``Discretizator`` (timeseries.py):

- regular-grid bucket assignment [t_i, t_{i+1}) with the reference's
  grid construction: start = midnight of the first layer's date, end
  = midnight of (last layer's date + 1 day), trailing empty bucket
  dropped (timeseries.py:73-98);
- collision resolution: 'None' → nearest-to-centroid (argmin, earlier
  layer wins ties, timeseries.py:108-123); 'simple' → per-pixel mean;
  'weighted' → distance-rank weights n..1 (timeseries.py:126-182).
  NOTE (parity quirk): the reference averages sentinel values blindly
  — a gap pixel (-100) participates in the mean. Reproduced as-is.
- per-pixel temporal gap fill, 'median'/'poly' (timeseries.py:190-267):
  **sequential** — the known-index set is recomputed after every
  filled gap, so previously filled values become neighbors of later
  gaps. Order dependency is part of the contract (SURVEY.md §7
  "do not helpfully parallelize").

Vectorization strategy: the neighbor-index schedule of the sequential
fill depends only on the *gap pattern* (boolean mask along t), not on
pixel values. Pixels are therefore grouped by identical pattern; for
each pattern class the schedule is computed once and applied to all
member pixels at once (nanmedian / shared-Vandermonde lstsq across
the class). Bit-exact with the reference loop, ~pixels/patterns times
faster.
"""

from __future__ import annotations

import numpy as np

from ssgp_toolbox_spark.sentinels import DEFAULT_SENTINELS, Sentinels


def neighbor_schedule(gap_mask: np.ndarray, n_neighbors: int):
    """For one gap pattern (1-D bool, True = gap) return the ordered
    list of (gap_index, neighbor_indices) exactly as the reference's
    sequential loop would visit them (timeseries.py:213-235):
    gaps in ascending index order; after each fill the index becomes
    known."""
    known = ~gap_mask.copy()
    schedule = []
    for g in np.flatnonzero(gap_mask):
        i_known = np.flatnonzero(known)
        d = np.abs(i_known - g)
        order = np.argsort(d, kind="stable")[:n_neighbors]
        schedule.append((int(g), i_known[order]))
        known[g] = True
    return schedule


def _fill_pattern_median(stack: np.ndarray, cols: np.ndarray,
                         schedule, n_neighbors: int) -> None:
    for g, nbrs in schedule:
        if len(nbrs) == 0:  # series with no known values at all -> NaN
            stack[g, cols] = np.nan
            continue
        vals = stack[np.ix_(nbrs, cols)]
        stack[g, cols] = np.nanmedian(vals, axis=0)


def _fill_pattern_poly(stack: np.ndarray, cols: np.ndarray,
                       schedule, poly_degree: int) -> None:
    for g, nbrs in schedule:
        if len(nbrs) == 0:  # reference would crash here (empty polyfit);
            stack[g, cols] = np.nan  # we define it as NaN instead
            continue
        x = nbrs.astype(np.float64)
        Y = stack[np.ix_(nbrs, cols)]  # (k, m)
        coefs = np.polyfit(x, Y, poly_degree)  # (deg+1, m)
        powers = np.vander([float(g)], poly_degree + 1)[0]  # highest first
        stack[g, cols] = powers @ coefs


def fill_stack(stack: np.ndarray, filling_method: str | None,
               n_neighbors: int = 5, poly_degree: int = 2,
               sv: Sentinels = DEFAULT_SENTINELS) -> np.ndarray:
    """Apply the per-pixel series rules to a (T, H, W) or (T, N)
    stack: any skip in a series → whole series skip
    (timeseries.py:293-295); series with gaps filled per
    ``filling_method`` ('None'/None → left as-is)."""
    orig_shape = stack.shape
    T = orig_shape[0]
    flat = stack.reshape(T, -1).astype(np.float64, copy=True)

    skip_cols = (flat == sv.skip).any(axis=0)
    flat[:, skip_cols] = sv.skip

    if filling_method in (None, "None"):
        return flat.reshape(orig_shape)

    gap_mask = flat == sv.gap  # (T, N)
    candidate = ~skip_cols & gap_mask.any(axis=0)
    if candidate.any():
        pat = gap_mask[:, candidate]  # (T, M)
        # group columns by identical pattern
        keys = np.packbits(pat, axis=0).T  # (M, ceil(T/8)) bytes
        uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
        cand_idx = np.flatnonzero(candidate)
        for u in range(len(uniq)):
            cols = cand_idx[inverse == u]
            pattern = gap_mask[:, cols[0]]
            sched = neighbor_schedule(pattern, n_neighbors)
            if filling_method == "median":
                _fill_pattern_median(flat, cols, sched, n_neighbors)
            elif filling_method == "poly":
                _fill_pattern_poly(flat, cols, sched, poly_degree)
            else:
                raise ValueError(f"unknown filling_method {filling_method!r}")
    return flat.reshape(orig_shape)


# ------------------------------------------------------------ bucketing


def grid_bounds(keys_ns: np.ndarray, step_ns: int):
    """Reference grid construction (timeseries.py:73-82): start =
    midnight of first key's date; end = midnight of last key's date +
    1 day; bucket i spans [start + i*step, start + (i+1)*step) for
    i in 0..n_buckets-1 where the grid has n_buckets+1 edges."""
    day = 86_400_000_000_000
    start = (keys_ns.min() // day) * day
    end = (keys_ns.max() // day) * day + day
    n_buckets = int((end - start) // step_ns)
    return int(start), int(end), n_buckets


def weighted_rank_weights(distances: np.ndarray) -> np.ndarray:
    """Distance-rank weights n..1 (timeseries.py:165-173): nearest
    layer gets weight n, farthest gets 1; ties resolved by argsort
    stability (earlier layer ranks closer)."""
    order = np.argsort(distances, kind="stable")
    weights = np.empty(len(distances), dtype=np.float64)
    w = len(distances)
    for idx in order:
        weights[idx] = w
        w -= 1
    return weights


def resolve_collision(mats: np.ndarray, dist_ns: np.ndarray, averaging: str):
    """Combine >1 layers falling into one bucket (timeseries.py:107-182).
    ``mats``: (k, h, w) in chronological order; ``dist_ns``: |ts −
    centroid| per layer."""
    if averaging in (None, "None"):
        return mats[int(np.argmin(dist_ns))]
    if averaging == "simple":
        return mats.mean(axis=0)
    if averaging == "weighted":
        w = weighted_rank_weights(dist_ns.astype(np.float64))
        return np.average(mats, axis=0, weights=w)
    raise ValueError(f"unknown averaging {averaging!r}")
