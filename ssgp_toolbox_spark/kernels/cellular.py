"""Cloud-shadow cellular automaton (reference ``cellular_expand``,
common_functions.py:34-193).

Per step: every non-cloud pixel with ≥1 cloudy cell in its (truncated,
self-inclusive) Moore neighborhood is a candidate. A candidate turns
cloudy with probability driven by (a) its cloudy-neighbor count
(threshold ladder 0.8..0.99, common_functions.py:117-127) and (b) how
cold it is vs the median of its 40 nearest same-biome pixels,
normalized by the image amplitude (common_functions.py:133-185).
Biome codes of cloudy pixels are overwritten with the gap code and
that mutation persists across steps (common_functions.py:49).

Vectorization: neighborhood cloud counts via zero-padded shifted sums
(the reference's truncated windows include the pixel itself, which is
never a cloud for candidates, so the 3×3 zero-padded count is exact);
candidate medians via per-candidate argpartitioned distances. RNG is
seeded and consumed in row-major candidate order — one draw per
candidate *before* any pass/fail logic, exactly like the reference's
``random.random()`` placement (common_functions.py:114).
"""

from __future__ import annotations

import numpy as np

from ssgp_toolbox_spark.sentinels import GAP

K_NEIGHBORS = 40
BIOME_MIN = 41

_FACT = {8: 0.8, 7: 0.85, 6: 0.9, 5: 0.95}


def _cloud_neighbor_counts(cloud: np.ndarray) -> np.ndarray:
    """3×3 zero-padded sum of the cloud mask (truncated Moore count)."""
    h, w = cloud.shape
    p = np.zeros((h + 2, w + 2), dtype=np.int32)
    p[1:-1, 1:-1] = cloud
    s = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    return s


def _k_nearest_median(matrix: np.ndarray, coords: np.ndarray,
                      target: tuple[int, int], k: int) -> float:
    d2 = ((coords - np.array(target)) ** 2).sum(axis=1).astype(np.float64)
    kk = min(k, len(coords))
    order = np.lexsort((np.arange(len(d2)), d2))[:kk]
    sel = coords[order]
    return float(np.median(matrix[sel[:, 0], sel[:, 1]]))


def cellular_step(matrix: np.ndarray, biome: np.ndarray,
                  rng: np.random.Generator, gap: float = GAP) -> np.ndarray:
    """One automaton step. ``biome`` is mutated in place (reference
    parity, common_functions.py:49). Returns the next matrix."""
    biome[matrix == gap] = gap
    nxt = matrix.copy()
    cloud = matrix == gap
    valid = ~cloud
    vals = matrix[valid]
    if vals.size == 0:
        return nxt
    amplitude = float(vals.max() - vals.min())
    counts = _cloud_neighbor_counts(cloud)
    cand = valid & (counts > 0)
    cand_idx = np.argwhere(cand)  # row-major order == reference scan order
    if len(cand_idx) == 0:
        return nxt
    probs = rng.random(len(cand_idx))  # one draw per candidate, in order
    valid_coords = np.argwhere(valid)
    for n, (i, j) in enumerate(cand_idx):
        n_cloud = int(counts[i, j])
        fact = _FACT.get(min(n_cloud, 8), 0.99) if n_cloud >= 5 else 0.99
        code = biome[i, j]
        coords = np.argwhere(biome == code)
        if len(coords) < BIOME_MIN:
            coords = valid_coords
        med = _k_nearest_median(matrix, coords, (int(i), int(j)), K_NEIGHBORS)
        value = (matrix[i, j] - med) / amplitude if amplitude != 0 else 0.0
        if value >= 0:
            continue
        if n_cloud < 3:
            continue
        if probs[n] >= fact + value:
            nxt[i, j] = gap
    return nxt


def cellular_expand(matrix: np.ndarray, biome: np.ndarray, iters: int = 10,
                    seed: int = 0, gap: float = GAP) -> np.ndarray:
    """Reference entry point (common_functions.py:191-193): ``iters``
    sequential steps; seeded (the reference uses unseeded ``random`` —
    seeding is our determinism requirement C10)."""
    m = np.asarray(matrix, dtype=np.float64).copy()
    b = np.asarray(biome, dtype=np.float64).copy()
    rng = np.random.default_rng(seed)
    for _ in range(iters):
        m = cellular_step(m, b, rng, gap)
    return m
