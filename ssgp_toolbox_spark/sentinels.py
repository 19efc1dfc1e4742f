"""In-band sentinel convention and shared numpy mask kernels.

The reference encodes pixel validity with three in-band float
sentinels (reference gapfiller.py:805, default ``key_values`` dict)
instead of NULLs:

- ``GAP``    (-100.0): cloud-covered, *to be filled*;
- ``SKIP``   (-200.0): permanently invalid (sea water), never filled;
- ``NODATA`` (-32768.0): outside extent / projection error.

Everything else is a valid physical value. These interact with every
operator (SURVEY.md §1.1.4), so the masks live here, in one place,
shared by UDF kernels and the generator.
"""

from __future__ import annotations

import numpy as np

GAP: float = -100.0
SKIP: float = -200.0
NODATA: float = -32768.0

SENTINELS: dict[str, float] = {"gap": GAP, "skip": SKIP, "NoData": NODATA}


def is_gap(a: np.ndarray, gap: float = GAP) -> np.ndarray:
    return a == gap


def is_skip(a: np.ndarray, skip: float = SKIP) -> np.ndarray:
    return a == skip


def is_nodata(a: np.ndarray, nodata: float = NODATA) -> np.ndarray:
    return a == nodata


def is_invalid(
    a: np.ndarray, gap: float = GAP, skip: float = SKIP, nodata: float = NODATA
) -> np.ndarray:
    """gap | skip | NoData (reference gapfiller.py:99-104 counts these)."""
    return (a == gap) | (a == skip) | (a == nodata)


def is_valid(
    a: np.ndarray, gap: float = GAP, skip: float = SKIP, nodata: float = NODATA
) -> np.ndarray:
    return ~is_invalid(a, gap, skip, nodata)


def sentinel_stats(
    a: np.ndarray, gap: float = GAP, skip: float = SKIP, nodata: float = NODATA
) -> dict[str, int]:
    """Per-image sentinel counts (reference gapfiller.py:102-104, 858-863).

    Returned keys feed the stats columns used for predicate pushdown:
    ``gap_count``, ``skip_count``, ``nodata_count``, ``valid_px``.
    """
    gap_count = int((a == gap).sum())
    skip_count = int((a == skip).sum())
    nodata_count = int((a == nodata).sum())
    return {
        "gap_count": gap_count,
        "skip_count": skip_count,
        "nodata_count": nodata_count,
        "valid_px": int(a.size - gap_count - skip_count - nodata_count),
    }


def nanify(
    a: np.ndarray, gap: float = GAP, skip: float = SKIP, nodata: float = NODATA
) -> np.ndarray:
    """Replace all three sentinels with NaN (reference gapfiller.py:639-651)."""
    out = a.astype(np.float64, copy=True)
    out[is_invalid(out, gap, skip, nodata)] = np.nan
    return out
