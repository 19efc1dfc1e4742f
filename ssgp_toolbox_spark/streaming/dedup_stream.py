"""Stateful streaming dedup — ``applyInPandasWithState`` over the
image stream.

At ingest, a 10^12-image pipeline must drop re-delivered or
near-duplicate frames *online*. This operator keeps, per site, the
set of phashes seen so far (GroupState) and emits only first-seen
images; an optional hamming radius also drops perceptual near-dups
against the retained state.

This is the custom-stateful-operator pattern of the brief: state is
a compact numpy int64 array serialized into the GroupState, updated
per micro-batch, with processing-time timeout available for eviction
at true scale (not enabled here — the tests use availableNow).
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


def _hamming_any(ph: int, seen: np.ndarray, radius: int) -> bool:
    if len(seen) == 0:
        return False
    x = np.bitwise_xor(seen, np.int64(ph))
    # popcount via bit tricks (numpy has no popcount on int64)
    v = x.astype(np.uint64)
    cnt = np.zeros_like(v)
    for _ in range(64):
        cnt += v & np.uint64(1)
        v >>= np.uint64(1)
    return bool((cnt <= radius).any())


def make_dedup_fn(hamming_radius: int = 0):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = np.array(state.get[0] if state.exists else [], dtype=np.int64)
        out = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                ph = int(row.phash)
                dup = (ph in seen) or (
                    hamming_radius > 0 and _hamming_any(ph, seen, hamming_radius)
                )
                out.append((key[0], row.image_id, ph, not dup))
                if not dup:
                    seen = np.append(seen, np.int64(ph))
        state.update(([int(v) for v in seen],))
        yield pd.DataFrame(out, columns=OUT_SCHEMA.fieldNames())

    return fn


def streaming_phash_dedup(images: DataFrame, hamming_radius: int = 0) -> DataFrame:
    """``images``: streaming DF with (site, image_id, phash). Emits
    every row with ``is_new`` = first-seen flag; state persists across
    micro-batches per site."""
    return images.select("site", "image_id", "phash").groupBy("site") \
        .applyInPandasWithState(
            make_dedup_fn(hamming_radius), OUT_SCHEMA, STATE_SCHEMA,
            "append", GroupStateTimeout.NoTimeout,
        )
