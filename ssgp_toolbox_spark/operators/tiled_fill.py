"""Tiled NN fill with ring-neighbor halo exchange — the scale path
for rasters too large for one Arrow batch (SURVEY.md M2/J3/W6).

Plan (two shuffles, both on tile keys):

1. tile explode (mapInPandas): image → core tiles (tiling.py grid);
2. halo exchange: every tile is duplicated to the 9 owner keys of its
   Moore neighborhood (declarative array-explode, tiling.
   tile_neighbors_df) and grouped by owner — each group is a tile
   plus its 8 ring-1 neighbors, i.e. a (3T)² context window;
3. per-group kernel: 1-NN fill of the owner tile's gap pixels against
   the valid pixels of the whole window;
4. reassembly: core tiles stitched back per image (exact inverse —
   tiling.assemble_from_tiles, the 'per-tile assignments exactly'
   invariant).

Exactness: every ACCEPTED fill is identical to the whole-image
``nn_fill`` — a pixel's fill is accepted only when its in-window
nearest-valid distance is strictly smaller than the distance to any
non-raster-border window edge (so no outside pixel can be nearer or
tie). Pixels failing the bound — including the no-valid-in-window
case — are left as gap and counted in ``unresolved_px`` (a second
pass with a wider ring, or the per-image path, finishes those). This
trade is what makes the operator viable at 10^5×10^5-pixel rasters
where no single task can hold the image.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ssgp_toolbox_spark import codecs, tiling
from ssgp_toolbox_spark.kernels import nn
from ssgp_toolbox_spark.sentinels import (DEFAULT_SENTINELS, Sentinels,
                                          check_payload_fmt)

_TILE_SCHEMA = T.StructType(
    [T.StructField("image_id", T.StringType()),
     T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
     T.StructField("fmt", T.StringType()), T.StructField("caption", T.StringType())]
    + [f for f in tiling.TILE_SCHEMA.fields if f.name != "image_id"]
)


def _explode_batches(tile: int, sv: Sentinels = DEFAULT_SENTINELS):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                # custom sentinel encodings on a lossy payload would
                # decode to the DEFAULT codes and silently fill nothing
                check_payload_fmt(row.fmt, sv)
                m = codecs.decode(row.bytes, int(row.h), int(row.w), row.fmt)
                tiles = tiling.explode_tiles_pdf(row.image_id, m, tile, halo=0)
                tiles["w"] = row.w
                tiles["h"] = row.h
                tiles["fmt"] = row.fmt
                tiles["caption"] = row.caption
                out.append(tiles)
            yield pd.concat(out)[_TILE_SCHEMA.fieldNames()] if out else pd.DataFrame(
                columns=_TILE_SCHEMA.fieldNames())

    return fn


_FILLED_TILE_SCHEMA = T.StructType(
    list(_TILE_SCHEMA.fields) + [T.StructField("unresolved_px", T.IntegerType())]
)


def _fill_window_fn(sv: Sentinels = DEFAULT_SENTINELS):
  def _fill_window(key, pdf: pd.DataFrame) -> pd.DataFrame:
    image_id, otx, oty = key
    own = pdf[(pdf.tx == otx) & (pdf.ty == oty)]
    if len(own) == 0:  # owner key outside the grid (edge offsets)
        return pd.DataFrame(columns=_FILLED_TILE_SCHEMA.fieldNames())
    own = own.iloc[0]
    core = np.frombuffer(own.tile_bytes, dtype="<f8").reshape(own.ph, own.pw).copy()
    n_unresolved = 0
    if (core == sv.gap).any():
        # build the window's valid-point cloud in image coordinates
        pts, vals = [], []
        for r in pdf.itertuples(index=False):
            blk = np.frombuffer(r.tile_bytes, dtype="<f8").reshape(r.ph, r.pw)
            v = np.argwhere((blk != sv.gap) & (blk != sv.skip) & (blk != sv.nodata))
            if len(v):
                pts.append(v + np.array([r.prow0, r.pcol0]))
                vals.append(blk[v[:, 0], v[:, 1]])
        targets = np.argwhere(core == sv.gap) + np.array([own.prow0, own.pcol0])
        if pts:
            pts = np.concatenate(pts)
            vals = np.concatenate(vals)
            # stable global order (row-major) so ties break like the
            # whole-image kernel
            order = np.lexsort((pts[:, 1], pts[:, 0]))
            pts, vals = pts[order], vals[order]
            filled_vals, d2 = nn.nn_fill_values(pts, vals, targets,
                                                return_d2=True)
            # exactness bound: the true nearest valid pixel could lie
            # just outside the window — accept a fill only when the
            # in-window nearest is STRICTLY closer than any possible
            # outside pixel (window edges at raster borders are safe;
            # ties rejected because row-major tie-break could prefer
            # an outside pixel). Rejected pixels stay gap and are
            # counted in unresolved_px.
            H, W = int(own.h), int(own.w)
            rmin = int(pdf.prow0.min())
            rmax = int((pdf.prow0 + pdf.ph).max())
            cmin = int(pdf.pcol0.min())
            cmax = int((pdf.pcol0 + pdf.pw).max())
            safe = np.full(len(targets), np.inf)
            if rmin > 0:
                safe = np.minimum(safe, (targets[:, 0] - rmin + 1) ** 2)
            if rmax < H:
                safe = np.minimum(safe, (rmax - targets[:, 0]) ** 2)
            if cmin > 0:
                safe = np.minimum(safe, (targets[:, 1] - cmin + 1) ** 2)
            if cmax < W:
                safe = np.minimum(safe, (cmax - targets[:, 1]) ** 2)
            ok = d2 < safe
            loc = targets - np.array([own.prow0, own.pcol0])
            core[loc[ok, 0], loc[ok, 1]] = filled_vals[ok]
            n_unresolved = int((~ok).sum())
        else:
            n_unresolved = len(targets)
    row = own.to_dict()
    row["tile_bytes"] = core.tobytes()
    row["unresolved_px"] = n_unresolved
    return pd.DataFrame([row])[_FILLED_TILE_SCHEMA.fieldNames()]

  return _fill_window


def _assemble_fn(sv: Sentinels = DEFAULT_SENTINELS):
  def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
    image_id = key[0]
    h, w = int(pdf["h"].iloc[0]), int(pdf["w"].iloc[0])
    fmt = pdf["fmt"].iloc[0]
    m = tiling.assemble_from_tiles(pdf, h, w)
    return pd.DataFrame([{
        "image_id": image_id,
        "bytes": codecs.encode(m, fmt),
        "w": w, "h": h, "fmt": fmt,
        "caption": pdf["caption"].iloc[0],
        "phash": codecs.phash64(m, sv.gap, sv.skip, sv.nodata),
        "status": "filled",
        "filled_px": 0,
        "unresolved_px": int(pdf["unresolved_px"].sum()),
    }])

  return _assemble


_OUT_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("status", T.StringType()),
    T.StructField("filled_px", T.IntegerType()),
    T.StructField("unresolved_px", T.IntegerType()),
])


def tiled_nn_fill(images: DataFrame, tile: int = 64,
                  key_values: dict | None = None) -> DataFrame:
    """Ring-1 halo-join NN fill. Note: unlike nn_interpolate this
    fills only ``gap`` pixels (skip/NoData preserved by construction —
    they are never fill targets here, matching the restore step of
    gapfiller.py:960-962)."""
    from ssgp_toolbox_spark.sentinels import resolve_key_values

    sv = resolve_key_values(key_values)
    cols = ["image_id", "bytes", "w", "h", "fmt", "caption"]
    tiles = images.select(*cols).mapInPandas(_explode_batches(tile, sv),
                                             _TILE_SCHEMA)
    owners = tiling.tile_neighbors_df(tiles)
    filled_tiles = owners.groupBy("image_id", "owner_tx", "owner_ty").applyInPandas(
        _fill_window_fn(sv), _FILLED_TILE_SCHEMA
    )
    return filled_tiles.groupBy("image_id").applyInPandas(
        _assemble_fn(sv), _OUT_SCHEMA)
