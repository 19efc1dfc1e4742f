"""Batched kNN gap fill — the throughput path for the north metric.

``frame.fill_image`` is a faithful per-pixel loop (reference
gapfiller.py:611-781 shape). For the Knn kernel the whole fill is
expressible as dense tensor algebra across *all* gap pixels at once:

- predictor selection: biome candidate sets are indexed once per
  image (the reference re-runs argwhere over the full raster per
  pixel, gapfiller.py:511); 40-nearest per pixel is one stable
  argsort over a (pixels × candidates) distance matrix;
- frame assembly: one fancy-index gather
  ``tensor[:, coords]`` → (layers, pixels, predictors);
- fill + 3-fold CV: pixels grouped by their target-validity pattern
  share train-row structure, so kNN predict/CV run as (pixels × test
  × train) matmuls per group.

Bit-identical to the per-pixel path (asserted in tests): pixels whose
frames contain sentinels in the predictor block fall back to
``frame.clean_frame`` + ``regressors.fit_predict`` per pixel; CV fold
seeding depends only on (image seed, train length) in both paths
(frame.cv_seed).

~20-60× faster than the loop; this is what the gapfill operator uses
for method='Knn'.
"""

from __future__ import annotations

import numpy as np

from ssgp_toolbox_spark.kernels import frame as FR
from ssgp_toolbox_spark.kernels import regressors
from ssgp_toolbox_spark.sentinels import DEFAULT_SENTINELS, Sentinels


def _is_sentinel(a: np.ndarray,
                 sv: Sentinels = DEFAULT_SENTINELS) -> np.ndarray:
    return (a == sv.gap) | (a == sv.skip) | (a == sv.nodata)


def _knn_predict(X_train, y_train, X_test, k: int, weights: str):
    """Batched kNN: X_train (p, n, c), y_train (p, n), X_test
    (p, t, c) → (p, t). Stable tie order matches KNNRegressor."""
    d2 = (
        (X_train**2).sum(-1)[:, None, :]
        + (X_test**2).sum(-1)[:, :, None]
        - 2.0 * np.einsum("ptc,pnc->ptn", X_test, X_train)
    )  # (p, t, n)
    n = X_train.shape[1]
    kk = min(k, n)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :kk]  # (p, t, k)
    vals = np.take_along_axis(y_train[:, None, :], idx, axis=-1)  # (p, t, k)
    if weights == "distance":
        d = np.sqrt(np.maximum(np.take_along_axis(d2, idx, axis=-1), 0.0))
        exact = d < 1e-12
        w = np.where(exact, 1.0, 1.0 / np.maximum(d, 1e-12))
        any_exact = exact.any(axis=-1, keepdims=True)
        w = np.where(any_exact & ~exact, 0.0, w)
        return (vals * w).sum(-1) / w.sum(-1)
    return vals.mean(-1)


def _knn_predict_direct(X_train, y_train, X_test, k: int, weights: str):
    """Direct-form batched kNN: identical stacking of
    ``regressors.KNNRegressor`` — distances via ``((a-b)**2).sum(-1)``
    (NOT the expanded a²+b²−2ab matmul of ``_knn_predict``), so every
    f64 distance, stable-argsort tie order, and weight is bit-identical
    to the per-pixel estimator. Used by the slow-path batcher, where
    parity with ``regressors.fit_predict`` is the contract.
    X_train (p, n, c), y_train (p, n), X_test (p, t, c) → (p, t)."""
    d2 = ((X_test[:, :, None, :] - X_train[:, None, :, :]) ** 2).sum(-1)
    n = X_train.shape[1]
    kk = min(k, n)
    idx = np.argsort(d2, axis=-1, kind="stable")[..., :kk]  # (p, t, k)
    vals = np.take_along_axis(y_train[:, None, :], idx, axis=-1)
    if weights == "distance":
        # same op chain as KNNRegressor.predict (no maximum() clamp:
        # direct-form squares are never negative)
        d = np.sqrt(np.take_along_axis(d2, idx, axis=-1))
        exact = d < 1e-12
        w = np.where(exact, 1.0, 1.0 / np.maximum(d, 1e-12))
        any_exact = exact.any(axis=-1, keepdims=True)
        w = np.where(any_exact & ~exact, 0.0, w)
        return (vals * w).sum(-1) / w.sum(-1)
    return vals.mean(-1)


def _knn_slow_group(Xp, yp, xt, k: int, weights: str, seed: int):
    """Batched slow path for one exact-(n, c) shape group of
    ``clean_frame`` outputs: replicates ``regressors.fit_predict``
    ('Knn'/'Custom') pixel-for-pixel — same folds (cv_seed depends
    only on (image seed, n), so the whole group shares one fold set,
    exactly the per-pixel behavior), same direct-form distances
    (``_knn_predict_direct``), same no-CV fallback when n < 3.
    Returns (pred (p,), |score| (p,))."""
    p, n, c = Xp.shape
    pred = _knn_predict_direct(Xp, yp, xt[:, None, :], k, weights)[:, 0]
    if n < 3:
        # cross_val_neg_mae raises n_splits → fit_predict.no_cv:
        # score = train MAE of the full-train fit
        train_pred = _knn_predict_direct(Xp, yp, Xp, k, weights)
        return pred, np.abs(train_pred - yp).mean(-1)
    rng = np.random.default_rng(FR.cv_seed(seed, n))
    folds = regressors.kfold_indices(n, 3, rng)
    fold_scores = np.zeros((len(folds), p))
    for fi, fold in enumerate(folds):
        mask = np.ones(n, dtype=bool)
        mask[fold] = False
        pr = _knn_predict_direct(Xp[:, mask], yp[:, mask], Xp[:, fold],
                                 k, weights)
        fold_scores[fi] = -np.abs(pr - yp[:, fold]).mean(-1)
    return pred, np.abs(fold_scores.mean(0))


# slow-path batching switch: False restores the per-pixel
# regressors.fit_predict loop (the parity reference the tests compare
# against)
SLOW_BATCH = True


def _knn_fill_group(Xp, yp, xt, k: int, weights: str, seed: int):
    """One pattern group: Xp (p, n, c) train predictors, yp (p, n)
    targets, xt (p, c) test row. Returns (pred (p,), score (p,)) —
    score = neg-MAE 3-fold CV, or train-MAE when n < 3
    (regressors.fit_predict no-CV fallback semantics)."""
    p, n, c = Xp.shape
    pred = _knn_predict(Xp, yp, xt[:, None, :], k, weights)[:, 0]
    if n < 3:
        train_pred = _knn_predict(Xp, yp, Xp, k, weights)  # (p, n)
        score = np.abs(train_pred - yp).mean(-1)
        return pred, score  # already |MAE|
    rng = np.random.default_rng(FR.cv_seed(seed, n))
    folds = regressors.kfold_indices(n, 3, rng)
    fold_scores = np.zeros((len(folds), p))
    for fi, fold in enumerate(folds):
        mask = np.ones(n, dtype=bool)
        mask[fold] = False
        pr = _knn_predict(Xp[:, mask], yp[:, mask], Xp[:, fold], k, weights)
        fold_scores[fi] = -np.abs(pr - yp[:, fold]).mean(-1)
    return pred, np.abs(fold_scores.mean(0))


def _knn_coords_exact(cands: np.ndarray, blk: np.ndarray, k: int,
                      shape: tuple[int, int]) -> np.ndarray:
    """Exact k-nearest candidate coords for a spatially-tight block of
    pixels, with (d², original-index) tie order (== np.argmin
    first-index, gapfiller.py:519-530).

    Memory-traffic design: candidates are prefiltered to the block's
    bounding box + margin, so the (pixels × candidates) distance
    matrix touches ~the local density instead of the whole raster —
    this is what keeps 32 workers off the memory-bandwidth wall.
    Exactness: a pixel's result is accepted only if its k-th distance
    fits inside the box (sides clipped at the raster edge are always
    safe); otherwise the margin doubles and the block retries."""
    h, w = shape
    n_c = len(cands)
    # expected k-NN radius from candidate density, with headroom
    rho = max(n_c / (h * w), 1e-9)
    m = int(np.ceil(1.3 * np.sqrt(k / (np.pi * rho)))) + 2
    while True:
        r0 = max(int(blk[:, 0].min()) - m, 0)
        r1 = min(int(blk[:, 0].max()) + m, h - 1)
        c0 = max(int(blk[:, 1].min()) - m, 0)
        c1 = min(int(blk[:, 1].max()) + m, w - 1)
        box = ((cands[:, 0] >= r0) & (cands[:, 0] <= r1)
               & (cands[:, 1] >= c0) & (cands[:, 1] <= c1))
        idx = np.flatnonzero(box)  # ascending == original tie order
        if len(idx) < min(k, n_c):
            m *= 2
            continue
        local = cands[idx]
        # two-plane int64 distance: same exact integer values as the
        # stacked ((blk - local)**2).sum(-1), without the (p, n, 2)
        # temporaries and the reduction pass
        dr = blk[:, 0, None] - local[None, :, 0]
        dc = blk[:, 1, None] - local[None, :, 1]
        d2 = dr * dr + dc * dc
        key = d2 * n_c + idx[None, :]
        kk = min(k, len(idx))
        if len(idx) > kk:
            part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
        else:
            part = np.broadcast_to(np.arange(len(idx)), (len(blk), len(idx))).copy()
        topkeys = np.take_along_axis(key, part, axis=1)
        order = np.take_along_axis(part, np.argsort(topkeys, axis=1), axis=1)[:, :kk]
        if len(idx) == n_c:
            return local[order]
        # safety: k-th distance must fit inside the (unclipped) box
        dk2 = np.take_along_axis(d2, order[:, -1:], axis=1)[:, 0]
        side = np.full(len(blk), np.iinfo(np.int64).max, dtype=np.int64)
        if r0 > 0:
            side = np.minimum(side, blk[:, 0] - r0)
        if r1 < h - 1:
            side = np.minimum(side, r1 - blk[:, 0])
        if c0 > 0:
            side = np.minimum(side, blk[:, 1] - c0)
        if c1 < w - 1:
            side = np.minimum(side, c1 - blk[:, 1])
        if (dk2 <= side * side).all():
            return local[order]
        m *= 2


def _biome_coords_batched(final, extra, gaps, seed, coord_offset=(0, 0),
                          sv: Sentinels = DEFAULT_SENTINELS):
    """Predictor coords for all gap pixels under 'Biome' (reference
    gapfiller.py:500-586 semantics incl. first-index tie-break and the
    101-random fallback for small biomes). ``coord_offset`` is the
    window's absolute origin (tiled path): fallback RNG seeds key on
    ABSOLUTE pixel coords so tiling never changes a pixel's seed."""
    masked = np.where(final == sv.gap, sv.gap, extra)
    P = len(gaps)
    out = np.empty((P, FR.N_NEAREST + 1, 2), dtype=np.int64)
    codes = extra[gaps[:, 0], gaps[:, 1]]
    dr, dc = int(coord_offset[0]), int(coord_offset[1])
    # per-code candidate sets via one flatnonzero scan per code:
    # ascending flat (row-major) index order — exactly np.argwhere's
    # order, so tie-breaks are unchanged (measured faster than the
    # former global stable argsort + per-segment re-sort: the chunk
    # only ever touches ~a dozen codes)
    w = final.shape[1]
    flat = masked.ravel()
    # the small-biome fallback's valid set is pixel-independent —
    # hoisted out of the per-pixel loop (select_random docstring)
    valid = None
    for code in np.unique(codes):
        sel = np.flatnonzero(codes == code)
        cidx = np.flatnonzero(flat == code)
        cands = np.column_stack([cidx // w, cidx % w])
        if len(cands) > FR.BIOME_MIN:
            pts = gaps[sel]  # (s, 2)
            for lo in range(0, len(pts), 128):
                blk = pts[lo : lo + 128]
                out[sel[lo : lo + 128], :-1] = _knn_coords_exact(
                    cands, blk, FR.N_NEAREST, final.shape)
        else:
            if valid is None:
                valid = np.argwhere((final != sv.gap) & (final != sv.skip)
                                    & (final != sv.nodata))
            for s in sel:
                r, c = (int(v) for v in gaps[s])
                rng = FR._pixel_rng(seed, r + dr, c + dc)
                rand = FR.select_random(final, (r, c), rng, sv,
                                        valid=valid)[:-1]
                out[s, :-1] = FR._k_nearest(rand, (r, c), FR.N_NEAREST)
    out[:, -1] = gaps
    return out


def select_coords(final: np.ndarray, extra: np.ndarray | None,
                  gaps: np.ndarray, predictor_configuration: str,
                  seed: int, coord_offset: tuple[int, int] = (0, 0),
                  sv: Sentinels = DEFAULT_SENTINELS) -> np.ndarray:
    """Predictor coords (P, C, 2) for the given gap pixels, target
    coord appended last — the selection block shared by the batched
    kNN fill and the deep-history operator's coords pass. Per-pixel
    deterministic (seeded RNG keyed on absolute coords), so any
    gap-subset slicing yields identical coords per pixel."""
    P = len(gaps)
    if predictor_configuration == "Biome":
        if extra is None:
            raise ValueError("Biome mode requires the extra (zone) matrix")
        return _biome_coords_batched(final, extra, gaps, seed, coord_offset,
                                     sv)
    if predictor_configuration == "Random":
        return np.stack([
            FR.select_random(final, (int(r), int(c)),
                             FR._pixel_rng(seed, int(r), int(c)), sv)
            for r, c in gaps
        ])
    if predictor_configuration == "All":
        base = np.argwhere(final != sv.gap)
        coords = np.empty((P, len(base) + 1, 2), dtype=np.int64)
        coords[:, :-1] = base[None, :, :]
        coords[:, -1] = gaps
        return coords
    raise ValueError(f"unknown predictor_configuration {predictor_configuration!r}")


def fill_image_knn(final: np.ndarray, tensor: np.ndarray,
                   extra: np.ndarray | None = None,
                   predictor_configuration: str = "Biome",
                   hyperparameters: str = "Custom",
                   params: dict | None = None, seed: int = 0,
                   gap_slice: tuple[int, int] | None = None,
                   gap_subset: np.ndarray | None = None,
                   coord_offset: tuple[int, int] = (0, 0),
                   sv: Sentinels = DEFAULT_SENTINELS):
    """Batched equivalent of frame.fill_image(method='Knn', ...).
    Custom mode only (the grid-search modes go through the generic
    path). Returns (filled, scores) with scores in gap scan order.

    ``gap_slice=(lo, hi)`` fills only gap pixels lo..hi-1 of the
    row-major gap scan while keeping the *full image* as selection
    context — per-pixel seeding makes chunked fills bit-identical to
    the whole-image fill, which is what lets the balanced gapfill
    operator split skewed images across tasks (north_rule salting)."""
    params = dict(params or {})
    k = int(params.get("n_neighbors", 5))
    weights = params.get("weights", "uniform")
    if hyperparameters != "Custom":
        return FR.fill_image(final, tensor, extra=extra, method="Knn",
                             predictor_configuration=predictor_configuration,
                             hyperparameters=hyperparameters, params=params,
                             seed=seed, sv=sv)
    gaps = np.argwhere(final == sv.gap)
    if gap_slice is not None:
        gaps = gaps[gap_slice[0] : gap_slice[1]]
    if gap_subset is not None:  # explicit (r, c) targets (tiled path)
        gaps = np.asarray(gap_subset, dtype=np.int64)
    filled = final.copy()
    P = len(gaps)
    if P == 0:
        return filled, []
    coords = select_coords(final, extra, gaps, predictor_configuration,
                           seed, coord_offset, sv)

    hist = tensor[:, coords[..., 0], coords[..., 1]]        # (L, P, C)
    last = final[coords[..., 0], coords[..., 1]]            # (P, C)
    preds, scores, skip_px = fill_gathered_knn(hist, last, k, weights, seed,
                                               sv)
    filled[gaps[skip_px, 0], gaps[skip_px, 1]] = sv.skip
    done = ~skip_px
    filled[gaps[done, 0], gaps[done, 1]] = preds[done]
    return filled, [float(s) for s in scores[done]]


def fill_gathered_knn(hist: np.ndarray, last: np.ndarray, k: int,
                      weights: str, seed: int,
                      sv: Sentinels = DEFAULT_SENTINELS):
    """The post-gather core of ``fill_image_knn``: operates on the
    pre-gathered frame blocks only — ``hist`` (L, P, C) history values
    at each pixel's predictor coords (target coord last), ``last``
    (P, C) final-image values at the same coords. Needs NO raster:
    this is what lets the deep-history operator
    (operators/deep_gapfill.py) ship per-chunk extracts instead of
    whole layers. Returns (preds (P,), |CV-MAE| scores (P,),
    skip mask (P,)); preds/scores are NaN where skip."""
    P = last.shape[0]
    target_hist = hist[:, :, -1]                            # (L, P)

    # F5: any skip in the target column → output skip
    skip_px = (target_hist == sv.skip).any(axis=0)

    # ---- batched frame cleaning (F5b/F6/F7/F8/A2 re-expressed) -----
    # Column *drops* become zero-masking: kNN uses only pairwise
    # distances, and a column zeroed in every row (train and test)
    # contributes 0 — identical to dropping it. Median imputation is a
    # batched nanmedian. F7's all-NaN row drop is subsumed by the F9
    # target-validity row mask (an all-NaN row has a NaN target), and
    # its effect on medians is nil because its values are all NaN.
    # (perf, measured: np.nanmedian routes (L+1, P, C) inputs through
    # numpy's masked-array median — ~30% of the whole fill kernel —
    # and the old where/copy chain allocated three full-size
    # temporaries; the sort-based median below is bit-identical —
    # NaNs sort last, the two middle valid values average with the
    # same (a+b)/2 arithmetic — and the imputation mutates in place.)
    vals = np.concatenate([hist[:, :, :-1], last[None, :, :-1]])  # (L+1, P, C-1)
    col_keep = ~(vals == sv.skip).any(axis=0)               # F5b  (P, C-1)
    vals[(vals == sv.gap) | (vals == sv.nodata)] = np.nan   # F6
    col_keep &= ~np.isnan(vals[-1])                         # F8 (NaN at target row)
    tmp = np.where(col_keep, vals, np.nan)
    tmp.sort(axis=0, kind="stable")                          # NaNs sort last
    cnt = (~np.isnan(tmp)).sum(axis=0)                       # valid per column
    lo = np.maximum((cnt - 1) // 2, 0)[None, :, :]
    hi = (cnt // 2)[None, :, :]
    med = (np.take_along_axis(tmp, lo, axis=0)[0]
           + np.take_along_axis(tmp, hi, axis=0)[0]) / 2.0   # (P, C-1)
    med[cnt == 0] = np.nan                                   # all-NaN column
    np.copyto(vals, np.broadcast_to(med, vals.shape), where=np.isnan(vals))  # A2
    np.copyto(vals, 0.0, where=~col_keep[None, :, :])       # drop → zero-mask
    # punt conditions → per-pixel slow path:
    # (1) safety net: kept column with empty median (shouldn't happen);
    # (2) every column dropped — then the reference's F7 drops the
    #     all-NaN *test row* itself and the frame's last row becomes a
    #     history layer (test-row shift quirk, gapfiller.py:653-659),
    #     AFTER which F8 re-evaluates column validity at the SHIFTED
    #     row and can re-admit predictors — only the sequential
    #     cleaner reproduces that cascade (a batched zero-feature
    #     shortcut was prototyped this round and found wrong exactly
    #     here: on the harness corpus every such pixel's columns are
    #     final-NODATA drops that survive the shifted F8).
    bad = (col_keep & np.isnan(med)).any(axis=1)
    bad |= ~col_keep.any(axis=1)
    fast = ~bad & ~skip_px
    slow = bad & ~skip_px

    preds = np.full(P, np.nan)
    scores = np.full(P, np.nan)

    if fast.any():
        fidx = np.flatnonzero(fast)
        valid_t = ~((target_hist[:, fidx] == sv.gap)
                    | (target_hist[:, fidx] == sv.nodata)
                    | (target_hist[:, fidx] == sv.skip))    # (L, f)
        patterns = np.packbits(valid_t, axis=0).T
        uniq, inv = np.unique(patterns, axis=0, return_inverse=True)
        for u in range(len(uniq)):
            sel = np.flatnonzero(inv == u)
            grp = fidx[sel]
            rows = np.flatnonzero(valid_t[:, sel[0]])
            if len(rows) == 0:
                continue  # empty train — leave NaN (reference would crash)
            Xp = vals[np.ix_(rows, grp)].transpose(1, 0, 2)             # (p, n, c)
            yp = target_hist[np.ix_(rows, grp)].T                       # (p, n)
            xt = vals[-1][grp]                                          # (p, c)
            pr, sc = _knn_fill_group(Xp, yp, xt, k, weights, seed)
            preds[grp] = pr
            scores[grp] = sc

    # slow path: the per-pixel clean_frame cascade (the reference's F7
    # test-row-shift quirk) stays sequential — it is cheap; the
    # EXPENSIVE part, the per-pixel kNN fit + 3-fold CV after it, is
    # batched by grouping the cleaned frames on their exact (n, c)
    # shape (same n → same cv_seed → same folds, the per-pixel rule)
    # and running the direct-form group kernel — bit-identical to
    # regressors.fit_predict by construction (measured ~20% of the
    # whole fill kernel on high-gap images before batching)
    slow_items: list = []
    for s in np.flatnonzero(slow):
        res = FR.clean_frame(np.vstack([hist[:, s, :], last[s][None, :]]),
                             sv)
        if isinstance(res, str):
            skip_px[s] = True
            continue
        if SLOW_BATCH:
            slow_items.append((s, res))
            continue
        X_train, y_train, X_test = res
        pr, sc = regressors.fit_predict(
            "Knn", "Custom", {"n_neighbors": k, "weights": weights},
            X_train, y_train, X_test, seed=FR.cv_seed(seed, len(y_train)),
        )
        preds[s] = float(np.ravel(pr)[0])
        scores[s] = abs(float(np.ravel(sc).mean() if np.ndim(sc) else sc))

    if slow_items:
        groups: dict = {}
        for s, (Xtr, ytr, Xte) in slow_items:
            groups.setdefault(Xtr.shape, []).append((s, Xtr, ytr, Xte))
        for (n, c), items in groups.items():
            sel = np.array([it[0] for it in items], dtype=np.int64)
            Xp = np.stack([it[1] for it in items])        # (p, n, c)
            yp = np.stack([it[2] for it in items])        # (p, n)
            xt = np.stack([it[3][0] for it in items])     # (p, c)
            pr, sc = _knn_slow_group(Xp, yp, xt, k, weights, seed)
            preds[sel] = pr
            scores[sel] = sc

    return preds, scores, skip_px
