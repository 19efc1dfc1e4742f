"""Pure-numpy regression kernels + CV/grid-search machinery.

Mirrors the reference's five per-pixel regressors and their three
hyperparameter modes (reference gapfiller.py:136-436):

- Lasso          (alpha grid ``arange(1, 800, 50)``, 3-fold CV, MAE)
- RandomForest   (depth {5..25}, min_split {2,5,10}, max_leaf
                  {10,50,100}, 50 trees, randomized search n_iter=5)
- ExtraTrees     (same grid)
- Knn            (weights {uniform,distance}, k {2,5,10,15,20})
- SVR            (linear kernel, C {0.001..10}, eps {0.1..1.0};
                  train+test standardized *together* — the reference's
                  leakage quirk, gapfiller.py:368-375, kept for parity)

All randomness is seeded per call site (C10 determinism requirement:
task retries and resume must be bit-stable), unlike the reference's
unseeded ``random``/``RandomizedSearchCV``.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ estimators


class KNNRegressor:
    """Exact brute-force kNN regression (Euclidean), stable neighbor
    order (distance, then index) — matches sklearn's KNeighborsRegressor
    predictions for distinct distances."""

    def __init__(self, n_neighbors: int = 5, weights: str = "uniform"):
        self.k = int(n_neighbors)
        self.weights = weights

    def fit(self, X, y):
        self._X = np.asarray(X, dtype=np.float64)
        self._y = np.asarray(y, dtype=np.float64).ravel()
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        k = min(self.k, len(self._X))
        # (m, n) distance matrix; test sets are small (usually 1 row)
        d2 = ((X[:, None, :] - self._X[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :k]
        vals = self._y[idx]
        if self.weights == "distance":
            d = np.sqrt(np.take_along_axis(d2, idx, axis=1))
            exact = d < 1e-12
            w = np.where(exact, 1.0, 1.0 / np.maximum(d, 1e-12))
            # sklearn: if any exact match, only exact matches vote
            any_exact = exact.any(axis=1, keepdims=True)
            w = np.where(any_exact & ~exact, 0.0, w)
            return (vals * w).sum(axis=1) / w.sum(axis=1)
        return vals.mean(axis=1)


class LassoRegressor:
    """Lasso via cyclic coordinate descent on the standard objective
    ``(1/2n)||y - Xw - b||^2 + alpha ||w||_1`` with intercept."""

    def __init__(self, alpha: float = 1.0, max_iter: int = 500, tol: float = 1e-6):
        self.alpha = float(alpha)
        self.max_iter = max_iter
        self.tol = tol

    def fit(self, X, y):
        # contiguous copy: BLAS dot products on strided views round
        # differently than on contiguous arrays — normalizing layout
        # keeps results independent of how the caller sliced X
        X = np.ascontiguousarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64).ravel()
        n, p = X.shape
        xm = X.mean(axis=0)
        ym = y.mean()
        Xc = X - xm
        yc = y - ym
        w = np.zeros(p)
        col_sq = (Xc**2).sum(axis=0)
        r = yc - Xc @ w
        lam = self.alpha * n
        for _ in range(self.max_iter):
            w_max = d_max = 0.0
            for j in range(p):
                if col_sq[j] == 0.0:
                    continue
                wj = w[j]
                rho = Xc[:, j] @ r + col_sq[j] * wj
                wn = np.sign(rho) * max(abs(rho) - lam, 0.0) / col_sq[j]
                if wn != wj:
                    r += Xc[:, j] * (wj - wn)
                    w[j] = wn
                d_max = max(d_max, abs(wn - wj))
                w_max = max(w_max, abs(wn))
            if w_max == 0.0 or d_max / max(w_max, 1e-30) < self.tol:
                break
        self.coef_ = w
        self.intercept_ = ym - xm @ w
        return self

    def predict(self, X):
        return np.asarray(X, dtype=np.float64) @ self.coef_ + self.intercept_


class LinearSVRRegressor:
    """Epsilon-insensitive linear SVR via dual coordinate descent
    (Ho & Lin 2012 style, L1 loss), with bias folded in as an extra
    constant feature scaled by ``bias_scale`` (liblinear's ``-B``
    trick): the intercept's effective regularization is
    1/bias_scale², approximating libsvm SVR's UNregularized intercept
    while keeping the one-variable CD updates. bias_scale=10 measured
    closest to the reference's sklearn-SVR fills on the Comparison
    data (MAE 0.406 vs published 0.42 on StPetersburg 4%); larger
    values hurt conditioning. Deterministic (cyclic order)."""

    def __init__(self, C: float = 1.0, epsilon: float = 0.1,
                 max_iter: int = 300, bias_scale: float = 10.0):
        self.C = float(C)
        self.epsilon = float(epsilon)
        self.max_iter = max_iter
        self.bias_scale = float(bias_scale)

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64).ravel()
        # center the target: libsvm's bias is unregularized and absorbs
        # the mean; a regularized folded-in bias cannot reach y≈290 K
        # at small C, so we fit residuals and add the mean back
        self._y_mean = float(y.mean())
        yl = (y - self._y_mean).tolist()
        n, p = X.shape
        Xb = np.hstack([X, np.full((n, 1), self.bias_scale)])
        # Gram form: per-coordinate gradient g_i = (K @ beta)_i - y_i
        # maintained incrementally — O(n) per update instead of O(p),
        # and the inner loop stays on raw python floats (the dual CD is
        # inherently sequential, so the win is constant-factor)
        K = Xb @ Xb.T
        krows = [np.ascontiguousarray(K[i]) for i in range(n)]
        ql = np.diag(K).tolist()
        beta = np.zeros(n)
        f = np.zeros(n)  # f = K @ beta
        C, eps = self.C, self.epsilon
        for _ in range(self.max_iter):
            max_step = 0.0
            for i in range(n):
                qi = ql[i]
                if qi == 0.0:
                    continue
                bi = beta[i]
                g = f[i] - yl[i]
                # subgradient step on the dual for coordinate i
                if bi != 0.0:
                    viol = g + (eps if bi > 0 else -eps)
                else:
                    if g > eps:
                        viol = g - eps
                    elif g < -eps:
                        viol = g + eps
                    else:
                        continue
                if viol == 0.0:
                    continue
                nb = bi - viol / qi
                if nb > C:
                    nb = C
                elif nb < -C:
                    nb = -C
                step = nb - bi
                if step != 0.0:
                    f += step * krows[i]
                    beta[i] = nb
                    a = abs(step)
                    if a > max_step:
                        max_step = a
            if max_step < 1e-8:
                break
        w = Xb.T @ beta
        self.coef_ = w[:-1]
        self.intercept_ = w[-1] * self.bias_scale + self._y_mean
        return self

    def predict(self, X):
        return np.asarray(X, dtype=np.float64) @ self.coef_ + self.intercept_


class _Tree:
    """Variance-reduction regression tree (numpy), supporting the
    reference grid's knobs: max_depth, min_samples_split,
    max_leaf_nodes; ``splitter='random'`` gives Extra-Trees-style
    random thresholds."""

    def __init__(self, max_depth=None, min_samples_split=2, max_leaf_nodes=None,
                 splitter="best", max_features=1.0, rng=None):
        self.max_depth = max_depth if max_depth is not None else 64
        self.min_samples_split = min_samples_split
        self.max_leaf_nodes = max_leaf_nodes
        self.splitter = splitter
        self.max_features = max_features
        self.rng = rng or np.random.default_rng(0)

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64).ravel()
        self.nodes = []  # (feature, threshold, left, right) or (-1, value, -1, -1)
        # best-first growth so max_leaf_nodes semantics match sklearn's
        import heapq

        def leaf(idx):
            self.nodes.append((-1, float(y[idx].mean()), -1, -1))
            return len(self.nodes) - 1

        def find_split(idx, depth):
            # fully vectorized over (split positions × features)
            n = len(idx)
            if n < self.min_samples_split or depth >= self.max_depth:
                return None
            Xn = X[idx]  # (n, p)
            yv = y[idx]
            p = Xn.shape[1]
            parent_imp = yv.var() * n
            spread = Xn.max(axis=0) - Xn.min(axis=0)
            if self.splitter == "random":
                thr = Xn.min(axis=0) + self.rng.uniform(0, 1, p) * spread  # (p,)
                left = Xn <= thr[None, :]  # (n, p)
                nl = left.sum(axis=0).astype(np.float64)
                ok = (nl > 0) & (nl < n) & (spread > 0)
                if not ok.any():
                    return None
                sl = (yv[:, None] * left).sum(axis=0)
                sql = ((yv**2)[:, None] * left).sum(axis=0)
                tot, totq = yv.sum(), (yv**2).sum()
                with np.errstate(divide="ignore", invalid="ignore"):
                    impl = sql - sl**2 / nl
                    impr = (totq - sql) - (tot - sl) ** 2 / (n - nl)
                gains = np.where(ok, parent_imp - (impl + impr), -np.inf)
                f = int(np.argmax(gains))
                if not np.isfinite(gains[f]):
                    return None
                mask = left[:, f]
                return (float(gains[f]), f, float(thr[f]), idx[mask], idx[~mask])
            order = np.argsort(Xn, axis=0, kind="stable")  # (n, p)
            xs = np.take_along_axis(Xn, order, axis=0)
            ys = yv[order]  # (n, p)
            csum = np.cumsum(ys, axis=0)
            csq = np.cumsum(ys**2, axis=0)
            tot, totq = csum[-1], csq[-1]  # (p,)
            nl = np.arange(1, n, dtype=np.float64)[:, None]  # (n-1, 1)
            nr = n - nl
            with np.errstate(divide="ignore", invalid="ignore"):
                impl = csq[:-1] - csum[:-1] ** 2 / nl
                impr = (totq - csq[:-1]) - (tot - csum[:-1]) ** 2 / nr
            gains = parent_imp - (impl + impr)  # (n-1, p)
            gains[xs[:-1] == xs[1:]] = -np.inf  # no split between equal values
            k = int(np.argmax(gains))
            ki, f = divmod(k, p)
            if not np.isfinite(gains[ki, f]):
                return None
            thr = (xs[ki, f] + xs[ki + 1, f]) / 2.0
            mask = Xn[:, f] <= thr
            return (float(gains[ki, f]), f, float(thr), idx[mask], idx[~mask])

        root_idx = np.arange(len(y))
        self.nodes.append(None)  # placeholder for root
        heap = []
        counter = 0
        split = find_split(root_idx, 0)
        if split is None:
            self.nodes[0] = (-1, float(y.mean()), -1, -1)
            return self
        heapq.heappush(heap, (-split[0], counter, 0, 0, root_idx, split))
        counter += 1
        n_leaves = 1
        max_leaves = self.max_leaf_nodes or 10**9
        while heap:
            _, _, node_id, depth, idx, split = heapq.heappop(heap)
            if n_leaves + 1 > max_leaves:
                self.nodes[node_id] = (-1, float(y[idx].mean()), -1, -1)
                continue
            _, f, thr, li, ri = split
            lsplit = find_split(li, depth + 1)
            rsplit = find_split(ri, depth + 1)
            self.nodes.append(None)
            lid = len(self.nodes) - 1
            self.nodes.append(None)
            rid = len(self.nodes) - 1
            self.nodes[node_id] = (f, thr, lid, rid)
            n_leaves += 1
            for cid, cidx, csplit, cdepth in ((lid, li, lsplit, depth + 1), (rid, ri, rsplit, depth + 1)):
                if csplit is None:
                    self.nodes[cid] = (-1, float(y[cidx].mean()), -1, -1)
                else:
                    heapq.heappush(heap, (-csplit[0], counter, cid, cdepth, cidx, csplit))
                    counter += 1
        # any unexpanded placeholders (heap drained by max_leaf cut) → leaves
        for i, nd in enumerate(self.nodes):
            if nd is None:
                self.nodes[i] = (-1, 0.0, -1, -1)
        return self

    def predict(self, X):
        X = np.asarray(X, dtype=np.float64)
        out = np.empty(len(X))
        for r in range(len(X)):
            nid = 0
            while True:
                f, thr, l, rgt = self.nodes[nid]
                if f == -1:
                    out[r] = thr
                    break
                nid = l if X[r, f] <= thr else rgt
        return out


class ForestRegressor:
    """RandomForest (bootstrap, best splits) / ExtraTrees (no
    bootstrap, random thresholds) — seeded, 50 trees default like the
    reference grid (gapfiller.py:205, 262)."""

    def __init__(self, n_estimators=50, max_depth=None, min_samples_split=2,
                 max_leaf_nodes=None, mode="rf", seed=0):
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.min_samples_split = min_samples_split
        self.max_leaf_nodes = max_leaf_nodes
        self.mode = mode
        self.seed = seed

    def fit(self, X, y):
        X = np.asarray(X, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64).ravel()
        n = len(y)
        self.trees = []
        for t in range(self.n_estimators):
            rng = np.random.default_rng(self.seed * 1_000_003 + t)
            if self.mode == "rf":
                idx = rng.integers(0, n, n)
                tree = _Tree(self.max_depth, self.min_samples_split,
                             self.max_leaf_nodes, "best", 1.0, rng)
            else:
                idx = np.arange(n)
                tree = _Tree(self.max_depth, self.min_samples_split,
                             self.max_leaf_nodes, "random", 1.0, rng)
            self.trees.append(tree.fit(X[idx], y[idx]))
        return self

    def predict(self, X):
        return np.mean([t.predict(X) for t in self.trees], axis=0)


# ------------------------------------------------------------ CV / search


def kfold_indices(n: int, k: int, rng: np.random.Generator):
    """Shuffled k-fold split (reference uses KFold(shuffle=True),
    gapfiller.py:172 — ours is seeded for determinism)."""
    perm = rng.permutation(n)
    sizes = np.full(k, n // k)
    sizes[: n % k] += 1
    folds, pos = [], 0
    for s in sizes:
        folds.append(perm[pos : pos + s])
        pos += s
    return folds


def kfold_sequential(n: int, k: int):
    """Contiguous unshuffled k-fold (sklearn KFold(shuffle=False)) —
    what GridSearchCV/RandomizedSearchCV's ``cv=3`` uses in the
    reference's grid modes (gapfiller.py:399-423): every candidate is
    scored on the SAME folds."""
    sizes = np.full(k, n // k)
    sizes[: n % k] += 1
    folds, pos = [], 0
    idx = np.arange(n)
    for s in sizes:
        folds.append(idx[pos : pos + s])
        pos += s
    return folds


def cross_val_neg_mae(factory, X, y, cv: int,
                      rng: np.random.Generator | None = None,
                      folds=None) -> float:
    """Mean negative MAE over cv folds (reference scoring
    'neg_mean_absolute_error'). Raises ValueError mentioning n_splits
    when the sample is too small — same trigger the reference catches
    (gapfiller.py:737-739). ``folds`` overrides the shuffled split
    (grid modes pass one fixed sequential split for all candidates)."""
    n = len(y)
    if n < cv:
        raise ValueError(f"n_splits={cv} cannot be greater than the number of samples={n}")
    scores = []
    for fold in (folds if folds is not None else kfold_indices(n, cv, rng)):
        mask = np.ones(n, dtype=bool)
        mask[fold] = False
        if mask.sum() == 0 or len(fold) == 0:
            continue
        m = factory().fit(X[mask], y[mask])
        pred = m.predict(X[fold])
        scores.append(-float(np.mean(np.abs(pred - y[fold]))))
    return float(np.mean(scores))


def grid_candidates(grid: dict) -> list[dict]:
    keys = sorted(grid)
    out = [{}]
    for k in keys:
        out = [{**d, k: v} for d in out for v in grid[k]]
    return out


def search(factory, grid: dict, X, y, rng: np.random.Generator,
           n_iter: int | None = None, cv: int = 3):
    """Grid / randomized-grid search by neg-MAE CV. ``n_iter`` set →
    seeded sample of the candidate list (RandomizedSearchCV analog).
    All candidates are scored on the SAME unshuffled sequential folds,
    like the reference's GridSearchCV/RandomizedSearchCV with ``cv=3``
    (sklearn KFold(shuffle=False)); ``rng`` only drives the candidate
    sample."""
    cands = grid_candidates(grid)
    if n_iter is not None and n_iter < len(cands):
        cands = [cands[i] for i in rng.choice(len(cands), size=n_iter, replace=False)]
    n = len(y)
    if n < cv:
        raise ValueError(f"n_splits={cv} cannot be greater than the number of samples={n}")
    folds = kfold_sequential(n, cv)
    best_params, best_score = None, -np.inf
    for params in cands:
        s = cross_val_neg_mae(lambda p=params: factory(**p), X, y, cv, folds=folds)
        if s > best_score:
            best_params, best_score = params, s
    return best_params, best_score


# ------------------------------------------------------------ dispatch

GRIDS = {
    "Lasso": {"alpha": list(np.arange(1, 800, 50))},
    "RandomForest": {"max_depth": [5, 10, 15, 20, 25],
                     "min_samples_split": [2, 5, 10],
                     "max_leaf_nodes": [10, 50, 100]},
    "ExtraTrees": {"max_depth": [5, 10, 15, 20, 25],
                   "min_samples_split": [2, 5, 10],
                   "max_leaf_nodes": [10, 50, 100]},
    "Knn": {"weights": ["uniform", "distance"], "n_neighbors": [2, 5, 10, 15, 20]},
    "SVR": {"C": [0.001, 0.01, 0.1, 1, 10], "epsilon": [0.1, 0.4, 0.7, 1.0]},
}

# reference gridsearch uses full grid for Lasso/SVR-like small grids;
# RandomizedSearch n_iter=5 for the tree/knn/SVR random modes
RANDOM_N_ITER = {"Lasso": None, "RandomForest": 5, "ExtraTrees": 5, "Knn": 5, "SVR": 5}

_FOREST_N = 50


def make_estimator(method: str, params: dict | None, seed: int = 0):
    params = dict(params or {})
    if method == "Lasso":
        return LassoRegressor(**params)
    if method == "Knn":
        params.pop("algorithm", None)  # brute-force always; param kept for API parity
        return KNNRegressor(**params)
    if method == "SVR":
        kernel = params.pop("kernel", None)
        if kernel not in (None, "linear"):
            # sklearn SVR() defaults to kernel='rbf'; our kernel is
            # linear-only, so a non-linear request must fail loudly
            # rather than silently diverge from reference semantics.
            # The parity-matched grid modes set kernel='linear'
            # (reference gapfiller.py:399,414).
            raise ValueError(
                f"SVR kernel={kernel!r} is not implemented (linear only); "
                "the reference's grid-search modes use kernel='linear'")
        params.pop("gamma", None)  # 'scale' — meaningless for linear
        return LinearSVRRegressor(**params)
    if method == "RandomForest":
        return ForestRegressor(n_estimators=params.pop("n_estimators", _FOREST_N),
                               mode="rf", seed=seed, **params)
    if method == "ExtraTrees":
        return ForestRegressor(n_estimators=params.pop("n_estimators", _FOREST_N),
                               mode="et", seed=seed, **params)
    raise ValueError(f"unknown method {method!r}")


def fit_predict(method: str, hyperparameters: str, params: dict | None,
                X_train, y_train, X_test, seed: int = 0):
    """One pixel's regression: returns (predicted array, neg-MAE CV
    score). Mirrors the reference kernels' three modes + the no-CV
    fallback (train-MAE as score) when the sample is too small
    (gapfiller.py:136-178 et al.)."""
    X_train = np.asarray(X_train, dtype=np.float64)
    y_train = np.asarray(y_train, dtype=np.float64).ravel()
    X_test = np.asarray(X_test, dtype=np.float64)
    rng = np.random.default_rng(seed)

    if method == "SVR":
        # reference standardizes train+test *together* (leakage quirk,
        # gapfiller.py:370-375) — reproduced for parity
        sample = np.vstack([X_train, X_test])
        mu = sample.mean(axis=0)
        sd = sample.std(axis=0)
        sd[sd == 0] = 1.0
        sample = (sample - mu) / sd
        X_train = sample[: len(X_train)]
        X_test = sample[len(X_train):]

    def no_cv():
        m = make_estimator(method, params, seed).fit(X_train, y_train)
        pred = m.predict(X_test)
        score = float(np.mean(np.abs(m.predict(X_train) - y_train)))
        return pred, score

    try:
        if hyperparameters in ("RandomGridSearch", "GridSearch"):
            n_iter = RANDOM_N_ITER[method] if hyperparameters == "RandomGridSearch" else None
            base = dict(params or {})  # non-grid knobs (e.g. max_iter) pass through
            best, score = search(lambda **p: make_estimator(method, {**base, **p}, seed),
                                 GRIDS[method], X_train, y_train, rng, n_iter=n_iter)
            m = make_estimator(method, {**base, **best}, seed).fit(X_train, y_train)
            return m.predict(X_test), float(score)
        if hyperparameters == "Custom":
            score = cross_val_neg_mae(lambda: make_estimator(method, params, seed),
                                      X_train, y_train, 3, rng)
            m = make_estimator(method, params, seed).fit(X_train, y_train)
            return m.predict(X_test), float(score)
        raise ValueError(f"unknown hyperparameters mode {hyperparameters!r}")
    except ValueError as ex:
        if "n_splits" not in str(ex):
            raise
        return no_cv()
