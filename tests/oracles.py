"""Independent, deliberately-naive oracles transcribing the reference
semantics (cited lines) with per-pixel loops — used to verify the
engine's vectorized kernels (FIXTURES.md §4). These are NOT imported
by the engine."""

import numpy as np
import pandas as pd

GAP, SKIP, NODATA = -100.0, -200.0, -32768.0


def nn_fill_oracle(matrix):
    """Transcription of gapfiller.py:920-962: flatten skip/NoData to
    gap, fill each flagged pixel with nearest valid (first-index tie),
    restore skip/NoData."""
    m = matrix.astype(np.float64).copy()
    invalid = (m == GAP) | (m == SKIP) | (m == NODATA)
    if (~invalid).sum() <= 10:
        return m, "not_enough_valid"
    if (m == GAP).sum() == 0:
        return m, "passthrough"
    work = m.copy()
    work[(work == SKIP) | (work == NODATA)] = GAP
    valid_pts = [(i, j) for i in range(m.shape[0]) for j in range(m.shape[1])
                 if work[i, j] != GAP]
    out = work.copy()
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            if work[i, j] == GAP:
                best, bd = None, None
                for (vi, vj) in valid_pts:
                    d = (vi - i) ** 2 + (vj - j) ** 2
                    if bd is None or d < bd:
                        bd, best = d, (vi, vj)
                out[i, j] = work[best]
    out[m == SKIP] = SKIP
    out[m == NODATA] = NODATA
    return out, "filled"


def clean_frame_oracle(frame):
    """pandas transcription of gapfiller.py:634-708."""
    df = pd.DataFrame(np.asarray(frame, dtype=np.float64))
    if any(v == SKIP for v in np.array(df)[:, -1]):
        return "skip"
    df = df.replace(SKIP, np.nan).dropna(axis="columns")
    df.columns = [str(i) for i in range(len(df.columns))]
    df = df.replace(NODATA, np.nan).replace(GAP, np.nan)
    df = df.dropna(how="all")
    last = np.ravel(np.array(df.iloc[-1:, :-1]))
    na_cols = [str(i) for i in np.ravel(np.argwhere(np.isnan(last)))]
    if na_cols:
        df = df.drop(na_cols, axis=1)
        df.columns = [str(i) for i in range(len(df.columns))]
    for i in range(len(df.columns) - 1):
        col = str(i)
        med = np.median(np.array(df[col].dropna()))
        df[col] = df[col].fillna(med)
    train = df.iloc[:-1, :].dropna()
    test = df.iloc[-1:, :]
    return (np.array(train.iloc[:, :-1]), np.array(train.iloc[:, -1]),
            np.array(test.iloc[:, :-1]))


def knn_predict_oracle(X_train, y_train, X_test, k, weights="uniform"):
    """Naive kNN regression (loop), stable order by (distance, index)."""
    out = []
    for x in np.asarray(X_test, dtype=float):
        d = [(float(np.sqrt(((x - xt) ** 2).sum())), i)
             for i, xt in enumerate(np.asarray(X_train, dtype=float))]
        d.sort()
        top = d[: min(k, len(d))]
        ys = np.array([y_train[i] for _, i in top], dtype=float)
        if weights == "distance":
            ds = np.array([dd for dd, _ in top])
            if (ds < 1e-12).any():
                out.append(ys[ds < 1e-12].mean())
            else:
                w = 1.0 / ds
                out.append(float((ys * w).sum() / w.sum()))
        else:
            out.append(float(ys.mean()))
    return np.array(out)


def k_nearest_coords_oracle(coords, target, k):
    """40×argmin selection with first-index tie-break
    (gapfiller.py:519-530), transcribed with the set-to-inf loop."""
    coords = np.asarray(coords, dtype=float)
    d = np.sqrt(((coords - np.asarray(target, dtype=float)) ** 2).sum(axis=1))
    d = d.copy()
    picked = []
    for _ in range(min(k, len(coords))):
        i = int(np.argmin(d))
        picked.append(coords[i])
        d[i] = np.inf
    return np.array(picked)
