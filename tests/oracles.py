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


def discretize_oracle(matrices_dict, timestep_hours=12, averaging="None",
                      filling_method="None", n_neighbors=5, poly_degree=2):
    """Naive transcription of Discretizator (timeseries.py:60-310):
    dict{datetime: matrix} -> (tensor, centroids)."""
    import datetime as dt

    keys = sorted(matrices_dict)
    example = matrices_dict[keys[0]]
    rows, cols = example.shape
    start = dt.datetime(keys[0].year, keys[0].month, keys[0].day)
    last = keys[-1] + dt.timedelta(days=1)
    end = dt.datetime(last.year, last.month, last.day)
    step = dt.timedelta(hours=timestep_hours)
    times = []
    t = start
    while t <= end:
        times.append(t)
        t += step
    tensor, centroids = [], []
    for i in range(len(times) - 1):
        centroid = times[i] + (times[i + 1] - times[i]) / 2
        suitable = [k for k in keys if times[i] <= k < times[i + 1]]
        if len(suitable) == 0:
            if i == len(times) - 2:
                break
            matrix = np.full((rows, cols), GAP)
        elif len(suitable) == 1:
            matrix = matrices_dict[suitable[0]].astype(float)
        else:
            dists = np.array([abs((k - centroid).total_seconds()) for k in suitable])
            batch = np.array([matrices_dict[k] for k in suitable], dtype=float)
            if averaging == "None":
                matrix = matrices_dict[suitable[int(np.argmin(dists))]].astype(float)
            elif averaging == "simple":
                matrix = batch.mean(axis=0)
            elif averaging == "weighted":
                order = np.argsort(dists)
                weights = np.empty(len(dists))
                wgt = len(dists)
                for idx in order:
                    weights[idx] = wgt
                    wgt -= 1
                matrix = np.average(batch, axis=0, weights=weights)
        tensor.append(matrix)
        centroids.append(centroid)
    tensor = np.array(tensor)

    def gap_process(series):
        i_gaps = np.ravel(np.argwhere(series == GAP))
        if filling_method in (None, "None"):
            return series
        for g in i_gaps:
            i_known = np.ravel(np.argwhere(series != GAP))
            d = np.abs(i_known - g)
            idx = np.argsort(d)[:n_neighbors]
            vals = np.array([series[i_known[i]] for i in idx])
            if filling_method == "median":
                series[g] = np.nanmedian(vals)
            elif filling_method == "poly":
                coefs = np.polyfit(i_known[idx], vals, poly_degree)
                series[g] = np.polyval(coefs, g)
        return series

    for r in range(tensor[0].shape[0]):
        for c in range(tensor[0].shape[1]):
            s = tensor[:, r, c]
            if any(v == SKIP for v in s):
                s = np.full(len(s), SKIP)
            elif any(v == GAP for v in s):
                s = gap_process(s)
            tensor[:, r, c] = s
    return tensor, centroids
