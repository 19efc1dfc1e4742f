"""No-Spark fill-kernel concurrency probe: the exact bench workload
(2 sites x 8 inputs, 200x160, 12-layer history, Biome/Knn, 1024-px
chunks) executed as plain processes. Reports per-chunk kernel seconds
at 1, 8, and 32 concurrent workers — separates host memory/allocator
contention from Spark machinery."""

import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np

from ssgp_toolbox_spark import generator
from ssgp_toolbox_spark.kernels import batch
from ssgp_toolbox_spark.sentinels import DEFAULT_SENTINELS as SV

SITES = ("stp", "madrid")
H, W = 200, 160
N_HIST, N_INPUTS = 12, 8
CHUNK = 1024


def build_workload():
    """(site, input_idx) -> (final, tensor, extra); chunk list."""
    data = {}
    chunks = []
    for site in SITES:
        hist = [generator.make_layer(site, H, W, t, "history",
                                     gap_frac=0.02) for t in range(N_HIST)]
        tensor = np.stack(hist)
        extra = generator.zone_raster(site, H, W).astype(float)
        for i in range(N_INPUTS):
            frac = generator.GAP_LADDER[i % len(generator.GAP_LADDER)]
            final = generator.make_layer(site, H, W, N_HIST + i, "input",
                                         gap_frac=frac)
            key = (site, i)
            data[key] = (final, tensor, extra)
            n_gaps = int((final == SV.gap).sum())
            for c in range((n_gaps + CHUNK - 1) // CHUNK):
                chunks.append((key, c))
    return data, chunks


_DATA = None


def _init():
    global _DATA
    _DATA = build_workload()[0]


def run_chunk(arg):
    key, c = arg
    final, tensor, extra = _DATA[key]
    t0 = time.time()
    batch.fill_image_knn(final, tensor, extra=extra,
                         predictor_configuration="Biome",
                         hyperparameters="Custom",
                         params={"n_neighbors": 5}, seed=12345,
                         gap_slice=(c * CHUNK, (c + 1) * CHUNK), sv=SV)
    return time.time() - t0


def main():
    data, chunks = build_workload()
    print(f"chunks: {len(chunks)}")
    global _DATA
    _DATA = data
    # warm single-process baseline
    t0 = time.time()
    times = [run_chunk(ch) for ch in chunks]
    wall1 = time.time() - t0
    print(f"1-proc: wall={wall1:.2f}s sum={sum(times):.2f}s "
          f"mean_chunk={np.mean(times)*1e3:.0f}ms")
    for nw in (8, 32):
        with ProcessPoolExecutor(max_workers=nw, initializer=_init) as ex:
            t0 = time.time()
            times = list(ex.map(run_chunk, chunks, chunksize=1))
            wall = time.time() - t0
        print(f"{nw}-proc: wall={wall:.2f}s sum={sum(times):.2f}s "
              f"mean_chunk={np.mean(times)*1e3:.0f}ms "
          f"speedup_vs_1={wall1/wall:.2f} eff={(wall1/wall)/nw:.2f}")


if __name__ == "__main__":
    main()
