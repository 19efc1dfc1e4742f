"""Two-parallelism scaling benchmark for the IVF-PQ ANN path
(north_rule evidence for the round-5 operator).

Same protocol as scaling_bench.py: the identical build+search job at
local[N] and local[4N], fresh JVM per level, deterministic input
synthesized JVM-side (no parquet read — the measured work is the
operator, not the scan), steady-state second run reported, scaling
efficiency = (T_N / T_4N) / 4.

The job: a 2M x 64-d corpus from a pure-Catalyst shader-hash
expression, ivf_pq_build (64 cells, stride-16 Lloyd training,
packed int64 codes) + ivf_pq_search for 64 queries. The measured
phases are the distributed ones — the stride-sampled Lloyd
aggregations, the corpus-wide narrow Arrow encode, the by-cell ADC
cogroup, and the bounded rerank join; driver-side codebook training
is a constant (train_cap) by design.

Usage: python scripts/pq_scaling_bench.py [N]   (default N=8)
Writes BENCH/scaling_pq.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = r"""
import json, sys, time
sys.path.insert(0, "@REPO@")
from pyspark.sql import functions as F
from ssgp_toolbox_spark.session import get_spark
from ssgp_toolbox_spark.functions import simsearch

cpus = int(sys.argv[1])
n_rows = int(sys.argv[2])
spark = get_spark("pq-scaling", master="local[%d]" % cpus)

# deterministic corpus, synthesized inside the JVM (classic
# frac(sin(...)) shader hash per (vec_id, dim) -> [-0.5, 0.5));
# float32 like the embeddings table
h = lambda d: (F.col("vec_id") * 12.9898 + F.lit(float(d)) * 78.233)
comp = lambda d: (F.sin(h(d)) * 43758.5453)
corpus = (spark.range(n_rows).withColumnRenamed("id", "vec_id")
          .withColumn("embedding", F.array(*[
              (comp(d) - F.floor(comp(d)) - F.lit(0.5)).cast("float")
              for d in range(64)]))
          .repartition(cpus * 4, "vec_id")
          .cache())
corpus.count()
queries = corpus.filter(F.col("vec_id") < 64).cache()
queries.count()


def run_once():
    t0 = time.time()
    index, model = simsearch.ivf_pq_build(
        corpus, n_cells=64, lloyd_iters=2, m=8, pq_ks=16,
        train_stride=16, train_cap=20000, packed=True)
    out = simsearch.ivf_pq_search(index, corpus, queries, model,
                                  k=5, n_probe=8, rerank=64)
    n = out.count()
    return n, time.time() - t0


run_once()                      # warmup: python workers, JIT, arrow
n, t = run_once()               # steady state
print("RESULT " + json.dumps({
    "cpus": cpus, "corpus_rows": n_rows, "result_rows": int(n),
    "t_build_search": t, "rows_per_sec": round(n_rows / t, 1)}))
spark.stop()
"""


def run(cpus: int, n_rows: int) -> dict:
    script = JOB.replace("@REPO@", REPO)
    p = subprocess.run([sys.executable, "-c", script, str(cpus),
                        str(n_rows)],
                       capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT line (rc={p.returncode}):\n{p.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_rows = int(os.environ.get("PQ_SCALING_ROWS", "2000000"))
    lo = run(n, n_rows)
    hi = run(4 * n, n_rows)
    eff = (lo["t_build_search"] / hi["t_build_search"]) / 4
    out = {"N": n, "low": lo, "high": hi,
           "scaling_efficiency": round(eff, 3)}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", f"scaling_pq_N{n}.json"),
              "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
