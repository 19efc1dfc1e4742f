"""Generate the DuckDB oracle fixture for the s05 IVF-PQ query.

Same contract as make_raster_fixtures.py: the expected SELECTION —
which (qid, nid) pairs each query's final top-5 contains — is computed
ONLY by the naive per-row transcription in tests/oracles.py
(ivf_pq_pairs_oracle), never by the Spark operator. The s05 oracle SQL
then recomputes sim + rank over these pairs in DuckDB with the same
normalize/cosine expressions the s01/s04 oracles already hash-match,
so no floating-point value crosses through this fixture — only the
candidate selection, which 6dp rounding makes engine-stable.

Input: /root/testdata/sf0.01/embeddings.parquet (the table the driver
registers for the correctness gate; read-only). Output:
/root/repo/fixtures/s05_pairs.parquet. Rerun with
    python scripts/make_ann_fixtures.py
(idempotent — everything is deterministic)."""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import oracles  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(REPO, "fixtures", "s05_pairs.parquet")


def main():
    t = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    qids = [v for v in vec_ids if v < 10]
    pairs = oracles.ivf_pq_pairs_oracle(
        vec_ids, embs, qids, k=5, n_cells=16, lloyd_iters=2,
        n_probe=4, m=8, pq_ks=16, rerank=32)
    table = pa.table({
        "qid": pa.array([p[0] for p in pairs], pa.int64()),
        "nid": pa.array([p[1] for p in pairs], pa.int64()),
    })
    pq.write_table(table, OUT)
    print(f"wrote {OUT}: {table.num_rows} rows for {len(qids)} queries")


if __name__ == "__main__":
    main()
