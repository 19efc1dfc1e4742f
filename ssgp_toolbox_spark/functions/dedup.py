"""Deduplication operators over the documents table.

Four families, each staying JVM-side (md5 + higher-order array
functions; no Python UDFs):

- exact: hash-groupBy on content (keeper = min doc_id);
- n-gram Jaccard: word-shingle explode → equi-join on shingle →
  |A∩B| / |A∪B| — the classic near-dup pair join;
- MinHash + LSH: per-doc signature = min over shingles of
  md5(seed ∥ shingle); signatures banded; candidate pairs share a
  band bucket (the scale path: the shuffle key is (band, bucket), so
  work is linear in corpus size, not quadratic);
- SimHash: 60-bit signature from per-token hash bits weighted ±1;
  near-dups = pairs within Hamming distance k (compared via a
  band-join on bit chunks, same LSH trick).

At 10^12 rows the pairwise joins are only ever evaluated inside LSH
buckets; the plain Jaccard join exists as the exact-verification
stage applied to LSH candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# md5-based 60-bit hash (parity with DuckDB: ('0x'||substr(md5(x),1,15))::BIGINT)
def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _h60_sql(expr_sql: str) -> str:
    """SQL-string twin of ``_h60`` for batch expression building: the
    signature/band trees below contain dozens of these, and composing
    them as Column objects costs a py4j round trip PER operator call —
    measured ~1 s of driver time per d04 build. One ``F.expr`` parse
    of the assembled string is one round trip for the whole tree and
    parses to the identical expression."""
    return f"CAST(conv(substring(md5({expr_sql}), 1, 15), 16, 10) AS BIGINT)"


def _comma_join(cols_sql: str) -> str:
    """``concat_ws(',', <cols>)`` as a SQL string (the comma separator
    quoted SQL-side)."""
    return "concat_ws(',', " + cols_sql + ")"


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact content dedup: one keeper per distinct text."""
    return (
        docs.groupBy(_h60(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keeper_id"), F.count("*").alias("n_copies"))
    )


def shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """doc_id → distinct word k-shingles (exploded)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )
    return docs.select("doc_id", F.explode(grams).alias("shingle"))


def jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.4,
                  max_df: int | None = None) -> DataFrame:
    """Near-dup pairs by k-shingle Jaccard ≥ threshold (a < b).

    ``max_df``: the 100 TB hot-shingle guard (same shape as
    ``max_bucket`` on the LSH/hamming paths). The shingle equi-join
    is quadratic in per-shingle document frequency — one boilerplate
    shingle shared by 10^6 docs is 10^12 pair rows in a single task.
    With ``max_df`` set, shingles whose document frequency exceeds it
    are dropped BEFORE the join, from both the intersection and the
    per-doc set sizes, so the reported value is the exact Jaccard
    over the reduced shingle universe (a shingle that common carries
    no similarity signal — the standard stopword-shingle treatment).
    None (default) keeps exact full-universe semantics; the intended
    full-corpus usage remains LSH candidates + this as the verify
    stage."""
    sh = shingles(docs, k)
    if max_df is not None:
        ok = (sh.groupBy("shingle").agg(F.count("*").alias("df"))
              .filter(F.col("df") <= max_df).drop("df"))
        sh = sh.join(ok, "shingle")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("x")
        .join(sh.alias("y"), "shingle")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "a")
                   .withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b")
              .withColumnRenamed("n_sh", "nb"), "b")
        .withColumn("jaccard", F.round(
            F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, k: int = 3, n_hashes: int = 16) -> DataFrame:
    """doc_id → array of n_hashes minhash values (seeded md5 family)."""
    sh = shingles(docs, k)
    # one F.expr parse per hash instead of ~8 Column-op round trips
    # (see _h60_sql) — identical min(md5-hash) aggregates
    mins = []
    for i in range(n_hashes):
        seeded = f"concat('seed{i}|', shingle)"
        mins.append(F.expr(f"min({_h60_sql(seeded)}) AS mh{i}"))
    return sh.groupBy("doc_id").agg(*mins)


def minhash_lsh_candidates(docs: DataFrame, k: int = 3, n_hashes: int = 16,
                           bands: int = 4,
                           max_bucket: int | None = None) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of their minhash
    signature. Shuffle key = (band, bucket) — linear, not quadratic.

    ``max_bucket``: the 100 TB hot-bucket guard. The within-bucket
    pair join is quadratic in bucket size, so one degenerate bucket
    (boilerplate shingles, empty docs) can dominate the whole job; a
    cap drops buckets with more than ``max_bucket`` members from
    candidate generation — the standard "too-common band" treatment
    (a bucket that common carries no near-dup signal anyway; raise
    n_hashes/bands instead if it fires on real corpora). None (the
    default) keeps exact classic LSH semantics."""
    rows_per_band = n_hashes // bands
    sig = minhash_signatures(docs, k, n_hashes)
    # single-parse band array (see _h60_sql): same struct(band, bucket)
    # tree the per-Column form built, one py4j round trip total
    band_sql = []
    for b in range(bands):
        members = ", ".join(f"mh{b * rows_per_band + r}"
                            for r in range(rows_per_band))
        band_sql.append(
            f"struct(CAST({b} AS INT) AS band, "
            f"{_h60_sql(_comma_join(members))} AS bucket)")
    buckets = sig.select(
        "doc_id",
        F.explode(F.expr("array(" + ", ".join(band_sql) + ")")).alias("bb")) \
        .select("doc_id", "bb.band", "bb.bucket")
    if max_bucket is not None:
        ok = (buckets.groupBy("band", "bucket")
              .agg(F.count("*").alias("n"))
              .filter(F.col("n") <= max_bucket).drop("n"))
        buckets = buckets.join(ok, ["band", "bucket"])
    return (
        buckets.alias("x").join(buckets.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )


def hamming_pairs(df: DataFrame, id_col: str = "image_id",
                  hash_col: str = "phash", max_dist: int = 8,
                  max_bucket: int | None = None) -> DataFrame:
    """Near-dup pairs by 64-bit-hash Hamming distance ≤ ``max_dist``
    WITHOUT a cross join: the hash is split into ``max_dist + 1``
    disjoint bit bands — by pigeonhole, two hashes within ``max_dist``
    share at least one exact band — candidates come from an equi-join
    on (band, chunk), then the exact Hamming filter runs on candidates
    only. Shuffle key = (band, chunk): linear in corpus size at 10^12
    rows (same structure as minhash_lsh_candidates), vs the O(n²)
    pair enumeration a crossJoin would cost.

    ``max_bucket``: the same 100 TB hot-bucket guard as
    ``minhash_lsh_candidates`` — the within-(band, chunk) self-join is
    quadratic in chunk membership, so a degenerate value (millions of
    near-black images sharing one phash band) turns one bucket into
    10^12 pair rows in a single task. The cap drops (band, chunk)
    groups with more than ``max_bucket`` members from candidate
    generation; pairs within ``max_dist`` still surface through any of
    their other ``max_dist`` non-degenerate bands, so only pairs ALL
    of whose shared bands are that hot are lost. None (default) keeps
    exact pigeonhole semantics.

    Returns (a, b, hamming) with a < b."""
    n_bands = max_dist + 1
    base, rem = divmod(64, n_bands)
    bands, off = [], 0
    for b in range(n_bands):
        wid = base + (1 if b < rem else 0)
        mask = (1 << wid) - 1
        bands.append(F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(hash_col), off)
             .bitwiseAND(F.lit(mask)).alias("chunk")))
        off += wid
    buckets = df.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("hash"),
        F.explode(F.array(*bands)).alias("bb"),
    ).select("id", "hash", "bb.band", "bb.chunk")
    if max_bucket is not None:
        ok = (buckets.groupBy("band", "chunk")
              .agg(F.count("*").alias("n"))
              .filter(F.col("n") <= max_bucket).drop("n"))
        buckets = buckets.join(ok, ["band", "chunk"])
    x, y = buckets.alias("x"), buckets.alias("y")
    return (
        x.join(y, ["band", "chunk"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                F.bit_count(F.col("x.hash").bitwiseXOR(F.col("y.hash")))
                 .cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_dist)
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 60) -> DataFrame:
    """60-bit SimHash over distinct word tokens: bit b set iff the
    ±1-weighted sum of token-hash bits at position b is positive.
    One explode + one groupBy pass (codegen-friendly conditional
    sums), not 60 array traversals."""
    tok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.col("text"), " "))).alias("t"),
    ).withColumn("th", _h60(F.col("t")))
    # the 60 conditional-sum aggregates and the 60-term signature sum
    # parse from assembled SQL strings (one F.expr round trip per
    # aggregate / one for the signature) instead of ~8 py4j calls per
    # operator — measured ~1 s of driver build time per d04 run with
    # the per-Column form; the parsed expressions are identical
    sums = [
        F.expr(f"sum((shiftright(th, {b}) & 1) * 2 - 1) AS s{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*sums)
    terms = [
        f"CAST(CASE WHEN s{b} > 0 THEN 1 ELSE 0 END AS BIGINT)"
        f" * CAST({2 ** b} AS BIGINT)"
        for b in range(bits)
    ]
    # left-assoc "+" chain = the former Python "+" fold, term order kept
    return agg.select("doc_id",
                      F.expr(" + ".join(terms) + " AS simhash"))


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95,
                        bits_per_table: int = 4, n_tables: int = 8,
                        seed: int = 11,
                        max_bucket: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the fifth dedup family,
    over the embeddings table instead of text.

    Candidate generation is multi-table random-hyperplane LSH (shared
    seeded planes, simsearch.hyperplanes): two vectors are candidates
    iff they share at least one table's full sign-bucket. Candidates
    are then verified by exact f64 cosine >= ``threshold``. The pair
    join only ever runs inside (table, bucket) groups — the shuffle
    key at 10^12 rows — so cost is linear in corpus size; no
    crossJoin anywhere in the plan.

    Recall semantics: by the SimHash bound, a pair at cosine >= t
    collides in one b-bit table with prob (1 - acos(t)/pi)^b; with
    t=0.95, b=4, 8 tables that is 1-(1-0.66)^8 ≈ 0.9998. The operator
    is deterministic given the seed, so an oracle reproducing the same
    planes reproduces the exact output.

    ``max_bucket``: hot-bucket guard (see ``minhash_lsh_candidates``)
    — a degenerate (tbl, bucket) group (e.g. a zero-vector cluster
    whose signs all agree) makes the within-bucket join quadratic; the
    cap drops groups above the threshold. A capped pair can still
    collide in any of the other n_tables - 1 tables. None (default)
    keeps exact multi-table LSH semantics.
    """
    from ssgp_toolbox_spark.functions import simsearch

    planes = simsearch.hyperplanes(bits_per_table * n_tables, seed=seed)
    emb = embeddings.withColumn("emb", F.col("embedding").cast("array<double>"))
    keys = simsearch.lsh_keys(F.col("emb"), planes, bits_per_table, n_tables)
    buck = emb.select(
        F.col("vec_id").alias("id"), F.col("emb"),
        F.posexplode(keys).alias("tbl", "bucket"))
    if max_bucket is not None:
        ok = (buck.groupBy("tbl", "bucket")
              .agg(F.count("*").alias("n"))
              .filter(F.col("n") <= max_bucket).drop("n"))
        buck = buck.join(ok, ["tbl", "bucket"])
    x, y = buck.alias("x"), buck.alias("y")
    cand = (
        x.join(y, ["tbl", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"),
                simsearch._cosine6(F.col("x.emb"), F.col("y.emb"))
                 .alias("sim"))
        .distinct()  # a pair may collide in several tables
    )
    return cand.filter(F.col("sim") >= threshold)


def cluster_pairs(pairs: DataFrame, vertices: DataFrame | None = None,
                  id_col: str = "doc_id", max_iter: int = 20) -> DataFrame:
    """Near-dup CLUSTER resolution: connected components over the
    candidate-pair graph, canonical keeper = min id per component —
    the step that turns pairwise matches into per-document keep/drop
    decisions.

    Iterative min-label propagation: every vertex starts with its own
    id; each round takes the min of its label and its neighbors'
    labels; converges to the component minimum in <= diameter rounds
    (each round is one shuffle join + groupBy-min, the standard
    distributed CC — the large-star/small-star variant halves round
    count at extreme scale, diameter of near-dup clusters is tiny in
    practice). Deterministic fixpoint → SQL-oracle-able via a
    recursive transitive closure.

    ``pairs``: (a, b) columns. ``vertices``: optional (id_col) frame —
    vertices with no edges become singleton clusters."""
    # materialize the (usually expensive) candidate-pair pipeline ONCE:
    # every propagation round joins `edges`, and without truncation the
    # whole upstream DAG (e.g. the MinHash-LSH candidate generation)
    # would be recomputed per round
    edges = (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .unionByName(pairs.select(F.col("b").alias("src"),
                                       F.col("a").alias("dst")))
             .distinct()).localCheckpoint(eager=False)
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    else:
        verts = edges.select(F.col("src").alias("id")).distinct()
    labels = verts.withColumn("label", F.col("id"))

    def digest(lab: DataFrame):
        # order-independent label-set fingerprint — one cheap
        # partial-agg shuffle instead of a full label-compare join per
        # round (the same convergence trick as cluster_pairs_star):
        # count is the constant vertex total, the decimal(38,0) hash
        # sum is collision-resistant across ~10^19 rows without
        # ANSI int64 overflow
        row = lab.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("id", "label").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    # no digest of the INITIAL labels: the first round never compares
    # equal to None, so the pre-loop digest action was pure overhead
    # in every normal run (an already-converged input merely pays one
    # extra cheap round before the round-2 digests match)
    prev_digest = None
    rounds = 0
    while True:
        neigh = (edges.join(labels.withColumnRenamed("id", "dst")
                            .select("dst", "label"), "dst")
                 .groupBy("src").agg(F.min("label").alias("nmin"))
                 .withColumnRenamed("src", "id"))
        new_labels = (labels.join(neigh, "id", "left")
                      .select("id", F.least(F.col("label"),
                                            F.coalesce("nmin", F.col("label")))
                              .alias("label"))
                      .localCheckpoint(eager=False))
        # the digest action materializes the lazy checkpoint — one
        # Spark job per round instead of checkpoint + digest
        new_digest = digest(new_labels)
        if new_digest == prev_digest:
            # digests agree → almost surely the fixpoint; confirm the
            # one time it matters with the exact compare so a 64-bit
            # hash-sum collision can't terminate the propagation early
            changed = (new_labels.alias("n").join(labels.alias("o"), "id")
                       .filter(F.col("n.label") != F.col("o.label")).limit(1)
                       .count())
            if not changed:
                labels = new_labels
                break
        prev_digest = new_digest
        rounds += 1
        if rounds >= max_iter:
            # returning partial labels would silently violate the
            # documented connected-components semantics
            raise RuntimeError(
                f"cluster_pairs: no fixpoint after {max_iter} rounds; "
                "component diameter exceeds max_iter — raise max_iter "
                "(or use a large-star/small-star contraction for "
                "extreme-diameter graphs)")
        labels = new_labels
    return labels.select(F.col("id").alias(id_col),
                         F.col("label").alias("cluster_id"))


def cluster_pairs_star(pairs: DataFrame, vertices: DataFrame | None = None,
                       id_col: str = "doc_id",
                       max_rounds: int = 50) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce
    and Beyond") — the extreme-diameter scale path that
    ``cluster_pairs``'s docstring promises: O(log^2 n) rounds
    regardless of component diameter, vs diameter rounds for
    min-label propagation.

    large-star: every node links its LARGER neighbors to the minimum
    of its closed neighborhood; small-star: every node links its
    smaller-or-self neighborhood to that neighborhood's minimum. At
    the fixpoint the edge set is a star forest rooted at each
    component's minimum id — the same canonical-keeper semantics (and
    the same recursive-transitive-closure oracle) as cluster_pairs.

    Each round is two groupBy-min + join shuffles over the current
    edge set; lineage is truncated per round (localCheckpoint)."""
    # materialize the candidate-pair pipeline ONCE: round 1's
    # large_star/small_star unions reference E four times, and digest
    # once more — without truncation the upstream candidate generation
    # (MinHash shingle → signature → band join) is recomputed each time
    E = (pairs.select(F.col("a").alias("u"), F.col("b").alias("v"))
         .filter(F.col("u") != F.col("v")).distinct()) \
        .localCheckpoint(eager=False)
    if vertices is not None:
        verts = vertices.select(F.col(id_col).alias("id")).distinct()
    else:
        verts = (E.select(F.col("u").alias("id"))
                 .union(E.select(F.col("v").alias("id"))).distinct())

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u").agg(F.min("v").alias("mn"))
                .select("u", F.least("mn", F.col("u")).alias("m")))
        return (sym.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .filter(F.col("u") != F.col("v")).distinct())

    def small_star(edges: DataFrame) -> DataFrame:
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        low = sym.filter(F.col("v") < F.col("u"))
        mins = (low.groupBy("u").agg(F.min("v").alias("m")))
        linked = (low.join(mins, "u")
                  .select(F.col("v").alias("u"), F.col("m").alias("v")))
        self_link = mins.select(F.col("u"), F.col("m").alias("v"))
        return (linked.union(self_link)
                .filter(F.col("u") != F.col("v")).distinct())

    def digest(edges: DataFrame):
        # order-independent edge-set fingerprint: one cheap partial-agg
        # shuffle (count + sum of row hashes) instead of two exceptAll
        # shuffles per round — at 10^12 edges the convergence *check*
        # otherwise costs as much as the contraction itself
        row = edges.agg(
            F.count("*").alias("n"),
            # decimal(38,0) sum: ANSI-safe (no int64 overflow) up to
            # ~10^19 edges
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    rounds = 0
    # no digest of the INITIAL edge set (see cluster_pairs): round 1
    # never compares equal to None, so the pre-loop digest action was
    # pure overhead in every normal run
    prev_digest = None
    while True:
        new = small_star(large_star(E)).localCheckpoint(eager=False)
        new_digest = digest(new)
        if new_digest == prev_digest:
            # digests agree → almost surely the fixpoint; confirm the
            # one time it matters with the exact set comparison (a
            # 64-bit sum collision would otherwise terminate early).
            # ONE action for both directions: the former sequential
            # pair always ran BOTH sides at the true fixpoint
            changed = (new.exceptAll(E).union(E.exceptAll(new))
                       .limit(1).count())
            if not changed:
                E = new
                break
        E, prev_digest = new, new_digest
        rounds += 1
        if rounds >= max_rounds:
            raise RuntimeError(
                f"cluster_pairs_star: no fixpoint after {max_rounds} "
                "alternating rounds (theory bound O(log^2 n) — check "
                "for adversarial id distributions)")
    # fixpoint: E is (child, component-min) star edges
    return (verts.join(E.withColumnRenamed("u", "id"), "id", "left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("v", F.col("id")).alias("cluster_id")))
