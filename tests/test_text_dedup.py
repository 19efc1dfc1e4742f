"""Language-ID discrimination on real-language snippets and the
embedding near-dup LSH join (crossJoin-free plan + planted recall)."""

import numpy as np

from ssgp_toolbox_spark.functions import dedup, text

SNIPPETS = [
    (1, "en", "the engine is that part of the plan that runs in the cluster"),
    (2, "es", "el problema de la memoria es que los datos no caben y una parte"),
    (3, "fr", "le moteur est dans les machines et une partie des resultats"),
    (4, "de", "der plan ist nicht das problem und die daten sind ein teil"),
    (5, "zh", "数据引擎在集群上运行并且填补空缺像素"),
    (6, "ru", "данные и память работают в кластере а результат пишется"),
]


def test_lang_id_discriminates_real_text(spark):
    df = spark.createDataFrame(SNIPPETS, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r["predicted_lang"] for r in text.lang_id(df).collect()}
    for doc_id, lang, _ in SNIPPETS:
        assert got[doc_id] == lang, (doc_id, got[doc_id], lang)


def _emb_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(40):
        rows.append((i, [float(v) for v in rng.standard_normal(64).round(6)]))
    # two planted twins of row 0 and row 1
    for j, src in enumerate([0, 1]):
        twin = np.array(rows[src][1]) + 0.01 * rng.standard_normal(64)
        rows.append((100 + j, [float(v) for v in twin.round(6)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dups_finds_planted_pairs(spark):
    df = _emb_df(spark)
    out = dedup.embedding_near_dups(df, threshold=0.95)
    pairs = {(r["a"], r["b"]) for r in out.collect()}
    assert (0, 100) in pairs and (1, 101) in pairs
    # near-orthogonal corpus rows must not pair up
    assert all(a >= 100 or b >= 100 for a, b in pairs)


def test_embedding_near_dups_plan_has_no_cartesian(spark):
    df = _emb_df(spark)
    plan = dedup.embedding_near_dups(df)._jdf.queryExecution().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cluster_pairs_chain_and_singletons(spark):
    """A 5-node chain (diameter > 1 → needs several propagation
    rounds) collapses to one cluster keyed by its min id; isolated
    vertices stay singletons."""
    pairs = spark.createDataFrame(
        [(2, 7), (7, 4), (4, 9), (9, 3), (11, 12)], "a long, b long")
    verts = spark.createDataFrame([(i,) for i in [2, 3, 4, 7, 9, 11, 12, 99]],
                                  "doc_id long")
    got = {r["doc_id"]: r["cluster_id"] for r in
           dedup.cluster_pairs(pairs, vertices=verts).collect()}
    assert got == {2: 2, 3: 2, 4: 2, 7: 2, 9: 2, 11: 11, 12: 11, 99: 99}


def test_ivf_topk_clustered_recall(spark):
    """On clustered data (IVF's home turf) the 2/8-probe search finds
    the true neighbors: per-cluster twins rank first."""
    from ssgp_toolbox_spark.functions import simsearch

    rng = np.random.default_rng(9)
    rows = []
    centers = rng.standard_normal((4, 64)) * 5
    for i in range(64):
        c = centers[i % 4]
        rows.append((i, [float(v) for v in (c + 0.1 * rng.standard_normal(64)).round(6)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = simsearch.ivf_topk(df, df.filter("vec_id < 8"), k=3)
    got = {(r["qid"], r["rank"]): r["nid"] for r in out.collect()}
    # every top-3 neighbor of query q must be in q's planted cluster
    for (q, rank), n in got.items():
        assert n % 4 == q % 4, (q, rank, n)


def test_cluster_pairs_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_iter must raise, not
    silently return partial labels (ADVICE r2)."""
    import pytest

    from ssgp_toolbox_spark.functions import dedup

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "a long, b long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        dedup.cluster_pairs(chain, max_iter=1)
    # and with enough rounds the same graph resolves to one cluster
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.cluster_pairs(chain, max_iter=10).collect()}
    assert set(got.values()) == {0}


def test_cluster_pairs_star_matches_propagation_and_beats_diameter(spark):
    """large-star/small-star CC: (1) identical labels to min-label
    propagation on a mixed graph; (2) converges on a diameter-120
    chain within its O(log^2 n) round budget — where propagation
    would need 120 rounds."""
    from ssgp_toolbox_spark.functions import dedup

    edges = [(2, 7), (7, 9), (9, 3), (4, 3), (11, 12), (20, 21),
             (21, 22), (22, 23), (2, 9)]
    pairs = spark.createDataFrame(edges, "a long, b long")
    verts = spark.createDataFrame([(i,) for i in range(25)], "doc_id long")
    a = {r["doc_id"]: r["cluster_id"]
         for r in dedup.cluster_pairs(pairs, vertices=verts).collect()}
    b = {r["doc_id"]: r["cluster_id"]
         for r in dedup.cluster_pairs_star(pairs, vertices=verts).collect()}
    assert a == b

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(120)], "a long, b long")
    got = {r["doc_id"]: r["cluster_id"]
           for r in dedup.cluster_pairs_star(chain, max_rounds=15).collect()}
    assert set(got.values()) == {0} and len(got) == 121


def test_minhash_hot_bucket_guard(spark):
    """max_bucket drops degenerate buckets (quadratic-blowup guard):
    20 identical boilerplate docs share every band; with the cap their
    190 pairs disappear while the genuine near-dup pair survives."""
    from ssgp_toolbox_spark.functions import dedup

    boiler = [(i, "the same boilerplate text repeated everywhere")
              for i in range(20)]
    real = [(100, "a unique document about spatial gapfilling engines"),
            (101, "a unique document about spatial gapfilling engines")]
    docs = spark.createDataFrame(boiler + real, "doc_id long, text string")
    full = {(r["a"], r["b"]) for r in
            dedup.minhash_lsh_candidates(docs).collect()}
    capped = {(r["a"], r["b"]) for r in
              dedup.minhash_lsh_candidates(docs, max_bucket=5).collect()}
    assert (100, 101) in full and (100, 101) in capped
    assert any(a < 20 and b < 20 for a, b in full)
    assert not any(a < 20 and b < 20 for a, b in capped)
    assert capped <= full


def test_jaccard_hot_shingle_guard(spark):
    """max_df drops boilerplate shingles BEFORE the shingle self-join
    (quadratic-blowup guard, round-4 VERDICT #3): 1,000 docs sharing
    one boilerplate text would be ~500k pair rows through one shingle
    group; with the cap they produce no candidates at all, while a
    genuine near-dup pair (rare shingles, df=2 ≤ cap) survives with
    its exact full-universe Jaccard (its shingles are untouched by
    the filter)."""
    from ssgp_toolbox_spark.functions import dedup

    boiler = [(i, "this agreement is subject to the terms of service")
              for i in range(1000)]
    real = [(2000, "spatial gapfilling engines partition raster stacks"),
            (2001, "spatial gapfilling engines partition raster tiles")]
    docs = spark.createDataFrame(boiler + real, "doc_id long, text string")
    capped = {(r["a"], r["b"]): r["jaccard"] for r in
              dedup.jaccard_pairs(docs, threshold=0.1, max_df=10).collect()}
    expect = {(r["a"], r["b"]): r["jaccard"] for r in
              dedup.jaccard_pairs(
                  spark.createDataFrame(real, "doc_id long, text string"),
                  threshold=0.1).collect()}
    assert capped == expect and (2000, 2001) in capped


def test_hamming_hot_bucket_guard(spark):
    """max_bucket on hamming_pairs: 1,000 identical-phash images (the
    near-black-corpus degenerate case) share every band chunk; the cap
    drops their ~500k pairs while a genuine hamming-2 pair in a cold
    region of hash space survives (its bands are not hot)."""
    rows = [(f"blk-{i:04d}", 0x0F0F0F0F0F0F0F0F) for i in range(1000)]
    rows += [("real-a", 0x7777000011112222), ("real-b", 0x7777000011112223)]
    df = spark.createDataFrame(rows, "image_id string, phash long")
    capped = {(r["a"], r["b"]) for r in dedup.hamming_pairs(
        df, max_dist=8, max_bucket=50).collect()}
    assert ("real-a", "real-b") in capped
    assert not any(a.startswith("blk") for a, b in capped)
    # default None keeps exact pigeonhole semantics on a small corpus
    small = spark.createDataFrame(rows[:3] + rows[-2:],
                                  "image_id string, phash long")
    full = {(r["a"], r["b"]) for r in dedup.hamming_pairs(small).collect()}
    assert ("real-a", "real-b") in full
    assert sum(a.startswith("blk") and b.startswith("blk")
               for a, b in full) == 3


def test_embedding_hot_bucket_guard(spark):
    """max_bucket on embedding_near_dups: 200 copies of one vector
    collapse into the same bucket in every table; the cap removes
    their quadratic pair set while the planted twin pair (cold
    buckets) survives."""
    rng = np.random.default_rng(13)
    hot = [float(v) for v in rng.standard_normal(64).round(6)]
    rows = [(i, hot) for i in range(200)]
    base = rng.standard_normal(64)
    twin = base + 0.01 * rng.standard_normal(64)
    rows += [(900, [float(v) for v in base.round(6)]),
             (901, [float(v) for v in twin.round(6)])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = {(r["a"], r["b"]) for r in dedup.embedding_near_dups(
        df, threshold=0.95, max_bucket=50).collect()}
    assert (900, 901) in capped
    assert not any(a < 200 and b < 200 for a, b in capped)


def test_ivf_sampled_training_recall(spark):
    """train_stride=4 fits centroids on a quarter of the corpus (the
    10^12-row practice); every vector is still assigned and the
    clustered-corpus recall property holds unchanged."""
    from ssgp_toolbox_spark.functions import simsearch

    rng = np.random.default_rng(9)
    rows = []
    centers = rng.standard_normal((4, 64)) * 5
    for i in range(64):
        c = centers[i % 4]
        rows.append((i, [float(v) for v in (c + 0.1 * rng.standard_normal(64)).round(6)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = simsearch.ivf_topk(df, df.filter("vec_id < 8"), k=3,
                             n_cells=8, n_probe=2, train_stride=4)
    got = {(r["qid"], r["rank"]): r["nid"] for r in out.collect()}
    assert len(got) == 8 * 3
    for (q, rank), n in got.items():
        assert n % 4 == q % 4, (q, rank, n)


def test_hamming_pairs_exactness_property(spark):
    """Pigeonhole exactness: on seeded random 64-bit corpora the
    banded equi-join returns EXACTLY the brute-force pair set for
    max_dist in {2, 8} — including planted near pairs at the radius
    boundary. (The pigeonhole guarantee: max_dist+1 disjoint bands,
    any pair within max_dist shares >= one exact band.)"""
    rng = np.random.default_rng(23)
    for max_dist in (2, 8):
        base = rng.integers(-2**63, 2**63 - 1, size=40, dtype=np.int64)
        hashes = list(base)
        # planted pairs at exactly max_dist and max_dist+1 bit flips
        for flips in (max_dist, max_dist + 1):
            v = int(base[0])
            for b in rng.choice(64, size=flips, replace=False):
                v ^= 1 << int(b)
            hashes.append(np.int64(np.uint64(v % 2**64)))
        rows = [(f"i{j:03d}", int(h)) for j, h in enumerate(hashes)]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        got = {(r["a"], r["b"], r["hamming"]) for r in
               dedup.hamming_pairs(df, max_dist=max_dist).collect()}
        brute = set()
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                d = bin((rows[i][1] ^ rows[j][1]) % 2**64).count("1")
                if d <= max_dist:
                    a, b = sorted((rows[i][0], rows[j][0]))
                    brute.add((a, b, d))
        assert got == brute, (max_dist, got ^ brute)
        # the planted boundary pair is found, the over-radius one not
        assert any(a == "i000" and b == "i040" for a, b, d in got)
        assert not any(a == "i000" and b == "i041" for a, b, d in got)


def test_simhash_composes_with_hamming_pairs(spark):
    """The SimHash signature table feeds hamming_pairs directly
    (hash_col is generic): two near-duplicate texts land within
    Hamming distance 8 of each other while unrelated docs do not —
    the full text near-dup pipeline as a two-operator composition."""
    docs = [(1, "the quick brown fox jumps over the lazy dog by the river"),
            (2, "the quick brown fox jumps over the lazy cat by the river"),
            (3, "completely different content about distributed query engines"),
            (4, "spark catalyst optimizer plans columnar scans and joins")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sig = dedup.simhash(df)
    pairs = {(r["a"], r["b"]) for r in dedup.hamming_pairs(
        sig, id_col="doc_id", hash_col="simhash", max_dist=8).collect()}
    assert (1, 2) in pairs
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_lang_id_ngram_profile_beats_markers(spark):
    """Planted ambiguous doc (round-4 VERDICT #8): zero closed-class
    marker words in ANY language — the old marker-only scorer scored
    every language 0 and fell through to the alphabetical tie-break
    ('de'); the character-trigram profile reads the French 'eur'
    morphology and wins without a single marker hit."""
    df = spark.createDataFrame(
        [(1, "fr", "moteur ordinateur utilisateur valeur chaleur")],
        "doc_id long, lang string, text string")
    r = text.lang_id(df).collect()[0]
    assert r["predicted_lang"] == "fr"
    # pure-trigram win: score below one marker-hit quantum proves no
    # marker fired anywhere (the case the marker scorer cannot decide)
    assert 0 < r["score"] < text.MARKER_WEIGHT
