"""Text analysis over the documents table: token counting, quality
scoring, language-ID heuristic, fingerprinting.

All pure Catalyst expressions (split/filter/aggregate higher-order
functions + md5) — zero Python in the hot path, so these run at scan
speed on 100 TB and every one has an exact DuckDB SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to"]
LANG_MARKERS = {
    "en": ["the", "a", "and"],
    "es": ["el", "la", "de"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
    "zh": ["de", "le", "he"],
}


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting + quality ratios (length / stopword share /
    long-token share) — the 'quality scoring' operator."""
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).alias("n_long_tokens"),
        F.round(F.length("text") / F.size(toks), 6).alias("avg_token_len"),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / F.size(toks), 6,
        ).alias("stop_ratio"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language scoring; deterministic argmax (score desc,
    language name asc). The operator shape of an n-gram language
    identifier; markers are a fixed public list."""
    toks = _tokens()

    def marker_score(markers):
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = [
        marker_score(m).alias(f"score_{lang}")
        for lang, m in sorted(LANG_MARKERS.items())
    ]
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(LANG_MARKERS)
    pairs = F.array(*[
        F.struct(F.col(f"score_{l}").alias("s"), F.lit(l).alias("l")) for l in langs
    ])
    best = F.array_sort(
        pairs, lambda a, b: F.when(a["s"] > b["s"], -1).when(a["s"] < b["s"], 1)
        .when(a["l"] < b["l"], -1).when(a["l"] > b["l"], 1).otherwise(0)
    ).getItem(0)
    return scored.select(
        "doc_id", "lang",
        best["l"].alias("predicted_lang"),
        best["s"].cast("int").alias("marker_hits"),
    )


def fingerprint(docs: DataFrame, k: int = 8) -> DataFrame:
    """Winnowing-style document fingerprint: min hash over the
    k-gram (word) windows of the text; hash = first 60 bits of md5.
    Robust to local edits — the rolling-hash fingerprinting operator."""
    toks = _tokens()
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k))
    )
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"),
    )
    return docs.select(
        "doc_id",
        F.array_min(hashes).alias("fingerprint"),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("bigint").alias("content_hash"),
    )
