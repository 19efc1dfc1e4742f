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

# function-word markers for space-tokenized languages (top closed-class
# words, mutually disjoint where they would collide: 'la' is es+fr but
# each list also has unique members so real text separates cleanly)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "that", "in"],
    "es": ["el", "la", "los", "las", "que", "y", "una", "por"],
    "fr": ["le", "les", "des", "une", "est", "dans", "et"],
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein"],
}

# script-range evidence for languages tokenization can't segment:
# score = count of characters in the script's Unicode block (negated
# class → regexp_replace strip + length, pure Catalyst / RE2-portable)
SCRIPT_RANGES = {
    "zh": "[^一-鿿]",   # CJK Unified Ideographs
    "ru": "[^Ѐ-ӿ]",   # Cyrillic
}

# characteristic character trigrams per language (the classic n-gram
# LID evidence, Cavnar & Trenkle '94 style): counted by replace-strip
# ((len(text) - len(replace(text, g))) / 3) — still pure Catalyst and
# exactly SQL-mirrorable. These catch morphology the closed-class
# marker words miss (a text can avoid every function word and still
# scream 'eur'/'sch'/'ing'), so zero-marker documents stop falling
# through to the alphabetical tie-break.
LANG_TRIGRAMS = {
    "en": [" th", "the", "ing", "and", " of"],
    "es": [" de", "la ", "os ", "el ", "que"],
    "fr": [" le", "les", "ent", "eur", "ais"],
    "de": ["der", "ein", "ich", "sch", "und"],
}

# one marker-word (or script-block character) hit outweighs any
# realistic trigram count; trigrams decide ties and marker-free text
MARKER_WEIGHT = 100


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
    """Language ID: per language, ``MARKER_WEIGHT`` × (function-word
    marker hits, or script-block character count for zh/ru) + the
    document's occurrence count of that language's characteristic
    trigrams (``LANG_TRIGRAMS``); deterministic argmax (score desc,
    language name asc). The trigram term upgrades the round-3 marker
    scorer: marker-free text (no closed-class words at all) used to
    fall through to the alphabetical tie-break, now the character
    n-gram profile decides it. Public-knowledge heuristics
    (closed-class word lists, Unicode blocks, Cavnar-&-Trenkle-style
    character n-grams), all pure Catalyst and exactly reproducible in
    SQL — the oracle builds from the same constants.

    BREAKING CHANGE (round 5): the output column ``marker_hits`` was
    renamed to ``score`` and its VALUES changed meaning — formerly raw
    marker hits, now marker hits x MARKER_WEIGHT + trigram counts.
    External consumers of the old column/semantics must adapt; the
    t02 oracle was updated in lockstep."""
    toks = _tokens()

    def marker_score(markers):
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    def script_score(pattern):
        return F.length(F.regexp_replace(F.col("text"), pattern, ""))

    def trigram_score(grams):
        total = F.lit(0)
        for g in grams:
            total = total + ((F.length("text")
                              - F.length(F.replace(F.col("text"), F.lit(g),
                                                   F.lit(""))))
                             / len(g)).cast("int")
        return total

    score_exprs = {
        lang: marker_score(m) * MARKER_WEIGHT + trigram_score(LANG_TRIGRAMS[lang])
        for lang, m in LANG_MARKERS.items()
    }
    score_exprs.update({lang: script_score(p) * MARKER_WEIGHT
                        for lang, p in SCRIPT_RANGES.items()})
    scores = [score_exprs[lang].alias(f"score_{lang}")
              for lang in sorted(score_exprs)]
    scored = docs.select("doc_id", "lang", *scores)
    langs = sorted(score_exprs)
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
        best["s"].cast("int").alias("score"),
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


# quality-gate thresholds (public C4/Gopher-style heuristics, tuned to
# the synthetic corpus ranges so both labels occur)
QUALITY_GATES = {
    "min_tokens": 5,
    "max_tokens": 5000,
    "max_long_token_ratio": 0.5,
    "min_stop_ratio": 0.001,
    "max_avg_token_len": 12.0,
}


def quality_gate(docs: DataFrame) -> DataFrame:
    """Keep/drop labeling over the token_stats metrics — the decision
    operator a training-data pipeline applies after scoring. Each rule
    that fires is recorded in ``fail_reasons`` (sorted array) so drops
    are auditable; ``keep`` = no rule fired. Pure Catalyst."""
    g = QUALITY_GATES
    stats = token_stats(docs)
    rules = [
        (F.col("n_tokens") < g["min_tokens"], "too_short"),
        (F.col("n_tokens") > g["max_tokens"], "too_long"),
        (F.col("n_long_tokens") / F.col("n_tokens")
         > g["max_long_token_ratio"], "long_tokens"),
        (F.col("stop_ratio") < g["min_stop_ratio"], "no_stopwords"),
        (F.col("avg_token_len") > g["max_avg_token_len"], "avg_len"),
    ]
    reasons = F.array_sort(F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None))
                  for cond, name in rules]),
        lambda x: x.isNotNull(),
    ))
    return stats.select(
        "doc_id", "n_tokens",
        reasons.alias("fail_reasons"),
        (F.size(reasons) == 0).alias("keep"),
    )


# GPT-2-style pre-tokenizer pattern, ASCII-simplified so the SAME
# literal runs identically under Java regex (Spark) and RE2 (DuckDB):
# contractions | space?letters | space?digits | space?punct-run | spaces
BPE_SPLIT_RE = "'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9']+| +"


def bpe_token_stats(docs: DataFrame) -> DataFrame:
    """Subword-boundary token counting: the whitespace count beside a
    BPE-ish pre-tokenizer segmentation (the regex every GPT-2-family
    tokenizer applies before merges — the count LLM pipelines bill
    by). Pure Catalyst (regexp_extract_all), no Python."""
    n_ws = F.size(_tokens())
    bpe = F.expr(f"regexp_extract_all(text, \"{BPE_SPLIT_RE}\", 0)")
    n_bpe = F.size(bpe)
    return docs.select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_bpe.alias("n_bpe_tokens"),
        F.round(F.length("text") / n_bpe, 6).alias("chars_per_bpe_token"),
    )
