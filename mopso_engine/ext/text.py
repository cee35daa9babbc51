"""Text-analysis operators over the ``documents`` table.

All operators are pure Catalyst expressions (no Python in the hot
path): tokenization, quality scoring, language-ID heuristic, token
counting, and document fingerprinting stay inside whole-stage codegen
and scale linearly with zero shuffles (the aggregating variants shuffle
once on their group keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic —
#: deliberately small and fixed so the operator is deterministic and
#: SQL-portable (the oracle uses the same lists).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "zu"],
    "es": ["el", "la", "los", "y", "de"],
    "fr": ["le", "la", "les", "et", "de"],
    "zh": ["的", "是", "了", "在", "和"],
}


def tokens_col(text_col: str = "text"):
    """Whitespace tokenization of trimmed text (the portable baseline)."""
    return F.split(F.trim(F.col(text_col)), r"\s+")


def text_stats(docs: DataFrame) -> DataFrame:
    """Per-document stats: chars, tokens, mean token length, distinct-token
    ratio. One projection + no shuffle."""
    toks = tokens_col()
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / F.size(toks), 6
        ).alias("mean_token_len"),
        F.round(F.size(F.array_distinct(toks)) / F.size(toks), 6).alias("distinct_ratio"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score in [0,1]: length band + vocabulary diversity
    — the standard cheap pre-filter of LLM data pipelines. Deterministic
    arithmetic, SQL-portable."""
    toks = tokens_col()
    n_tokens = F.size(toks)
    diversity = F.size(F.array_distinct(toks)) / n_tokens
    len_ok = F.when((n_tokens >= 20) & (n_tokens <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    return docs.select(
        "doc_id",
        F.round(len_ok * diversity, 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-ratio language ID: for each language, the fraction of its
    stopword list found among the document's tokens; predict the argmax
    (ties → lexicographically first language). Pure expressions."""
    toks = F.array_distinct(tokens_col())
    scores = F.array(
        *[
            F.struct(
                (
                    F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
                    / F.lit(float(len(words)))
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(STOPWORDS.items())
        ]
    )
    best = F.array_sort(
        scores,
        lambda a, b: F.when(a["score"] > b["score"], -1)
        .when(a["score"] < b["score"], 1)
        .otherwise(F.when(a["lang"] < b["lang"], -1).when(a["lang"] > b["lang"], 1).otherwise(0)),
    )[0]
    return docs.select(
        "doc_id",
        best["lang"].alias("pred_lang"),
        F.round(best["score"], 6).alias("lang_score"),
    )


def token_count(docs: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex count
    (word pieces + standalone punctuation) — the usual proxy for LLM token
    budgets."""
    return docs.select(
        "doc_id",
        F.size(tokens_col()).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "bpe_ish_tokens"
        ),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercase text —
    the exact-dedup key (a rolling/Rabin hash at byte level would be the
    streaming variant; md5 is the portable batch rendering)."""
    normalized = F.lower(F.concat_ws(" ", tokens_col()))
    return docs.select("doc_id", F.md5(normalized).alias("fp"))
