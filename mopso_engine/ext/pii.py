"""PII detection and redaction — the privacy-scrub stage of a
training-data curation pipeline (run before packing/export, after
dedup: redaction changes fingerprints).

Everything here is PURE Catalyst expressions — `regexp_count` for
detection and a fixed-order `regexp_replace` chain for redaction — so
the operators are zero-shuffle, whole-stage-codegen, and streaming-safe
(stateless: compose into `stream_curate`-style pipelines unchanged).

Pattern portability: the regexes use only the syntax subset shared by
Java regex (Spark) and RE2 (DuckDB, Go) — character classes, bounded
repetition, alternation, ``\\b`` word boundaries; no lookaround, no
backreferences — so the DuckDB oracle applies the IDENTICAL patterns
and the redacted text hashes match bit-for-bit across engines.

These are pattern-match scrubbers (emails, NANP-style phone numbers,
IPv4 addresses, US-SSN-shaped ids) — the deterministic, auditable tier
that production pipelines run first; an NER-model scrubber for names
and addresses is a model-inference `mapInPandas` stage with the same
shape as `ext.quality.score_quality` and deliberately out of scope
here (no model weights in this container).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (pii_type, pattern, replacement) in REDACTION ORDER — most specific
#: first, so a 123-45-6789 is consumed as an SSN before the phone rule
#: can see its tail digits. Detection counts use the same patterns but
#: are independent (each counts over the ORIGINAL text).
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(\d{3}\) \d{3}-\d{4}|\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IPV4>"),
]


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII detection: one ``n_<type>`` match count per rule
    (each counted over the original text, so counts are rule-independent)
    plus ``n_pii``, their sum. Every OTHER input column is kept;
    pre-existing ``n_<type>``/``n_pii`` columns (e.g. counts re-run
    after an enrichment pass) are overwritten — withColumn semantics —
    so the output never carries ambiguous duplicate names. Map-only, no
    shuffle, no Python."""
    count_names = {f"n_{name}" for name, _, _ in PII_RULES} | {"n_pii"}
    keep = [c for c in docs.columns if c not in count_names]
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_RULES
    ]
    out = docs.select(*keep, *counts)
    total = sum(
        [F.col(f"n_{name}") for name, _, _ in PII_RULES], start=F.lit(0).cast("long")
    )
    return out.withColumn("n_pii", total)


def redacted_text(text_col: str = "text") -> Column:
    """The redaction EXPRESSION: the fixed-order `regexp_replace` chain
    over ``PII_RULES``. Exposed as a Column so streaming plans and SQL
    twins can embed it directly."""
    expr = F.col(text_col)
    for _, pat, repl in PII_RULES:
        expr = F.regexp_replace(expr, pat, repl)
    return expr


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact in place: ``text_col`` is REPLACED by the scrubbed text
    (placeholders ``<EMAIL>``/``<SSN>``/``<PHONE>``/``<IPV4>``), all
    other columns pass through. Idempotent — placeholders contain no
    digits or ``@``, so a second pass matches nothing (tested)."""
    return docs.withColumn(text_col, redacted_text(text_col))


def corpus_pii_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level privacy audit: one row per PII type —
    (pii_type, n_docs, n_matches) over documents with ≥1 match —
    the release-gate summary. One linear scan; the per-type rows come
    from an in-row struct array + explode (no per-type scan, no shuffle
    beyond the 4-key partial aggregate)."""
    c = pii_counts(docs.select(F.col(text_col).alias("__t")), "__t")
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("pii_type"), F.col(f"n_{name}").alias("n")
            )
            for name, _, _ in PII_RULES
        ]
    )
    return (
        c.select(F.explode(pairs).alias("p"))
        .select("p.pii_type", "p.n")
        .groupBy("pii_type")
        .agg(
            F.count(F.when(F.col("n") > 0, 1)).alias("n_docs"),
            F.sum("n").alias("n_matches"),
        )
    )
