"""Upstream text extraction — the TRUE first stage of a C4/RefinedWeb
pipeline (VERDICT r7 #7): raw HTML → clean text, before any dedup or
quality gate sees a byte. jusText/trafilatura do this with DOM parsing;
the operator here is the engine-friendly twin — a pure-Catalyst
tag-strip + line-density heuristic that needs NO parser library, stays
inside whole-stage codegen, and is replayable in ANSI-ish SQL so the
DuckDB oracle can pin it.

Pipeline (all per-row expressions, zero shuffle, zero Python):

1. drop ``<script>``/``<style>`` blocks (their text is never content);
2. block-level tags (``p div li h1-6 tr title nav footer header ul ol
   table section article`` and ``<br>``) become NEWLINES — the line
   structure the density heuristic needs;
3. every remaining tag is stripped; the common HTML entities are
   decoded;
4. per line: keep it iff it has ≥ ``min_words`` words, or ≥ 3 words
   ending in terminal punctuation (the C4 sentence rule) — short
   nav/footer/menu fragments die here;
5. emit (doc_id, n_lines, n_kept, n_words, stopword_frac, text_clean):
   kept lines whitespace-normalized and joined with ``\\n``, plus the
   stopword ratio of the kept words (the classic human-text signal,
   REPORTED not gated — synthetic corpora legitimately score low).

100 TB shape: one map-only projection over the scan — regexp chains,
split, and higher-order filters all fold into a single WholeStageCodegen
span; the stopword list is a literal array. Composes ahead of
``corpus_curation_v2`` without adding an exchange, and the identical
expressions serve a streaming ingest unchanged.

Regex dialect note: every pattern avoids backreferences and lookaround,
so Java (Spark) and RE2 (DuckDB) read them identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: words whose density separates prose from boilerplate/navigation —
#: deliberately tiny and pinned (the oracle carries the same literals)
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "for", "on", "with", "as", "at", "by", "it", "this", "that",
]

_BLOCK_TAG_RE = (
    r"(?i)</?(p|div|li|h[1-6]|tr|title|nav|footer|header|ul|ol|table"
    r"|section|article)\b[^>]*>|<br\s*/?>"
)


def _decode_entities(col: Column) -> Column:
    for src, dst in (
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
    ):
        col = F.replace(col, F.lit(src), F.lit(dst))
    return col


#: the classic UTF-8-decoded-as-Latin-1 artifacts (ftfy's core table,
#: printable subset) in FIXED application order — the oracle replays the
#: same ordered chain, so the output is pinned byte-for-byte
MOJIBAKE_TABLE = [
    ("â€™", "'"), ("â€˜", "'"), ("â€œ", '"'), ("â€", '"'),
    ("â€“", "-"), ("â€”", "-"), ("â€¦", "..."),
    ("Ã©", "é"), ("Ã¨", "è"), ("Ã¼", "ü"), ("Ã¶", "ö"), ("Ã¤", "ä"),
    ("Ã±", "ñ"), ("Ã§", "ç"), ("Â°", "°"), ("Â·", "·"), ("Â ", " "),
]

_CTRL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f]"


def fix_mojibake(
    docs: DataFrame, *, text_col: str = "text", keep: list[str] | None = None
) -> DataFrame:
    """Encoding-artifact repair — the cleanup stage between raw extraction
    and tokenization (CCNet/ftfy lineage): undo the common
    UTF-8-decoded-as-Latin-1 sequences (``â€™`` → ``'``, ``Ã©`` → ``é``,
    …) with a FIXED ordered replace chain, then strip C0 control
    characters (tab/newline/CR survive). Returns (doc_id, n_fixed,
    n_ctrl, text_fixed): artifact occurrences counted BEFORE repair plus
    control characters stripped, so a corpus-health dashboard can track
    encoding rot per source.

    100 TB shape: one expression-only projection (replace chain +
    regexp), zero shuffle, zero Python, streaming-safe — the same
    class of plan as the PII chain. The artifact table is pinned and
    mirrored by the oracle, so the repaired text is byte-pinned.

    ``keep`` carries extra input columns through unchanged (e.g. lang/
    source labels), so a curation composition never has to re-join the
    corpus on doc_id just to recover them — the gate-fusion rule every
    expression-only stage in this repo follows."""
    # counts are PROGRESSIVE along the chain (``â€`` is a prefix of
    # ``â€™``/``â€œ``/…, so counting every artifact against the raw text
    # would double-count; counting each against the partially-repaired
    # string matches exactly what the chain replaces)
    fixed = F.col(text_col)
    n_fixed = F.lit(0).cast("long")
    for src, dst in MOJIBAKE_TABLE:
        c = (
            (F.length(fixed) - F.length(F.replace(fixed, F.lit(src), F.lit(""))))
            / F.lit(len(src))
        ).cast("long")
        n_fixed = n_fixed + c
        fixed = F.replace(fixed, F.lit(src), F.lit(dst))
    n_ctrl = F.length(fixed) - F.length(F.regexp_replace(fixed, _CTRL_RE, ""))
    reserved = {"doc_id", "n_fixed", "n_ctrl", "text_fixed"}
    if keep and (bad := reserved.intersection(keep)):
        raise ValueError(f"keep columns collide with output columns: {sorted(bad)}")
    return docs.select(
        "doc_id",
        *(keep or []),
        n_fixed.alias("n_fixed"),
        n_ctrl.cast("long").alias("n_ctrl"),
        F.regexp_replace(fixed, _CTRL_RE, "").alias("text_fixed"),
    )


def mojibake_sql(col: str) -> tuple[str, str]:
    """The repair chain rendered as DuckDB SQL over ``col`` — (fixed
    expression, progressive hit-count expression), generated from the
    SAME pinned table the Spark operator reads so both engines apply
    byte-identical literals in the identical order."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    fixed = col
    counts = []
    for src, dst in MOJIBAKE_TABLE:
        counts.append(
            f"((length({fixed}) - length(replace({fixed}, {q(src)}, ''))) // {len(src)})"
        )
        fixed = f"replace({fixed}, {q(src)}, {q(dst)})"
    return fixed, "(" + " + ".join(counts) + ")"


def html_extract(
    docs: DataFrame,
    *,
    html_col: str = "html",
    min_words: int = 5,
) -> DataFrame:
    """Boilerplate-stripping text extraction over an HTML column — see
    the module docstring for the stage-by-stage contract. Returns one
    row per input row: (doc_id, n_lines, n_kept, n_words, stopword_frac,
    text_clean)."""
    if min_words < 1:
        raise ValueError("min_words must be >= 1")
    raw = F.col(html_col)
    h = F.regexp_replace(raw, r"(?is)<script\b.*?</script\s*>", " ")
    h = F.regexp_replace(h, r"(?is)<style\b.*?</style\s*>", " ")
    h = F.regexp_replace(h, _BLOCK_TAG_RE, "\n")
    h = F.regexp_replace(h, r"<[^>]*>", " ")
    h = _decode_entities(h)
    word_arrays = F.filter(
        F.transform(
            F.split(h, "\n"),
            lambda l: F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != ""),
        ),
        lambda ws: F.size(ws) > 0,
    )
    keep = lambda ws: (F.size(ws) >= F.lit(int(min_words))) | (  # noqa: E731
        (F.size(ws) >= 3) & F.element_at(ws, -1).rlike(r"[.!?]$")
    )
    kept = F.filter(word_arrays, keep)
    n_words = F.aggregate(kept, F.lit(0), lambda acc, ws: acc + F.size(ws))
    n_stop = F.aggregate(
        kept,
        F.lit(0),
        lambda acc, ws: acc
        + F.size(
            F.filter(
                ws,
                lambda w: F.array_contains(
                    F.array(*[F.lit(s) for s in STOPWORDS]), F.lower(w)
                ),
            )
        ),
    )
    return docs.select(
        "doc_id",
        F.size(word_arrays).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        n_words.cast("long").alias("n_words"),
        F.when(n_words > 0, F.round(n_stop / n_words, 6))
        .otherwise(F.lit(0.0))
        .alias("stopword_frac"),
        F.concat_ws(
            "\n", F.transform(kept, lambda ws: F.concat_ws(" ", ws))
        ).alias("text_clean"),
    )
