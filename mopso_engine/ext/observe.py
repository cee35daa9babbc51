"""Zero-cost pipeline data-quality counters via Spark's observation API.

A 100 TB curation job cannot afford a second scan just to learn "how
many rows were null / empty / dropped". ``df.observe(...)`` attaches
accumulator-backed aggregate metrics to the plan itself: they are
collected AS the main action runs — no extra job, no extra scan, exact
counts even under task retries (Spark de-dupes by task attempt).

Batch: :func:`observed` returns (df, Observation); read
``observation.get`` after any action on df. Streaming: the same
``observe`` call surfaces per-micro-batch metrics in
``StreamingQueryProgress.observedMetrics`` — identical plumbing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.observation import Observation

from mopso_engine.ext.text import tokens_col


def corpus_counters(text_col: str = "text") -> list[Column]:
    """The standard curation counters: rows, null/empty texts, total
    tokens, short docs (< 5 tokens). All sums/counts — observation
    metrics must be commutative aggregates, which these are."""
    t = F.col(text_col)
    n_tok = F.size(tokens_col(text_col))
    return [
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.when(t.isNull() | (F.length(t) == 0), 1).otherwise(0)).alias("null_or_empty"),
        F.sum(F.when(t.isNotNull(), n_tok).otherwise(0)).cast("long").alias("tokens"),
        F.sum(F.when(t.isNotNull() & (n_tok < 5), 1).otherwise(0)).alias("short_docs"),
    ]


def observed(
    df: DataFrame, counters: list[Column] | None = None, *, text_col: str = "text"
) -> tuple[DataFrame, Observation]:
    """Attach quality counters to ``df``'s plan. Returns the observed
    frame (use it in place of ``df``) and the Observation whose
    ``.get`` yields the metric dict after the FIRST action — the
    counters ride the action's own scan, costing nothing extra.

    Place the observation UPSTREAM of filters to count what the gates
    will see, or downstream to count what survived; observing both
    sides of a gate gives its drop rate for one total scan.
    """
    obs = Observation()
    return df.observe(obs, *(counters if counters is not None else corpus_counters(text_col))), obs


def observed_stream(
    df: DataFrame,
    name: str = "corpus",
    counters: list[Column] | None = None,
    *,
    text_col: str = "text",
) -> DataFrame:
    """The STREAMING form: Observation objects are batch-only, so a
    streaming plan observes under a string name and each micro-batch
    surfaces its counters in ``StreamingQueryProgress.observedMetrics
    [name]`` — per-batch data-quality telemetry riding the batch's own
    processing, no extra scan, no state."""
    return df.observe(name, *(counters if counters is not None else corpus_counters(text_col)))
