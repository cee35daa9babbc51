"""Sparse lexical retrieval over the documents corpus.

BM25 (Robertson/Spärck Jones; the Lucene ``k1``/``b`` variant with the
always-positive idf) is the one retrieval primitive a curation/RAG
pipeline needs that the TF-IDF keyword extractor (ext.text.tfidf_top_terms)
does not cover: scoring a *small query set* against the whole corpus and
keeping the top-k hits per query.

Engine-exactness: every per-(doc,term) contribution is quantized to
integer micro-units (floor(x*1e6+0.5) as long) BEFORE the per-(query,doc)
sum, so score totals and the (score desc, doc_id asc) top-k cut are
bit-identical across engines — the same micro-nat discipline used by
ext.text.unigram_logppl / bigram_logppl.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk"]


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` documents per query by BM25.

    ``docs``: (doc_id, text, ...); ``queries``: (query_id, qtext) — a
    SMALL query table (benchmark suites, seed prompts, eval probes); it
    is broadcast, never shuffled against the corpus.

    Per (query q, doc d):  score = Σ_{t ∈ distinct terms of q} idf(t) ·
    tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/Σdl)), with the Lucene idf
    ln((N − df + 0.5)/(df + 0.5) + 1) that stays positive even when a
    term appears in every document. Query terms are DISTINCT (standard
    for short queries; repeated query words do not double-count).

    Physical shape (100 TB): document length dl rides in-row from the
    same token array that is exploded (zero extra join); the exploded
    token stream is pruned by a BROADCAST semi-join on the distinct
    query-term set BEFORE the only corpus shuffle (the (doc_id, term)
    tf count, map-side combinable); df and the corpus scalars (N, Σdl)
    are tiny aggregates; the final per-query top-k is a rank window over
    query_id — WindowGroupLimit pushes the k-heap below the exchange, so
    the shuffle carries at most k·|queries| rows per map partition.
    Nothing quadratic, nothing collected.

    Output: (query_id, doc_id, score_micro, rk) — score in integer
    micro-units, rk 1-based with the deterministic (score desc, doc_id
    asc) tie-break.
    """
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    qtoks = F.split(F.lower(F.trim(F.col("qtext"))), r"\s+")

    qpairs = (
        queries.select("query_id", F.explode(qtoks).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    qterms = qpairs.select("term").distinct()

    # corpus scalars: one 2-number aggregate, broadcast everywhere
    lengths = docs.select("doc_id", F.size(toks).alias("dl"), F.col("text"))
    stats = lengths.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )

    # explode → broadcast prune on query terms → ONE (doc_id, term) shuffle
    tf = (
        lengths.select(
            "doc_id",
            "dl",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("term"),
        )
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
    )
    dfq = tf.groupBy("term").agg(F.count("*").alias("df"))

    # per-(doc, term) contribution, quantized to micro-units pre-sum.
    # The expression tree is written ONCE and mirrored verbatim in the
    # SQL oracle: ln((N - df + 0.5) / (df + 0.5) + 1.0) *
    #   (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl * N / sum_dl))
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    dfd = F.col("df").cast("double")
    nd = F.col("n_docs").cast("double")
    sdl = F.col("sum_dl").cast("double")
    idf = F.log((nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)) + F.lit(1.0))
    norm = (tfd * F.lit(k1 + 1.0)) / (
        tfd + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dld * nd / sdl)
    )
    contrib = (
        tf.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            F.floor(idf * norm * F.lit(1e6) + F.lit(0.5)).alias("c_micro"),
        )
    )

    scored = (
        contrib.join(F.broadcast(qpairs), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c_micro").alias("score_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= top_k)
        .select("query_id", "doc_id", "score_micro", "rk")
    )
