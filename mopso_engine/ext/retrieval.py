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

__all__ = ["bm25_topk", "term_coverage_topk", "rrf_fuse"]


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


def term_coverage_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` documents per query by QUERY-TERM COVERAGE — how
    many distinct query terms the document contains. The blunt exact-
    match signal that complements BM25's tf/length weighting (BM25 can
    rank a doc hammering one term over a doc containing every term;
    coverage cannot). Same broadcast-prune physical shape as
    :func:`bm25_topk`: the corpus explode is semi-joined against the
    tiny distinct-term set BEFORE the one (doc, term) shuffle, and the
    per-query top-k is a WindowGroupLimit rank window with the
    deterministic (n_terms desc, doc_id asc) tie-break.

    Returns (query_id, doc_id, n_terms, rk).
    """
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    qtoks = F.split(F.lower(F.trim(F.col("qtext"))), r"\s+")
    qpairs = (
        queries.select("query_id", F.explode(qtoks).alias("term"))
        .where(F.col("term") != "")
        .distinct()
    )
    qterms = qpairs.select("term").distinct()
    doc_terms = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .join(F.broadcast(qterms), "term")
        .distinct()
    )
    scored = (
        doc_terms.join(F.broadcast(qpairs), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_terms"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(top_k))
        .select("query_id", "doc_id", "n_terms", "rk")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    k0: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack et al. 2009) — the standard
    hybrid-search combiner: each system's ranked list contributes
    1/(k0 + rank) per document and the fused ranking sums the
    contributions, rewarding documents multiple retrievers agree on
    without any score calibration between systems (ranks, not scores,
    fuse — which is why RRF survives mixing BM25 with ANN distances).

    Exactness: contributions are ``1e6 div (k0 + rk)`` — exact integer
    division, so the fused score and the (score desc, doc_id asc) cut
    are engine-exact. Input frames need (query_id, doc_id, rk); a doc
    absent from a system simply contributes nothing (union semantics).

    Shape: union-all of the (already tiny) top-k lists, ONE
    (query, doc) sum, one WindowGroupLimit top-k — the fusion costs
    nothing next to the retrievers it combines.

    Returns (query_id, doc_id, rrf_micro, n_systems, rk).
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1, got {k0}")
    u = None
    for r in rankings:
        part = r.select(
            "query_id",
            "doc_id",
            F.expr(f"CAST(1000000 AS BIGINT) div ({int(k0)} + rk)").alias("c"),
        )
        u = part if u is None else u.unionByName(part)
    fused = u.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("rrf_micro"), F.count(F.lit(1)).alias("n_systems")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_micro"), F.asc("doc_id"))
    return (
        fused.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= int(top_k))
        .select("query_id", "doc_id", "rrf_micro", "n_systems", "rk")
    )
