"""Deduplication operators over the ``documents`` table.

Four tiers, all shuffle-frugal and 100 TB-shaped:

* **exact** — hash-groupBy on a normalized fingerprint; one shuffle on
  the (tiny) hash key, map-side combine does the heavy lifting.
* **n-gram Jaccard** — word-shingle sets + a pair-join; exact but
  quadratic per candidate group, so run it on LSH candidates (or small
  samples), never the raw corpus.
* **MinHash + LSH banding** — signature = min(md5(shingle ∥ seed)) per
  band row; candidate pairs come from equality joins on banded
  signatures: linear scans + equality shuffles only. Hash = md5 (not
  Spark's xxhash/murmur) so results are portable across engines — the
  DuckDB oracle computes the identical signature.
* **SimHash** — 16-bit sign-aggregated token hashes; near-dup = equal
  simhash (or small Hamming distance via banding the bits).

Embedding-cosine near-dup lives in ext/simsearch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mopso_engine.ext.text import tokens_col


def normalized_text():
    return F.lower(F.concat_ws(" ", tokens_col()))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact-duplicate groups: (fp, n_docs, keep_id) for groups with >1 doc;
    keep_id = min doc_id (the canonical survivor)."""
    return (
        docs.select("doc_id", F.md5(normalized_text()).alias("fp"))
        .groupBy("fp")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
        .where(F.col("n_docs") > 1)
    )


def word_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) — distinct k-word shingles of the normalized text.

    posexplode + window `lead`: the tokenizing split runs ONCE per doc
    (an inline `transform(sequence(...), i -> slice(toks, i, k))` would
    re-evaluate the split per shingle — measured 5× slower), then k-grams
    assemble from lead() neighbors. One shuffle on doc_id; linear in
    token count — the shape that survives wide corpora."""
    from pyspark.sql.window import Window

    tok = docs.select(
        "doc_id", F.posexplode(F.split(normalized_text(), " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, k)]
    sh = tok.select(
        "doc_id",
        F.concat_ws(" ", *parts).alias("shingle"),
        F.lead("tok", k - 1).over(w).alias("_tail"),
    )
    return sh.where(F.col("_tail").isNotNull()).select("doc_id", "shingle").distinct()


def jaccard_pairs(docs: DataFrame, k: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard over all pairs sharing ≥1 shingle.

    The shingle equality join prunes the N² space to co-shingled pairs
    (inverted-index join); |∩| comes from the join, |∪| = |A|+|B|−|∩|.
    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard ≥ threshold.
    """
    sh = word_shingles(docs, k).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_signatures(docs: DataFrame, k: int = 3, num_hashes: int = 16) -> DataFrame:
    """(doc_id, hash_idx, minhash): minhash_i = min over shingles of
    md5(shingle ∥ '#' ∥ i). Min over hex strings ≡ min over the 128-bit
    integers — portable to any engine with md5."""
    sh = word_shingles(docs, k)
    # one min-aggregate column per hash: the shuffle moves |shingles| rows
    # with 16 narrow partial-min columns (map-side combined), not the
    # 16×-exploded row set; the (doc_id, hash_idx, minhash) shape is
    # recovered by an unpivot AFTER aggregation.
    aggs = [
        F.min(F.md5(F.concat_ws("#", F.col("shingle"), F.lit(i)))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("hash_idx"), F.col(f"h{i}").alias("minhash"))
            for i in range(num_hashes)
        ]
    )
    return wide.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.hash_idx").cast("int").alias("hash_idx"), F.col("p.minhash").alias("minhash")
    )


def minhash_lsh_candidates(
    docs: DataFrame, k: int = 3, num_hashes: int = 16, bands: int = 4
) -> DataFrame:
    """LSH banding: band signature = concat of the band's minhashes; docs
    sharing a band signature are candidate near-dups. Returns
    (doc_a, doc_b, n_bands) with doc_a < doc_b — equality joins only,
    never a cross product (the 100 TB path)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, k, num_hashes).withColumn(
        "band", (F.col("hash_idx") / rows_per_band).cast("int")
    )
    band_sig = sig.groupBy("doc_id", "band").agg(
        F.concat_ws("|", F.array_sort(F.collect_list(F.concat_ws(":", "hash_idx", "minhash")))).alias(
            "band_sig"
        )
    )
    a = band_sig.select(F.col("doc_id").alias("doc_a"), "band", "band_sig")
    b = band_sig.select(F.col("doc_id").alias("doc_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_bands"))
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): sign-aggregated token hashes. Token hash = first
    8 hex chars of md5 as a 32-bit int; bit j of the simhash is 1 iff
    Σ_tokens (bit_j ? +1 : −1) > 0. Expressible identically in SQL."""
    tok = docs.select("doc_id", F.explode(F.split(normalized_text(), " ")).alias("tok"))
    h = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    # one ±1 sum column per bit in a single groupBy — the shuffle carries
    # |tokens| rows with 16 narrow partial sums (map-side combined), not a
    # 16×-exploded row set; the final simhash assembles in a projection.
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    wide = tok.select("doc_id", h.alias("h")).groupBy("doc_id").agg(*aggs)
    sim = sum(
        [
            F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            for j in range(bits)
        ],
        start=F.lit(0).cast("long"),
    )
    return wide.select("doc_id", sim.alias("simhash"))
