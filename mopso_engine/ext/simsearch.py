"""Similarity search over an embedding column (``array<float>``).

* **Brute-force top-k cosine** — the exactness baseline: a broadcast
  join of the (small) query set against the corpus; scoring is a pure
  Catalyst expression (zip_with + aggregate), so the scan stays inside
  whole-stage codegen. Linear in corpus size, no shuffle except the
  final per-query top-k (window over query id).
* **IVF (inverted-file) top-k** — the scale path: corpus is bucketed by
  nearest coarse centroid (here: the per-label centroid — deterministic
  and oracle-friendly; at scale, a sampled k-means codebook); a query
  probes only the ``nprobe`` nearest cells. Same plan shape as a
  partition-pruned scan: the centroid assignment is the partition key.
* **Embedding-cosine near-dup** — sign-LSH bucketed candidate pairs
  (equality joins on band signatures, the dedup stack's LSH → verify
  shape) + exact cosine verification; linear in corpus size. The
  all-pairs cross product survives only as the recall-test baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: str | Column, b: str | Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: str | Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine_kernel():
    """Arrow-batched cosine similarity of two array<double> columns.

    Replaces the interpreted ``_dot/(_norm·_norm)`` higher-order-function
    expression in the hot scoring paths (Spark never compiles HOF lambdas
    into codegen — measured ~10× on pair-verification at sf0.1). The
    accumulation is SEQUENTIAL OVER DIMS, so every row's result is
    bit-identical to the left-associated fold the expression twin (and the
    SQL oracle) computes: IEEE-754 double mul/add in the same order."""
    import numpy as np
    import pandas as pd

    def _cos(va, vb):
        if len(va) == 0:
            return pd.Series(np.zeros(0))
        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
        dot = np.zeros(A.shape[0])
        na = np.zeros(A.shape[0])
        nb = np.zeros(A.shape[0])
        for i in range(A.shape[1]):  # sequential over dims == the fold's order
            dot += A[:, i] * B[:, i]
            na += A[:, i] * A[:, i]
            nb += B[:, i] * B[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    _cos.__annotations__ = {"va": pd.Series, "vb": pd.Series, "return": pd.Series}
    return F.pandas_udf(_cos, "double")


def as_double_vecs(embeddings: DataFrame) -> DataFrame:
    """embeddings(vec_id, embedding float[], label) → (vec_id, vec array<double>)."""
    return embeddings.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("vec"), "label"
    )


def cosine_topk_bruteforce(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query id.

    (query_id, nbr_id, rank, cos_sim) — broadcast(query) × corpus, pure
    expressions, window row_number ≤ k. Ties break on nbr_id asc.
    """
    vecs = as_double_vecs(embeddings)
    q = vecs.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    pairs = vecs.crossJoin(F.broadcast(q)).where(F.col("vec_id") != F.col("query_id"))
    cos = _cosine_kernel()("vec", "qvec")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id").asc())
    return (
        pairs.select("query_id", F.col("vec_id").alias("nbr_id"), F.round(cos, 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos_sim")
    )


def label_centroids(embeddings: DataFrame) -> DataFrame:
    """Deterministic coarse codebook: per-label mean vector.

    (label, centroid array<double>) — posexplode + two-level agg, one
    shuffle on (label, dim). At 100 TB labels come from a sampled
    k-means; the plan is identical.
    """
    vecs = as_double_vecs(embeddings)
    return (
        vecs.select("label", F.posexplode("vec").alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(F.avg("v").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("cs"))
        .select("label", F.col("cs.c").alias("centroid"))
    )


def cosine_topk_ivf(
    embeddings: DataFrame, query_ids: list[int], k: int = 5, nprobe: int = 3
) -> DataFrame:
    """IVF top-k: probe only the nprobe cells whose centroid is most
    cosine-similar to the query; exact scoring within the probed cells.

    Recall < 1 by design (documented approximation); the plan replaces
    the full corpus scan with `corpus ⋈ (query × nprobe cells)` — an
    equality join on the cell key, which is what survives 100 TB.
    """
    vecs = as_double_vecs(embeddings)
    cents = label_centroids(embeddings)  # (label, centroid) — tiny
    q = vecs.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec")
    )
    qcos = _dot("qvec", "centroid") / (_norm("qvec") * _norm("centroid"))
    wq = Window.partitionBy("query_id").orderBy(F.col("cell_sim").desc(), F.col("label").asc())
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "qvec", "label", qcos.alias("cell_sim"))
        .withColumn("pr", F.row_number().over(wq))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "qvec", "label")
    )
    cand = vecs.join(F.broadcast(probes), "label").where(F.col("vec_id") != F.col("query_id"))
    cos = _cosine_kernel()("vec", "qvec")
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("nbr_id").asc())
    return (
        cand.select("query_id", F.col("vec_id").alias("nbr_id"), F.round(cos, 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "rank", "cos_sim")
    )


def lsh_planes(dim: int, n_bits: int, seed: int = 7):
    """Deterministic random-hyperplane set for sign-LSH: (n_bits, dim)
    standard normals from a seeded numpy generator. The SAME constants are
    embedded as literals in the Spark plan and in the SQL oracle, so both
    engines compute identical bucket assignments."""
    import numpy as np

    return np.random.default_rng(seed).standard_normal((n_bits, dim))


def sign_lsh_bands(
    embeddings: DataFrame, *, dim: int, bands: int = 8, rows_per_band: int = 4, seed: int = 7
) -> DataFrame:
    """(vec_id, band, sig): per-band sign-LSH signature. bit_j = 1 iff
    vec · plane_j ≥ 0; a band's signature concatenates its rows_per_band
    bits.

    The dot products run in an Arrow-batched pandas UDF whose accumulation
    is SEQUENTIAL OVER DIMS (``acc += v[i]·p[i]``, vectorized over rows):
    each per-row result is bit-identical to the left-associated Catalyst
    fold (IEEE-754 double mul/add in the same order), so bucket
    assignments match the SQL oracle exactly — while one kernel call
    replaces bands×rows_per_band interpreted higher-order-function
    evaluations per row (measured ~10× on emb_neardup; Spark's
    ``aggregate``/``zip_with`` lambdas never enter codegen, and the
    32×64-term flat expression overflows janino's 64 KB method limit).
    The expression twin (:func:`_sign_lsh_bands_expr`) stays as the
    parity baseline."""
    import numpy as np
    import pandas as pd

    n_bits = bands * rows_per_band
    planes = lsh_planes(dim, n_bits, seed)
    vecs = as_double_vecs(embeddings)

    def _band_sigs(vec):
        V = np.stack(vec.to_numpy())  # (n, dim) float64
        acc = np.zeros((V.shape[0], n_bits))
        for i in range(dim):  # sequential over dims == the fold's order
            acc += V[:, i : i + 1] * planes[:, i][None, :]
        bits = np.where(acc >= 0, "1", "0")
        return pd.Series(
            [
                ["".join(row[b * rows_per_band : (b + 1) * rows_per_band]) for b in range(bands)]
                for row in bits
            ]
        )

    # real class objects (not strings): `from __future__ import annotations`
    # would otherwise leave hints the UDF type-inferencer can't resolve
    _band_sigs.__annotations__ = {"vec": pd.Series, "return": pd.Series}
    band_sigs = F.pandas_udf(_band_sigs, "array<string>")

    return (
        vecs.select("vec_id", F.posexplode(band_sigs("vec")).alias("band", "sig"))
        .select("vec_id", F.col("band").cast("int").alias("band"), "sig")
    )


def _sign_lsh_bands_expr(
    embeddings: DataFrame, *, dim: int, bands: int = 8, rows_per_band: int = 4, seed: int = 7
) -> DataFrame:
    """Pure-Catalyst rendering of :func:`sign_lsh_bands` (interpreted HOF
    fold) — the parity baseline the kernel must match bit-for-bit."""
    planes = lsh_planes(dim, bands * rows_per_band, seed)
    vecs = as_double_vecs(embeddings)
    bits = []
    for j in range(bands * rows_per_band):
        plane = F.array(*[F.lit(float(v)) for v in planes[j]])
        dot = _dot(F.col("vec"), plane)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*bits[b * rows_per_band : (b + 1) * rows_per_band]).alias("sig"),
            )
            for b in range(bands)
        ]
    )
    return (
        vecs.select("vec_id", F.explode(band_structs).alias("p"))
        .select("vec_id", F.col("p.band").alias("band"), F.col("p.sig").alias("sig"))
    )


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    *,
    dim: int = 64,
    bands: int = 8,
    rows_per_band: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Embedding near-duplicate pairs (cosine ≥ threshold) via sign-LSH
    blocking — the LSH → exact-verify composition the dedup stack uses:

    1. every vector gets ``bands`` bucket keys (sign patterns of
       ``rows_per_band`` random hyperplanes);
    2. candidate pairs come from EQUALITY self-joins on (band, sig) —
       bucketed, never an all-pairs cross product;
    3. exact cosine scores only the candidates; pairs below threshold drop.

    Recall < 1 by construction (a pair at angle θ collides in one band
    w.p. (1−θ/π)^rows_per_band; missing all 8 bands at cos ≈ 0.95 is
    ~2·10⁻⁴) — the documented trade that makes the operator linear in
    corpus size. The brute-force exactness baseline remains available as
    :func:`cosine_neardup_bruteforce`.
    """
    vecs = as_double_vecs(embeddings)
    bs = sign_lsh_bands(
        embeddings, dim=dim, bands=bands, rows_per_band=rows_per_band, seed=seed
    )
    a = bs.select(F.col("vec_id").alias("id_a"), "band", "sig")
    b = bs.select(F.col("vec_id").alias("id_b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = vecs.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"))
    vb = vecs.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"))
    cos = _cosine_kernel()("va", "vb")
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def cosine_neardup_bruteforce(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """All-pairs exact near-dup — the O(N²) correctness baseline for
    :func:`cosine_neardup_pairs` recall tests. Cross-product plan: never
    run on a real corpus."""
    vecs = as_double_vecs(embeddings)
    a = vecs.select(F.col("vec_id").alias("id_a"), F.col("vec").alias("va"))
    b = vecs.select(F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"))
    cos = _dot("va", "vb") / (_norm("va") * _norm("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )
