"""Distributed dense linear algebra over embedding columns.

The pattern here is the one that scales to 100 TB of vectors: map-side
PARTIAL sufficient statistics (one tiny row per Arrow batch), then a
shuffle of partials that is orders of magnitude smaller than the data,
then the closed-form combine. Nothing ever materializes an n×d matrix
on one node; nothing joins row-against-row.

Covers the classic pipeline needs: covariance / Gram matrix (whitening,
PCA preprocessing, embedding-drift monitoring). The d×d result is tiny
(64² = 4096 cells), so the post-shuffle stage is effectively free —
100% of the cost is one linear scan of the vectors.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

#: single packed partial per Arrow batch: [n, Σx (d cells), ΣxxT (d² cells,
#: row-major)]. ONE array column means the whole reduce is ONE
#: posexplode+groupBy over (1+d+d²)·n_batches tiny rows — the vector scan
#: runs exactly once, with no persist and no repeated subtree.
_PARTIAL_SCHEMA = StructType([StructField("p", ArrayType(DoubleType(), False), False)])


def gram_partials(emb: DataFrame, dims: int, col: str = "embedding") -> DataFrame:
    """One packed row per Arrow batch (see module note). float64
    accumulation regardless of the input's float32 storage, so the
    combine order (a Spark shuffle vs DuckDB's sequential scan) agrees to
    ≪1e-9 and round(…, 6) downstream is engine-deterministic. The BLAS
    ``x.T @ x`` per batch is the one place Python beats the JVM here —
    there is no codegen dgemm."""

    def kernel(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[col].to_numpy())[:, :dims].astype(np.float64)
            packed = np.concatenate(([float(x.shape[0])], x.sum(axis=0), (x.T @ x).ravel()))
            yield pd.DataFrame({"p": [packed]})

    return emb.select(col).mapInPandas(kernel, schema=_PARTIAL_SCHEMA)


def embedding_covariance(emb: DataFrame, dims: int, col: str = "embedding") -> DataFrame:
    """Population covariance of the first ``dims`` dimensions:
    cov(i,j) = Σxᵢxⱼ/N − (Σxᵢ/N)(Σxⱼ/N), upper triangle (i ≤ j), 0-based
    (i, j, cov) rows.

    Physical shape: one linear mapInPandas scan emitting packed batch
    partials, ONE posexplode+groupBy(cell-index) over thousands of tiny
    partial cells (map-side combined), then broadcast-joined combines on
    the d-sized mean table. The alternative declarative rendering
    (posexplode² self-join) is O(n·d²) shuffled rows and is exactly what
    this shape avoids — at 100 TB the partial reduce is ~MBs.
    """
    d = dims
    # one LINEAR chain — no plan branches, so the expensive vector scan
    # provably runs once (a branched rendering with per-branch idx
    # filters loses ReusedExchange: Catalyst pushes the group-key filter
    # below the aggregate, making each branch's exchange distinct and
    # re-running the kernel per branch — measured, and pinned by
    # tests/test_linalg.py::test_covariance_single_scan_plan):
    #   partials → posexplode → groupBy(idx) [map-side combined, tiny]
    #   → pack the ≤1+d+d² summed cells into ONE map row
    #   → explode the d² (i,j) index space and look combines up in the map
    cells = (
        gram_partials(emb, d, col)
        .select(F.posexplode("p").alias("idx", "v"))
        .groupBy("idx")
        .agg(F.sum("v").alias("s"))
    )
    packed = cells.agg(F.map_from_entries(F.collect_list(F.struct("idx", "s"))).alias("m"))
    k = F.col("k")
    m = F.col("m")
    return (
        packed.select(F.explode(F.sequence(F.lit(0), F.lit(d * d - 1))).alias("k"), "m")
        .select(k, (k / d).cast("int").alias("i"), (k % d).alias("j"), m)
        .where(F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            F.round(
                m[k + 1 + d] / m[F.lit(0)]
                - (m[F.col("i") + 1] / m[F.lit(0)]) * (m[F.col("j") + 1] / m[F.lit(0)]),
                6,
            ).alias("cov"),
        )
    )
