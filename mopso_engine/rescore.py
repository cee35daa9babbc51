"""Post-hoc RELATIONAL re-scoring of a fitted archive (VERDICT r1 #1).

``MopsoEngine.fit`` computes [Dev, Conn] with the Arrow fitness kernel
(objectives.evaluate_solutions). These helpers recompute the same
objectives for the returned archive positions through a completely
different code path — declarative assignment + kNN-pair joins + grouped
aggregates (the plans behind the ``dev_inertia`` / ``conn_objective``
queries) — so a fitness-kernel regression shows up as a disagreement,
and a SQL oracle holding the same positions as literals can verify the
values independently (DuckDB re-derives assignment, kNN and Conn from
the embeddings/lineitem tables; only the seeded RNG output — the
positions — is injected).

Everything here is control-plane sized: S ≤ archive-capacity solutions,
so the collected result is S rows; the distributed work is one
multi-solution assignment pass + one kNN-pair subtree.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mopso_engine.assign import assign_all_solutions
from mopso_engine.objectives import knn_pairs_exact


def rescore_archive(
    pts: DataFrame, positions: list[np.ndarray], knn_l: int, *, n_rows: int | None = None
) -> list[tuple[int, float, float]]:
    """[(solution, dev, conn)] for each archive position, recomputed
    relationally with exact-math distances (oracle-reproducible).

    Dev = Σ nearest-center distance; Conn = Σ 1/rank over same-cluster
    top-``knn_l`` neighbors — the reference's global ('exact' mode)
    objective semantics. Eager: persists the multi-solution assignment
    for its two uses and releases it before returning.
    """
    # spread the CPU-bound exact kNN + multi-solution assignment kernels:
    # a small parquet corpus arrives as one scan partition, which would
    # serialize the quadratic work (results are layout-independent; the
    # grouped sums absorb reorder noise well below the oracle rounding)
    dp = pts.sparkSession.sparkContext.defaultParallelism
    pts = pts.repartition(dp, "id")
    stack = np.stack(positions)
    asg = assign_all_solutions(pts, stack, exact_math=True).persist()
    try:
        dev_rows = asg.groupBy("solution").agg(F.sum("dist").alias("dev")).collect()
        pairs = knn_pairs_exact(pts, knn_l, n_rows=n_rows, exact_math=True)
        a = asg.select("id", "solution", F.col("cluster").alias("c_i"))
        b = asg.select(
            F.col("id").alias("nbr_id_b"),
            F.col("solution").alias("sol_j"),
            F.col("cluster").alias("c_j"),
        )
        conn_rows = (
            pairs.join(a, "id")
            .join(b, (F.col("nbr_id") == F.col("nbr_id_b")) & (F.col("solution") == F.col("sol_j")))
            .groupBy("solution")
            .agg(
                F.sum(
                    F.when(F.col("c_i") == F.col("c_j"), 1.0 / F.col("rank")).otherwise(0.0)
                ).alias("conn")
            )
            .collect()
        )
    finally:
        asg.unpersist()
    dev = {r["solution"]: r["dev"] for r in dev_rows}
    conn = {r["solution"]: r["conn"] for r in conn_rows}
    return [(s, float(dev[s]), float(conn.get(s, 0.0))) for s in sorted(dev)]


def rescore_dev(pts: DataFrame, positions: list[np.ndarray]) -> list[tuple[int, float]]:
    """[(solution, dev)] — global Dev only, for partition-local fits whose
    Conn is layout-dependent (not SQL-expressible); one multi-solution
    assignment pass + one grouped aggregate."""
    stack = np.stack(positions)
    rows = (
        assign_all_solutions(pts, stack, exact_math=True)
        .groupBy("solution")
        .agg(F.sum("dist").alias("dev"))
        .collect()
    )
    return sorted((r["solution"], float(r["dev"])) for r in rows)
