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
from mopso_engine.objectives import knn_pairs_exact, knn_pairs_partition_local


def rescore_archive(
    pts: DataFrame,
    positions: list[np.ndarray],
    knn_l: int,
    *,
    n_rows: int | None = None,
    knn_mode: str = "exact",
    layout_partitions: int | None = None,
) -> list[tuple[int, float, float]]:
    """[(solution, dev, conn)] for each archive position, recomputed
    relationally with exact-math distances (oracle-reproducible).

    Dev = Σ nearest-center distance; Conn = Σ 1/rank over same-cluster
    top-``knn_l`` neighbors. ``knn_mode`` must be the mode the fit
    ACTUALLY used (``MopsoResult.knn_mode_used``):

    * ``'exact'`` — global neighbors via the collect+broadcast block
      kernel (valid to ``MAX_EXACT_KNN_ROWS``; the engine's own fallback
      guarantees no real fit exceeds it in this mode);
    * ``'partition_local'`` — neighbors from
      :func:`knn_pairs_partition_local` over the fit's deterministic
      layout, rebuilt here from ``layout_partitions``
      (``MopsoResult.layout_partitions``): no collect, no broadcast —
      the unbounded-scale path, and the ONLY semantics that can agree
      with a big fit's kernel (an exact global rescore of a
      partition-local fit would disagree by construction).

    Eager: persists the multi-solution assignment for its two uses and
    releases it before returning.
    """
    import time

    t0 = time.time()
    stack = np.stack(positions)
    if knn_mode == "partition_local":
        if layout_partitions is None:
            raise ValueError(
                "partition_local rescore needs the fit's layout_partitions "
                "(MopsoResult.layout_partitions) — neighbor sets are a "
                "function of the layout"
            )
        # rebuild the fit's layout bit-for-bit: hash-partition on id +
        # in-partition sort is a pure function of (data, partition count)
        pts = pts.repartition(layout_partitions, "id").sortWithinPartitions("id")
        pairs = knn_pairs_partition_local(pts, knn_l)
    elif knn_mode == "exact":
        # spread the CPU-bound exact kNN + multi-solution assignment
        # kernels: a small parquet corpus arrives as one scan partition,
        # which would serialize the quadratic work (results are
        # layout-independent; the grouped sums absorb reorder noise well
        # below the oracle rounding)
        dp = pts.sparkSession.sparkContext.defaultParallelism
        pts = pts.repartition(dp, "id")
        pairs = knn_pairs_exact(pts, knn_l, n_rows=n_rows, exact_math=True)
    else:
        raise ValueError(f"unknown rescore knn_mode: {knn_mode}")
    # the laid-out points feed THREE jobs (the kNN collect, the
    # assignment kernel and the pair kernel) — persist the layout once
    # so each consumer reads the cache instead of re-running the parquet
    # scan + repartition (2 scans + 2 exchanges removed; kernel rows are
    # row-independent, so values are unchanged). Released below.
    pts = pts.persist()
    asg = assign_all_solutions(pts, stack, exact_math=True).persist()
    try:
        dev_rows = asg.groupBy("solution").agg(F.sum("dist").alias("dev")).collect()
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
        pts.unpersist()
    _note_rescore_phase(time.time() - t0)
    dev = {r["solution"]: r["dev"] for r in dev_rows}
    conn = {r["solution"]: r["conn"] for r in conn_rows}
    return [(s, float(dev[s]), float(conn.get(s, 0.0))) for s in sorted(dev)]


def _note_rescore_phase(wall: float) -> None:
    """Record the rescore wall into the engine's LAST_FIT_PHASES so the
    bench's fit+rescore entries (mopso_fit, mopso_fit_full,
    mopso_fit_lineitem) self-adjudicate their composition (VERDICT r16
    #7): the fit just populated the dict, the rescore runs after it, so
    appending here keeps setup/iter_loop/rescore in one artifact.
    Lazy import — engine does not import rescore, but stay cycle-proof."""
    from mopso_engine.engine import LAST_FIT_PHASES

    if LAST_FIT_PHASES:
        LAST_FIT_PHASES["rescore"] = round(wall, 3)


def rescore_dev(pts: DataFrame, positions: list[np.ndarray]) -> list[tuple[int, float]]:
    """[(solution, dev)] — global Dev only, for partition-local fits whose
    Conn is layout-dependent (not SQL-expressible); one multi-solution
    assignment pass + one grouped aggregate."""
    import time

    t0 = time.time()
    stack = np.stack(positions)
    rows = (
        assign_all_solutions(pts, stack, exact_math=True)
        .groupBy("solution")
        .agg(F.sum("dist").alias("dev"))
        .collect()
    )
    _note_rescore_phase(time.time() - t0)
    return sorted((r["solution"], float(r["dev"])) for r in rows)
