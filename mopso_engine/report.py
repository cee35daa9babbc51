"""Run report (SURVEY S5/S6/F11) — JSON instead of the reference's
bilingual text lines (Spark_MOPSO_Avg.scala:679-799), same content:
config echo, wall clock, Pareto front (raw + min-max normalized),
per-label purity, and the side-by-side MLlib-KMeans baseline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from mopso_engine import metrics as metrics_mod
from mopso_engine.assign import assign_with_labels
from mopso_engine.engine import MopsoEngine, MopsoResult
from mopso_engine.init import kmeans_centers


def build_report(engine: MopsoEngine, points: DataFrame, result: MopsoResult, *, kmeans_baseline: bool = True) -> dict:
    cfg = engine.cfg
    report = {
        "config": {
            "n_particles": cfg.n_particles,
            "archive_capacity": cfg.archive_capacity,
            "iter_max": cfg.iter_max,
            "knn_l": cfg.knn_l,
            "c1": cfg.c1,
            "c2": cfg.c2,
            "w_schedule": cfg.w_schedule,
            "crowding_formula": cfg.crowding_formula,
            "fitness_mode": cfg.fitness_mode,
            "seed": cfg.seed,
        },
        "data": {"n": result.n_points, "d": result.n_features, "k": result.k},
        "wall_clock_sec": result.wall_clock_sec,
        "archive": [
            {
                "solution": i,
                "dev": float(f[0]),
                "conn": float(f[1]),
                "dev_norm": float(nf[0]),
                "conn_norm": float(nf[1]),
                "centers": np.asarray(p).tolist(),
            }
            for i, (f, nf, p) in enumerate(
                zip(result.archive_fitness, result.archive_fitness_normalized, result.archive_positions)
            )
        ],
        "best_index": result.best_index,
        "mopso_eval": engine.evaluate(points, result),
        "history": result.history,
    }
    # per-archive-solution purity, all solutions in ONE distributed pass
    # (the reference runs k·|archive| jobs here, Spark_MOPSO_Avg.scala:325-356)
    stack = np.stack(result.archive_positions)
    per_sol: dict[int, list] = {}
    for r in metrics_mod.purity_all_solutions(points, stack).collect():
        per_sol.setdefault(r["solution"], []).append(r)
    for i, entry in enumerate(report["archive"]):
        rows = per_sol.get(i, [])
        got = sum(r["modal_count"] for r in rows)
        entry["purity"] = got / result.n_points if result.n_points else 0.0
        entry["purity_accepted"] = len({r["modal_cluster"] for r in rows}) == result.k
    if kmeans_baseline:
        km = kmeans_centers(points, result.k, seed=cfg.seed)
        awl = assign_with_labels(points, km).persist()
        purity, accepted = metrics_mod.purity_accuracy(awl, result.n_points, result.k)
        report["kmeans_baseline"] = {
            "purity": purity,
            "purity_accepted": accepted,
            "inertia": metrics_mod.inertia(awl),
        }
        awl.unpersist()
    return report
