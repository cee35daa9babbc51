#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced through the noop datasource sink (full pipeline runs,
nothing is collected to the driver). Each query is the same callable the
correctness gate checks — no bench-special code paths.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # relational layer
    "q1_pricing",
    "q3_shipping",
    "q4_priority",
    "q6_forecast",
    "q13_custdist",
    "q16_supplier_variety",
    "q22_idle_customers",
    "nation_revenue",
    "top_parts",
    "orders_window_suite",
    "events_interval_join",
    "events_windowed",
    "events_sessionized",
    "events_sessions_native",
    "events_asof",
    "user_stats",
    # points/assignment family
    "assign_nearest",
    "purity",
    "dev_inertia",
    "knn_top5",
    "conn_objective",
    # text / dedup / simsearch extensions
    "text_stats",
    "lang_pred",
    "tfidf_terms",
    "docs_sample",
    "corpus_curation",
    "dedup_jaccard",
    "dedup_jaccard_capped",
    # planted-hot-shingle pair: measures the skew cap's benefit (the
    # uncapped twin pays ~(n/3)^2 intersection rows per hot shingle)
    "dedup_jaccard_skewed_uncapped",
    "dedup_jaccard_skewed",
    "dedup_verified",
    "lsh_candidates",
    "simhash_fp",
    "simhash_neardup",
    "ann_topk",
    "ann_ivf",
    "emb_covariance",
    # the full algorithm: tiny budget (fit-only — the r01-comparable
    # number — and fit+rescore, separated per VERDICT r2 #6), the
    # reference's 50x10xL10 budget, and the 600k-row partition-local
    # scale demo
    "mopso_fit_only",
    "mopso_fit",
    "mopso_fit_full",
    "mopso_fit_lineitem",
]

#: iterations of the reference-budget fit — for the s/iteration readout
FIT_FULL_ITERS = 10


def _cpu_calibration() -> float:
    """Seconds for a fixed single-core workload (see the JSON field note)."""
    import numpy as np

    a = np.random.RandomState(0).rand(1024, 1024)
    t0 = time.time()
    for _ in range(10):
        a @ a
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from mopso_engine.session import build_session

    spark = build_session(master=f"local[{cpus}]", app_name="mopso-engine-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    # warm the session (JVM classloading, scheduler, python workers,
    # parquet reader) so the first timed query isn't charged for it
    spark.range(1000).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    # ... and warm the two heaviest codegen/JIT families on bounded
    # inputs (a 300-doc shingle join, a 300-vector fitness pass): the
    # first dedup and first fit queries otherwise pay one-off janino
    # compilation + C2 warmup — measured 2-6s of run-to-run noise that
    # belongs to the JVM, not to the operator being timed. Uncharged,
    # applied before ALL timings, same policy as the scheduler warmup.
    from mopso_engine.ext.dedup import jaccard_pairs
    from mopso_engine.io import points_from_embeddings
    from mopso_engine.objectives import evaluate_solutions, with_neighbors

    import numpy as np

    docs_small = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).limit(300)
    jaccard_pairs(docs_small, threshold=0.5).write.format("noop").mode("overwrite").save()
    pts_small = points_from_embeddings(spark, sf_dir).limit(300)
    nbr_small = with_neighbors(pts_small.repartition(4, "id"), 3, mode="partition_local")
    evaluate_solutions(nbr_small, np.zeros((2, 3, 64)))

    from mopso_engine.ext.dedup import clear_shingle_caches

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        # release query-lifetime executor caches so one query's storage
        # doesn't leak into the next timing
        clear_shingle_caches()
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "bench_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        # fixed-size CPU calibration (10× 1024² float64 matmul, single
        # core): a machine-speed fingerprint recorded WITH the run, so a
        # cross-round regression can be attributed to code vs a noisy /
        # throttled host (run-to-run host variance of 2-4× was observed
        # in round 3). Compare ratios of this before comparing queries.
        "cpu_calib_sec": _cpu_calibration(),
    }
    if "mopso_fit_full" in timings:
        # per-iteration driver-loop cost of the reference-budget fit
        # (includes its one-off kNN precompute + post-hoc rescore)
        out["fit_full_sec_per_iter"] = round(timings["mopso_fit_full"] / FIT_FULL_ITERS, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
