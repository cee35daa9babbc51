"""One-shot decomposition probe for supplier_bfs: where do the
~6.8s outside bfs_levels' setup/blocks phases go? Not a benchmark —
a diagnostic (guide §1: measure before changing)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from mopso_engine.session import build_session

    spark = build_session(master=f"local[{cpus}]", app_name="probe-bfs")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    # bench-style warmup
    spark.range(1000).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    from mopso_engine.ext.graph import LAST_GRAPH_PHASES, clear_pagerank_caches

    for attempt in range(3):
        t0 = time.time()
        spark.sparkContext.setJobDescription(f"bfs build a{attempt}")
        df = qs["supplier_bfs"](spark, sf_dir)
        t1 = time.time()
        spark.sparkContext.setJobDescription(f"bfs noop a{attempt}")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        clear_pagerank_caches()
        t3 = time.time()
        ph = dict(LAST_GRAPH_PHASES)
        tracked = ph.get("setup", 0.0) + sum(
            b["wall"] for b in ph.get("blocks", [])
        )
        print(
            f"attempt {attempt}: total {t2 - t0:.3f}  "
            f"build(incl bfs_levels) {t1 - t0:.3f}  noop_write {t2 - t1:.3f}  "
            f"cleanup {t3 - t2:.3f}  phases_tracked {tracked:.3f}  "
            f"untracked_in_build {(t1 - t0) - tracked:.3f}  phases={ph}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
