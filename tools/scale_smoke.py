#!/usr/bin/env python
"""10× scale smoke (VERDICT r7 #6): every scale argument in this repo is
a plan-shape argument verified at sf0.1 — this script adds one actual
order-of-magnitude datapoint to catch partition-count and memory cliffs
the sf0.1 bench cannot.

It derives a 10× corpus IN THE REPO (never touching /root/testdata):
``documents`` ×10 (50k docs, re-keyed ids) and ``lineitem`` ×10 (6M
rows, re-keyed orderkeys so the row-hash point ids stay unique), writes
them under ``.scale10/`` with the standard table names, then runs

* ``corpus_curation_v2`` — the flagship dedup/curation composition,
  unchanged, against the scaled dir;
* the lineitem partition-local fit with partitions scaled WITH the data
  (64 → 640, holding per-partition rows constant — exactly what a
  cluster deployment does), tiny budget (2 iterations).

For each it records wall seconds plus total/peak shuffle bytes from the
Spark REST API, and prints one JSON line. Results are transcribed into
BASELINE.md's scale-smoke section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10")
REPLICAS = 10


def build_corpus(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    scaled_docs = None
    for i in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        scaled_docs = d if scaled_docs is None else scaled_docs.unionByName(d)
    scaled_docs.write.parquet(os.path.join(OUT, "documents.parquet"))

    li = spark.read.parquet(os.path.join(SRC, "lineitem.parquet"))
    scaled_li = None
    for i in range(REPLICAS):
        d = li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
        scaled_li = d if scaled_li is None else scaled_li.unionByName(d)
    scaled_li.write.parquet(os.path.join(OUT, "lineitem.parquet"))


def shuffle_stats(spark) -> tuple[int, int, int]:
    """(total shuffle write bytes, peak per-stage write, completed stages)
    from the REST API of the live app."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    writes = [s.get("shuffleWriteBytes", 0) for s in stages]
    return sum(writes), max(writes, default=0), len(stages)


def main() -> None:
    from mopso_engine.session import build_session

    spark = build_session(master="local[32]", app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    build_corpus(spark)
    out: dict = {"metric": "scale10_smoke", "replicas": REPLICAS}

    # flagship curation composition, unchanged, on the 10x corpus
    qs = entry_mod.queries()
    w0, _, s0 = shuffle_stats(spark)
    t0 = time.time()
    df = qs["corpus_curation_v2"](spark, OUT)
    df.write.format("noop").mode("overwrite").save()
    t_cur = round(time.time() - t0, 3)
    w1, peak1, s1 = shuffle_stats(spark)
    out["corpus_curation_v2"] = {
        "rows_in": 50_000, "wall_sec": t_cur,
        "shuffle_write_bytes": w1 - w0, "peak_stage_shuffle_bytes": peak1,
        "stages": s1 - s0,
    }
    print(f"# corpus_curation_v2 x10: {t_cur}s", file=sys.stderr)

    # lineitem partition-local fit, partitions scaled WITH the data
    from pyspark.sql import functions as F

    from mopso_engine.engine import MopsoEngine
    from mopso_engine.io import points_from_columns, read_table
    from mopso_engine.schema import MopsoConfig

    li = read_table(spark, OUT, "lineitem").withColumn(
        "pid",
        F.xxhash64(
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        ),
    )
    pts = points_from_columns(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"], None, id_col="pid"
    ).repartition(640, "id").sortWithinPartitions("id")
    cfg = MopsoConfig(
        k=4, n_particles=5, iter_max=2, knn_l=5, seed=42,
        fitness_mode="partition_local",
    )
    w0, _, s0 = shuffle_stats(spark)
    t0 = time.time()
    res = MopsoEngine(cfg).fit(pts)
    t_fit = round(time.time() - t0, 3)
    w1, peak1, s1 = shuffle_stats(spark)
    out["fit_lineitem_x10"] = {
        "rows_in": 6_000_000, "partitions": 640, "wall_sec": t_fit,
        "archive_size": len(res.archive_positions),
        "shuffle_write_bytes": w1 - w0, "peak_stage_shuffle_bytes": peak1,
        "stages": s1 - s0,
    }
    print(f"# fit_lineitem x10: {t_fit}s archive={len(res.archive_positions)}", file=sys.stderr)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
