#!/usr/bin/env python
"""Compact plan evidence for the r17 graph-setup restructure (§2.4).

The full supplier_pagerank/bfs query plans nest the persisted loop
caches' lineage recursively (1-5 MB of formatted explain per query —
useless as committed evidence), so this probe explains exactly the
SETUP LINEAGES the r17 change touched, old rendering vs new, over the
real supplier edge table:

* esrc (pagerank): old = e.distinct ⋈ groupBy(src) count, then
  repartition(src); new = e(distinct asserted by the caller)
  .repartition(src) + count window over src.
* nodes (both loops): old = union.distinct().repartition(node);
  new = union.repartition(node).distinct().

Writes plans/r17/graph_setup_{before,after}.txt with Exchange counts.
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r17"
    os.makedirs(outdir, exist_ok=True)

    from mopso_engine.session import build_session
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = build_session(master=f"local[{cpus}]", app_name="graph-setup-probe")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey"
    )
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(
            F.col("o_custkey").alias("cust"),
            (F.col("l_suppkey") + F.lit(1_000_000_000)).alias("supp"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("cust").alias("src"), F.col("supp").alias("dst")
    ).union(pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst")))
    base = edges.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
    ).where(F.col("src").isNotNull() & F.col("dst").isNotNull())
    p = 8  # representative loop width; the count is width-independent

    # ---- old rendering (r16 code) ----
    e_old = base.distinct()
    deg = e_old.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    esrc_old = e_old.join(deg, "src").repartition(p, "src")
    nodes_old = (
        e_old.select(F.col("src").alias("node"))
        .union(e_old.select(F.col("dst").alias("node")))
        .distinct()
        .repartition(p, "node")
    )

    # ---- new rendering (r17 code) ----
    e_new = base  # edges_distinct=True: caller-proved duplicate-free
    esrc_new = e_new.repartition(p, "src").withColumn(
        "outdeg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    )
    nodes_new = (
        e_new.select(F.col("src").alias("node"))
        .union(e_new.select(F.col("dst").alias("node")))
        .repartition(p, "node")
        .distinct()
    )

    for tag, esrc, nodes in (
        ("before", esrc_old, nodes_old),
        ("after", esrc_new, nodes_new),
    ):
        parts = []
        for name, df in (("esrc", esrc), ("nodes", nodes)):
            txt = _explain(df)
            n_ex = txt.count("Exchange")
            parts.append(
                f"==== {name} setup lineage ({tag}) — {n_ex} Exchange "
                f"node(s) ====\n{txt}"
            )
        path = os.path.join(outdir, f"graph_setup_{tag}.txt")
        with open(path, "w") as fh:
            fh.write("\n".join(parts))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
