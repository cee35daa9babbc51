#!/usr/bin/env python
"""Dump .explain("formatted") for named declared queries to files.

Usage: python tools/dump_plans.py q1,q2 /root/repo/plans/r16 suffix
Writes <outdir>/<query>_<suffix>.txt for each query. Env:
SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

The plan is built (not executed) — cheap; fit queries that require an
executed pass to render a plan are skipped with a note.
"""
from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    outdir = sys.argv[2]
    suffix = sys.argv[3]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.makedirs(outdir, exist_ok=True)

    from mopso_engine.session import build_session

    spark = build_session(master=f"local[{cpus}]", app_name="mopso-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
