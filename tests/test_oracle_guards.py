"""Comparator blind-spot guards for tools/check_oracle.py.

The round-9 driver reds (``bm25_search``, ``orders_target_encode``) were
NOT value bugs: DuckDB's ``sum(BIGINT)`` widens to HUGEINT, pandas renders
HUGEINT as float64, and the driver's formatted-value hash sees ``414213.0``
vs Spark's ``414213``.  The local comparator coerced via ``float()`` and
stayed green, so the class was invisible locally.  These tests plant the
exact bug shape and assert the two new guards catch it:

1. the DESCRIBE-based HUGEINT output scan (pre-execution), and
2. the pandas dtype-class (int-vs-float) column check in ``compare``.

They also sweep every registered oracle's DESCRIBE output so an uncast
sum can never land again.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check_oracle import compare  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_planted_uncast_sum_is_flagged_by_describe():
    """A scratch oracle with an uncast sum() must show a HUGEINT output
    column in DESCRIBE — the shape of the r9 bm25/target-encode bug."""
    con = _con()
    desc = con.execute(
        "DESCRIBE SELECT o_orderpriority, sum(o_custkey) AS s FROM orders GROUP BY 1"
    ).df()
    types = dict(zip(desc["column_name"], desc["column_type"]))
    assert "HUGEINT" in str(types["s"]).upper()
    # and the cast fixes it, the way the two oracles were fixed
    desc2 = con.execute(
        "DESCRIBE SELECT o_orderpriority, sum(o_custkey)::BIGINT AS s "
        "FROM orders GROUP BY 1"
    ).df()
    types2 = dict(zip(desc2["column_name"], desc2["column_type"]))
    assert "HUGEINT" not in str(types2["s"]).upper()


def test_dtype_class_mismatch_fails_compare():
    """int64 Spark column vs float64 oracle column must be a red row even
    when every value is numerically equal (the driver's hash sensitivity)."""
    a = pd.DataFrame({"k": ["x", "y"], "v": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["x", "y"], "v": pd.array([1.0, 2.0], dtype="float64")})
    r = compare(a, b)
    assert r["dtype_flags"] == [("v", "int64", "float64")]
    assert not r["exact"] and not r["tolerant"]
    # same-class frames stay green
    r2 = compare(a, a.copy())
    assert r2["exact"] and not r2.get("dtype_flags")


def test_no_registered_oracle_emits_hugeint():
    """Permanent version of the judge's one-off DESCRIBE scan: every
    oracle_sql() entry must bind with zero HUGEINT output columns."""
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    import __spark_entry__ as entry_mod

    con = _con()
    offenders = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            desc = con.execute("DESCRIBE " + sql).df()
        except Exception as exc:  # binding failure is its own offense
            offenders.append((name, f"DESCRIBE failed: {exc}"))
            continue
        for cn, ct in zip(desc["column_name"], desc["column_type"]):
            if "HUGEINT" in str(ct).upper():
                offenders.append((name, f"{cn}: {ct}"))
    assert offenders == [], offenders


def test_driver_window_invariants():
    """The driver's correctness sweep truncates at the first 50
    registered queries — the registration order IS the window. Pin the
    invariants the rotation discipline depends on: unique names, every
    window entry oracle-backed, and every oracle key declared."""
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    names = list(qs)
    assert len(names) == len(set(names)), "duplicate registered query names"
    oracles = entry_mod.oracle_sql()
    window = names[:50]
    missing = [n for n in window if n not in oracles]
    assert missing == [], f"window entries without oracles: {missing}"
    stray = [n for n in oracles if n not in qs]
    assert stray == [], f"oracles without declared queries: {stray}"


def test_registry_comment_count_matches_declared_queries():
    """VERDICT r11 #4: the rotation-policy comment's 'All N are
    verified locally' count drifted once (228 while len(queries())
    was 238) — pin it to the registry so it can't drift again."""
    import inspect
    import re

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
    import __spark_entry__ as entry_mod

    m = re.search(
        r"All (\d+) are verified", inspect.getsource(entry_mod)
    )
    assert m is not None, "rotation-policy comment lost its count sentence"
    assert int(m.group(1)) == len(entry_mod.queries())
