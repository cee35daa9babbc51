"""Testdata schema canary (VERDICT r4 #5).

The driver regenerates /root/testdata between rounds and has already
shifted a physical encoding once (events.ts: INT64 TIMESTAMP(NANOS) →
timestamp[us]), silently breaking every consumer that hard-coded the old
type. This module pins the COLUMN NAMES exactly and constrains each
column to the set of physical types the engine's readers handle — so the
next regeneration fails HERE, loudly and attributably, instead of as 12
red driver rows.

Pure pyarrow footer reads — no Spark session, runs in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: column -> acceptable pyarrow type names. Lists cover every encoding a
#: reader branch exists for (see ext.streaming.normalize_event_ts for the
#: events.ts branches); a type outside the list means a NEW reader branch
#: is needed.
INT = {"int32", "int64"}
TS = {"timestamp[us]", "timestamp[ns]", "timestamp[us, tz=UTC]", "timestamp[ns, tz=UTC]", "int64"}
EXPECTED: dict[str, dict[str, set[str]]] = {
    "region": {"r_regionkey": INT, "r_name": {"string", "large_string"}},
    "nation": {"n_nationkey": INT, "n_name": {"string", "large_string"}, "n_regionkey": INT},
    "customer": {
        "c_custkey": INT,
        "c_name": {"string", "large_string"},
        "c_nationkey": INT,
        "c_acctbal": {"double"},
        "c_mktsegment": {"string", "large_string"},
    },
    "supplier": {
        "s_suppkey": INT,
        "s_name": {"string", "large_string"},
        "s_nationkey": INT,
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": INT,
        "p_name": {"string", "large_string"},
        "p_brand": {"string", "large_string"},
        "p_type": {"string", "large_string"},
        "p_size": INT,
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": INT,
        "o_custkey": INT,
        "o_orderstatus": {"string", "large_string"},
        "o_totalprice": {"double"},
        "o_orderdate": TS,
        "o_orderpriority": {"string", "large_string"},
    },
    "lineitem": {
        "l_orderkey": INT,
        "l_partkey": INT,
        "l_suppkey": INT,
        "l_linenumber": INT,
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string", "large_string"},
        "l_linestatus": {"string", "large_string"},
        "l_shipdate": TS,
    },
    "events": {
        "event_id": INT,
        "ts": TS,
        "user_id": INT,
        "event_type": {"string", "large_string"},
        "value": {"double"},
        "props": {"string", "large_string"},
    },
    "documents": {
        "doc_id": INT,
        "text": {"string", "large_string"},
        "lang": {"string", "large_string"},
        "source": {"string", "large_string"},
        "n_chars": INT,
    },
    "embeddings": {
        "vec_id": INT,
        "embedding": {"list<element: float>", "list<item: float>", "list<element: double>"},
        "label": INT,
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_is_one_the_engine_reads(table):
    path = os.path.join(SF, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    schema = pq.read_schema(path)
    got = {f.name: str(f.type) for f in schema}
    assert list(got) == list(EXPECTED[table]), (
        f"{table}: driver regenerated testdata with different COLUMNS — "
        f"expected {list(EXPECTED[table])}, got {list(got)}"
    )
    for col, allowed in EXPECTED[table].items():
        assert got[col] in allowed, (
            f"{table}.{col}: physical type {got[col]!r} has NO reader branch "
            f"(engine handles {sorted(allowed)}); add one before the driver "
            f"round rots downstream queries"
        )
