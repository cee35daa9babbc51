"""PII scrub: detection counts, fixed-order redaction, idempotence,
and Java↔RE2 pattern portability (the DuckDB-oracle contract)."""

import duckdb
import pytest

from mopso_engine.ext.pii import (
    PII_RULES,
    corpus_pii_report,
    pii_counts,
    pii_redact,
)

DOCS = [
    (1, "mail me at alice.smith+x@example.co.uk or bob@ex.org today"),
    (2, "ssn 123-45-6789 then phone 555-123-4567 and (415) 555-0199"),
    (3, "server at 10.0.0.1 and 192.168.255.254; version 1.2 is fine"),
    (4, "nothing sensitive here"),
    (5, "mixed: c@d.io 1.2.3.4 999-88-7777"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pii_counts(spark, docs):
    rows = {r["doc_id"]: r for r in pii_counts(docs).collect()}
    assert (rows[1]["n_email"], rows[1]["n_pii"]) == (2, 2)
    assert (rows[2]["n_ssn"], rows[2]["n_phone"], rows[2]["n_pii"]) == (1, 2, 3)
    assert (rows[3]["n_ipv4"], rows[3]["n_pii"]) == (2, 2)
    assert rows[4]["n_pii"] == 0
    assert (rows[5]["n_email"], rows[5]["n_ipv4"], rows[5]["n_ssn"]) == (1, 1, 1)
    # append-only projection: original columns survive
    assert {"doc_id", "text"} <= set(rows[1].asDict())


def test_pii_counts_rerun_overwrites_no_ambiguity(spark, docs):
    """Re-running pii_counts over already-counted input (ADVICE r6:
    enrichment-pass rerun) must OVERWRITE the n_<type>/n_pii columns,
    not duplicate them into analysis-time ambiguity."""
    twice = pii_counts(pii_counts(docs))
    assert twice.columns.count("n_pii") == 1
    assert all(twice.columns.count(f"n_{name}") == 1 for name, _, _ in PII_RULES)
    once = {r["doc_id"]: r.asDict() for r in pii_counts(docs).collect()}
    again = {r["doc_id"]: r.asDict() for r in twice.collect()}
    assert once == again


def test_pii_redact_exact_and_ordered(spark, docs):
    got = {r["doc_id"]: r["text"] for r in pii_redact(docs).collect()}
    assert got[1] == "mail me at <EMAIL> or <EMAIL> today"
    # SSN rule runs BEFORE phone: 123-45-6789 must not become a phone
    assert got[2] == "ssn <SSN> then phone <PHONE> and <PHONE>"
    assert got[3] == "server at <IPV4> and <IPV4>; version 1.2 is fine"
    assert got[4] == "nothing sensitive here"
    assert got[5] == "mixed: <EMAIL> <IPV4> <SSN>"


def test_pii_redact_idempotent(spark, docs):
    once = {r["doc_id"]: r["text"] for r in pii_redact(docs).collect()}
    twice = {r["doc_id"]: r["text"] for r in pii_redact(pii_redact(docs)).collect()}
    assert once == twice


def test_corpus_report(spark, docs):
    rep = {r["pii_type"]: (r["n_docs"], r["n_matches"]) for r in corpus_pii_report(docs).collect()}
    assert rep == {"email": (2, 3), "ssn": (2, 2), "phone": (1, 2), "ipv4": (2, 3)}


def test_patterns_portable_to_duckdb(spark, docs):
    """The oracle contract: DuckDB's RE2 applies the IDENTICAL patterns
    and produces the identical counts and redacted text."""
    con = duckdb.connect()
    for doc_id, text in DOCS:
        red = text
        for name, pat, repl in PII_RULES:
            (n,) = con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [text, pat]
            ).fetchone()
            spark_n = (
                pii_counts(spark.createDataFrame([(text,)], "text string"))
                .collect()[0][f"n_{name}"]
            )
            assert n == spark_n, (doc_id, name)
            red = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [red, pat, repl]
            ).fetchone()[0]
        spark_red = pii_redact(
            spark.createDataFrame([(text,)], "text string")
        ).collect()[0]["text"]
        assert red == spark_red, doc_id


def test_pii_redact_stream_equals_batch(spark):
    """The scrub chain is stateless Catalyst — the same expression over
    a readStream source yields the identical redacted corpus."""
    from pyspark.sql import functions as F

    from mopso_engine.ext.pii import redacted_text
    from mopso_engine.ext.streaming import docs_stream_source, run_available_now

    sf = "/root/testdata/sf0.001"
    batch = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", F.md5(redacted_text()).alias("fp"))
    )
    stream = docs_stream_source(spark, f"{sf}/documents.parquet").select(
        "doc_id", F.md5(redacted_text()).alias("fp")
    )
    got = run_available_now(stream, query_name="pii_stream_test", output_mode="append")
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in batch.collect()}
    assert got.count() > 0
