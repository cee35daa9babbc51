"""BM25 top-k retrieval (ext.retrieval.bm25_topk) vs a from-scratch
python replay — scores in integer micro-units, Lucene idf, distinct
query terms, (score desc, doc_id asc) tie-break."""
import math

import pytest
from pyspark.sql import functions as F

from mopso_engine.ext.retrieval import bm25_topk

CORPUS = [
    (0, "hash join hash join scan table"),
    (1, "scan scan scan filter row"),
    (2, "stream window stream window stream"),
    (3, "customer order value customer"),
    (4, "join scan window order"),
    (5, "the a of"),
    (6, "hash hash hash hash hash hash hash hash"),
    (7, "value value order order customer window"),
]

QUERIES = [
    ("qa", "hash join scan"),
    ("qb", "stream window"),
    ("qc", "customer order value missingterm"),
]


def replay_bm25(corpus, queries, k1=1.2, b=0.75, top_k=10):
    docs = {i: t.lower().strip().split() for i, t in corpus}
    n = len(docs)
    sum_dl = sum(len(w) for w in docs.values())
    out = {}
    for qid, qtext in queries:
        terms = sorted(set(qtext.lower().strip().split()))
        scores = {}
        for t in terms:
            df = sum(1 for w in docs.values() if t in w)
            if df == 0:
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            for i, w in docs.items():
                tf = w.count(t)
                if tf == 0:
                    continue
                norm = (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * len(w) * n / sum_dl)
                )
                scores[i] = scores.get(i, 0) + math.floor(idf * norm * 1e6 + 0.5)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
        out[qid] = [(i, s, rk + 1) for rk, (i, s) in enumerate(ranked)]
    return out


class TestBm25:
    @pytest.fixture(scope="class")
    def result(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        qdf = spark.createDataFrame(QUERIES, "query_id string, qtext string")
        return bm25_topk(docs, qdf, k1=1.2, b=0.75, top_k=10).collect()

    def test_matches_python_replay_exactly(self, result):
        expected = replay_bm25(CORPUS, QUERIES)
        got = {}
        for r in result:
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score_micro"], r["rk"])
            )
        for qid in got:
            got[qid].sort(key=lambda x: x[2])
        assert got == expected

    def test_only_matching_docs_scored(self, result):
        # doc 5 shares no term with any query; it must not appear
        assert all(r["doc_id"] != 5 for r in result)

    def test_missing_query_term_is_harmless(self, result):
        # "missingterm" (df=0) contributes nothing but must not error
        # or suppress qc's real matches
        qc_docs = {r["doc_id"] for r in result if r["query_id"] == "qc"}
        assert {3, 7} <= qc_docs

    def test_tf_saturation_bounds_spam(self, result):
        # BM25's tf saturation: doc 6 (8x "hash") must NOT outrank
        # doc 0 on the multi-term query qa — doc 0 matches all three
        # terms while saturation caps the single-term spam doc
        qa = {r["doc_id"]: r["rk"] for r in result if r["query_id"] == "qa"}
        assert qa[0] < qa[6]

    def test_repeated_query_words_distinct(self, spark):
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        q1 = spark.createDataFrame(
            [("q", "hash hash hash")], "query_id string, qtext string"
        )
        q2 = spark.createDataFrame(
            [("q", "hash")], "query_id string, qtext string"
        )
        r1 = {
            (r["doc_id"], r["score_micro"])
            for r in bm25_topk(docs, q1).collect()
        }
        r2 = {
            (r["doc_id"], r["score_micro"])
            for r in bm25_topk(docs, q2).collect()
        }
        assert r1 == r2

    def test_constant_folding_parity(self):
        # the oracle writes (1.2 + 1.0) and (1.0 - 0.75); the operator
        # folds the same python doubles — both must be the IEEE results
        # the SQL engine folds to
        assert 1.2 + 1.0 == 2.2
        assert 1.0 - 0.75 == 0.25


class TestRrfFusion:
    def test_python_replay(self, spark):
        from mopso_engine.ext.retrieval import rrf_fuse

        r1 = spark.createDataFrame(
            [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)],
            "query_id string, doc_id long, rk int",
        )
        r2 = spark.createDataFrame(
            [("q", 3, 1), ("q", 4, 2), ("q", 1, 3)],
            "query_id string, doc_id long, rk int",
        )
        got = {
            r["doc_id"]: (r["rrf_micro"], r["n_systems"], r["rk"])
            for r in rrf_fuse([r1, r2], k0=60, top_k=10).collect()
        }
        c = lambda rk: 1_000_000 // (60 + rk)
        want_scores = {
            1: c(1) + c(3), 2: c(2), 3: c(3) + c(1), 4: c(2),
        }
        order = sorted(want_scores, key=lambda d: (-want_scores[d], d))
        for i, d in enumerate(order, 1):
            ns = 2 if d in (1, 3) else 1
            assert got[d] == (want_scores[d], ns, i)
        # consensus docs (1, 3) beat single-system docs
        assert got[1][2] <= 2 and got[3][2] <= 2

    def test_term_coverage_prefers_all_terms_present(self, spark):
        from mopso_engine.ext.retrieval import term_coverage_topk

        docs = spark.createDataFrame(
            [
                (1, "alpha alpha alpha alpha"),  # hammers one term
                (2, "alpha beta gamma"),         # covers all three
                (3, "beta gamma"),
            ],
            "doc_id long, text string",
        )
        q = spark.createDataFrame(
            [("q1", "alpha beta gamma")], "query_id string, qtext string"
        )
        out = {r["doc_id"]: r for r in term_coverage_topk(docs, q, top_k=3).collect()}
        assert out[2]["rk"] == 1 and out[2]["n_terms"] == 3
        assert out[1]["n_terms"] == 1

    def test_guards(self, spark):
        from mopso_engine.ext.retrieval import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([])
        df = spark.createDataFrame([("q", 1, 1)], "query_id string, doc_id long, rk int")
        with pytest.raises(ValueError):
            rrf_fuse([df], k0=0)
