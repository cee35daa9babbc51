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
    """From-scratch replay of the pinned-idf exact-rational BM25:
    idf_micro = floor(1e6*ln(...)+0.5) per term (the ONE transcendental,
    quantized before use), contribution = round_half_up(idf_micro *
    a1*tf*sdl / (a2*tf*sdl + a3*sdl + a4*dl*N)) in exact integers."""
    from mopso_engine.ext.retrieval import bm25_rational_constants

    a1, a2, a3, a4 = bm25_rational_constants(k1, b)
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
            idf_micro = math.floor(
                math.log((n - df + 0.5) / (df + 0.5) + 1.0) * 1e6 + 0.5
            )
            for i, w in docs.items():
                tf = w.count(t)
                if tf == 0:
                    continue
                num = a1 * tf * sum_dl
                den = a2 * tf * sum_dl + a3 * sum_dl + a4 * len(w) * n
                scores[i] = scores.get(i, 0) + (2 * idf_micro * num + den) // (
                    2 * den
                )
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

    def test_rational_constants(self):
        # k1=6/5, b=3/4 → a1=(6+5)*4, a2=5*4, a3=6*(4-3), a4=6*3
        from mopso_engine.ext.retrieval import bm25_rational_constants

        assert bm25_rational_constants(1.2, 0.75) == (44, 20, 6, 18)
        assert bm25_rational_constants(2.0, 0.5) == (6, 2, 2, 2)

    def test_idf_micro_table_is_pure_integer(self):
        from mopso_engine.ext.retrieval import idf_micro_table

        t = idf_micro_table({"a": 1, "b": 7}, 8)
        assert t == {
            "a": math.floor(math.log((8 - 1 + 0.5) / 1.5 + 1.0) * 1e6 + 0.5),
            "b": math.floor(math.log((8 - 7 + 0.5) / 7.5 + 1.0) * 1e6 + 0.5),
        }
        assert all(isinstance(v, int) for v in t.values())

    def test_no_transcendental_in_plan(self, spark):
        # the hashed value must not depend on an engine's libm: the
        # scoring plan may contain NO log/ln/exp — the idf rides in as a
        # pinned literal table (VERDICT r8: a 1-ulp JVM/DuckDB ln drift
        # flipped the micro-unit at a floor boundary)
        docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
        qdf = spark.createDataFrame(QUERIES, "query_id string, qtext string")
        plan = bm25_topk(docs, qdf)._jdf.queryExecution().optimizedPlan().toString()
        assert "LOG(" not in plan.upper().replace("LOGICAL", "")

    def test_decimal_arithmetic_survives_past_int64(self, spark):
        # DECIMAL(38,0) path: at 100 TB scale 2*idf*a1*tf*sum_dl blows
        # through int64 (e.g. sum_dl=2.5e13, tf=1e4 → ~6e26). Evaluate
        # the exact expression bm25_topk builds, with corpus scalars at
        # that magnitude, and check it equals the python-bigint value.
        from mopso_engine.ext.retrieval import bm25_rational_constants

        a1, a2, a3, a4 = bm25_rational_constants(1.2, 0.75)
        idf, tf, dl = 2_800_000, 10_000, 90_000
        n_docs, sum_dl = 250_000_000_000, 25_000_000_000_000
        num = a1 * tf * sum_dl
        den = a2 * tf * sum_dl + a3 * sum_dl + a4 * dl * n_docs
        assert 2 * idf * num > 2**63  # the premise: int64 is not enough
        want = (2 * idf * num + den) // (2 * den)
        row = spark.createDataFrame(
            [(idf, tf, dl)], "idf_micro long, tf long, dl long"
        ).selectExpr(
            f"CAST((2 * CAST(idf_micro AS DECIMAL(38,0)) "
            f"* (CAST({a1} AS DECIMAL(38,0)) * tf * {sum_dl}) "
            f"+ (CAST({a2} AS DECIMAL(38,0)) * tf * {sum_dl} "
            f"   + CAST({a3} AS DECIMAL(38,0)) * {sum_dl} "
            f"   + CAST({a4} AS DECIMAL(38,0)) * dl * {n_docs})) "
            f"div (2 * (CAST({a2} AS DECIMAL(38,0)) * tf * {sum_dl} "
            f"   + CAST({a3} AS DECIMAL(38,0)) * {sum_dl} "
            f"   + CAST({a4} AS DECIMAL(38,0)) * dl * {n_docs})) "
            f"AS BIGINT) AS c"
        ).first()
        assert row["c"] == want


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


class TestProximity:
    """ext.retrieval.proximity_topk — MinCover window vs a brute-force
    python replay, coverage semantics, and the term-count guard."""

    def _replay(self, corpus, queries, top_k=10):
        import re as _re

        out = {}
        for qid, qtext in queries:
            terms = sorted({t for t in _re.split(r"\s+", qtext.lower().strip()) if t})
            scored = []
            for doc_id, text in corpus:
                toks = _re.split(r"\s+", text.lower().strip())
                if not all(t in toks for t in terms):
                    continue
                best = None
                for i in range(len(toks)):
                    for j in range(i, len(toks)):
                        win = toks[i : j + 1]
                        if all(t in win for t in terms):
                            w = j - i + 1
                            best = w if best is None else min(best, w)
                            break
                scored.append((doc_id, best))
            scored.sort(key=lambda kv: (kv[1], kv[0]))
            out[qid] = [(d, w, rk + 1) for rk, (d, w) in enumerate(scored[:top_k])]
        return out

    def test_matches_bruteforce_replay(self, spark):
        from mopso_engine.ext.retrieval import proximity_topk

        corpus = [
            (0, "hash join scan table row"),            # all adjacent -> 3
            (1, "hash filter filter join x y scan"),    # spread -> 7
            (2, "scan a hash b join"),                  # -> 5
            (3, "hash join"),                           # missing scan -> absent
            (4, "scan scan hash join scan"),            # best window 3 (hash join scan)
            (5, "join hash scan join hash"),            # 3
        ]
        queries = [("qa", "hash join scan"), ("qb", "join")]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        qdf = spark.createDataFrame(queries, "query_id string, qtext string")
        got = {}
        for r in proximity_topk(docs, qdf, top_k=10).collect():
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["min_window"], r["rk"])
            )
        for k in got:
            got[k].sort(key=lambda x: x[2])
        assert got == self._replay(corpus, queries)

    def test_phrase_beats_spread(self, spark):
        from mopso_engine.ext.retrieval import proximity_topk

        docs = spark.createDataFrame(
            [
                (1, "hash join " + "x " * 50 + "scan"),
                (2, "x x hash join scan x"),
            ],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "hash join scan")], "query_id string, qtext string"
        )
        out = {r["doc_id"]: r for r in proximity_topk(docs, qdf).collect()}
        assert out[2]["rk"] == 1 and out[2]["min_window"] == 3
        assert out[1]["rk"] == 2

    def test_partial_coverage_excluded(self, spark):
        from mopso_engine.ext.retrieval import proximity_topk

        docs = spark.createDataFrame(
            [(1, "hash hash hash"), (2, "hash join")],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "hash join")], "query_id string, qtext string"
        )
        out = proximity_topk(docs, qdf).collect()
        assert [r["doc_id"] for r in out] == [2]

    def test_too_many_terms_raises_in_plan(self, spark):
        from mopso_engine.ext.retrieval import MAX_PROX_TERMS, proximity_topk

        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        big_q = " ".join(f"t{i}" for i in range(MAX_PROX_TERMS + 1))
        qdf = spark.createDataFrame(
            [("q", big_q)], "query_id string, qtext string"
        )
        with pytest.raises(Exception) as ei:
            proximity_topk(docs, qdf).collect()
        assert "distinct terms" in str(ei.value)
        with pytest.raises(ValueError):
            proximity_topk(docs, qdf, top_k=0)


class TestRetrievalEval:
    """retrieval_eval / coverage_qrels / ndcg_weights_micro."""

    def test_metrics_exact_python_replay(self, spark):
        import math

        from mopso_engine.ext.retrieval import retrieval_eval

        results = spark.createDataFrame(
            [("q1", 5, 1), ("q1", 1, 2), ("q1", 2, 3)],
            "query_id string, doc_id long, rk int",
        )
        qrels = spark.createDataFrame(
            [("q1", 1, 2), ("q1", 2, 1), ("q1", 3, 1)],
            "query_id string, doc_id long, rel int",
        )
        row = retrieval_eval(results, qrels, k=10).collect()[0]

        # from-scratch replay with independently computed weights
        w = {r: int(math.floor(1e6 / math.log2(r + 1) + 0.5)) for r in range(1, 11)}
        gain = lambda rel: (1 << rel) - 1  # noqa: E731
        dcg = gain(2) * w[2] + gain(1) * w[3]  # doc1 at rk2, doc2 at rk3
        idcg = gain(2) * w[1] + gain(1) * w[2] + gain(1) * w[3]
        assert row["n_rel"] == 3 and row["n_hits"] == 2
        assert row["recall_pm"] == (2 * 1000 * 2 + 3) // (2 * 3)
        assert row["mrr_micro"] == (2 * 1_000_000 + 2) // (2 * 2)
        assert row["ndcg_pm"] == (2 * 1000 * dcg + idcg) // (2 * idcg)

    def test_unretrieved_query_scores_zero(self, spark):
        from mopso_engine.ext.retrieval import retrieval_eval

        results = spark.createDataFrame(
            [("q1", 1, 1)], "query_id string, doc_id long, rk int"
        )
        qrels = spark.createDataFrame(
            [("q1", 1, 1), ("q2", 7, 2)],
            "query_id string, doc_id long, rel int",
        )
        out = {r["query_id"]: r for r in retrieval_eval(results, qrels).collect()}
        assert out["q1"]["recall_pm"] == 1000
        q2 = out["q2"]
        assert (
            q2["n_hits"] == 0
            and q2["recall_pm"] == 0
            and q2["mrr_micro"] == 0
            and q2["ndcg_pm"] == 0
        )

    def test_query_without_qrels_raises_in_plan(self, spark):
        from mopso_engine.ext.retrieval import retrieval_eval

        results = spark.createDataFrame(
            [("q1", 1, 1)], "query_id string, doc_id long, rk int"
        )
        qrels = spark.createDataFrame(
            [("q2", 1, 1)], "query_id string, doc_id long, rel int"
        )
        with pytest.raises(Exception) as ei:
            retrieval_eval(results, qrels).collect()
        assert "no qrel rows" in str(ei.value)

    def test_rel_grade_bounds_raise_in_plan(self, spark):
        from mopso_engine.ext.retrieval import MAX_QREL_GRADE, retrieval_eval

        results = spark.createDataFrame(
            [("q1", 1, 1)], "query_id string, doc_id long, rk int"
        )
        qrels = spark.createDataFrame(
            [("q1", 1, MAX_QREL_GRADE + 1)],
            "query_id string, doc_id long, rel int",
        )
        with pytest.raises(Exception) as ei:
            retrieval_eval(results, qrels).collect()
        assert "rel grades" in str(ei.value)
        with pytest.raises(ValueError):
            retrieval_eval(results, qrels, k=0)

    def test_coverage_qrels_grades(self, spark):
        from mopso_engine.ext.retrieval import coverage_qrels

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma pad"),   # full coverage -> rel 2
                (2, "alpha beta pad pad"),     # all but one  -> rel 1
                (3, "alpha pad pad pad"),      # sparser      -> absent
            ],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "alpha beta gamma")], "query_id string, qtext string"
        )
        out = {r["doc_id"]: r["rel"] for r in coverage_qrels(docs, qdf).collect()}
        assert out == {1: 2, 2: 1}
        with pytest.raises(ValueError):
            coverage_qrels(docs, qdf, full_rel=1, partial_rel=1)

    def test_ndcg_weights_pinned_vs_math(self):
        import math

        from mopso_engine.ext.retrieval import ndcg_weights_micro

        w = ndcg_weights_micro(25)
        assert w[1] == 1_000_000 and w[3] == 500_000 and w[7] == 333_333
        for r, m in w.items():
            assert m == int(math.floor(1e6 / math.log2(r + 1) + 0.5))
        with pytest.raises(ValueError):
            ndcg_weights_micro(0)


class TestSharedPrunedTf:
    def test_hybrid_entries_build_one_pruned_tf_pass(self, spark, monkeypatch):
        """VERDICT r13 #3 guard: every hybrid-family entry must pay the
        corpus explode ONCE — hybrid_search used to let the coverage
        retriever re-explode the corpus itself (its identified level
        drift vs the r10 birth). Counts real pruned_tf calls through
        the entry path; a second call (either retriever building its
        own) fails here before it can show up as a bench regression."""
        import mopso_engine.ext.retrieval as rt

        import __spark_entry__ as em

        calls = {"n": 0}
        real = rt.pruned_tf

        def counted(docs, queries):
            calls["n"] += 1
            return real(docs, queries)

        monkeypatch.setattr(rt, "pruned_tf", counted)
        q = em.queries()
        for name in ("hybrid_search", "hybrid_rerank", "hybrid_rerank_eval"):
            calls["n"] = 0
            q[name](spark, "/root/testdata/sf0.001").collect()
            assert calls["n"] == 1, (name, calls["n"])

    def test_observed_stats_equal_explicit_aggregate(self, spark):
        """r14: pruned_tf rides the corpus scalars (N, Σdl) on the SAME
        scan via observe() and bm25_topk reads them off the
        materializing job — a tf WITHOUT the observation (a caller-
        built table) must fall back to the explicit aggregate and
        produce IDENTICAL scores; and an all-unmatched query set
        (empty tf — AQE may skip the observed scan stage) must not
        hang on the observation."""
        from mopso_engine.ext.retrieval import PrunedTf, bm25_topk, pruned_tf

        docs = spark.createDataFrame(
            [(i, "alpha beta " + "pad " * (i % 4)) for i in range(8)],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "alpha beta")], "query_id string, qtext string"
        )
        tf = pruned_tf(docs, qdf)
        assert isinstance(tf, PrunedTf) and tf.corpus_stats is not None
        observed = sorted(map(tuple, bm25_topk(docs, qdf, tf=tf).collect()))
        # a bare tf FRAME (no PrunedTf pair) takes the explicit
        # corpus-stats fallback aggregate (ADVICE r14 contract)
        bare = pruned_tf(docs, qdf).df
        fallback = sorted(
            map(tuple, bm25_topk(docs, qdf, tf=bare).collect())
        )
        assert observed == fallback and observed
        # all-unmatched terms: empty tf, no hang, empty result
        q_none = spark.createDataFrame(
            [("q", "zzzz qqqq")], "query_id string, qtext string"
        )
        assert bm25_topk(docs, q_none).collect() == []

    def test_coverage_qrels_with_shared_tf_is_identical(self, spark):
        """Self-review: bm25_eval shares ONE pruned_tf pass between the
        retriever and the labeler — the shared-input path must be
        value-identical to the self-built path."""
        from mopso_engine.ext.retrieval import coverage_qrels, pruned_tf

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma pad"),
                (2, "alpha beta pad pad"),
                (3, "alpha pad pad pad"),
                (4, "beta gamma alpha alpha"),
            ],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "alpha beta gamma")], "query_id string, qtext string"
        )
        plain = sorted(map(tuple, coverage_qrels(docs, qdf).collect()))
        tf = pruned_tf(docs, qdf)
        shared = sorted(
            map(tuple, coverage_qrels(docs, qdf, doc_terms=tf).collect())
        )
        assert plain == shared

    def test_bm25_with_shared_tf_is_identical(self, spark):
        from mopso_engine.ext.retrieval import bm25_topk, pruned_tf

        docs = spark.createDataFrame(
            [(i, "alpha beta " + "pad " * (i % 4)) for i in range(8)],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "alpha beta")], "query_id string, qtext string"
        )
        plain = sorted(map(tuple, bm25_topk(docs, qdf).collect()))
        shared = sorted(
            map(tuple, bm25_topk(docs, qdf, tf=pruned_tf(docs, qdf)).collect())
        )
        assert plain == shared

    def test_exact_rerank_python_replay(self, spark):
        """From-scratch replay of the cross-encoder-style joint score:
        cov / capped tf_sum / first-position bonus packed
        lexicographically with the per-query (cap·|q|+1) base."""
        from mopso_engine.ext.retrieval import exact_rerank

        cap = 50
        corpus = CORPUS
        queries = QUERIES
        cand_pairs = [(q, d) for q, _ in queries for d, _ in corpus]
        docs = spark.createDataFrame(corpus, "doc_id long, text string")
        qdf = spark.createDataFrame(queries, "query_id string, qtext string")
        cand = spark.createDataFrame(
            cand_pairs + cand_pairs[:5],  # dupes must dedup
            "query_id string, doc_id long",
        )
        got = {
            (r["query_id"], r["doc_id"]): (
                r["cov"], r["tf_sum"], r["rerank_score"], r["rk"]
            )
            for r in exact_rerank(
                docs, qdf, cand, top_k=10, pos_cap=cap
            ).collect()
        }
        want = {}
        toks = {d: t.lower().strip().split() for d, t in corpus}
        for qid, qtext in queries:
            qt = sorted(set(qtext.lower().strip().split()))
            scored = []
            for d, w in toks.items():
                cov = sum(1 for t in qt if t in w)
                tfsum = sum(w.count(t) for t in qt)
                possum = sum(
                    min(w.index(t) + 1, cap) if t in w else cap for t in qt
                )
                score = (1000 * cov + min(tfsum, 999)) * (cap * len(qt) + 1) + (
                    cap * len(qt) - possum
                )
                scored.append((d, cov, min(tfsum, 999), score))
            scored.sort(key=lambda x: (-x[3], x[0]))
            for rk, (d, cov, tfs, score) in enumerate(scored[:10], 1):
                want[(qid, d)] = (cov, tfs, score, rk)
        assert got == want

    def test_exact_rerank_null_text_raises(self, spark):
        from mopso_engine.ext.retrieval import exact_rerank

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, None)], "doc_id long, text string"
        )
        qdf = spark.createDataFrame(
            [("q", "alpha")], "query_id string, qtext string"
        )
        cand = spark.createDataFrame(
            [("q", 1), ("q", 2)], "query_id string, doc_id long"
        )
        with pytest.raises(Exception) as ei:
            exact_rerank(docs, qdf, cand).collect()
        assert "NULL text" in str(ei.value)

    def test_exact_rerank_null_or_empty_qtext_raises(self, spark):
        """Self-review r13 regression: a NULL qtext used to emit
        (cov=NULL, tf_sum=999, score=NULL, rk=1) — least(NULL, 999)
        fabricated the tf — and a whitespace-only qtext scored
        everything 0; the oracle drops such queries, so the silent
        rows were also a cross-engine divergence. Both now raise."""
        from mopso_engine.ext.retrieval import exact_rerank

        docs = spark.createDataFrame(
            [(1, "alpha beta")], "doc_id long, text string"
        )
        cand = spark.createDataFrame(
            [("q", 1)], "query_id string, doc_id long"
        )
        for qtext in (None, "   "):
            qdf = spark.createDataFrame(
                [("q", qtext)], "query_id string, qtext string"
            )
            with pytest.raises(Exception) as ei:
                exact_rerank(docs, qdf, cand).collect()
            assert "empty qtext" in str(ei.value)

    def test_exact_rerank_plan_is_broadcast_map_only(self, spark):
        """The 100 TB claim: the corpus scan is pruned by BROADCAST
        joins only — no sort-merge join, no Generate/explode anywhere
        in the rerank plan (features are in-row array expressions);
        the single Exchange is the |cand|-bounded top-k window."""
        import contextlib
        import io

        from mopso_engine.ext.retrieval import exact_rerank

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(40)],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [("q", "alpha beta")], "query_id string, qtext string"
        )
        cand = spark.createDataFrame(
            [("q", i) for i in range(10)], "query_id string, doc_id long"
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            exact_rerank(docs, qdf, cand).explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" not in plan, plan
        assert "Generate" not in plan, plan
        assert plan.count("BroadcastHashJoin") >= 2, plan

    def test_generate_projection_materializes_dl_below(self, spark):
        """VERDICT r12 #2 — the round's worst regression, pinned as a
        plan shape: folding the doc-length projection into the explode
        select made Spark re-derive size(split(text)) per GENERATED
        row (bm25_search 2.7→4.3s). The fixed two-step projection must
        show in the optimized plan as: the corpus Generate's required
        child output carries the materialized ``dl`` attribute and NOT
        the raw ``text`` column, and every ``size(split`` sits BELOW
        the Generate (in its child projection), never above it.
        Lesson comment: retrieval.py pruned_tf."""
        import re

        from mopso_engine.ext.retrieval import pruned_tf

        docs = spark.createDataFrame(
            [(i, "alpha beta gamma delta") for i in range(30)],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [(1, "alpha beta")], "query_id long, qtext string"
        )
        opt = (
            pruned_tf(docs, qdf).df._jdf.queryExecution().optimizedPlan().toString()
        )
        lines = opt.splitlines()
        # the corpus-side Generate is the one with a non-empty required
        # child output list (the query-side one carries nothing)
        gen_idx, req = None, None
        for i, ln in enumerate(lines):
            m = re.search(r"Generate explode\(.*?\), \[([^\]]+)\], false", ln)
            if m:
                gen_idx, req = i, m.group(1)
                break
        assert gen_idx is not None, opt
        assert "dl#" in req, opt          # dl rides through the Generate
        assert "text#" not in req, opt    # text does NOT — no per-row rederive
        for i, ln in enumerate(lines):
            if "size(split" in ln:
                assert i > gen_idx, opt   # materialized BELOW the Generate
