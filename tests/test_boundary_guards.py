"""Transcendental floor-boundary guards (VERDICT r8 #6).

Round 8 proved the failure class is real: `bm25_search`'s driver row went
red because a 1-ulp `ln` difference between the JVM's libm and a foreign
DuckDB build flipped a `floor(x*1e6 + 0.5)` micro-unit at a boundary.
BM25 was fixed by pinning the idf driver-side (r9); every OTHER
micro-quantized transcendental oracle is green today on both libms we
can see, but sits one libm version away from the same flake UNLESS its
corpus values keep a healthy distance from their floor boundaries.

These guards compute the exact pre-floor doubles of each operator's
quantization over the REAL sf0.01 corpus (the driver's correctness
scale) with a from-scratch python replay, and assert every value stays
farther from its boundary than any plausible cross-libm drift
(~|ln|·2^-52·1e6 ≈ 1e-8; thresholds leave 10-1000x headroom). If a
future corpus regeneration ever lands a value inside the margin, the
fix is the BM25 treatment: pin that operator's transcendental table
driver-side as literals in both engines.

Pure-python tests (pyarrow + math) — no Spark session, so the guards
are cheap enough to run every round.
"""
import math
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq
import pytest

SF_DOCS = "/root/testdata/sf0.01/documents.parquet"

#: cross-libm drift bound on floor(ln(p)*1e6+0.5): 1 ulp of ln at
#: |ln(p)| <= ~30 is ~3e-15, scaled by 1e6 -> ~3e-9. Guards assert 1e-7
#: (unigram/bigram micro-nats) and 1e-6 (KL 6dp rounding), 30-1000x above.
MICRO_DRIFT_MARGIN = 1e-7


def _docs():
    t = pq.read_table(SF_DOCS, columns=["doc_id", "text", "source"])
    return t.to_pylist()


def _tokens(text: str) -> list[str]:
    # exactly ext.text.tokens_col(): split(trim(text), '\s+') — an empty
    # trimmed text yields [''] (regex split semantics), not []
    return re.split(r"\s+", (text or "").strip())


def _int_margin(y: float) -> float:
    """Distance of y from the nearest integer — the floor(y) flip point."""
    return abs(y - round(y))


class TestUnigramLogpplBoundaries:
    def test_all_vocab_probs_clear_of_floor_boundaries(self):
        docs = _docs()
        counts = Counter(w for d in docs for w in _tokens(d["text"]))
        n_total = float(sum(len(_tokens(d["text"])) for d in docs))
        vocab_size, alpha = 1000, 0.5  # docs_logppl declared defaults
        vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
        denom = n_total + alpha * (vocab_size + 1.0)
        ps = [(c + alpha) / denom for _, c in vocab] + [alpha / denom]
        margins = [_int_margin(math.log(p) * 1e6 + 0.5) for p in ps]
        assert min(margins) > MICRO_DRIFT_MARGIN, (
            f"unigram ln(p) value within {min(margins):.2e} of a floor "
            "boundary — pin the probability table driver-side (BM25 fix)"
        )


class TestBigramLogpplBoundaries:
    def test_all_interpolated_probs_clear_of_floor_boundaries(self):
        docs = _docs()
        vocab_size, alpha, lam = 500, 0.5, 0.75  # declared defaults
        v1 = alpha * (vocab_size + 1.0)
        toks = {d["doc_id"]: _tokens(d["text"]) for d in docs}
        counts = Counter(w for t in toks.values() for w in t)
        n_total = float(sum(len(t) for t in toks.values()))
        vocab = {
            w
            for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
                :vocab_size
            ]
        }
        m = lambda w: w if w in vocab else "<oov>"
        cm = Counter(m(w) for t in toks.values() for w in t)
        p1 = {w: (c + alpha) / (n_total + v1) for w, c in cm.items()}
        c2 = Counter(
            (m(t[i - 1]), m(t[i])) for t in toks.values() for i in range(1, len(t))
        )
        ctx = defaultdict(int)
        for (a, _b), c in c2.items():
            ctx[a] += c
        margins = []
        # first-token positions score by ln(p1) alone
        for w in {m(t[0]) for t in toks.values() if t}:
            margins.append(_int_margin(math.log(p1[w]) * 1e6 + 0.5))
        # every OBSERVED pair's interpolated probability
        for (a, b), c in c2.items():
            p2 = (c + alpha) / (ctx[a] + v1)
            margins.append(
                _int_margin(math.log(lam * p2 + (1.0 - lam) * p1[b]) * 1e6 + 0.5)
            )
        assert margins
        assert min(margins) > MICRO_DRIFT_MARGIN, (
            f"bigram interpolated ln within {min(margins):.2e} of a floor "
            "boundary — pin the pair table driver-side (BM25 fix)"
        )


class TestSourceKlBoundaries:
    def test_per_source_kl_clear_of_6dp_rounding_boundaries(self):
        # source_token_kl rounds a double SUM to 6dp; the rounding flip
        # point is the half-integer of kl*1e6. Drift here is larger than
        # a single ln ulp (a |vocab|-term float sum reorders across
        # engines/partitions: ~1e-12 relative), so demand a wider berth.
        docs = _docs()
        by_src = defaultdict(Counter)
        for d in docs:
            by_src[d["source"]].update(_tokens(d["text"]))
        corpus = Counter()
        for c in by_src.values():
            corpus.update(c)
        n_corpus = sum(corpus.values())
        worst = 1.0
        for s, c in by_src.items():
            n_s = sum(c.values())
            kl = sum(
                (cs / n_s) * math.log((cs / n_s) / (corpus[w] / n_corpus))
                for w, cs in c.items()
            )
            y = kl * 1e6
            worst = min(worst, abs((y - math.floor(y)) - 0.5))
        assert worst > 1e-3, (
            f"a per-source KL sits within {worst:.2e} of a 6dp rounding "
            "boundary — quantize the per-term ln driver-side (BM25 fix)"
        )


class TestMixtureTemperatureIsSqrtExact:
    def test_declared_alpha_takes_the_correctly_rounded_sqrt_path(self, spark):
        # source_mixture_temp pins alpha=0.5, which routes through SQRT —
        # IEEE 754 REQUIRES sqrt to be correctly rounded, so the
        # quantized n^0.5 is bit-identical on every engine and needs no
        # boundary margin. The guard pins the plan: SQRT present, the
        # last-ulp-engine-dependent POWER absent.
        import __spark_entry__ as em

        df = em.queries()["source_mixture_temp"](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().optimizedPlan().toString().upper()
        assert "SQRT" in plan
        assert "POWER" not in plan and "POW(" not in plan
