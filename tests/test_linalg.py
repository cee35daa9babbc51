"""ext.linalg (distributed covariance) + ext.text TF-IDF / PMI tests:
numpy / hand-computed oracles over tiny in-memory data, plus the
plan-shape guarantee that the covariance never explodes row-wise."""

import math

import numpy as np
import pytest

from pyspark.sql import Row

from mopso_engine.ext.linalg import (
    derive_scale_log2,
    embedding_covariance,
    embedding_covariance_gated,
    gram_partials_quantized,
)
from mopso_engine.ext.text import pmi_bigrams, tfidf_top_terms


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(11)
    x = rng.normal(size=(257, 8)).astype(np.float32)  # odd n: uneven batches
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
    )
    got = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb, dims=5).collect()}
    ref = np.cov(x[:, :5].astype(np.float64), rowvar=False, bias=True)
    assert len(got) == 15  # upper triangle of 5x5
    for (i, j), v in got.items():
        assert i <= j
        assert v == pytest.approx(ref[i, j], abs=2e-6)


def test_covariance_single_scan_plan(spark):
    """The three combine branches (n_tot / sx / sxx) must share ONE
    partial-cell exchange: the plan shows ReusedExchange, so the
    mapInPandas vector scan runs once, not three times."""
    import contextlib
    import io

    rng = np.random.default_rng(3)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in rng.normal(size=4)]) for i in range(64)]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        embedding_covariance(emb, dims=4).explain("formatted")
    plan = buf.getvalue()
    # formatted explain lists each physical op twice (tree + detail
    # section): ≤2 occurrences ⇒ exactly one MapInPandas instance. The
    # branched rendering this guards against shows 4 instances (8 hits).
    assert plan.count("MapInPandas") <= 2


def test_covariance_gated_matches_numpy_int_sums(spark):
    """The quantized gate's int64 statistics must equal exact numpy int64
    sums of the same quantization, and cov_ok must be true everywhere
    (the float operator sits well inside the band)."""
    rng = np.random.default_rng(7)
    x = rng.uniform(-0.9, 0.9, size=(257, 6)).astype(np.float32)  # odd n: ragged batches
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
    )
    d = 5
    rows = embedding_covariance_gated(emb, dims=d).collect()
    assert len(rows) == 15
    k = derive_scale_log2(257)
    q = np.floor(x[:, :d].astype(np.float64) * float(1 << k) + 0.5).astype(np.int64)
    sq = q.sum(axis=0)
    sqq = q.T @ q
    for r in rows:
        i, j = r["i"], r["j"]
        assert i <= j
        assert r["n"] == 257
        assert r["sx_i"] == int(sq[i])
        assert r["sx_j"] == int(sq[j])
        assert r["sxx"] == int(sqq[i, j])
        assert r["cov_ok"] is True


def test_derive_scale_overflow_envelope():
    """Exact integer derivation: n·2^(2k) must stay ≤ 2^61, k capped at
    22, and corpora too big for the int64 floor fail loudly."""
    for n in [1, 2, 131072, 131073, 1 << 30, (1 << 35)]:
        k = derive_scale_log2(n)
        assert n * (1 << (2 * k)) <= 1 << 61
        assert k <= 22
        # maximality: one more bit of scale would overflow (unless capped)
        if k < 22:
            assert n * (1 << (2 * (k + 1))) > 1 << 61
    assert derive_scale_log2(131072) == 22  # boundary: exactly 2^61
    assert derive_scale_log2(131073) == 21
    with pytest.raises(ValueError, match="decimal"):
        derive_scale_log2(1 << 40)  # needs k<13 -> int64 insufficient
    with pytest.raises(ValueError):
        derive_scale_log2(0)


def test_quantized_kernel_rejects_nonfinite_and_out_of_bound(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    bad = spark.createDataFrame(
        [Row(vec_id=0, embedding=[0.1, float("nan")]), Row(vec_id=1, embedding=[0.2, 0.3])]
    )
    with pytest.raises((PythonException, Py4JJavaError), match="non-finite"):
        gram_partials_quantized(bad, dims=2).collect()
    big = spark.createDataFrame([Row(vec_id=0, embedding=[0.1, 5.0])])
    with pytest.raises((PythonException, Py4JJavaError), match="x_bound"):
        gram_partials_quantized(big, dims=2).collect()


def test_covariance_gated_empty_input_fails_closed(spark):
    """cov_ok on missing statistics must be FALSE, never NULL (Spark
    three-valued logic would let an indeterminate gate pass)."""
    from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("embedding", ArrayType(FloatType()))]
    )
    empty = spark.createDataFrame([], schema)
    rows = embedding_covariance_gated(empty, dims=3, scale=1 << 22).collect()
    assert all(r["cov_ok"] is False for r in rows)
    # ADVICE r5: the DEFAULT scale must also fail closed on an empty
    # corpus (derive from count would raise n >= 1) — same gate rows,
    # no extra args needed
    rows_default = embedding_covariance_gated(empty, dims=3).collect()
    assert len(rows_default) == 6
    assert all(r["cov_ok"] is False for r in rows_default)


def test_derive_combine_plan_escalates_to_decimal():
    """derive_combine_plan: int64 with the count-derived scale while
    representable; past ~2^35 rows, decimal(38,0) at full 2^22 relative
    resolution instead of an error."""
    from mopso_engine.ext.linalg import derive_combine_plan

    k, combine = derive_combine_plan(257)
    assert combine == "int64" and k == derive_scale_log2(257)
    k, combine = derive_combine_plan(1 << 40)
    assert combine == "decimal" and k == 22
    k, combine = derive_combine_plan(1 << 40, 3)
    assert combine == "decimal" and k == 19  # relative resolution preserved
    with pytest.raises(ValueError):
        derive_combine_plan(0)


def test_covariance_gated_decimal_path_matches_numpy_int_oracle(spark):
    """VERDICT r5 #8: the decimal(38,0) combine must reproduce the exact
    numpy int sums of the same quantization — the overflow-regime
    degradation is exact-decimal, not approximate."""
    rng = np.random.default_rng(13)
    x = rng.uniform(-0.9, 0.9, size=(101, 4)).astype(np.float32)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
    )
    d = 4
    rows = embedding_covariance_gated(emb, dims=d, scale=1 << 22, combine="decimal").collect()
    assert len(rows) == 10
    q = np.floor(x[:, :d].astype(np.float64) * float(1 << 22) + 0.5).astype(np.int64)
    sq = q.sum(axis=0)
    sqq = q.T @ q
    for r in rows:
        i, j = r["i"], r["j"]
        assert int(r["n"]) == 101
        assert int(r["sx_i"]) == int(sq[i])
        assert int(r["sx_j"]) == int(sq[j])
        assert int(r["sxx"]) == int(sqq[i, j])
        assert r["cov_ok"] is True


def test_quantized_kernel_chunked_emits_are_exact(spark):
    """Chunked partial emission (the per-emit int64 safety valve of the
    decimal regime) must not change the combined statistics: tiny
    chunk_rows forces many emits per batch, totals still exact."""
    rng = np.random.default_rng(17)
    x = rng.uniform(-0.9, 0.9, size=(67, 3)).astype(np.float32)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(v) for v in row]) for i, row in enumerate(x)]
    )
    parts = gram_partials_quantized(emb, dims=3, scale=1 << 20, chunk_rows=8).collect()
    assert len(parts) >= math.ceil(67 / 8)  # forced multiple emits
    total = np.sum([np.asarray(r["p"], dtype=np.int64) for r in parts], axis=0)
    q = np.floor(x.astype(np.float64) * float(1 << 20) + 0.5).astype(np.int64)
    expect = np.concatenate(([67], q.sum(axis=0), (q.T @ q).ravel()))
    assert (total == expect).all()


def test_tfidf_hand_oracle(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="apple banana apple"),
            Row(doc_id=2, text="banana cherry"),
            Row(doc_id=3, text="cherry cherry cherry"),
        ]
    )
    out = {
        (r["doc_id"], r["term"]): (r["tf"], r["tfidf"], r["rk"])
        for r in tfidf_top_terms(docs, top_n=2).collect()
    }
    n = 3

    def idf(df):
        return math.log((n + 1.0) / (df + 1.0)) + 1.0

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, "apple")][0] == 2
    assert out[(1, "apple")][1] == pytest.approx(round(2 * idf(1), 6), abs=1e-9)
    assert out[(1, "apple")][2] == 1
    assert out[(1, "banana")][2] == 2
    # doc 3: only one distinct term
    assert out[(3, "cherry")][0] == 3
    assert (3, "cherry") in out and len([k for k in out if k[0] == 3]) == 1


def test_pmi_hand_oracle(spark):
    # 'a b' appears 3x, tokens: a=3, b=3, total=6; bigrams: 'a b' 3 of 3
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="a b") for i in range(3)]
    )
    rows = pmi_bigrams(docs, min_count=2, top_n=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["w1"], r["w2"], r["c_ab"]) == ("a", "b", 3)
    # PMI = ln((3*6*6)/(3*3*3)) = ln(4)
    assert r["pmi"] == pytest.approx(round(math.log(4.0), 6), abs=1e-9)


def test_pmi_min_count_filters(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="x y"), Row(doc_id=2, text="p q p q")]
    )
    got = {(r["w1"], r["w2"]) for r in pmi_bigrams(docs, min_count=2, top_n=10).collect()}
    # 'x y' occurs once -> filtered; 'p q' twice, 'q p' once
    assert got == {("p", "q")}


class TestPCA:
    def test_trainer_twins_bit_identical(self, spark):
        from mopso_engine.ext.linalg import train_pca, train_pca_local

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        m1, c1 = train_pca(emb, dims=16, n_components=2)
        m2, c2 = train_pca_local(
            "/root/testdata/sf0.001/embeddings.parquet", dims=16, n_components=2
        )
        assert (m1 == m2).all() and (c1 == c2).all()  # BIT-identical

    def test_projection_matches_numpy(self, spark):
        import numpy as np

        from mopso_engine.ext.linalg import pca_project, train_pca

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        mean, comps = train_pca(emb, dims=16, n_components=2)
        got = {
            (r["vec_id"], r["comp"]): r["value"]
            for r in pca_project(emb.limit(50), mean, comps, round_dp=None).collect()
        }
        rows = emb.limit(50).select("vec_id", "embedding").collect()
        for r in rows:
            x = np.asarray(r["embedding"], dtype=np.float64)[:16]
            for c in range(2):
                exp = float(x @ comps[c] - mean @ comps[c])
                assert got[(r["vec_id"], c)] == pytest.approx(exp, abs=1e-9)

    def test_components_orthonormal_and_sign_normalized(self, spark):
        import numpy as np

        from mopso_engine.ext.linalg import train_pca

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        _, comps = train_pca(emb, dims=16, n_components=3)
        assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
        for c in comps:
            assert c[int(np.argmax(np.abs(c)))] > 0

    def test_projection_plan_is_map_only(self, spark):
        from mopso_engine.ext.linalg import pca_project, train_pca

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        mean, comps = train_pca(emb, dims=16, n_components=2)
        plan = pca_project(emb, mean, comps)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle: projection is map-only

    def test_train_pca_guards_oversized_sample(self, spark):
        from mopso_engine.ext.linalg import train_pca

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        with pytest.raises(ValueError, match="max_sample_rows"):
            train_pca(emb, dims=16, n_components=2, max_sample_rows=10)


class TestRandomProjection:
    def test_python_replay_and_jl_distance_preservation(self, spark):
        import hashlib
        import math

        import numpy as np

        from mopso_engine.ext.linalg import rademacher_signs, random_projection

        rng = np.random.default_rng(5)
        X = rng.normal(size=(40, 32)).astype(np.float32)
        rows = [(i, [float(x) for x in X[i]]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = random_projection(df, out_dim=24, salt="rp").collect()
        got = {}
        for r in out:
            got.setdefault(r["vec_id"], {})[r["j"]] = r["out_micro"]

        # from-scratch replay: md5 signs + integer matmul
        S = np.empty((24, 32), dtype=np.int64)
        for j in range(24):
            for i in range(32):
                h = int(hashlib.md5(f"rp_{j}_{i}".encode()).hexdigest()[:8], 16)
                S[j, i] = 1 if h % 2 == 0 else -1
        assert (S == rademacher_signs(24, 32)).all()
        Q = np.floor(X.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
        P = Q @ S.T
        for i in range(40):
            assert [got[i][j] for j in range(24)] == list(P[i])

        # JL sanity: projected pairwise distances (scaled by 1e6*sqrt(k))
        # approximate the originals within a loose factor
        Pn = P.astype(np.float64) / (1e6 * math.sqrt(24))
        for a, b in [(0, 1), (2, 3), (10, 30)]:
            d_true = np.linalg.norm(X[a].astype(np.float64) - X[b].astype(np.float64))
            d_proj = np.linalg.norm(Pn[a] - Pn[b])
            assert 0.4 * d_true < d_proj < 2.2 * d_true

    def test_guards(self, spark):
        import pytest as _pytest

        from mopso_engine.ext.linalg import random_projection

        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        with _pytest.raises(ValueError):
            random_projection(df, out_dim=0)
        with _pytest.raises(ValueError):
            random_projection(df, out_dim=4)  # empty -> cannot probe dim


class TestCentroidMatrix:
    def test_python_replay_and_separated_fixture(self, spark):
        import itertools
        import math

        import numpy as np

        from mopso_engine.ext.linalg import centroid_separation_matrix

        rng = np.random.default_rng(13)
        # 3 classes: 0 and 1 nearly aligned centroids, 2 orthogonal-ish
        base = {0: np.array([5.0, 0.1, 0.0, 0.0]),
                1: np.array([5.0, 0.2, 0.0, 0.0]),
                2: np.array([0.0, 0.0, 4.0, 1.0])}
        rows = []
        i = 0
        for lbl, c in base.items():
            for _ in range(20):
                v = c + rng.normal(scale=0.05, size=4)
                rows.append((i, [float(x) for x in v], lbl))
                i += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
        got = {
            (r["label_a"], r["label_b"]): r["cos_6"]
            for r in centroid_separation_matrix(df).collect()
        }
        # exact replay on quantized sums
        sums = {}
        for _, v, lbl in rows:
            q = np.floor(np.array(v, dtype=np.float64) * 1e6 + 0.5).astype(np.int64)
            sums[lbl] = sums.get(lbl, np.zeros(4, dtype=np.int64)) + q
        for a, b in itertools.combinations(sorted(sums), 2):
            dot = int((sums[a].astype(object) * sums[b].astype(object)).sum())
            na2 = int((sums[a].astype(object) ** 2).sum())
            nb2 = int((sums[b].astype(object) ** 2).sum())
            want = round(dot / (math.sqrt(na2) * math.sqrt(nb2)), 6)
            assert got[(a, b)] == pytest.approx(want, abs=1e-9)
        # the near-aligned pair reads ~1, the separated pairs clearly lower
        assert got[(0, 1)] > 0.99
        assert got[(0, 2)] < 0.5 and got[(1, 2)] < 0.5
