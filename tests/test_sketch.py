"""Misra–Gries heavy hitters: exactness (sketch+verify == full
groupBy-count), recall guarantee under adversarial partitioning, and the
candidate-boundedness that makes it the 100 TB shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from mopso_engine.ext.sketch import _mg_reduce, heavy_hitters, mg_partition_sketch


def _exact(rows, min_frac):
    import collections

    n = len(rows)
    c = collections.Counter(rows)
    thr = int(np.ceil(min_frac * n))
    return {(k, v, n) for k, v in c.items() if v >= thr}


def _hh(spark, rows, min_frac, parts, **kw):
    df = spark.createDataFrame([(x,) for x in rows], "item string").repartition(parts)
    out = heavy_hitters(df, "item", min_frac=min_frac, **kw)
    return {(r["item"], r["n"], r["n_total"]) for r in out.collect()}


def test_mg_reduce_caps_and_lower_bounds():
    c = {f"k{i}": i + 1 for i in range(10)}  # counts 1..10
    _mg_reduce(c, 4)
    assert len(c) <= 4
    # survivors are the largest, decremented by the (m+1)-th largest (6)
    assert c == {"k9": 4, "k8": 3, "k7": 2, "k6": 1}


def test_heavy_hitters_exact_on_zipf(spark):
    rng = np.random.default_rng(11)
    # zipf-ish: a few hot items over a long uniform tail
    rows = (
        ["hot_a"] * 400
        + ["hot_b"] * 250
        + ["warm"] * 60
        + [f"tail_{i}" for i in rng.integers(0, 2000, size=1300)]
    )
    rng.shuffle(rows)
    rows = [str(x) for x in rows]
    for frac in (0.02, 0.1):
        assert _hh(spark, rows, frac, parts=7) == _exact(rows, frac)


def test_heavy_hitters_adversarial_partitioning(spark):
    """A qualifying item spread thinly across MANY partitions must still
    be recalled (the averaging-argument guarantee): 'spread' has 5
    occurrences in each of 13 partitions — never locally dominant."""
    rows = ["spread"] * 65 + [f"noise_{i}" for i in range(900)]
    df = spark.createDataFrame([(x,) for x in rows], "item string").repartition(13)
    out = heavy_hitters(df, "item", min_frac=0.05)
    got = {r["item"]: r["n"] for r in out.collect()}
    assert got == {"spread": 65}


def test_heavy_hitters_min_m_boundary(spark):
    """With the tightest capacity (m = ceil(2/min_frac)) the guarantee
    still holds when MANY items sit exactly at the threshold."""
    rows = []
    for i in range(20):
        rows += [f"at_{i}"] * 10  # each exactly 10 = 0.05 * 200
    df = spark.createDataFrame([(x,) for x in rows], "item string").repartition(5)
    out = heavy_hitters(df, "item", min_frac=0.05)
    assert {r["item"] for r in out.collect()} == {f"at_{i}" for i in range(20)}
    assert all(r["n"] == 10 and r["n_total"] == 200 for r in out.collect())


def test_sketch_candidates_bounded(spark):
    """The map-only sketch emits ≤ m candidates + 1 count row per
    partition — the boundedness that replaces the full-cardinality
    shuffle at scale."""
    rows = [f"u{i}" for i in range(5000)]
    df = spark.createDataFrame([(x,) for x in rows], "item string").repartition(8)
    m = 25
    sk = mg_partition_sketch(df, "item", m).collect()
    cand = [r for r in sk if r["item"] is not None]
    counts = [r for r in sk if r["item"] is None]
    assert len(counts) >= 1 and sum(r["lb"] for r in counts) == 5000
    assert len(cand) <= m * len(counts)


def test_heavy_hitters_rejects_bad_frac(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "item", min_frac=0.0)


def test_heavy_hitters_empty_input(spark):
    df = spark.createDataFrame([], "item string")
    assert heavy_hitters(df, "item", min_frac=0.1).count() == 0


def test_mg_lower_bound_property():
    """Hypothesis: after any batch sequence, every surviving counter is
    a LOWER bound on the true count, and every item with true count
    > n/(m+1) survives."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import collections

    @given(
        st.lists(st.integers(0, 15), min_size=1, max_size=300),
        st.integers(2, 8),
        st.integers(1, 50),
    )
    @settings(max_examples=150, deadline=None)
    def check(xs, m, batch_size):
        counters: dict = {}
        for i in range(0, len(xs), batch_size):
            for item, c in collections.Counter(xs[i : i + batch_size]).items():
                counters[item] = counters.get(item, 0) + int(c)
            _mg_reduce(counters, m)
        true = collections.Counter(xs)
        n = len(xs)
        assert len(counters) <= m
        for k, v in counters.items():
            assert v <= true[k]  # stored is a lower bound
        for k, c in true.items():
            if c > n / (m + 1):
                assert k in counters  # the MG guarantee

    check()


def test_stream_heavy_hitters_equals_batch(spark, tmp_path):
    """Streaming MG candidates (state folded across REAL micro-batches
    via maxFilesPerTrigger=1) + exact verify == batch heavy_hitters
    bit-for-bit; state stays ≤ m counters per bucket; every emitted lb
    is a true lower bound."""
    import collections
    import random

    from pyspark.sql import functions as F

    from mopso_engine.ext.sketch import verify_candidates
    from mopso_engine.ext.streaming import (
        run_available_now,
        stream_heavy_hitter_candidates,
    )

    rng = np.random.default_rng(7)
    rows = (
        ["hot_a"] * 400
        + ["hot_b"] * 250
        + [f"t{i}" for i in rng.integers(0, 500, 600)]
    )
    random.Random(3).shuffle(rows)
    df = spark.createDataFrame([(x,) for x in rows], "item string")
    path = str(tmp_path / "items")
    df.repartition(4).write.parquet(path)  # 4 files -> 4 micro-batches
    sch = spark.read.parquet(path).schema
    src = spark.readStream.schema(sch).option("maxFilesPerTrigger", 1).parquet(path)
    m = 16
    emissions = run_available_now(
        stream_heavy_hitter_candidates(src, m=m, buckets=4),
        query_name="hh_stream_test",
        output_mode="update",
    )
    # bounded state: each (bucket, batch) emission carries <= m counters
    per_emit = emissions.groupBy("bucket", "n_bucket").count().collect()
    assert per_emit and all(r["count"] <= m for r in per_emit)
    # every emitted lb is a true lower bound (any batch's emission)
    true = collections.Counter(rows)
    for r in emissions.collect():
        assert r["lb"] <= true[r["item"]]
    # candidates' union + exact verify == the batch sketch's exact answer
    batch_items = spark.read.parquet(path)
    cands = emissions.select("item").distinct()
    got = {
        (r["item"], r["n"], r["n_total"])
        for r in verify_candidates(batch_items, cands, "item", min_frac=0.05).collect()
    }
    want = _hh(spark, rows, 0.05, 4)
    assert got == want
    assert {x[0] for x in got} == {"hot_a", "hot_b"}


def test_verify_candidates_guards(spark):
    """ADVICE r6: verify_candidates' exactness depends on the MG front
    end's capacity — an undersized caller-supplied m (the streaming
    pair) must raise instead of silently presenting an incomplete
    candidate set as exact; min_frac is validated too."""
    from mopso_engine.ext.sketch import verify_candidates

    items = spark.createDataFrame([("a",), ("b",)], "item string")
    cands = items.select("item").distinct()
    with pytest.raises(ValueError, match="min_frac"):
        verify_candidates(items, cands, "item", min_frac=0.0)
    with pytest.raises(ValueError, match="min_frac"):
        verify_candidates(items, cands, "item", min_frac=1.5)
    # m = 16 < ceil(2/0.05) = 40 -> incomplete-candidate pairing rejected
    with pytest.raises(ValueError, match="not guaranteed complete"):
        verify_candidates(items, cands, "item", min_frac=0.05, m=16)
    # a correctly-sized pairing passes through
    got = verify_candidates(items, cands, "item", min_frac=0.5, m=4).collect()
    assert {(r["item"], r["n"]) for r in got} == {("a", 1), ("b", 1)}


class TestCountMinSketch:
    """ext.sketch.cms_build / cms_estimate vs a from-scratch replay:
    identical md5 bucketing, the one-sided error contract, and the
    epsilon-N bound."""

    def _bucket(self, row, key, width):
        import hashlib

        return int(
            hashlib.md5(f"{row}:{key}".encode()).hexdigest()[:8], 16
        ) % width

    def test_matches_python_replay_exactly(self, spark):
        from collections import Counter

        from mopso_engine.ext.sketch import cms_build, cms_estimate

        data = [(k,) for k in "aabbbccccddddd" for _ in range(3)]
        df = spark.createDataFrame(data, "k string")
        depth, width = 3, 8  # tiny width FORCES collisions
        sk = {
            (r["row"], r["bucket"]): r["c"]
            for r in cms_build(df, "k", depth=depth, width=width).collect()
        }
        counts = Counter(k for k, in data)
        want_sk = Counter()
        for k, c in counts.items():
            for j in range(depth):
                want_sk[(j, self._bucket(j, k, width))] += c
        assert sk == dict(want_sk)
        est = {
            r["k"]: r["est"]
            for r in cms_estimate(
                cms_build(df, "k", depth=depth, width=width),
                df.select("k").distinct(),
                "k",
                depth=depth,
                width=width,
            ).collect()
        }
        want_est = {
            k: min(want_sk[(j, self._bucket(j, k, width))] for j in range(depth))
            for k in counts
        }
        assert est == want_est

    def test_one_sided_error_and_epsilon_bound(self, spark):
        from mopso_engine.ext.sketch import cms_build, cms_estimate
        from pyspark.sql import functions as F

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        depth, width = 4, 256
        sk = cms_build(ev, "user_id", depth=depth, width=width)
        est = cms_estimate(
            sk, ev.select("user_id").distinct(), "user_id",
            depth=depth, width=width,
        )
        exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact"))
        rows = est.join(exact, "user_id").collect()
        n_total = ev.count()
        assert rows
        # CMS error is ONE-SIDED: est >= exact for every key, always
        assert all(r["est"] >= r["exact"] for r in rows)
        # and bounded: overcount <= (e/width)*N for each row with depth
        # independent hashes (probabilistic; generous 3x slack keeps the
        # deterministic fixture safely inside)
        import math as _m

        bound = 3 * _m.e / width * n_total
        assert all(r["est"] - r["exact"] <= bound for r in rows)

    def test_guards(self, spark):
        import pytest as _pt

        from mopso_engine.ext.sketch import cms_build, cms_estimate

        df = spark.createDataFrame([("a",)], "k string")
        with _pt.raises(ValueError):
            cms_build(df, "k", depth=0)
        with _pt.raises(ValueError):
            cms_build(df, "k", width=1)
        with _pt.raises(ValueError):
            cms_estimate(df, df, "k", depth=17)
