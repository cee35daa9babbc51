import numpy as np
import pytest
from pyspark.sql import functions as F

from mopso_engine.assign import assign
from mopso_engine.objectives import (
    conn_df,
    dev_of,
    evaluate_solutions,
    knn_pairs_crossjoin,
    knn_pairs_exact,
    with_neighbors,
)
from tests.conftest import oracle_assign, oracle_conn

L = 10


def test_knn_exact_matches_crossjoin(blobs_df):
    a = {(r["id"], r["rank"]): r["nbr_id"] for r in knn_pairs_exact(blobs_df, L).collect()}
    b = {(r["id"], r["rank"]): r["nbr_id"] for r in knn_pairs_crossjoin(blobs_df, L).collect()}
    assert a == b


def test_dev_matches_oracle(blobs_df, blobs):
    _, x, _, c = blobs
    assigned = assign(blobs_df, c)
    _, dist = oracle_assign(x, c)
    assert dev_of(assigned) == pytest.approx(dist.sum(), rel=1e-9)


def test_conn_relational_matches_oracle(blobs_df, blobs):
    _, x, _, c = blobs
    cl, _ = oracle_assign(x, c)
    pairs = knn_pairs_exact(blobs_df, L)
    got = conn_df(pairs, assign(blobs_df, c)).collect()[0]["conn"]
    assert got == pytest.approx(oracle_conn(x, cl, L), rel=1e-9)


def test_evaluate_solutions_matches_oracles(blobs_df, blobs):
    _, x, _, c = blobs
    rng = np.random.default_rng(1)
    stack = np.stack([c, c + rng.normal(scale=0.5, size=c.shape)])
    nbr = with_neighbors(blobs_df, L, mode="exact")
    fit = evaluate_solutions(nbr, stack)
    for s in range(2):
        cl, dist = oracle_assign(x, stack[s])
        assert fit[s, 0] == pytest.approx(dist.sum(), rel=1e-9)
        assert fit[s, 1] == pytest.approx(oracle_conn(x, cl, L), rel=1e-9)


def test_fixed_blocks_invariant_to_batch_chunking():
    """The fitness kernel's re-chunker: block boundaries are a pure
    function of (row order, block size) — the incoming Arrow batch sizes
    must not matter (that's what keeps per-block float reductions
    config-independent), and memory never needs the whole partition."""
    import pandas as pd

    from mopso_engine.objectives import _fixed_blocks

    rows = pd.DataFrame({"a": np.arange(23), "b": np.arange(23) * 1.5})

    def chunked(sizes):
        out, i = [], 0
        for s in sizes:
            out.append(rows.iloc[i : i + s].reset_index(drop=True))
            i += s
        return out

    for sizes in ([23], [1] * 23, [3, 5, 2, 8, 5], [10, 13]):
        blocks = list(_fixed_blocks(iter(chunked(sizes)), 4))
        assert [len(b) for b in blocks] == [4, 4, 4, 4, 4, 3]
        cat = pd.concat(blocks, ignore_index=True)
        assert np.array_equal(cat["a"].to_numpy(), rows["a"].to_numpy())
        assert np.array_equal(cat["b"].to_numpy(), rows["b"].to_numpy())


def test_partition_local_mode_weighted_sum(spark, blobs):
    """Avg-compat mode: Σ_p (|p|/N)·[Dev_p, Conn_p] with partition-local kNN
    (Spark_MOPSO_Avg.scala:843-865). Verified on a 2-partition layout
    partitioned by a known key."""
    ids, x, labels, c = blobs
    n = len(x)
    rows = [(int(i), [float(v) for v in xi], int(l)) for i, xi, l in zip(ids, x, labels)]
    df = (
        spark.createDataFrame(rows, "id long, features array<double>, label int")
        .repartition(2, "label")
    )
    part_of = {
        r["id"]: r["p"]
        for r in df.select("id", F.spark_partition_id().alias("p")).collect()
    }
    nbr = with_neighbors(df, L, mode="partition_local")
    fit = evaluate_solutions(nbr, np.stack([c]), partition_weighted=True, n_total=n)
    exp_dev, exp_conn = 0.0, 0.0
    for p in set(part_of.values()):
        sel = np.array([i for i in range(n) if part_of[i] == p])
        cl, dist = oracle_assign(x[sel], c)
        w = len(sel) / n
        exp_dev += w * dist.sum()
        exp_conn += w * oracle_conn(x[sel], cl, L)
    assert fit[0, 0] == pytest.approx(exp_dev, rel=1e-9)
    assert fit[0, 1] == pytest.approx(exp_conn, rel=1e-9)


def test_pairs_based_neighbors_match_broadcast_path(blobs_df, blobs):
    """The join-based with_neighbors tail ('crossjoin' mode) must produce
    the same fitness as the broadcast-exact path."""
    _, x, _, c = blobs
    stack = np.stack([c])
    f_exact = evaluate_solutions(with_neighbors(blobs_df, 5, mode="exact"), stack)
    f_pairs = evaluate_solutions(with_neighbors(blobs_df, 5, mode="crossjoin"), stack)
    np.testing.assert_allclose(f_exact, f_pairs, rtol=1e-9)


def test_exact_mode_refuses_oversized_broadcast(blobs_df):
    with pytest.raises(ValueError, match="partition_local"):
        with_neighbors(blobs_df, 5, mode="exact", n_rows=10**9)


def test_lsh_knn_mostly_agrees_with_exact(blobs_df):
    from mopso_engine.objectives import knn_pairs_lsh

    exact = {(r["id"], r["nbr_id"]) for r in knn_pairs_exact(blobs_df, 5).collect()}
    approx = {(r["id"], r["nbr_id"]) for r in knn_pairs_lsh(blobs_df, 5).collect()}
    # approximate: demand high recall on well-separated blobs
    assert len(exact & approx) / len(exact) > 0.9


def test_knn_pairs_exact_refuses_oversized_collect(blobs_df):
    """The MAX_EXACT_KNN_ROWS guard lives in knn_pairs_exact itself — a
    direct call on a big table must fail fast, not OOM the driver."""
    with pytest.raises(ValueError, match="partition_local"):
        knn_pairs_exact(blobs_df, 5, n_rows=10**9)


def test_crossjoin_unroll_matches_fold_bitexact(blobs_df):
    """knn_pairs_crossjoin's opt-in unrolled distance (dim=) must be
    BIT-identical to the default HOF fold — the r17 settle keeps the
    fold on sample-sized callers and the unroll on the recall gate's
    big-pair arm, so the two renderings must never diverge."""
    from pyspark.sql import functions as F

    from mopso_engine.objectives import knn_pairs_crossjoin

    pts = blobs_df.where(F.col("id") < 60)
    dim = len(pts.select("features").first()["features"])
    fold = knn_pairs_crossjoin(pts, 5).collect()
    unroll = knn_pairs_crossjoin(pts, 5, dim=dim).collect()
    key = lambda r: (r["id"], r["rank"])  # noqa: E731
    fold_m = {key(r): (r["nbr_id"], r["nbr_dist"]) for r in fold}
    unroll_m = {key(r): (r["nbr_id"], r["nbr_dist"]) for r in unroll}
    assert fold_m == unroll_m  # exact equality, doubles included
