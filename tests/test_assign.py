import numpy as np
import pytest

from mopso_engine.assign import assign, assign_all_solutions, assign_expr, assign_with_labels
from tests.conftest import oracle_assign


@pytest.fixture(scope="module")
def centers(blobs):
    _, _, _, true_centers = blobs
    return np.sort(true_centers, axis=0)[: len(true_centers)]  # any fixed (k,d)


def test_assign_matches_numpy_oracle(blobs_df, blobs):
    _, x, _, c = blobs
    got = {r["id"]: (r["cluster"], r["dist"]) for r in assign(blobs_df, c).collect()}
    cl, dist = oracle_assign(x, c)
    for i in range(len(x)):
        assert got[i][0] == cl[i]
        assert got[i][1] == pytest.approx(dist[i], rel=1e-9)


def test_assign_expr_matches_pandas_kernel(blobs_df, blobs):
    _, x, _, c = blobs
    a = {r["id"]: (r["cluster"], r["dist"]) for r in assign(blobs_df, c).collect()}
    b = {r["id"]: (r["cluster"], r["dist"]) for r in assign_expr(blobs_df, c).collect()}
    assert a.keys() == b.keys()
    for i in a:
        assert a[i][0] == b[i][0]
        assert a[i][1] == pytest.approx(b[i][1], rel=1e-9)


def test_assign_tie_breaks_to_first_center(spark):
    # degenerate duplicate centers (FIXTURES.md F2): first minimum wins (minBy)
    df = spark.createDataFrame([(0, [0.0, 0.0], 1)], "id long, features array<double>, label int")
    c = np.array([[1.0, 0.0], [1.0, 0.0], [5.0, 5.0]])
    row = assign(df, c).collect()[0]
    assert row["cluster"] == 1


def test_assign_all_solutions_consistent(blobs_df, blobs):
    _, x, _, c = blobs
    rng = np.random.default_rng(0)
    stack = np.stack([c, c + rng.normal(scale=0.1, size=c.shape), c * 0.5])
    multi = assign_all_solutions(blobs_df, stack).collect()
    for s in range(3):
        single = {r["id"]: (r["cluster"], r["dist"]) for r in assign(blobs_df, stack[s]).collect()}
        got = {r["id"]: (r["cluster"], r["dist"]) for r in multi if r["solution"] == s}
        assert got.keys() == single.keys()
        for i in got:
            assert got[i][0] == single[i][0]
            assert got[i][1] == pytest.approx(single[i][1], rel=1e-9)


def test_assign_with_labels_keeps_label(blobs_df, blobs):
    _, _, labels, c = blobs
    rows = assign_with_labels(blobs_df, c).collect()
    assert len(rows) == len(labels)
    by_id = {r["id"]: r["label"] for r in rows}
    for i, l in enumerate(labels):
        assert by_id[i] == l
