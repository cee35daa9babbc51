import numpy as np
import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = (
        SparkSession.builder.master("local[4]")
        .appName("mopso-engine-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", "4g")
        .config("spark.ui.enabled", "false")
        # bucketed-table tests saveAsTable; keep the warehouse out of the repo
        .config("spark.sql.warehouse.dir", tempfile.mkdtemp(prefix="mopso-warehouse-"))
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s
    s.stop()


def make_blobs(n=300, d=4, k=3, seed=7, spread=0.3, sep=10.0):
    """FIXTURES.md F1 points_blobs_small-style labeled gaussian blobs.

    Returns (ids, X, labels 1-based, true_centers)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-1, 1, size=(k, d)) * sep
    labels = rng.integers(0, k, size=n)
    x = centers[labels] + rng.normal(scale=spread, size=(n, d))
    return np.arange(n, dtype=np.int64), x, (labels + 1).astype(np.int32), centers


@pytest.fixture(scope="session")
def blobs():
    return make_blobs()


@pytest.fixture(scope="session")
def blobs_df(spark, blobs):
    ids, x, labels, _ = blobs
    rows = [(int(i), [float(v) for v in xi], int(l)) for i, xi, l in zip(ids, x, labels)]
    return spark.createDataFrame(rows, "id long, features array<double>, label int").cache()


def oracle_assign(x: np.ndarray, centers: np.ndarray):
    """Literal re-implementation of the reference assignment
    (Spark_MOPSO_Avg.scala:660-675): sequential-fold distance + first-min."""
    d = np.sqrt(((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2))
    cl = d.argmin(axis=1)
    return cl + 1, d[np.arange(len(x)), cl]


def oracle_conn(x: np.ndarray, clusters: np.ndarray, l_nbrs=10):
    """Literal Conn (Spark_MOPSO_Avg.scala:1036-1063): for each point, L
    nearest others by distance; +1/rank for same-cluster neighbors."""
    n = len(x)
    d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(axis=2))
    np.fill_diagonal(d, np.inf)
    total = 0.0
    for i in range(n):
        order = np.argsort(d[i], kind="stable")[:l_nbrs]
        for rank, j in enumerate(order, start=1):
            if clusters[j] == clusters[i]:
                total += 1.0 / rank
    return total
