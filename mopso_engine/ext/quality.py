"""Model-based document quality scoring — the learned stage after
`ext.text.quality_score`'s heuristic gate in an LLM data pipeline
(fasttext-style quality classifiers, trained on weak labels, scored
over the whole corpus).

Design for exact reproducibility, the same contract as
`ext.linalg.train_pca` / `ext.simsearch.train_codebook`:

* **Features are rounded to 6dp at the source** (the repo's oracle
  rounding convention), so the Spark featurization and the DuckDB
  featurization produce the SAME matrix bit-for-bit — which makes the
  two trainers (:func:`train_quality` on Spark, :func:`train_quality_local`
  on a parquet path via DuckDB) return IDENTICAL weights: full-batch
  gradient descent is a deterministic function of its input matrix.
* **Training reads a deterministic md5-hash sample** (join-stable,
  partition-invariant, replayable on any engine), collected to the
  driver under an explicit row cap — the model is O(features) tiny;
  the corpus never moves.
* **Scoring is one map-only codegen'd expression** (sequential dot
  product + sigmoid), zero shuffle, zero Python — at 100 TB the score
  column costs a linear scan, and the SQL oracle replays the same
  fold with the same weight literals.

Weak labels here are the repo's heuristic quality gate (length band +
vocabulary diversity): the point is the TRAIN-THEN-SCORE plumbing —
swap in human labels or an LLM-judge column and nothing else changes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mopso_engine.ext.pipeline import hash_uniform
from mopso_engine.ext.text import tokens_col

#: feature column names, in model order (after the implicit bias term)
FEATURES = ["f_logtok", "f_distinct", "f_meanlen"]

#: gradient-descent hyperparameters — FIXED so the fit is a pure
#: function of the feature matrix (both trainer twins share them)
GD_LR = 0.5
GD_ITERS = 300

#: driver-side guard for the training-sample collect
MAX_TRAIN_ROWS = 2_000_000

#: DuckDB featurization twin of :func:`quality_features` — same rounded
#: features, same weak label; ``{src}`` is a table/view/read_parquet()
#: expression with (doc_id, text). Kept here so the oracle builder and
#: the local trainer can never drift from each other.
FEATURES_SQL = r"""
    WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM {src}),
    f AS (SELECT doc_id,
                 len(t) AS n_tok,
                 round(ln(1.0 + len(t)), 6) AS f_logtok,
                 round(len(list_distinct(t))*1.0/len(t), 6) AS f_distinct,
                 round(list_sum(list_transform(t, x -> len(x)*1.0))/len(t), 6) AS f_meanlen
          FROM toks)
    SELECT doc_id, f_logtok, f_distinct, f_meanlen,
           CASE WHEN n_tok BETWEEN 20 AND 1000 AND f_distinct >= 0.5
                THEN 1 ELSE 0 END AS y
    FROM f
"""


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc model features, each rounded to 6dp AT THE SOURCE so the
    DuckDB twin (:data:`FEATURES_SQL`) reproduces the matrix exactly:
    log token count, distinct-token ratio, mean token length — plus the
    weak label ``y`` (the heuristic quality gate). Pure expressions, no
    shuffle."""
    toks = tokens_col()
    n = F.size(toks)
    f_distinct = F.round(F.size(F.array_distinct(toks)) / n, 6)
    return docs.select(
        "doc_id",
        F.round(F.log(n.cast("double") + F.lit(1.0)), 6).alias("f_logtok"),
        f_distinct.alias("f_distinct"),
        F.round(
            F.aggregate(toks, F.lit(0.0), lambda a, t: a + F.length(t)) / n, 6
        ).alias("f_meanlen"),
        F.when((n >= 20) & (n <= 1000) & (f_distinct >= 0.5), F.lit(1))
        .otherwise(F.lit(0))
        .alias("y"),
    )


def _fit_logreg(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Full-batch GD on [1|X] — deterministic: fixed init, fixed lr,
    fixed iteration count, float64 throughout. Rows are sorted by the
    caller, so the matrix (hence the fit) is partition-invariant.

    The input is forced C-contiguous first: OpenBLAS dispatches
    different gemv kernels (different reduction orders) by memory
    layout, so a column-major matrix from ``DataFrame.to_numpy`` would
    give last-ulp-different weights than the row-major twin — measured
    on this container, and exactly the kind of drift the bit-identical
    trainer contract forbids."""
    X = np.ascontiguousarray(X, dtype=np.float64)
    # standardize for GD conditioning (raw features span ~[0, 7] with
    # strong correlation — unscaled GD underfits badly in 300 steps),
    # then FOLD the affine transform back into the returned weights so
    # scoring stays a plain dot product on raw features
    mu = X.mean(axis=0)
    sd = X.std(axis=0)
    sd[sd == 0.0] = 1.0
    Xs = np.ascontiguousarray((X - mu) / sd)
    Xb = np.ascontiguousarray(np.hstack([np.ones((len(Xs), 1)), Xs]))
    w = np.zeros(Xb.shape[1], dtype=np.float64)
    m = float(len(Xb))
    for _ in range(GD_ITERS):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        w -= GD_LR * (Xb.T @ (p - y)) / m
    raw = np.empty_like(w)
    raw[1:] = w[1:] / sd
    raw[0] = w[0] - float((w[1:] * mu / sd).sum())
    return raw


def train_quality(
    docs: DataFrame, *, sample_frac: float = 0.5, salt: str = "qm"
) -> np.ndarray:
    """Fit the quality model on a deterministic hash sample of ``docs``.
    Returns weights [bias, *FEATURES]. The sample (not the corpus) is
    collected to the driver — row-capped at :data:`MAX_TRAIN_ROWS`; at
    corpus scale pick ``sample_frac`` so the sample stays ~1e6 rows
    (a quality LR saturates long before that)."""
    samp = quality_features(docs).where(hash_uniform("doc_id", salt=salt) < F.lit(sample_frac))
    # size the sample BEFORE collecting — a post-collect length check
    # cannot protect the driver from the transfer itself (review
    # finding); the count is one cheap aggregate over the same filter
    n_sample = samp.count()
    if n_sample > MAX_TRAIN_ROWS:
        raise ValueError(
            f"training sample has {n_sample} rows > {MAX_TRAIN_ROWS}; lower sample_frac"
        )
    rows = samp.select("doc_id", *FEATURES, "y").collect()
    rows.sort(key=lambda r: r["doc_id"])
    X = np.array([[r[f] for f in FEATURES] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    return _fit_logreg(X, y)


def train_quality_local(
    parquet_path: str, *, sample_frac: float = 0.5, salt: str = "qm"
) -> np.ndarray:
    """The DuckDB twin of :func:`train_quality`: same rounded features
    (:data:`FEATURES_SQL`), same hash sample, same GD — so the weights
    are bit-identical to the Spark trainer's. Used by the SQL oracle to
    retrain the model it injects as literals."""
    import duckdb

    pred = (
        "((('0x' || substr(md5(doc_id::VARCHAR || '#" + salt + "'), 1, 8))::BIGINT)::DOUBLE"
        f" / 4294967296.0) < {float(sample_frac)!r}"
    )
    sql = (
        FEATURES_SQL.format(src=f"read_parquet('{parquet_path}')")
        + f" WHERE {pred} ORDER BY doc_id"
    )
    pdf = duckdb.connect().execute(sql).fetchdf()
    X = pdf[FEATURES].to_numpy(dtype=np.float64)
    y = pdf["y"].to_numpy(dtype=np.float64)
    return _fit_logreg(X, y)


def score_expr(weights: np.ndarray) -> Column:
    """sigmoid(w·[1, features]) as ONE sequential codegen'd expression —
    the same left-to-right fold the SQL oracle replays, so the double
    is reproduced exactly before the final rounding."""
    z = F.lit(float(weights[0]))
    for wi, f in zip(weights[1:], FEATURES):
        z = z + F.lit(float(wi)) * F.col(f)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality(docs: DataFrame, weights: np.ndarray) -> DataFrame:
    """Score every document with a trained model: map-only, zero
    shuffle, no Python in the path. Output (doc_id, score, y) with the
    score rounded to 4dp (absorbs the last-ulp exp() noise across
    engines)."""
    return quality_features(docs).select(
        "doc_id", F.round(score_expr(weights), 4).alias("score"), "y"
    )
