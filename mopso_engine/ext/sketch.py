"""Frequency sketching: distributed Misra–Gries heavy hitters with an
exact verification pass.

The 100 TB shape is two linear scans and one candidate-bounded shuffle:

1. **Sketch scan** (map-only): every partition folds its rows into a
   Misra–Gries summary of capacity ``m`` — at most ``m`` counters,
   batch-merged with the standard reduction (subtract the (m+1)-th
   largest count, drop non-positive). Guarantee: any item whose count in
   partition *p* exceeds ``n_p/(m+1)`` survives p's summary, so any item
   with GLOBAL frequency ≥ n/(m+1) survives in at least one partition
   (averaging argument: Σf_p ≥ n/(m+1) = Σ n_p/(m+1) forces some
   f_p ≥ n_p/(m+1)). With ``m ≥ 2/min_frac`` the candidate set is a
   strict superset of every item at or above the threshold.
2. **Verify scan** (broadcast semi-join + tiny groupBy): exact counts
   for candidate items only — the shuffle carries O(partitions·m)
   candidate keys, never the corpus — then the threshold filter.

The result is therefore EXACT (identical to a full groupBy-count +
HAVING), but the full-cardinality shuffle of a naive groupBy is replaced
by a bounded one: at 100 TB a token-frequency groupBy shuffles billions
of distinct keys; sketch+verify shuffles ≤ partitions·m candidates.

Each partition also emits one null-item row carrying its row count, so
the total-count denominator rides the same scan (no separate count job).
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_reduce(counters: dict, m: int) -> None:
    """Misra–Gries reduction: keep ≤ m counters by subtracting the
    (m+1)-th largest count from all and dropping non-positive ones.
    Each element's count decreases by at most n_p/(m+1) in total."""
    if len(counters) <= m:
        return
    cut = sorted(counters.values(), reverse=True)[m]
    for k in [k for k, v in counters.items() if v - cut <= 0]:
        del counters[k]
    for k in counters:
        counters[k] -= cut


def mg_partition_sketch(items: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition Misra–Gries summaries: (item, lb) candidate rows
    plus one (NULL, n_p) row per partition carrying the partition's row
    count. Map-only — no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        n_p = 0
        for b in batches:
            s = b[col].dropna()
            n_p += len(s)
            for item, c in s.value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            _mg_reduce(counters, m)
        out = pd.DataFrame(
            {"item": list(counters) + [None], "lb": list(counters.values()) + [n_p]}
        )
        yield out.astype({"lb": "int64"})

    return items.select(F.col(col).cast("string").alias(col)).mapInPandas(
        kernel, "item string, lb long"
    )


def heavy_hitters(
    items: DataFrame, col: str, *, min_frac: float, m: int | None = None
) -> DataFrame:
    """EXACT heavy hitters: (item, n, n_total) for every item with
    count ≥ ceil(min_frac · n_total), via sketch + verify.

    ``m`` defaults to ceil(2/min_frac) — comfortably above the 1/min_frac
    recall bound, so the candidate superset provably contains every
    qualifying item and the verified output equals the full
    groupBy-count answer bit-for-bit.

    Semantics notes: the item column is canonicalized to STRING (sketch
    state is typed once; cast keys upstream if a typed result matters),
    and NULL items are excluded from both the candidates and the total —
    unlike a bare SQL GROUP BY, which would count NULL as a group.
    """
    if not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")
    if m is None:
        m = int(math.ceil(2.0 / min_frac))
    items = items.select(F.col(col).cast("string").alias(col))
    sk = mg_partition_sketch(items, col, m)
    cands = sk.where(F.col("item").isNotNull()).select(F.col("item").alias(col)).distinct()
    total = sk.where(F.col("item").isNull()).agg(F.sum("lb").alias("n_total"))
    return verify_candidates(items, cands, col, min_frac=min_frac, total=total)


def verify_candidates(
    items: DataFrame, cands: DataFrame, col: str, *, min_frac: float,
    total: DataFrame | None = None, m: int | None = None,
) -> DataFrame:
    """The EXACT-verify stage shared by the batch and streaming sketches:
    count ONLY the (broadcast) candidate items over the full corpus, then
    apply the frequency threshold. As long as ``cands`` is a superset of
    every item with count ≥ ceil(min_frac·n_total) — which both MG
    front ends guarantee by construction — the output equals the full
    groupBy-count + HAVING answer bit-for-bit. NULL items are excluded
    from the total, matching :func:`heavy_hitters` semantics. ``total``
    lets a caller pass a 1-row (n_total) frame already derived from its
    own scan (the batch sketch's per-partition census rows) instead of
    paying a second corpus count.

    The exactness contract DEPENDS on candidate completeness: the MG
    front end must have run with capacity m ≥ ceil(2/min_frac) (the
    batch sketch derives m from min_frac; the streaming sketch takes m
    from the caller). Pass the front end's ``m`` here and the pairing is
    validated — an undersized m raises instead of silently presenting an
    incomplete candidate set as the exact answer."""
    if not (0.0 < min_frac <= 1.0):
        raise ValueError("min_frac must be in (0, 1]")
    if m is not None and m < math.ceil(2.0 / min_frac):
        raise ValueError(
            f"sketch capacity m={m} < ceil(2/min_frac)={math.ceil(2.0 / min_frac)}: "
            "the candidate set is not guaranteed complete at this threshold — "
            "raise m (or min_frac) before trusting the verified output as exact"
        )
    items = items.select(F.col(col).cast("string").alias(col)).where(
        F.col(col).isNotNull()
    )
    if total is None:
        total = items.agg(F.count("*").alias("n_total"))
    counts = (
        items.join(F.broadcast(cands.select(F.col(cands.columns[0]).alias(col)).distinct()), col)
        .groupBy(col)
        .agg(F.count("*").alias("n"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("n") >= F.ceil(F.lit(float(min_frac)) * F.col("n_total")))
        .select(col, "n", "n_total")
    )


# --------------------------------------------------------------------------
# Count-Min Sketch
# --------------------------------------------------------------------------

def cms_build(
    items: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) over ``col`` —
    the frequency-estimation complement of the Misra-Gries heavy-hitter
    sketch already in this module: MG answers "which keys are heavy",
    CMS answers "roughly how often is ANY key seen" in ``depth × width``
    counters regardless of key cardinality, with one-sided error
    (estimates only OVER-count: est ≥ true, and est ≤ true + εN with
    probability 1−δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉).

    Engine-exactness: row j's bucket for key k is the repo's md5-slice
    hash of ``'j:' || k`` mod width — plain integer SQL, so the DuckDB
    oracle rebuilds the identical counter table and the estimates are
    bit-for-bit.

    100 TB shape: the depth hash rows ride ONE in-row posexplode
    (map-only); the counter build is a single (row, bucket) count
    shuffle whose OUTPUT is bounded by depth·width — the sketch, like
    the Bloom filter's word table, is collectable/broadcastable no
    matter how big the stream was. Returns (row, bucket, c).
    """
    if depth < 1 or depth > 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    if width < 2 or width > 1 << 20:
        raise ValueError(f"width must be in [2, 2^20], got {width}")
    rows = F.array(*[F.lit(j) for j in range(depth)])
    k = F.col(col).cast("string")
    return (
        items.select(k.alias("k"), F.explode(rows).alias("row"))
        .select(
            "row",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("k"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(int(width)),
            ).alias("bucket"),
        )
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for every key in ``keys``: est(k) =
    min over rows j of counter[j, bucket_j(k)]. The probe explodes the
    same depth hash rows per key and BROADCASTS the (depth·width)-row
    sketch onto them — map-only per key, one key groupBy for the min.
    A key hashing to an untouched counter (possible for keys never
    inserted) reads 0 via the left join's coalesce.

    Returns (col, est) with est ≥ the key's true insert count.
    """
    if depth < 1 or depth > 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    rows = F.array(*[F.lit(j) for j in range(depth)])
    k = F.col(col).cast("string")
    probes = keys.select(F.col(col), k.alias("_k"), F.explode(rows).alias("row")).select(
        col,
        "row",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("row").cast("string"), F.lit(":"), F.col("_k"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(int(width)),
        ).alias("bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
