"""Pipeline-health audits: data contracts, referential integrity,
freshness.

The ops trio every long-running 100 TB ingest needs BEFORE training
consumes a snapshot: (1) row-level contract violations (a declared
invariant broken inside one table), (2) cross-table referential
orphans (a foreign key pointing at nothing — silent join loss
downstream), (3) per-stream freshness lag (a stalled source poisoning
"last N days" mixes). All three are rendered as bounded relational
movement — map-side flag expressions + tiny aggregates, or anti-join
COUNTS (never materialized orphan rows) — so the audits cost a scan,
not a pipeline.

House rules apply throughout: integer-exact outputs (epoch seconds,
violation counts), deterministic orders, raises-over-silence where a
broken input would otherwise produce a defensible-looking number.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def contract_audit(
    df: DataFrame,
    group_col: str,
    contracts: list[tuple[str, Column]],
    *,
    key_col: str | None = None,
) -> DataFrame:
    """Row-level data-contract audit: each contract is a named boolean
    Column that is TRUE when the row VIOLATES it; the readout is one
    per-group violation table — the Great-Expectations-style gate
    rendered as a single Spark aggregate.

    Movement: every contract compiles to a map-side flag inside ONE
    groupBy(``group_col``) — no per-contract scans, no row
    materialization; adding a contract adds a sum, not a pass. With
    ``key_col`` the audit also reports per-group duplicate keys
    (rows − distinct keys, the uniqueness contract) from the same
    aggregate. NULL contract evaluations count as violations — a
    contract that cannot be evaluated is not satisfied (the audit
    fails loud, never absolves by NULL).

    Returns one row per group: (group, n_rows, n_dup_keys?, then one
    ``viol_<name>`` count per contract), deterministic column order.
    """
    if not contracts:
        raise ValueError("contract_audit: need at least one contract")
    # duplicate names would emit duplicate viol_<name> columns —
    # silently breaking the deterministic-column contract and any
    # name-based downstream comparison (ADVICE r11); names shadowing
    # the fixed readout columns are rejected for the same reason
    names = [name for name, _ in contracts]
    dups = sorted({n for n in names if names.count(n) > 1})
    if dups:
        raise ValueError(f"contract_audit: duplicate contract names {dups}")
    clash = sorted(set(names) & {"n_rows", "n_dup_keys"})
    if clash:
        raise ValueError(
            f"contract_audit: contract names {clash} collide with the "
            "fixed readout columns"
        )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if key_col is not None:
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(F.col(key_col))).alias(
                "n_dup_keys"
            )
        )
    for name, cond in contracts:
        aggs.append(
            F.sum(
                F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0)
            ).alias(f"viol_{name}")
        )
    return df.groupBy(group_col).agg(*aggs)


def referential_audit(
    pairs: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Referential-integrity audit over (child → parent) foreign keys:
    for each named constraint, the CHILD row count and the count of
    child rows whose key matches NO parent — the silent-join-loss
    detector a warehouse runs before every snapshot publish.

    Each entry is (name, child_df, child_key, parent_df, parent_key).
    Movement per constraint: ONE pass over the child (column-pruned to
    the key) — a left-outer probe against the distinct'd parent keys
    (Catalyst broadcasts small parents, AQE handles the rest) folded
    straight into a (count, orphan-flag sum) aggregate, so orphan rows
    never materialize and the child is scanned exactly once. NULL
    child keys count as orphans (a NULL FK references nothing; a
    match-based probe alone would pass them silently, so the flag
    counts no-hit OR null-key).

    Returns (constraint, n_child, n_orphans) — one row per entry, in
    the given order made deterministic by sorting on constraint name.
    """
    if not pairs:
        raise ValueError("referential_audit: need at least one constraint")
    outs = []
    for name, child, ckey, parent, pkey in pairs:
        keys = child.select(F.col(ckey).alias("_fk"))
        pk = (
            parent.select(F.col(pkey).alias("_pk"))
            .where(F.col("_pk").isNotNull())
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        outs.append(
            keys.join(pk, F.col("_fk") == F.col("_pk"), "left_outer")
            .agg(
                F.count(F.lit(1)).alias("n_child"),
                # coalesce: SUM over zero rows is NULL, but an EMPTY
                # child has zero orphans, not unknown-many (review
                # finding — the oracle's COUNT subqueries say 0)
                F.coalesce(
                    F.sum(
                        F.when(
                            F.col("_fk").isNull() | F.col("_hit").isNull(), 1
                        ).otherwise(0)
                    ),
                    F.lit(0),
                ).alias("n_orphans"),
            )
            .select(
                F.lit(name).alias("constraint"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("constraint")


def freshness_audit(
    df: DataFrame,
    stream_col: str,
    ts_col: str,
    *,
    window_sec: int = 86_400,
) -> DataFrame:
    """Per-stream freshness: each stream's newest event, its lag behind
    the corpus frontier, and how many of its rows landed inside the
    frontier's trailing window — the stalled-source detector (a feed
    that died yesterday still shows healthy TOTALS; its lag and empty
    trailing window are what give it away).

    Movement: the 1-row corpus-frontier aggregate is broadcast back
    onto the scan (the decayed_topk pattern), so the trailing-window
    flag is map-side and everything folds in ONE map-side-combined
    groupBy(``stream_col``) — per-stream (n, max_epoch, trailing
    count) from a single corpus exchange of stream-count rows. Epochs
    are exact integer ``floor(epoch)`` seconds in both engines. NULL
    timestamps raise in-plan (a feed emitting NULL event time is
    broken, not fresh).

    Returns (stream, n_rows, max_epoch_s, lag_s, n_trailing) ordered
    by stream.
    """
    checked = (
        F.when(
            F.col(ts_col).isNull(),
            F.raise_error(F.lit(f"freshness_audit: NULL {ts_col}")),
        )
        .otherwise(F.floor(F.col(ts_col).cast("double")))
        .cast("long")
    )
    base = df.select(F.col(stream_col).alias("stream"), checked.alias("_ep"))
    frontier = base.agg(F.max("_ep").alias("_front"))
    per = (
        base.crossJoin(F.broadcast(frontier))
        .groupBy("stream")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("_ep").alias("max_epoch_s"),
            F.sum(
                F.when(
                    F.col("_ep") > F.col("_front") - F.lit(int(window_sec)), 1
                ).otherwise(0)
            ).alias("n_trailing"),
            F.max("_front").alias("_front"),
        )
    )
    return per.select(
        "stream",
        "n_rows",
        "max_epoch_s",
        (F.col("_front") - F.col("max_epoch_s")).alias("lag_s"),
        "n_trailing",
    ).orderBy("stream")
