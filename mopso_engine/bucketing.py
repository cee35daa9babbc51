"""Bucketed tables: the shuffle-free co-located fact-fact join path.

At 100 TB the dominant cost of the relational layer is the fact-fact
shuffle (orders ⋈ lineitem on orderkey; candidate-pair ⋈ corpus joins in
the dedup/ANN stack). Broadcasting handles the small side; when BOTH
sides are big, the remaining lever is physical co-location: write both
tables bucketed by the join key with the SAME bucket count, and
SortMergeJoin reads bucket i against bucket i with NO Exchange on either
side — the shuffle is paid once at write time and amortized over every
subsequent join, which is how a 100 TB fact table should be laid out
for its hot join keys (the reference has no storage layer at all; this
is the Spark-native rendering of "pre-partitioned input", cf.
Spark_MOPSO_Avg_labelPartition.scala:77-85 repartitioning by label so
downstream stages inherit the layout).

Bucket-count guidance: buckets × target-file-size ≈ table size, and the
count must MATCH across tables meant to co-join (Spark only elides the
shuffle when bucket specs line up; a mismatch falls back to a normal
exchange). ``sortBy`` the same key so the merge phase streams without
an in-memory sort.

Requires a session catalog (``saveAsTable``) — bucketing metadata lives
in the table definition, not the parquet files themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    key: str | list[str],
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) parquet table.

    Joins between tables bucketed on the same key with the same count
    skip BOTH shuffles (see module docstring); aggregations grouped by
    the bucket key skip their exchange too.
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucketing metadata (a plain
    ``spark.read.parquet`` of the same files would lose the layout and
    reintroduce the shuffle)."""
    return spark.table(table)
