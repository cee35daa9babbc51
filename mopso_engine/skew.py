"""Skew mitigation: explicit salting for hot join keys.

AQE's skew-join splitting (on in ``session.build_session``) handles most
runtime imbalance; explicit salting remains the lever when (a) AQE is
off or can't see the skew (e.g. the hot key materializes mid-pipeline),
or (b) a single key is so hot that even a split partition's build side
overflows. The classic rendering: give every big-side row a random salt
in [0, buckets), replicate the small side once per salt value, and join
on (key, salt) — the hot key's rows now spread over ``buckets``
partitions instead of one.

Correctness note: the join RESULT is invariant to the salt values (each
big-side row still meets every small-side row of its key, exactly once),
so a task retry re-randomizing salts cannot change the output — the salt
only chooses WHERE the row is processed. A seeded ``rand`` keeps runs
reproducible anyway.

The cost is deliberate: the small side inflates ×buckets. Size
``buckets`` to the skew (hot-key rows / target partition rows), not to
the cluster.

For AGGREGATION skew no helper is needed: Spark's hash aggregate already
partial-aggregates map-side, so a hot group contributes one row per task
to the shuffle (the two-phase "salted aggregation" trick is built in).
Salting only matters where partials can't fold — collect_list-style
holistic aggregates or the join above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    buckets: int = 8,
    seed: int = 42,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the big side salted over
    ``buckets`` partitions per key (see module docstring).

    ``small`` is replicated ×buckets via a literal-array explode (no
    extra scan); both sides then hash-join on (*on, __salt). Supports
    'inner' and 'left' joins (right/full would need the salt on the
    other side)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn("__salt", F.floor(F.rand(seed) * buckets).cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return b.join(s, on=[*keys, "__salt"], how=how).drop("__salt")
