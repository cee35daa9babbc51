"""Physical-plan assertions: the optimizations SURVEY §4 promises must
actually show up in `.explain` — filter pushdown, column pruning,
broadcast joins, whole-stage codegen."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from mopso_engine.io import points_from_embeddings, read_table
from mopso_engine.ext import simsearch as ss

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def fresh_scans(spark):
    """Plan assertions need real parquet scans, not the InMemoryRelations
    other test modules may have cached for the same tables."""
    spark.catalog.clearCache()
    yield


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    df = read_table(spark, SF, "embeddings").where(F.col("vec_id") < 100)
    plan = plan_of(df)
    assert "PushedFilters" in plan
    assert "LessThan(vec_id,100)" in plan.replace(" ", "")


def test_column_pruning_q1(spark):
    li = read_table(spark, SF, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity").alias("sum_qty"))
    plan = plan_of(q)
    # scan must read only the two needed columns
    assert "l_returnflag" in plan and "l_quantity" in plan
    assert "l_partkey" not in plan and "l_extendedprice" not in plan


def test_whole_stage_codegen_on_aggregate(spark):
    li = read_table(spark, SF, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    q.collect()  # AQE finalizes the plan only on execution
    plan = q._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes are the WholeStageCodegen spans in simpleString form
    assert "*(" in plan


def test_broadcast_in_ann_bruteforce(spark):
    emb = read_table(spark, SF, "embeddings")
    plan = plan_of(ss.cosine_topk_bruteforce(emb, [0, 1], k=3))
    assert "Broadcast" in plan  # query side ships as a broadcast


def test_small_dim_join_is_broadcast(spark):
    n = read_table(spark, SF, "nation")
    c = read_table(spark, SF, "customer")
    plan = plan_of(c.join(n, c.c_nationkey == n.n_nationkey))
    assert "BroadcastHashJoin" in plan


def test_points_projection_prunes_label(spark):
    pts = points_from_embeddings(spark, SF).select("id", "features")
    plan = plan_of(pts)
    assert "label" not in plan


def test_neardup_blocked_has_no_cartesian_product(spark):
    """VERDICT r1 #2: emb_neardup must be bucketed equality joins, never an
    all-pairs cross product."""
    emb = read_table(spark, SF, "embeddings")
    plan = plan_of(ss.cosine_neardup_pairs(emb, threshold=0.4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
