"""Plan-level assertions for the round-4 analytics / vector additions —
each query's scale claim (docstring) is pinned by its physical plan."""

from __future__ import annotations

from vector_search_playground_spark.queries import analytics as A
from vector_search_playground_spark.queries import vector_search as V


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_win_range_time_single_exchange(spark, sf_smoke):
    """One shuffle on user_id; the RANGE frame itself adds no exchange."""
    plan = _plan(A.win_range_time(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "RangeFrame" in plan, plan


def test_funnel_reuses_user_partitioning(spark, sf_smoke):
    """Every aggregation and join keys on user_id: the event relation is
    exchanged on user_id, and no stage re-partitions on another data key
    (the final three scalar counts reduce to single partitions, which is
    the only non-user_id movement)."""
    plan = _plan(A.funnel_events(spark, sf_smoke))
    import re

    hash_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert hash_keys == {"user_id"}, (hash_keys, plan)


def test_gapfill_broadcasts_aggregated_side(spark, sf_smoke):
    """The spine joins the AGGREGATED hourly relation broadcast — the raw
    event stream is aggregated before any join, never joined row-wise."""
    plan = _plan(A.time_bucket_gapfill(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_knn_prefiltered_heap_and_filter_before_topk(spark, sf_smoke):
    """Top-k must plan as TakeOrderedAndProject (per-partition heaps) and
    the lang predicate must reach the documents parquet scan."""
    df = V.knn_prefiltered(spark, sf_smoke)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    spark_plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [" in spark_plan, spark_plan
    pushed = spark_plan.split("PushedFilters")
    assert any("lang" in p[:300] for p in pushed[1:]), spark_plan


def test_quantize_embed_shuffle_free_scan(spark, sf_smoke):
    """The corpus scan must stay shuffle- and join-free: the quantized
    query ships as a constant-folded literal inside the plan, and the
    top-k is TakeOrderedAndProject — no Exchange, no Join anywhere."""
    plan = _plan(V.quantize_embed(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_join_fuzzy_blocked_never_forms_pair_space(spark, sf_smoke):
    """The blocked fuzzy join must reach its candidates through equi-joins
    on segment keys — no cartesian product, no nested-loop join anywhere
    in the physical plan (the n² shape is exactly what PassJoin exists to
    avoid)."""
    from vector_search_playground_spark.queries import analytics as A

    plan = (
        A.join_fuzzy_blocked(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
