"""Plan-level assertions for the relational core — guard the physical
plans that make these queries scale, the way tests/test_knn.py guards
TakeOrderedAndProject for the flagship (SURVEY.md §5.5)."""

from __future__ import annotations

from vector_search_playground_spark.queries import relational as R


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_broadcast_plans_broadcast_hash_join(spark, sf_smoke):
    plan = _plan(R.join_broadcast(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, plan


def test_filter_pred_pushes_to_scan(spark, sf_smoke):
    df = R.filter_pred(spark, sf_smoke)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "PushedFilters: [" in plan, plan
    # at least the plain-column predicates reach the parquet reader
    assert "l_linestatus" in plan.split("PushedFilters")[1][:400], plan


def test_sort_limit_plans_take_ordered(spark, sf_smoke):
    for q in (R.sort_multi, R.limit_n):
        plan = _plan(q(spark, sf_smoke))
        assert "TakeOrderedAndProject" in plan, plan


def test_semi_anti_plan_shapes(spark, sf_smoke):
    assert "LeftSemi" in _plan(R.join_semi(spark, sf_smoke))
    assert "LeftAnti" in _plan(R.join_anti(spark, sf_smoke))


def test_scan_parquet_prunes_columns(spark, sf_smoke):
    # project_content-style pruning: fn_string reads documents but must not
    # scan the embedding-sized text of other tables; check ReadSchema is
    # restricted to the referenced columns.
    df = R.fn_cond(spark, sf_smoke)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    read = plan.split("ReadSchema:")[1]
    assert "c_acctbal" in read and "c_name" not in read, read


def test_agg_approx_is_self_checking(spark, sf_correct):
    """Round-5: the result row itself carries (approx, exact, rel_err,
    within_bound) so the driver's rows-only check pins accuracy; the
    in-query 5% bound must hold with the 0.01-rsd sketch."""
    from vector_search_playground_spark.sources import load_table

    row = R.agg_approx(spark, sf_correct).first()
    exact = (
        load_table(spark, sf_correct, "events").select("user_id").distinct().count()
    )
    assert row["exact_users"] == exact
    assert row["within_bound"], row
    assert row["rel_err"] < 0.05


def test_asof_join_is_join_free(spark, sf_smoke):
    """The as-of implementation must not contain any join operator — it is
    a union + window, one shuffle by user_id."""
    plan = _plan(R.join_asof(spark, sf_smoke))
    assert "Join" not in plan, plan
    assert "Union" in plan and "Window" in plan, plan


def test_agg_hll_merge_bounds_and_merged_row(spark, sf_correct):
    """Round-5: per-group HLL estimates and the sketch-union __merged__
    row must all sit inside the in-query 5% bound, and the merged row's
    estimate must come from sketch bytes (present exactly once)."""
    rows = R.agg_hll_merge(spark, sf_correct).collect()
    assert sum(r["event_type"] == "__merged__" for r in rows) == 1
    assert all(r["within_bound"] for r in rows), rows


def test_quantile_sketch_rank_error_bound(spark, sf_correct):
    """Round-5: the GK sketch's contract is rank error ≤ n/accuracy —
    asserted per probed quantile, against an exactly-measured rank."""
    rows = R.quantile_sketch(spark, sf_correct).collect()
    assert {r["quantile"] for r in rows} == {0.5, 0.9, 0.99}
    assert all(r["within_bound"] for r in rows), rows


def test_join_nearest_join_free_single_exchange(spark, sf_smoke):
    """The nearest-event join must stay join-free like its as-of twins:
    union + two opposite-order windows sharing ONE user_id exchange —
    never the per-user pair product the oracle states."""
    import re

    plan = _plan(R.join_nearest(spark, sf_smoke))
    assert "Join" not in plan, plan
    assert "Union" in plan and "Window" in plan, plan
    hash_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert hash_keys == {"user_id"}, (hash_keys, plan)


def test_join_nearest_dominates_both_directions(spark, sf_smoke):
    """For every purchase, the picked click is at least as close as both
    the backward as-of answer and the forward as-of answer."""
    near = {r["event_id"]: r for r in R.join_nearest(spark, sf_smoke).collect()}
    back = {r["event_id"]: r["click_us"] for r in R.join_asof(spark, sf_smoke).collect()}
    fwd = {r["event_id"]: r["click_us"] for r in R.join_asof_fwd(spark, sf_smoke).collect()}
    assert set(near) == set(back) == set(fwd)
    for eid, r in near.items():
        cands = [c for c in (back[eid], fwd[eid]) if c is not None]
        if not cands:
            assert r["click_us"] is None
            continue
        best = min(abs(c - r["purchase_us"]) for c in cands)
        assert abs(r["click_us"] - r["purchase_us"]) == best
