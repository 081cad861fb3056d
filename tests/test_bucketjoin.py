"""join_bucketed: the bucketed layout must eliminate the join-side
shuffle AND be answer-invariant vs the plain join (oracle contract)."""

from __future__ import annotations

from vector_search_playground_spark.queries.bucketjoin import (
    join_bucketed_q,
)
from vector_search_playground_spark.registry import ORACLES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_inputs_read_buckets_without_exchange(spark, sf_smoke):
    df = join_bucketed_q(spark, sf_smoke)
    plan = _plan(df)
    assert "SortMergeJoin" in plan, plan
    # The ONLY exchanges allowed are above the join: the 5-row priority
    # rollup and the final sort. Below the join both scans must arrive
    # pre-bucketed — that is the entire point of the layout.
    join_subtree = plan[plan.index("SortMergeJoin"):]
    assert "Exchange" not in join_subtree, join_subtree
    assert "SelectedBucketsCount" in plan, plan


def test_bucketed_table_reuse_is_idempotent(spark, sf_smoke):
    # second call must re-use the catalog entry, not rebuild; value
    # equality vs the plain join is covered by the test_oracle_diff
    # sweep (join_bucketed registers an oracle like every other ID)
    assert "join_bucketed" in ORACLES
    a = join_bucketed_q(spark, sf_smoke).collect()
    b = join_bucketed_q(spark, sf_smoke).collect()
    assert a == b and len(a) == 5
