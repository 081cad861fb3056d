"""Engine-wide physical-plan invariants, enforced over EVERY registered
query (SURVEY §4): no accidental cartesian products, and no row-at-a-time
Python evaluation outside the two queries that exist precisely to
demonstrate it. Catches the two easiest ways a future query silently
stops scaling."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

# stream_* execute a full streaming job on invocation (their result is a
# drained memory sink, not a lazy plan) — their plan discipline is covered
# by tests/test_streaming.py instead.
PLAN_CHECKED = sorted(
    q for q in QUERIES if not q.startswith("stream_")
)

# Row-at-a-time Python is allowed ONLY where it is the point of the query.
ROW_PYTHON_OK = {"udf_scalar", "udf_table"}

# MLlib's recommendForUserSubset deliberately cross-joins USER-FACTOR
# blocks with ITEM-FACTOR blocks (all-pairs scoring over rank-8 model
# metadata, then per-block top-k) — bounded by |factors|, never a
# data-relation cartesian. The intended shape, not an accident.
CARTESIAN_OK = {"als_recommend"}


@pytest.fixture(scope="module")
def plans(spark, sf_smoke):
    out = {}
    for qid in PLAN_CHECKED:
        df = QUERIES[qid](spark, sf_smoke)
        out[qid] = df._jdf.queryExecution().executedPlan().toString()
    return out


@pytest.mark.parametrize("qid", PLAN_CHECKED)
def test_no_cartesian_product(plans, qid):
    # BroadcastNestedLoopJoin against a broadcast-small side is the
    # intended all-pairs shape; CartesianProductExec (shuffled n×m) never is.
    if qid in CARTESIAN_OK:
        return
    assert "CartesianProduct" not in plans[qid], plans[qid]


@pytest.mark.parametrize("qid", PLAN_CHECKED)
def test_no_row_at_a_time_python(plans, qid):
    if qid in ROW_PYTHON_OK:
        return
    # Arrow-batched Python (ArrowEvalPython / MapInPandas / FlatMapGroups
    # InPandas) is the sanctioned escape hatch; BatchEvalPython is the
    # per-row pickle path and must not appear anywhere else.
    assert "BatchEvalPython" not in plans[qid], plans[qid]


def test_partition_sensitive_oracled_queries_have_layout_certificate(plans):
    """Closure over the layout-independence certificate: every ORACLED
    query whose plan evaluates Python per input partition (or mints
    layout-dependent ids) must be listed in
    tests/test_partition_independence.py's TARGETS, where it is re-run
    under an adversarial partition layout and compared value-for-value.
    Fails when a new/changed query gains a partition-sensitive plan
    without gaining the certificate (the staleness direction is covered
    by test_target_is_still_partition_sensitive over there)."""
    import __spark_entry__ as entrymod

    from tests.test_partition_independence import MARKERS, TARGETS

    oracles = entrymod.oracle_sql()
    sensitive = {
        qid
        for qid in PLAN_CHECKED
        if qid in oracles and any(m in plans[qid] for m in MARKERS)
    }
    missing = sorted(sensitive - set(TARGETS))
    assert not missing, (
        f"oracled partition-sensitive queries without a layout-independence "
        f"certificate: {missing}"
    )
