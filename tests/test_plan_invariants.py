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

# Queries whose plan is ALLOWED a Sort/Window directly over an
# Exchange SinglePartition: each windows a relation that is BOUNDED by
# construction (audited via tools/plan_audit.py --dump, round 10), so
# the single task holds metadata, never the corpus. A final HashAggregate
# merge over SinglePartition (the common case) is always fine — only
# Sort/Window consumers are gated here.
SINGLE_PARTITION_SORT_OK = {
    # |resamples| rows: the B-row bootstrap sum relation (B = 1000)
    "bootstrap_ci",
    # |days| rows: daily CUSUM series
    "changepoint_cusum",
    # |cat_a|x|cat_b| rows: the contingency-cell relation
    "corr_categorical",
    # |distinct degrees| rows: distribution support, not the edge list
    "degree_distribution",
    # |hash buckets| rows (1024): the DSIR model table
    "dsir_weights",
    # |days| rows: per-day minimum-price thresholds
    "pareto_frontier",
    # |days| rows: calendar day spine
    "running_distinct",
    # |distinct durations| rows: calendar-bounded KM table
    "survival_km",
    # 10 rows: the decile spine
    "vocab_growth",
}


def _single_partition_sort_window(plan: str) -> list[str]:
    """Op names of every Sort/Window that DIRECTLY consumes an
    Exchange SinglePartition (nearest ancestor by tree indentation)."""
    import re

    def indent(line: str) -> int:
        m = re.match(r"^[\s:+\-*()0-9]*", line)
        return len(m.group(0)) if m else 0

    lines = plan.splitlines()
    hits = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        my = indent(line)
        for j in range(i - 1, -1, -1):
            if indent(lines[j]) < my:
                m = re.search(r"([A-Za-z][A-Za-z0-9]+)", lines[j])
                op = m.group(1) if m else ""
                if op in ("Sort", "Window"):
                    hits.append(op)
                break
    return hits


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


@pytest.mark.parametrize("qid", PLAN_CHECKED)
def test_no_unbounded_single_partition_sort_or_window(plans, qid):
    """A Sort or Window consuming an Exchange SinglePartition runs the
    whole relation on ONE task — the easiest way for a query to stop
    scaling while staying correct. Allowed only where the exchanged
    relation is bounded by construction (audited allowlist above);
    everything data-sized must use a partitioned window or the shared
    bucketed two-pass prefix sum (operators/prefix.bucketed_cumsum —
    see mannwhitney_u's round-10 fix for the template)."""
    hits = _single_partition_sort_window(plans[qid])
    if qid in SINGLE_PARTITION_SORT_OK:
        assert hits, (
            f"{qid} is allowlisted for a single-partition Sort/Window but "
            f"its plan no longer has one; remove it from "
            f"SINGLE_PARTITION_SORT_OK"
        )
        return
    assert not hits, (
        f"{qid} runs {hits} over Exchange SinglePartition — a one-task "
        f"sort/window of the full relation. Re-shape (partitioned window "
        f"or bucketed_cumsum) or, if the input is bounded by construction, "
        f"allowlist it with the boundedness rationale.\n{plans[qid]}"
    )


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

    from tests.test_partition_independence import (
        MARKERS,
        ROWS_ONLY_TARGETS,
        TARGETS,
    )

    # ids_fast's monotonically_increasing_id values are layout-dependent
    # BY DESIGN (contract = unique + dense, certified in test_ids.py).
    LAYOUT_DEPENDENT_BY_CONTRACT = {"ids_fast"}

    oracles = entrymod.oracle_sql()
    sensitive = {
        qid
        for qid in PLAN_CHECKED
        if any(m in plans[qid] for m in MARKERS)
    }
    missing_oracled = sorted(
        q for q in sensitive if q in oracles and q not in TARGETS
    )
    assert not missing_oracled, (
        f"oracled partition-sensitive queries without a layout-independence "
        f"certificate: {missing_oracled}"
    )
    missing_rows_only = sorted(
        q
        for q in sensitive
        if q not in oracles
        and q not in ROWS_ONLY_TARGETS
        and q not in LAYOUT_DEPENDENT_BY_CONTRACT
    )
    assert not missing_rows_only, (
        f"rows-only partition-sensitive queries neither layout-certified "
        f"nor declared layout-dependent by contract: {missing_rows_only}"
    )


def test_partition_sensitive_queries_have_retry_certificate(plans):
    """Closure over the task-retry determinism certificate (r11 verdict
    #3): every query whose plan is partition-sensitive must be in
    tests/test_task_retry_determinism.py's RETRY_ROSTER, where a probe
    JVM replays every task's failed first attempt and compares digests.
    Unlike the layout certificate, ids_fast is NOT exempt — its mono
    ids are layout-dependent by contract but must still be replay-
    stable within one fixed layout. The seeded index builds are in the
    roster by the verdict's name even though their Python runs in
    build jobs the returned plan doesn't show."""
    from tests.test_partition_independence import MARKERS
    from tests.test_task_retry_determinism import RETRY_ROSTER

    sensitive = {
        qid
        for qid in PLAN_CHECKED
        if any(m in plans[qid] for m in MARKERS)
    }
    missing = sorted(sensitive - set(RETRY_ROSTER))
    assert not missing, (
        f"partition-sensitive queries without a task-retry determinism "
        f"certificate: {missing}"
    )
