"""Partition-layout independence certificate for every hash-oracled query
whose physical plan evaluates Python per input partition.

On a real cluster the partition layout is whatever HDFS block placement,
AQE coalescing, and executor count happen to produce — never the layout
the fixture gave the test box. Built-in relational operators are
layout-independent by construction (Catalyst guarantees it), but a
``mapInPandas`` function sees ONE ARBITRARY SLICE of the input per call
and an ``applyInPandas`` function sees its group's rows in ARBITRARY
ORDER — any hidden dependence on slice boundaries or intra-group arrival
order (a running state seeded per-batch, a "first row wins" without an
explicit sort, a float sum whose error grows with batch count past the
oracle's 9-dp round) returns different values under a different layout
and would pass every fixed-layout test while failing in production.

So: every oracled query whose executed plan contains ``MapInPandas`` /
``FlatMapGroupsInPandas`` / ``monotonically_increasing_id`` (discovered
by tools/plan_audit.py over the full registry; the closure test in
tests/test_plan_invariants.py keeps this list honest) re-runs under an
adversarial layout — shuffle parallelism cut 8 -> 5, input splits forced
tiny, AQE's post-shuffle coalescing disabled so the ugly layout survives
— and must produce the driver's canonical result form (sorted columns,
order-insensitive normalized row multiset) BIT-IDENTICALLY to the
default-layout run.

Rows-only queries (no SQL oracle) get the same cross-layout equality
check wherever their CONTRACT is deterministic output — which is all of
them except ``ids_fast``, whose ``monotonically_increasing_id`` values
are layout-dependent by design (its contract is uniqueness + density,
certified in its own tests). The transformer tier is the sharpest case:
``embed_minilm``/``embed_batch`` process rows in per-partition Arrow
batches, and a batch-size-dependent float path (e.g. a reduction whose
accumulation order follows the batch dimension) would ship different
embeddings from different layouts; per-row determinism across layouts
is asserted here value-for-value.

Reference parity: the reference executes in one Postgres process
(`/root/reference/docker-compose.yaml:3-10`) where "layout" doesn't
exist; on Spark, layout-independence is the equivalent determinism
contract and must be proven, not assumed.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import spark_result

QUERIES = entrymod.queries()

# Hash-oracled queries whose executed plan contains a partition-sensitive
# operator (tools/plan_audit.py at sf0.001, this round). The closure test
# in test_plan_invariants.py fails if a registry change adds an oracled
# partition-sensitive plan that is missing here; test_target_is_still_
# partition_sensitive below fails if an entry goes stale.
TARGETS = [
    "eval_classification",
    "ewma_smooth",
    "holt_forecast",
    "knn_batch",
    "knn_classify",
    "knn_graph",
    "lttb_downsample",
    "scan_avro",
    "scan_avro_split",
    "sim_join",
    "udf_grouped_map",
    "window_funnel",
]

# Rows-only (no SQL oracle) partition-sensitive queries whose output is
# nonetheless deterministic by contract: certified by cross-layout
# equality alone. ids_fast is the one exclusion — its ids are
# layout-dependent BY DESIGN (contract = unique + dense, own tests).
ROWS_ONLY_TARGETS = [
    "dedup_simhash",
    "embed_batch",
    "embed_minilm",
    "eval_minhash",
    "multimodal_features",
]

MARKERS = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "monotonically_increasing_id",
)

# The perturbation: different post-shuffle parallelism (8 -> 5), input
# splits forced down to 32 KiB (multi-row-group fixture files split into
# several scan partitions; openCostInBytes=0 stops Spark re-packing the
# tiny splits together), and AQE coalescing off so the runtime doesn't
# merge the perturbed layout back into the default one.
ADVERSARIAL = {
    "spark.sql.shuffle.partitions": "5",
    "spark.sql.files.maxPartitionBytes": str(32 * 1024),
    "spark.sql.files.openCostInBytes": "0",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture()
def adversarial_layout(spark):
    old = {k: spark.conf.get(k) for k in ADVERSARIAL}
    try:
        yield lambda: [spark.conf.set(k, v) for k, v in ADVERSARIAL.items()]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize("qid", TARGETS + ROWS_ONLY_TARGETS)
def test_layout_independent_result(spark, sf_correct, qid, adversarial_layout):
    baseline = spark_result(QUERIES[qid](spark, sf_correct))
    adversarial_layout()
    perturbed = spark_result(QUERIES[qid](spark, sf_correct))
    assert baseline[0] == perturbed[0], f"{qid}: columns changed under layout"
    assert len(baseline[1]) == len(perturbed[1]), (
        f"{qid}: row count {len(baseline[1])} -> {len(perturbed[1])} under layout"
    )
    for i, (a, b) in enumerate(zip(baseline[1], perturbed[1])):
        assert a == b, (
            f"{qid}: first layout-dependent row #{i}: default={a!r} "
            f"adversarial={b!r}"
        )


@pytest.mark.parametrize("qid", TARGETS + ROWS_ONLY_TARGETS)
def test_target_is_still_partition_sensitive(spark, sf_smoke, qid):
    """An entry whose plan no longer contains a partition-sensitive op is
    stale — prune it (and let the closure test confirm the registry side)."""
    df = QUERIES[qid](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert any(m in plan for m in MARKERS), (
        f"{qid} no longer has a partition-sensitive plan; remove it from "
        f"TARGETS"
    )
