"""Task-retry / speculative-execution determinism certificate (r11
verdict #3).

Partition-layout independence (test_partition_independence.py) proves a
DIFFERENT slicing of the input yields identical bytes. This test proves
a REPLAYED slice does: at 100 TB, speculative execution and executor
loss re-run individual tasks routinely, and attempt 1 often executes in
a REUSED Python worker process whose module state attempt 0 already
advanced (``spark.python.worker.reuse`` defaults to true). A per-batch
seeded RNG advanced by the first attempt, a memoized cache mutated
mid-task, or a write-commit-protocol bug would produce different bytes
on replay while passing every single-attempt test in the suite.

Mechanics live in tests/_retry_probe.py (own JVM: local mode only
retries tasks when the master string carries a failure budget —
``local[8,3]`` — which is a SparkContext-creation property, so the
shared session cannot be reused). The probe fails attempt 0 of every
scan-stage and final-stage task AFTER full input consumption and
asserts the replayed job's order-insensitive digest equals a control
run whose plan is node-for-node identical (identity pass-through in
place of the poison).

Roster = the partition-sensitive inventory from tools/plan_audit.py
(MapInPandas / FlatMapGroupsInPandas / monotonically_increasing_id —
the same list test_partition_independence.py certifies, THIS round's
audit: .scratch/r12/plan_audit_full.log) plus the seeded model builds
(their Python runs in build jobs during query construction, so the
returned plan doesn't show the marker, but their KMeans/codebook tasks
replay all the same and index_build_ivf's overwrite-rebuild write path
drives the FileFormatWriter commit protocol's discard-failed-attempt
branch). ``ids_fast`` is EXCLUDED from layout independence (its
monotonically_increasing_id values are layout-dependent by design) but
INCLUDED here: within one fixed layout, a replayed task must regenerate
the exact same ids — the speculative-execution safety question mono_id
is famous for.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

# plan_audit's partition-sensitive list (r12 audit), oracled + rows-only
RETRY_ROSTER = [
    "dedup_simhash",
    "embed_batch",
    "embed_minilm",
    "eval_classification",
    "eval_minhash",
    "ewma_smooth",
    "holt_forecast",
    "ids_fast",
    "knn_batch",
    "knn_classify",
    "knn_graph",
    "lttb_downsample",
    "multimodal_features",
    "scan_avro",
    "scan_avro_split",
    "sim_join",
    "udf_grouped_map",
    "window_funnel",
    # seeded model builds (r11 verdict #3 names them explicitly)
    "index_build_ivf",
    "index_build_lsh",
    "index_build_pq",
]

FIXTURE = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def retry_stats(tmp_path_factory):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path_factory.mktemp("retry") / "retry_stats.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "tests", "_retry_probe.py"),
         FIXTURE, out, *RETRY_ROSTER],
        cwd=here,
        env={**os.environ, "PYTHONPATH": here + os.pathsep
             + os.environ.get("PYTHONPATH", "")},
        capture_output=True,
        text=True,
        timeout=2400,
    )
    assert proc.returncode == 0, (
        f"retry probe JVM failed:\n{proc.stderr[-4000:]}"
    )
    with open(out) as fh:
        return json.load(fh)


@pytest.mark.parametrize("qid", RETRY_ROSTER)
def test_replayed_tasks_produce_identical_bytes(retry_stats, qid):
    rec = retry_stats[qid]
    assert "error" not in rec, f"{qid}: probe error {rec.get('error')}"
    assert rec["failed_tasks"] > 0, (
        f"{qid}: no task failed under poison — the certificate ran "
        "vacuously (did the poison wrapper detach?)"
    )
    assert rec["n_rows"] == rec["n_rows_poisoned"], (
        f"{qid}: row count changed under task replay "
        f"({rec['n_rows']} -> {rec['n_rows_poisoned']})"
    )
    assert rec["digest"] == rec["digest_poisoned"], (
        f"{qid}: result digest changed under task replay — a re-executed "
        "attempt produced different bytes"
    )
    # the "two arms share one physical plan" claim, ASSERTED (r12
    # ADVICE): normalized plans must be node-identical modulo the
    # pass-through function's name — else the digest equality compared
    # two different computations, not replay-vs-no-replay
    assert rec["plan"] == rec["plan_poisoned"], (
        f"{qid}: control and poison arms planned differently — the "
        "replay comparison no longer isolates task retry"
    )


def test_model_builds_are_in_roster():
    """_retry_probe.MODEL_BUILDS documents WHY the seeded builds are
    probed (overwrite-rebuild drives the commit protocol's
    discard-failed-attempt branch); this gate keeps that list and the
    actual roster from drifting apart (r12 ADVICE)."""
    from tests._retry_probe import MODEL_BUILDS

    assert set(MODEL_BUILDS) <= set(RETRY_ROSTER)
