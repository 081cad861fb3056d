"""Subprocess body for the forced-spill certificate (r8 verdict #2).

Runs in its OWN JVM so the memory budget is real: a small driver heap,
a lowered execution-memory fraction, and the core force-spill threshold
(``spark.shuffle.spill.numElementsForceSpillThreshold`` — a JVM-creation
conf, which is why this cannot run inside the shared test session) make
every sizable sort/join/window buffer go through its disk-spill path.
Broadcast joins are disabled so the joins that would normally broadcast
at fixture scale take the sort-merge path a memory-constrained cluster
falls back to.

For each probed query the script executes the REGISTERED Spark query at
the given fixture dir, compares it against its registered DuckDB oracle
(rows + schema + values — the driver's own check, via
tests.oracle_harness.compare), and records the spill/peak-memory stage
metrics from the UI status store. Output: one JSON file
``{qid: {spill_bytes, peak_exec_mem, oracle_match}}``.

Reference behavior certified: the exact brute-force semantics of the
search verb (/root/reference/src/main.rs:85-96) must hold under ANY
memory budget — spilling changes where bytes live, never what the
query returns.
"""

from __future__ import annotations

import json
import sys
import urllib.request

PROBE_QUERIES = ("knn_search", "ids_dense", "semdedup")

SPILL_CONF = {
    # small, real memory budget (vs the factory's 16g default)
    "spark.driver.memory": "1500m",
    "spark.memory.fraction": "0.3",
    # force every UnsafeExternalSorter (sorts, SMJ inputs, agg
    # fallbacks) to spill after 2000 records — the deterministic way to
    # exercise the spill path at fixture row counts, same technique
    # Spark's own ExternalSorterSuite uses
    "spark.shuffle.spill.numElementsForceSpillThreshold": "2000",
    # runtime buffer thresholds: SMJ same-key groups and window
    # partitions beyond 256 rows go to disk
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "256",
    "spark.sql.windowExec.buffer.spill.threshold": "256",
    # a memory-constrained cluster can't assume broadcast room; forcing
    # the sort-merge path is both the pressure scenario and what makes
    # the join buffers exist at all
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def _stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.load(resp)


def _watermark(spark) -> int:
    return max((s.get("stageId", -1) for s in _stages(spark)), default=-1) + 1


def _stats_since(spark, mark: int) -> dict:
    picked = [s for s in _stages(spark) if s.get("stageId", -1) >= mark]
    return {
        "spill_bytes": sum(
            s.get("memoryBytesSpilled", 0) + s.get("diskBytesSpilled", 0)
            for s in picked
        ),
        "peak_exec_mem": max(
            (s.get("peakExecutionMemory", 0) for s in picked), default=0
        ),
    }


def main() -> None:
    fixture_dir, out_path = sys.argv[1], sys.argv[2]

    from vector_search_playground_spark import registry
    from vector_search_playground_spark.session import get_spark

    from tests.oracle_harness import compare, duck_connect

    spark = get_spark(
        app_name="spill-probe",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf=SPILL_CONF,
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    con = duck_connect(fixture_dir)

    results: dict[str, dict] = {}
    for qid in PROBE_QUERIES:
        mark = _watermark(spark)
        df = registry.QUERIES[qid](spark, fixture_dir)
        compare(df, con, registry.ORACLES[qid], qid)  # raises on mismatch
        stats = _stats_since(spark, mark)
        stats["oracle_match"] = True
        results[qid] = stats
        spark.catalog.clearCache()

    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
