"""Engine-wide physical-plan audit over every registered query.

Builds each non-streaming query's executed plan at a small fixture and
reports, per query, the plan patterns that matter for 100 TB scale:

- ``MapInPandas`` / ``FlatMapGroupsInPandas`` / ``monotonically_increasing_id``
  — Python evaluated per input partition (or layout-dependent ids): these
  queries must prove partition-layout independence
  (tests/test_partition_independence.py consumes this list).
- ``Exchange SinglePartition`` — everything downstream of one runs on a
  single task; fine over a bounded pre-aggregate, a scale-killer over a
  data-sized relation (tests/test_plan_invariants.py enforces the
  audited allowlist).
- ``CartesianProduct`` / ``BatchEvalPython`` — the two suite-banned
  anti-patterns (enforced in tests/test_plan_invariants.py; reported
  here so one tool shows the whole picture).

Usage:
    python tools/plan_audit.py                  # all queries at sf0.001
    python tools/plan_audit.py qid1 qid2 ...    # named ids
    python tools/plan_audit.py --dump DIR [...] # also write DIR/<qid>.plan
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATTERNS = (
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "monotonically_increasing_id",
    "Exchange SinglePartition",
    "CartesianProduct",
    "BatchEvalPython",
)


def audit(spark, qids, sf_dir, dump_dir=None):
    """{qid: [matched pattern, ...]} for every qid that builds a plan;
    errors are reported as ["ERROR: ..."]. With ``dump_dir``, every
    query's full executed-plan text is written to ``dump_dir/<qid>.plan``
    for offline analysis (exchange context, codegen spans, ...)."""
    import __spark_entry__ as em

    qs = em.queries()
    out: dict[str, list[str]] = {}
    for qid in qids:
        if qid.startswith("stream_"):
            continue
        try:
            df = qs[qid](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001
            out[qid] = [f"ERROR: {exc!r}"]
            continue
        if dump_dir:
            with open(os.path.join(dump_dir, f"{qid}.plan"), "w") as f:
                f.write(plan)
        hits = [p for p in PATTERNS if p in plan]
        if hits:
            out[qid] = hits
    return out


def main() -> int:
    import __spark_entry__ as em

    from vector_search_playground_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    qs = em.queries()
    argv = sys.argv[1:]
    dump_dir = None
    if argv and argv[0] == "--dump":
        dump_dir = argv[1]
        os.makedirs(dump_dir, exist_ok=True)
        argv = argv[2:]
    qids = argv or sorted(qs)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    oracles = em.oracle_sql()
    result = audit(spark, qids, sf, dump_dir=dump_dir)
    for qid, hits in sorted(result.items()):
        print(f"{qid}: oracled={qid in oracles} {hits}", flush=True)
    print(f"\n{len(result)}/{len(qids)} queries matched >=1 pattern")
    return 1 if any(h[0].startswith("ERROR") for h in result.values()) else 0


if __name__ == "__main__":
    raise SystemExit(main())
