"""Dump ``.explain("formatted")`` for named queries to files.

The optimization rounds' deliverable: ``plans/r{N}/<qid>_{before,after}.txt``
holds the formatted plan for every query an optimization touched, so the
judge can check plan-shape claims (Exchange count, join strategy,
PushedFilters, Python-eval nodes) without running Spark.

Usage:
    python tools/dump_plans.py OUTDIR SUFFIX qid1 [qid2 ...]
        # writes OUTDIR/<qid>_<SUFFIX>.txt
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import __spark_entry__ as em

    from vector_search_playground_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    outdir, suffix, qids = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for qid in qids:
        df = qs[qid](spark, sf)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{qid}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
