"""Count Spark jobs (actions) a query costs, end to end.

The pass-fused stat kernels (r15 radix bucketing) cut DRIVER-SIDE
construction actions that never show in the returned plan's explain
output — the falsifiable evidence is the number of jobs a full
construct+noop execution submits. Prints per-query job counts and
wall time.

Usage:
    python tools/job_count.py qid1 [qid2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _n_jobs(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/jobs", timeout=30
    ) as r:
        return len(json.load(r))


def main() -> int:
    from vector_search_playground_spark import registry
    from vector_search_playground_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    qids = sys.argv[1:]
    spark = get_spark(app_name="job-count", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    # warm-up so JIT/codegen doesn't ride the first query's wall time
    registry.QUERIES["knn_search"](spark, "/root/testdata/sf0.001").collect()
    spark.catalog.clearCache()
    for qid in qids:
        before = _n_jobs(spark)
        t0 = time.perf_counter()
        df = registry.QUERIES[qid](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"{qid}: jobs={_n_jobs(spark) - before} wall={dt:.2f}s",
              flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
