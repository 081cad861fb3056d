"""Per-job time attribution for one or more queries via the Spark UI
REST API (local, no network): runs each query noop-sink style, then
lists every job it spawned with duration + description so the
expensive pass is identified empirically (guide §1.1) instead of
guessed.

Usage: python .scratch/opt14/profile_query.py qid [qid ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> int:
    from vector_search_playground_spark import registry
    from vector_search_playground_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qids = sys.argv[1:]
    spark = get_spark(app_name="profile-query", master="local[32]")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    registry.load_all()
    registry.QUERIES["knn_search"](spark, "/root/testdata/sf0.001").collect()

    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    def jobs_after(min_id: int) -> list[dict]:
        with urllib.request.urlopen(f"{base}/jobs") as r:
            data = json.loads(r.read())
        return sorted(
            (j for j in data if j["jobId"] >= min_id),
            key=lambda j: j["jobId"],
        )

    for qid in qids:
        # warm rep (codegen/broadcast warmup), then the profiled rep
        fn = registry.QUERIES[qid]
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        existing = jobs_after(0)
        next_id = existing[-1]["jobId"] + 1 if existing else 0
        t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        time.sleep(0.3)
        print(f"\n=== {qid}: wall {wall:.3f}s ===")
        tot = 0.0
        for j in jobs_after(next_id):
            t1 = time.mktime(time.strptime(
                j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            ms = int(j["submissionTime"][20:23])
            t2 = time.mktime(time.strptime(
                j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            ms2 = int(j["completionTime"][20:23])
            dur = (t2 + ms2 / 1000) - (t1 + ms / 1000)
            tot += dur
            desc = (j.get("description") or j["name"])[:90]
            ntasks = j["numTasks"]
            print(f"  job {j['jobId']:>4} {dur:7.3f}s tasks={ntasks:>4}  {desc}")
        print(f"  sum of job durations: {tot:.3f}s (gaps = driver/plan time)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
