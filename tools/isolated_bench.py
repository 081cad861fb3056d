"""Isolated warm re-measurement of named queries — the flap adjudicator.

Bench medians on this box flap ±50% between same-code runs (VERDICT
r6–r9), so a cross-round per-query delta proves nothing by itself.
This runs each named query alone on an idle box: one untimed warm rep,
then REPS timed reps, reporting the min (interference only ever
inflates a rep). Use it before calling any bench delta a regression.

Usage:
    python tools/isolated_bench.py weighted_median stream_join ...
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_BENCH_REPS (default 5)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from vector_search_playground_spark import registry
    from vector_search_playground_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    qids = sys.argv[1:]
    if not qids:
        print("usage: isolated_bench.py <qid> [qid ...]", file=sys.stderr)
        return 2

    spark = get_spark(app_name="isolated-bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    unknown = [q for q in qids if q not in registry.QUERIES]
    if unknown:
        print(f"unknown qids: {unknown}", file=sys.stderr)
        return 2
    # JVM/codegen warm-up (same discipline as bench.py)
    registry.QUERIES["knn_search"](spark, "/root/testdata/sf0.001").collect()

    for qid in qids:
        fn = registry.QUERIES[qid]

        def run() -> float:
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # same per-rep clear as bench.py: intra-query persists must
            # not feed the next rep through CacheManager plan matching
            spark.catalog.clearCache()
            return dt

        run()  # untimed warm rep
        runs = [run() for _ in range(reps)]
        print(
            f"{qid}: min {min(runs):.3f}s "
            f"runs {[round(r, 3) for r in runs]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
