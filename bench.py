"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and print ONE JSON line with per-query and
total wall seconds. The driver records this as BENCH_r{N}.json.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3; slow queries are
topped up to 5) and reports the per-query MIN as the headline stat (robust
to scheduler noise in a warm JVM — interference only inflates a rep), with
the median alongside for spread diagnostics. ``categories`` tags one-off
index-build IDs vs steady-state query IDs — build cost and query latency
must not be conflated when comparing rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_search_playground_spark import registry  # noqa: E402
from vector_search_playground_spark.session import get_spark  # noqa: E402

# One-off construction cost (k-means fit / PQ codebook fit / partitioned
# write / streaming index ingest / tokenizer training); everything else
# measures steady-state query latency. ivf_search / lsh_search reuse
# cached indexes, so they land in "query".
BUILD_IDS = {
    "index_build_ivf",
    "index_build_lsh",
    "index_build_pq",
    "stream_index_append",
    "bpe_train",
    "als_recommend",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")

    spark = get_spark(app_name="vspg-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()

    # JVM/codegen warmup on the smallest SF so the measured numbers reflect
    # steady-state execution, not first-query classloading.
    warm = registry.QUERIES["knn_search"]
    warm(spark, "/root/testdata/sf0.001").collect()

    # Per-query session floor: the fixed JVM/Py4J/scheduler cost any query
    # pays regardless of plan (round-4 judge: ~40 s of a 72 s total at
    # sf0.1 was floor, not plan cost — the 2× gate should compare plan
    # work). r10: the old median-of-5 sat inside the JIT warm-up decay
    # (no-op cost falls 0.10 → 0.036 s over the first ~25 invocations),
    # so the recorded floor measured WHERE the JIT was, not the session
    # constant — the r8→r9 floor "drift" (0.0625 → 0.0964) was exactly
    # this transient. Now: 10 untimed warm-up no-ops, then min of 15
    # (min pairs with the min headline stat — interference only ever
    # inflates a rep).
    for _ in range(10):
        spark.range(1).write.format("noop").mode("overwrite").save()
    floor_runs: list[float] = []
    for _ in range(15):
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor_runs.append(time.perf_counter() - t0)
    floor = min(floor_runs)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    # Round-6 verdict: 3-rep medians flap 2-3× between same-code runs on
    # the multi-second queries (dedup_ngram 2.09 ↔ 4.31 s), putting
    # round-over-round per-query deltas below the noise floor. Two
    # mitigations: queries whose first-pass median is ≥ SLOW_CUTOFF get
    # topped up to SLOW_REPS total reps, and the per-query MIN is recorded
    # alongside the median (min is far more stable against scheduler /
    # sandbox interference — spikes only ever inflate, never deflate).
    slow_cutoff = float(os.environ.get("SPARK_GRAFT_BENCH_SLOW_CUTOFF", "2.0"))
    slow_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_SLOW_REPS", "5")))
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    spreads: list[float] = []
    categories: dict[str, str] = {}
    total = 0.0
    for qid in sorted(registry.QUERIES):
        fn = registry.QUERIES[qid]
        runs: list[float] = []
        failed = False

        def one_run() -> bool:
            t0 = time.perf_counter()
            try:
                df = fn(spark, sf_dir)
                # Force full evaluation of every column with a noop sink:
                # count() alone lets Catalyst elide sorts and prune
                # projections, which under-measures (a count over
                # order_by_dist never sorts).
                df.write.format("noop").mode("overwrite").save()
            except Exception as exc:  # pragma: no cover - bench must never die
                print(f"# {qid} FAILED: {exc}", file=sys.stderr)
                return False
            runs.append(time.perf_counter() - t0)
            # Measurement fix (r14): clear the cache after EVERY rep, not
            # only between queries. A query whose returned DataFrame
            # depends on an intra-query persist cannot unpersist before
            # returning; Spark's CacheManager matches the NEXT rep's
            # logically-identical plan against the previous rep's cache,
            # so without this clear the min-of-reps headline timed a
            # cache read instead of the computation from parquet. The
            # clear itself stays outside the timed window.
            try:
                spark.catalog.clearCache()
            except Exception:
                pass
            return True

        for _ in range(reps):
            if not one_run():
                failed = True
                break
        if not failed and statistics.median(runs) >= slow_cutoff:
            for _ in range(slow_reps - len(runs)):
                if not one_run():
                    failed = True
                    break
        if failed or not runs:
            continue
        # Belt-and-braces clear between queries too (a failed rep skips
        # the per-rep clear). Not timed — runs are already recorded.
        try:
            spark.catalog.clearCache()
        except Exception:
            pass
        dt = statistics.median(runs)
        timings[qid] = round(dt, 4)
        mins[qid] = round(min(runs), 4)
        if dt > 0:
            spreads.append((max(runs) - min(runs)) / dt)
        categories[qid] = "build" if qid in BUILD_IDS else "query"
        total += dt
        print(
            f"# {qid}: median {dt:.3f}s min {min(runs):.3f}s over "
            f"{len(runs)} ({', '.join(f'{r:.3f}' for r in runs)})",
            file=sys.stderr,
        )

    # The driver records only the LAST 2000 characters of output, so the
    # final JSON line must fit that window end-to-end or it parses as null
    # (rounds 2-3 both lost their numbers this way once the query count
    # grew). Three-tier output:
    #   1. full payload (all timings + categories) → BENCH_FULL.json on
    #      disk, the durable record;
    #   2. the same payload as an EARLY stdout line (humans, logs);
    #   3. the final line, printed last after spark.stop(), with the
    #      queries map trimmed fastest-first until the whole line fits the
    #      capture window — the slowest queries are the signal.
    # Round-7 verdict: medians at 3-5 reps still flap ±0.4 s/query, which
    # forced three "regressions" to be adjudicated via git archaeology.
    # min is robust to scheduler noise in a warm JVM (interference only
    # ever inflates a rep, never deflates it), so min is now the HEADLINE
    # stat: value/queries carry mins, medians ride alongside for the
    # noise-envelope fields that need them.
    spreads.sort()
    # per-category totals (r8 verdict #8): one-off model/index builds and
    # steady-state queries must not be conflated when comparing rounds —
    # the parsed summary carries both tiers' totals explicitly
    build_total = round(
        sum(v for q, v in mins.items() if categories[q] == "build"), 4
    )
    query_total = round(
        sum(v for q, v in mins.items() if categories[q] == "query"), 4
    )
    full = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(mins.values()), 4),
        "unit": "sec",
        "total_query_tier_seconds": query_total,
        "total_build_tier_seconds": build_total,
        "n_build_ids": sum(1 for c in categories.values() if c == "build"),
        "queries": mins,
        "sf": sf,
        "reps": reps,
        "reps_slow": slow_reps,
        "slow_cutoff_sec": slow_cutoff,
        "stat": "min",
        "n_queries": len(timings),
        "floor_per_query_sec": round(floor, 4),
        "floor_seconds": round(floor * len(timings), 2),
        # run-to-run stability of THIS run: per-query (max-min)/median,
        # summarized — compare totals only when the delta clears this
        "rep_spread_median": round(
            statistics.median(spreads), 4
        ) if spreads else None,
        "rep_spread_p90": round(
            spreads[int(0.9 * (len(spreads) - 1))], 4
        ) if spreads else None,
        "total_min_seconds": round(sum(mins.values()), 4),
        "total_median_seconds": round(total, 4),
        "queries_median": timings,
        "categories": categories,
    }
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_FULL.json"),
            "w",
        ) as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(full, separators=(",", ":")))

    spark.stop()

    final = {
        k: v
        for k, v in full.items()
        if k not in ("categories", "queries_median")
    }
    budget = 1900  # capture window minus margin for a trailing newline
    by_time = sorted(mins, key=mins.get)  # fastest first
    while (
        len(json.dumps(final, separators=(",", ":"))) > budget
        and len(final["queries"]) > 1
    ):
        drop = by_time.pop(0)
        final["queries"] = {
            k: v for k, v in final["queries"].items() if k != drop
        }
        final["queries_shown"] = len(final["queries"])
    print(json.dumps(final, separators=(",", ":")))


if __name__ == "__main__":
    main()
