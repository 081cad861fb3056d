"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``vector_search_playground_spark``; this module is
a thin adapter.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_search_playground_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_HERE = os.path.dirname(os.path.abspath(__file__))


def _driver_status() -> tuple[dict[str, int], set[str]]:
    """(id -> round of its newest driver check, ids whose LATEST check failed).

    Round files are read in numeric round order so the newest verdict per id
    wins: an id that failed in r3 but passed in r4 is not re-prioritized.
    Numeric (not lexicographic) ordering matters once rounds outgrow the
    zero-padding: r10 must sort after r9, not between r1 and r2."""
    last_round: dict[str, int] = {}
    last_ok: dict[str, bool] = {}
    paths = []
    for path in glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if m:
            paths.append((int(m.group(1)), path))
    for rnd, path in sorted(paths):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for qid, row in data.items():
            last_round[qid] = rnd
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                # rows-only by design: the weak check passed iff the
                # query executed (a row count was recorded)
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    row.get("err") is None
                    and row.get("rows_match") is not False
                    and row.get("hash_match") is not False
                )
            last_ok[qid] = ok
    failed = {q for q, ok in last_ok.items() if not ok}
    return last_round, failed


# Greens the driver MUST re-certify ahead of even never-checked IDs:
# their implementing code changed AFTER their newest driver row, so the
# old green certifies code that no longer exists. Value = "stale if the
# id's newest driver row is from this round or earlier"; the entry
# self-clears as soon as the driver writes a newer row. The r2-era
# streaming certifications predate both the round-4 events timestamp-unit
# fix and the multi-microbatch hardening (round-4 verdict, gap #1).
RECERTIFY_IF_AT_OR_BEFORE = {
    # r2-era streaming rows: re-certified by the driver in round 5 (these
    # entries self-cleared; kept for the audit trail)
    "stream_tumble": 2,
    "stream_slide": 2,
    "stream_session": 2,
    "stream_watermark": 2,
    "stream_dedup": 2,
    # round-6: rounding discipline changed from Python round() to the
    # shared half-up floor(x*10^k+0.5) AFTER the round-5 green row
    "funnel_latency": 5,
    # round-7: ADVICE fixes landed after the round-6 green rows —
    # graph_triangles' oracle was rephrased as scalar subqueries (empty-
    # graph row-shape fix) and embedding_outliers' centroid rounding moved
    # from engine-native ROUND to the shared half-up floor on both engines
    "graph_triangles": 6,
    "embedding_outliers": 6,
    # round-7: pagerank_topn gained a full value oracle (exact fixed-point
    # BIGINT iteration, 12 unrolled DuckDB CTEs) — its r6 row was the weak
    # rows-only check of the old float implementation
    "pagerank_topn": 6,
    # round-7: in-row quality scorecards added after the r6 rows-only rows
    # (leave-one-out hit/AUC + train-fit AUC; codebook balance/usage)
    "als_recommend": 6,
    "index_build_pq": 6,
    # round-7: topk_diverse graduated from rows-only (its r5 row) to a
    # full value oracle — MMR re-based on the certified int8-quantized
    # similarity space, greedy unrolled as MATERIALIZED CTEs
    "topk_diverse": 6,
    # round-8: lttb_downsample graduated from rows-only (its r5 row) to a
    # full value oracle — exact-integer quantized LTTB (seconds/cents),
    # greedy unrolled as 18 MATERIALIZED CTEs (the topk_diverse
    # discipline); the registered query now runs the quantized kernel
    "lttb_downsample": 7,
    # round-8: semdedup's bucket bit count became corpus-adaptive after
    # the second-decade stress run caught the fixed-6-bit variant going
    # quadratic; query AND oracle changed (sem_bits computed identically
    # in both engines), so the r3 green certifies retired code
    "semdedup": 7,
    # round-9: embed_minilm's self_cos certificate moved to a
    # deterministic 10% sample (nullable column — schema changed);
    # index_build_lsh gained the bucket_balance/buckets_used_frac/
    # recall_at_k scorecard columns; scan_avro's codec changed (varint
    # bounds checks, NaN-vs-NULL double transport, schema-declared
    # union branch order); multimodal_features' FLAC encoder now prices
    # subframes with the exact per-partition Rice cost, changing the
    # emitted bitstream the decode path re-reads (this supersedes the
    # round-8 media-rotation entry for multimodal_features — JPEG 4:2:0,
    # the Motion-JPEG MP4 track, stereo+LPC FLAC — whose threshold-7
    # entry was shadowed by this one anyway; r8's driver row cleared it)
    "embed_minilm": 8,
    "index_build_lsh": 8,
    "scan_avro": 8,
    "multimodal_features": 8,
    # round-10: index_build_ivf's destination became fingerprint-keyed
    # with overwrite-rebuild semantics (the r9 ADVICE stale-index fix) —
    # the executed build path changed; scan_avro_split's decode task
    # changed (incremental chunked sync search, memoized schema parse)
    # and its header pass can now run distributed. scan_avro itself is
    # untouched (binaryFile + read_ocf path).
    "index_build_ivf": 9,
    "scan_avro_split": 9,
    # round-10 (late): stream_stateful's state function hoisted to the
    # module-level running_totals_fn factory (so the state-store
    # crash-recovery test drives the exact production function through
    # a restartable sink) — semantically identical, but the executed
    # code changed, so the green stamp re-earns itself
    "stream_stateful": 9,
    # round-10 (late): mannwhitney_u's tie-group prefix sum moved off
    # the unpartitioned Window.orderBy (a single-partition sort of the
    # distinct-value relation — the one unbounded case the
    # SinglePartition plan audit found) onto the shared
    # operators/prefix.bucketed_cumsum; identical exact-int64 values,
    # but the executed plan changed, so the r6 green re-earns itself
    # [driver-cleared in r10; threshold superseded by the r11 entry
    # below]
    # round-10 (late): the low-cardinality window-key audit (the whale
    # the SinglePartition plan gate can't see — the exchange looks
    # partitioned) moved gini_index's per-segment ranks and
    # shuffle_global's per-shard positions onto the new
    # operators/prefix.grouped_bucketed_rank; identical exact ranks,
    # changed executed plans. (win_ntile got the same fix but its
    # newest row is r4 — already first in the oldest-green rotation.)
    # [both driver-cleared in r10; thresholds superseded by the r11
    # entries below]
    # round-11: the r10 ADVICE fixes — grouped_bucketed_rank gained the
    # null-group and max-partials guards (changing the executed path of
    # all three callers), gini_index now materializes its |segments|-row
    # moment table while the cache is alive, shuffle_global's docstring
    # became a real docstring (the .format() call WAS an executed
    # statement), and mannwhitney_u's materialize/unpersist moved into
    # try/finally. Exactly the 4 spare slots r11's rotation leaves after
    # the 46-ID r5 tail.
    "mannwhitney_u": 10,
    # round-12: the r11 ADVICE fix — grouped_bucketed_rank's partials
    # hash-agg now carries a per-(group, bucket) null-order count and
    # RAISES on null order values (previously documented as enforced
    # but not checked), changing the executed partials plan of all
    # three callers; their r11 rows (threshold-10 entries above,
    # driver-cleared in r11) re-earn once more. bucketed_cumsum is
    # untouched (its docstring never claimed enforcement), so
    # mannwhitney_u does not re-earn.
    "win_ntile": 11,
    "gini_index": 11,
    "shuffle_global": 11,
    # round-14: paragraph_relation gained the loud para_id-overflow
    # guard (raise_error when the paragraph index reaches
    # PARA_ID_STRIDE — the r13 ADVICE fix), changing dedup_paragraph's
    # executed plan after its r13 green row. Values identical at any
    # fixture scale (the guard never fires below 32M-token documents);
    # re-proven by replica this round, re-earns its driver stamp.
    "dedup_paragraph": 13,
}


def _prioritized(d: dict) -> dict:
    """Stale-certified IDs whose code changed since their driver row
    first (RECERTIFY_IF_AT_OR_BEFORE), then IDs whose latest driver
    check FAILED (the repaired-bug re-verification), then
    never-driver-checked IDs, then the stable greens ordered
    least-recently-driver-checked first.

    The per-round correctness run covers a bounded number of queries
    (50 in rounds 2-5); this ordering guarantees every fix gets
    re-judged before the cap can cut it off (repairs outrank even
    never-checked IDs: a red row that stays red is strictly worse than
    a new query waiting one round — round 6 grew the new-ID backlog to
    exactly the cap and would otherwise have starved the round-5
    tokenize_to_ids repair), every new query eventually gets a driver
    entry, AND stable greens rotate: code that changed since an old
    certification cannot be starved behind newer rows forever."""
    last_round, failed = _driver_status()
    recert = {
        k: v
        for k, v in d.items()
        if k in last_round
        and last_round[k] <= RECERTIFY_IF_AT_OR_BEFORE.get(k, -1)
    }
    repair = {
        k: v
        for k, v in d.items()
        if k in failed and k in last_round and k not in recert
    }
    head = {k: v for k, v in d.items() if k not in last_round}
    green = sorted(
        (
            k
            for k in d
            if k in last_round and k not in failed and k not in recert
        ),
        key=lambda k: last_round[k],
    )
    tail = {k: d[k] for k in green}
    return {**recert, **repair, **head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (exact cosine KNN, the reference's `search` verb) on
    /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES["knn_search"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return _prioritized(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    registry.load_all()
    return _prioritized(dict(registry.ORACLES))
