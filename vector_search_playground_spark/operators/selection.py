"""Exact distributed quantiles (per-key selection) without a holistic agg.

Spark's exact ``percentile`` is a *holistic* aggregate: every value of a
group is buffered and sorted inside ONE task. For column profiling that
means "one task per profiled column holding the entire column" — the exact
shape that dies first at 100 TB. This operator computes the same
interpolated quantile (SQL ``percentile_cont`` semantics, matching both
Spark's ``percentile`` and DuckDB's ``quantile_cont``) by distributed
selection, entirely with codegen'd JVM expressions:

1. per-key count/min/max (one metadata-sized hash agg) → the target REAL
   position ``t = (n-1)·q`` per key;
2. per-(key, equal-width-bucket) histogram via ``width_bucket`` with the
   per-key range wired in as literal maps — one shuffle of K·B rows;
   bucketing depends only on the value, so equal values share a bucket and
   bucket ranges are monotone: cumulative counts give exact global
   positions;
3. for each needed global index ⌊t⌋ / ⌈t⌉, locate its bucket and LOCAL
   index from the cumulative histogram (driver arithmetic over K·B rows of
   metadata);
4. rank ONLY the straddling buckets (a B-th of the data under any
   reasonably spread distribution) with a window partitioned by
   (key, bucket) and pull the ≤ 2 selected neighbors per key.

Equal-width buckets trade the sketch pass of a quantile-boundary scheme
for zero extra scans; a pathological distribution (nearly all mass inside
one bucket width) degrades step 4's rank size, never correctness — the
production hardening is to recurse the same histogram inside an oversized
straddling bucket. Keys are the *profiled columns* — a bounded set — so
driver bookkeeping is O(keys · buckets) metadata, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    q: float,
    *,
    num_buckets: int = 64,
) -> dict[str, float]:
    """{key: exact interpolated q-quantile of value} for every key."""
    multi = exact_quantiles(df, key_col, value_col, [q], num_buckets=num_buckets)
    return {k: per[q] for k, per in multi.items()}


def exact_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs: "list[float]",
    *,
    num_buckets: int = 64,
) -> dict[str, dict[float, float]]:
    """{key: {q: exact interpolated quantile}} for every key and every q.

    All requested quantiles share the SAME three passes (stats, histogram,
    straddling-bucket rank): the per-key target indices are the union over
    qs, so asking for p50+p95+p99 costs exactly what p50 alone does — the
    rank pass just touches a couple more buckets.

    Contract: the key domain is bounded (profiling columns, metric names —
    never a data-scale id); values must be non-null doubles.
    """
    stats = {
        r["k"]: (r["n"], r["mn"], r["mx"])
        for r in df.groupBy(F.col(key_col).alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col(value_col).cast("double")).alias("mn"),
            F.max(F.col(value_col).cast("double")).alias("mx"),
        )
        .collect()
    }
    if not stats:
        return {}

    mn_map = F.create_map(
        *[F.lit(x) for k, (_, mn, _) in stats.items() for x in (k, mn)]
    )
    mx_map = F.create_map(
        *[F.lit(x) for k, (_, _, mx) in stats.items() for x in (k, mx)]
    )
    k_expr = F.col(key_col)
    # width_bucket is 1-based; values == max land in bucket B+1 → clamp.
    # A key with min == max has no bucket width — every value goes to 1.
    bucket = F.when(mn_map[k_expr] == mx_map[k_expr], F.lit(1)).otherwise(
        F.least(
            F.width_bucket(
                F.col(value_col).cast("double"),
                mn_map[k_expr],
                mx_map[k_expr],
                F.lit(num_buckets),
            ),
            F.lit(num_buckets),
        )
    ).alias("b")
    bucketed = df.select(
        k_expr.alias("k"), F.col(value_col).cast("double").alias("v"), bucket
    )
    hist = {
        (r["k"], r["b"]): r["n"]
        for r in bucketed.groupBy("k", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }

    # global index -> (bucket, local index) per key, from cumulative
    # counts; indices are the UNION over all requested quantiles
    needed: dict[str, dict[int, tuple[int, int]]] = {}
    for k, (n, _, _) in stats.items():
        idxs: set[int] = set()
        for q in qs:
            t = (n - 1) * q
            lo = int(t)
            idxs.add(lo)
            if t != lo:
                idxs.add(lo + 1)
        cum = 0
        per_key = {}
        for b in range(1, num_buckets + 1):
            cnt = hist.get((k, b), 0)
            for gi in idxs:
                if cum <= gi < cum + cnt:
                    per_key[gi] = (b, gi - cum)
            cum += cnt
        needed[k] = per_key

    wanted_pairs = {
        (k, b) for k, per in needed.items() for b, _ in per.values()
    }
    cond = F.lit(False)
    for k, b in wanted_pairs:
        cond = cond | ((F.col("k") == k) & (F.col("b") == b))
    w = Window.partitionBy("k", "b").orderBy("v")
    ranked = bucketed.where(cond).withColumn(
        "r", F.row_number().over(w) - 1
    )
    local_wanted = {
        (k, b, li): gi
        for k, per in needed.items()
        for gi, (b, li) in per.items()
    }
    pick_cond = F.lit(False)
    for k, b, li in local_wanted:
        pick_cond = pick_cond | (
            (F.col("k") == k) & (F.col("b") == b) & (F.col("r") == li)
        )
    # ≤ 2 rows per key reach the driver — the selected values, not data
    picked: dict[tuple[str, int], float] = {}
    for r in ranked.where(pick_cond).collect():
        picked[(r["k"], local_wanted[(r["k"], r["b"], r["r"])])] = r["v"]

    out: dict[str, dict[float, float]] = {}
    for k, (n, _, _) in stats.items():
        per_q: dict[float, float] = {}
        for q in qs:
            t = (n - 1) * q
            lo = int(t)
            frac = t - lo
            vlo = picked[(k, lo)]
            per_q[q] = (
                vlo if frac == 0 else vlo + (picked[(k, lo + 1)] - vlo) * frac
            )
        out[k] = per_q
    return out
