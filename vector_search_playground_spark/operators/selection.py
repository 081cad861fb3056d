"""Exact distributed quantiles (per-key selection) without a holistic agg.

Spark's exact ``percentile`` is a *holistic* aggregate: every value of a
group is buffered and sorted inside ONE task. For column profiling that
means "one task per profiled column holding the entire column" — the exact
shape that dies first at 100 TB. This operator computes the same
interpolated quantile (SQL ``percentile_cont`` semantics, matching both
Spark's ``percentile`` and DuckDB's ``quantile_cont``) by distributed
selection, entirely with codegen'd JVM expressions:

1. per-(key, radix-bucket) histogram (``operators/radix``: the bucket is
   an exactly monotone pure function of the value — binary exponent plus
   top mantissa bits — so NO min/max or sketch probe pass is needed, and
   cumulative bucket counts give exact global positions). One shuffle of
   K·B metadata rows; per-key row counts fall out of the same histogram.
2. for each needed global index ⌊t⌋ / ⌈t⌉ at target position
   ``t = (n-1)·q``, locate its bucket and LOCAL index from the cumulative
   histogram (driver arithmetic over K·B rows of metadata);
3. rank ONLY the straddling buckets (a log-spaced slice of the data —
   ≤ one 2^-sub_bits octave slice per needed index under any distribution
   wider than one sub-bucket) with a window partitioned by (key, bucket)
   and pull the ≤ 2 selected neighbors per key.

r15: the r8–r14 shape had a THIRD pass — a per-key count/min/max probe
feeding equal-width ``width_bucket`` boundaries. Radix bucketing removes
that pass (and its Spark action — at fixture scale the per-action driver
floor was most of the probe's cost) while keeping the same exactness
argument: bucketing depends only on the value, equal values share a
bucket, bucket ranges are monotone. A pathological distribution (nearly
all mass inside one sub-bucket's ~9% relative width) degrades step 3's
rank size, never correctness — the same documented degradation the
equal-width scheme had. Keys are the *profiled columns* — a bounded
set — so driver bookkeeping is O(keys · observed buckets) metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.operators.radix import (
    RADIX_SUB_BITS,
    bucket_bounds_py,
    radix_bucket,
)


def exact_quantile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    q: float,
    *,
    sub_bits: int = RADIX_SUB_BITS,
) -> dict[str, float]:
    """{key: exact interpolated q-quantile of value} for every key."""
    multi = exact_quantiles(df, key_col, value_col, [q], sub_bits=sub_bits)
    return {k: per[q] for k, per in multi.items()}


def exact_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    qs: "list[float]",
    *,
    sub_bits: int = RADIX_SUB_BITS,
) -> dict[str, dict[float, float]]:
    """{key: {q: exact interpolated quantile}} for every key and every q.

    All requested quantiles share the SAME two passes (histogram,
    straddling-bucket rank): the per-key target indices are the union
    over qs, so asking for p50+p95+p99 costs exactly what p50 alone
    does — the rank pass just touches a couple more buckets.

    Contract: the key domain is bounded (profiling columns, metric names —
    never a data-scale id); values must be non-null finite doubles.
    """
    bucketed = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).cast("double").alias("v"),
        radix_bucket(F.col(value_col), sub_bits=sub_bits).alias("b"),
    )
    hist: dict[str, dict[int, int]] = {}
    for r in (
        bucketed.groupBy("k", "b").agg(F.count(F.lit(1)).alias("n")).collect()
    ):
        hist.setdefault(r["k"], {})[r["b"]] = r["n"]
    if not hist:
        return {}

    # global index -> (bucket, local index) per key, from cumulative
    # counts over the ASCENDING observed buckets (radix ids are monotone
    # in value); indices are the UNION over all requested quantiles
    counts = {k: sum(per.values()) for k, per in hist.items()}
    needed: dict[str, dict[int, tuple[int, int]]] = {}
    for k, n in counts.items():
        idxs: set[int] = set()
        for q in qs:
            t = (n - 1) * q
            lo = int(t)
            idxs.add(lo)
            if t != lo:
                idxs.add(lo + 1)
        cum = 0
        per_key = {}
        for b in sorted(hist[k]):
            cnt = hist[k][b]
            for gi in idxs:
                if cum <= gi < cum + cnt:
                    per_key[gi] = (b, gi - cum)
            cum += cnt
        needed[k] = per_key

    # Pass 2 carries NO radix tree: the needed bucket ids are inverted
    # driver-side to exact double intervals (radix.bucket_bounds_py —
    # nextafter-corrected, so subnormal-boundary rounding cannot leak a
    # neighboring value in or out) and the straddling rows are selected
    # with plain range compares on ``v``. This keeps the pass-2 plan
    # SMALL: an earlier pass-2 that re-evaluated radix_bucket in the
    # filter handed janino a fat whole-stage source on every kernel
    # call (~0.5 s/call of codegen compile — dwarfing the probe pass
    # the fusion saves). Adjacent needed buckets merge into one range;
    # ranks then run within the key's filtered union, whose per-bucket
    # offsets fall out of the same histogram.
    ranges: dict[str, list[tuple[float, float]]] = {}
    for k, per in needed.items():
        bs = sorted({b for b, _ in per.values()})
        runs: list[list[int]] = []
        for b in bs:
            if runs and b == runs[-1][1] + 1:
                runs[-1][1] = b
            else:
                runs.append([b, b])
        ranges[k] = [
            (
                bucket_bounds_py(b0, sub_bits=sub_bits)[0],
                bucket_bounds_py(b1, sub_bits=sub_bits)[1],
            )
            for b0, b1 in runs
        ]
    k_expr, v_expr = F.col("k"), F.col("v")
    cond = F.lit(False)
    for i in range(max(len(rs) for rs in ranges.values())):
        lo_map = F.create_map(
            *[
                F.lit(x)
                for k, rs in ranges.items()
                if len(rs) > i
                for x in (k, rs[i][0])
            ]
        )
        hi_map = F.create_map(
            *[
                F.lit(x)
                for k, rs in ranges.items()
                if len(rs) > i
                for x in (k, rs[i][1])
            ]
        )
        cond = cond | ((v_expr >= lo_map[k_expr]) & (v_expr < hi_map[k_expr]))
    vals = df.select(
        F.col(key_col).alias("k"), F.col(value_col).cast("double").alias("v")
    )
    w = Window.partitionBy("k").orderBy("v")
    ranked = vals.where(cond).withColumn("r", F.row_number().over(w) - 1)
    # global index -> rank within the key's FILTERED union: rows of
    # included buckets below gi's bucket, plus gi's local index
    want: dict[tuple[str, int], int] = {}  # (k, filtered_rank) -> gi
    for k, per in needed.items():
        bs = sorted({b for b, _ in per.values()})
        for gi, (b, li) in per.items():
            fr = sum(hist[k][b2] for b2 in bs if b2 < b) + li
            want[(k, fr)] = gi
    pick_cond = F.lit(False)
    for k, fr in want:
        pick_cond = pick_cond | ((F.col("k") == k) & (F.col("r") == fr))
    # ≤ 2 rows per key reach the driver — the selected values, not data
    picked: dict[tuple[str, int], float] = {}
    for r in ranked.where(pick_cond).collect():
        picked[(r["k"], want[(r["k"], r["r"])])] = r["v"]

    out: dict[str, dict[float, float]] = {}
    for k, n in counts.items():
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
