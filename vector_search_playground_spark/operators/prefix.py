"""Bucketed two-pass prefix sums over an ordered relation — the
scale-safe replacement for ``sum(...) OVER (ORDER BY ...)`` global
windows, which plan as a single-partition whale.

Pass 1 buckets rows by approxQuantile boundaries of the order column and
aggregates per-bucket (count, weight-sum) partials; the driver prefixes
the ≤ ``num_buckets`` partials (metadata). Pass 2 runs the rank/cumsum
window WITHIN each bucket (1/num_buckets slices) and adds the bucket's
offset. Used by ``revenue_concentration`` (Pareto crossing) and
``weighted_median`` (weighted selection); same discipline as
operators/packing.py's sequence packing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    *,
    tiebreak_col: str,
    descending: bool = False,
    num_buckets: int = 64,
) -> tuple[DataFrame, int, int]:
    """(df + [rk, cum], n_rows, total_weight).

    ``rk`` = 1-based rank in (order_col, tiebreak_col) order;
    ``cum`` = inclusive running sum of ``weight_col`` in that order.
    Weights must be integral (cast to long) so ``cum`` is exact int64 —
    threshold tests downstream stay knife-edge-free.

    The input is scanned by BOTH passes (boundary probe + partials, then
    the within-bucket window): callers should ``.cache()`` ``df`` around
    the call and unpersist after consuming the result.
    """
    probs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = sorted(
        set(
            df.select(F.col(order_col).cast("double").alias("__v"))
            .approxQuantile("__v", probs, 1.0 / (4 * num_buckets))
        )
    )

    def bucket_of(c: Column) -> Column:
        v = c.cast("double")
        expr = F.lit(0)
        for b in bounds:
            expr = expr + F.when(v > F.lit(b), 1).otherwise(0)
        return expr.cast("int")

    nb = len(bounds) + 1
    bucketed = df.withColumn("__bkt", bucket_of(F.col(order_col)))
    parts = {
        r["__bkt"]: (r["n"], r["s"])
        for r in bucketed.groupBy("__bkt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(weight_col).cast("long")).alias("s"),
        )
        .collect()
    }
    n_rows = sum(n for n, _ in parts.values())
    total = sum(s for _, s in parts.values())
    walk = range(nb - 1, -1, -1) if descending else range(nb)
    off_n, off_s, cn, cs = {}, {}, 0, 0
    for b in walk:
        off_n[b], off_s[b] = cn, cs
        n, s = parts.get(b, (0, 0))
        cn, cs = cn + n, cs + s
    map_n = F.create_map(*[F.lit(x) for b in range(nb) for x in (b, off_n[b])])
    map_s = F.create_map(*[F.lit(x) for b in range(nb) for x in (b, off_s[b])])
    order = (
        [F.desc(order_col), F.asc(tiebreak_col)]
        if descending
        else [F.asc(order_col), F.asc(tiebreak_col)]
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = bucketed.withColumn(
        "rk", map_n[F.col("__bkt")] + F.count(F.lit(1)).over(w)
    ).withColumn(
        "cum",
        map_s[F.col("__bkt")] + F.sum(F.col(weight_col).cast("long")).over(w),
    )
    return out, n_rows, total
