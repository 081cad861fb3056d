"""Bucketed interval (range) join — equi-join plan for a non-equi predicate.

North-star relational surface: the reference's SQL frontend would express
"every point inside an interval" as a θ-join (`WHERE p.ts >= i.start AND
p.ts < i.end`), and Postgres would nested-loop it with an index. On Spark a
raw θ-join of two data-scale relations is a BroadcastNestedLoopJoin or a
CartesianProduct — quadratic work that no executor count survives at
100 TB. The public fix (used by every distributed interval-join engine,
e.g. Flink's interval join and the Spark range-join hints in Databricks'
docs) is to discretize time into buckets of width ≥ the interval length:

1. each interval [start, end) is exploded to the ⌈span/width⌉ (≤ 2 when
   width ≥ max interval length) buckets it overlaps — `sequence()` +
   `explode`, all codegen'd;
2. each point belongs to exactly ONE bucket (`ts div width`), so every
   qualifying (interval, point) pair meets in exactly one bucket — no
   post-join dedup needed;
3. the join becomes an equi-join on the bucket id, refined by the exact
   range predicate — a plain shuffle-hash/sort-merge join whose cost is
   |intervals| + |points| + |output|, never |intervals| × |points|.

Skew note: a bursty hour concentrates its points in one bucket; AQE's
skew-join split handles moderate cases, and the bucket key extends to
(bucket, salt) with an interval-side explode if a single bucket outgrows an
executor. Bucket width is the knob: smaller widths sharpen pruning but fan
intervals into more buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    *,
    start_col: str,
    end_col: str,
    ts_col: str,
    bucket_width: int,
) -> DataFrame:
    """All (interval, point) pairs with ``start <= ts < end`` (end
    exclusive), as an equi-join on time buckets.

    ``start_col``/``end_col``/``ts_col`` must be integer epoch columns in
    the same unit (µs here); ``bucket_width`` in that unit. Column names
    must be disjoint between the two inputs (select/alias first).
    """
    lb = intervals.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {int(bucket_width)}"),
                # end is exclusive → last covered instant is end-1
                F.expr(f"({end_col} - 1) div {int(bucket_width)}"),
            )
        ),
    )
    rb = points.withColumn("__bkt", F.expr(f"{ts_col} div {int(bucket_width)}"))
    joined = lb.join(rb, "__bkt").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__bkt")
