"""Scale-safe dense id assignment (Postgres-serial semantics, no global sort).

The reference gets dense ids from Postgres's serial counter
(`/root/reference/migration/src/m20250414_131949_create_search.rs:27-31`).
A naive Spark translation — ``row_number()`` over a global window — collapses
to a single partition holding the whole table. This operator computes the
same dense rank in three cheap distributed passes:

1. one ``approxQuantile`` sketch of the order column → P-1 bucket
   boundaries (metadata-scale driver result),
2. boundary bucketing + per-bucket counts (P rows to the driver — metadata,
   not data),
3. ``row_number()`` within each bucket + the bucket's cumulative offset.

The window in pass 3 partitions by bucket, so the shuffle fans out to P
balanced groups instead of 1. Quantile boundaries (not equal-width ranges)
keep the groups balanced under ANY value distribution — with equal-width
bucketing, keys clustered near one end all land in one bucket and pass 3
degenerates back to the single-partition window this operator exists to
avoid. Boundary choice only affects load balance, never the result: the
dense rank of a unique order column is determined by the global value
order, and every pass agrees on the (boundaries-driven) assignment.
"""

from __future__ import annotations

from itertools import accumulate

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame,
    order_col: str,
    rid_col: str = "rid",
    num_buckets: int = 64,
) -> DataFrame:
    """Add ``rid_col`` = dense 0-based rank of ``order_col`` (must be
    numeric and unique, e.g. a key column)."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # dedupe (heavy skew can repeat a boundary) while keeping order; an
    # empty input yields no boundaries → single empty bucket, which the
    # passes below handle without a dedicated emptiness probe; and
    # num_buckets == 1 means no interior boundaries at all (approxQuantile
    # rejects an empty probability list, so don't ask)
    bounds = sorted(set(
        df.select(F.col(order_col).cast("double").alias("__v"))
        .approxQuantile("__v", probs, 1.0 / (4 * num_buckets))
    )) if probs else []

    def bucket_of(c: Column) -> Column:
        v = c.cast("double")
        expr = F.lit(0)
        for b in bounds:
            expr = expr + F.when(v > F.lit(b), 1).otherwise(0)
        return expr.cast("int")

    n_buckets = len(bounds) + 1
    bucketed = df.withColumn("__bkt", bucket_of(F.col(order_col)))
    counts = {
        r["__bkt"]: r["n"]
        for r in bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = [counts.get(b, 0) for b in range(n_buckets)]
    offsets = [0, *accumulate(sizes)][:n_buckets]
    offset_map = F.create_map(
        *[F.lit(x) for b in range(n_buckets) for x in (b, offsets[b])]
    )
    w = Window.partitionBy("__bkt").orderBy(order_col)
    return (
        bucketed.withColumn(
            rid_col,
            (
                F.row_number().over(w).cast("long")
                - 1
                + offset_map[F.col("__bkt")].cast("long")
            ),
        )
        .drop("__bkt")
    )
