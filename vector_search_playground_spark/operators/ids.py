"""Scale-safe dense id assignment (Postgres-serial semantics, no global sort).

The reference gets dense ids from Postgres's serial counter
(`/root/reference/migration/src/m20250414_131949_create_search.rs:27-31`).
A naive Spark translation — ``row_number()`` over a global window — collapses
to a single partition holding the whole table. This operator computes the
same dense rank in three cheap distributed passes:

1. one aggregate for ``min/max`` of the order column (metadata-scale),
2. deterministic equal-width bucketing on the order column + per-bucket
   counts (P rows to the driver — metadata, not data),
3. ``row_number()`` within each bucket + the bucket's cumulative offset.

The window in pass 3 partitions by bucket, so the shuffle fans out to P
balanced groups instead of 1 — each task holds ~n/P rows at any scale.
Bucketing is a pure function of the value (not sampling), so every pass
agrees on the assignment and the result is deterministic.
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
    lo, hi = df.agg(
        F.min(order_col).cast("double"), F.max(order_col).cast("double")
    ).first()
    if lo is None:  # empty input
        return df.withColumn(rid_col, F.lit(None).cast("long"))
    width = max((hi - lo) / num_buckets, 1e-300)

    def bucket_of(c: Column) -> Column:
        return F.least(
            F.lit(num_buckets - 1),
            F.floor((c.cast("double") - F.lit(lo)) / F.lit(width)),
        ).cast("int")

    bucketed = df.withColumn("__bkt", bucket_of(F.col(order_col)))
    counts = {
        r["__bkt"]: r["n"]
        for r in bucketed.groupBy("__bkt").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    sizes = [counts.get(b, 0) for b in range(num_buckets)]
    offsets = [0, *accumulate(sizes)][:num_buckets]
    offset_map = F.create_map(
        *[F.lit(x) for b in range(num_buckets) for x in (b, offsets[b])]
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
