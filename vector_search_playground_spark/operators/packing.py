"""Sequence packing: assign documents to fixed token-budget training
sequences, in global document order, without a global window.

North-star training-data op: LLM pretraining batches are built by packing
documents back-to-back into fixed-length token windows ("sequence packing"
in the T5/GPT data-pipeline literature). The contiguous variant — keep the
corpus order, cut a new sequence every `budget` tokens — is deterministic
and SQL-expressible (an exclusive running sum), which makes it
oracle-checkable, unlike greedy bin-packing whose output depends on
traversal order.

The naive Spark phrasing is ``SUM(tokens) OVER (ORDER BY doc_id)`` — a
GLOBAL window that collapses the whole corpus onto one partition, the same
scale-killer ``operators/ids.py`` exists to avoid. Same cure, generalized
from COUNT to SUM:

1. ``approxQuantile`` boundaries on the order column → P balanced buckets
   (driver gets P-1 doubles — metadata);
2. per-bucket token totals (P rows to the driver) → exclusive bucket
   offsets via a running sum in plain Python;
3. within-bucket exclusive prefix sum (window partitioned by bucket — P
   balanced groups, never 1) + the bucket offset = the global exclusive
   prefix sum; ``seq_id = floor(prefix / budget)``.

Boundary placement affects only load balance: the prefix sum is fixed by
the global order, and passes 2 and 3 agree on any boundary assignment.
"""

from __future__ import annotations

from itertools import accumulate

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    budget: int,
    *,
    seq_col: str = "seq_id",
    num_buckets: int = 64,
) -> DataFrame:
    """Add ``seq_col`` = floor(exclusive-prefix-sum(weight) / budget) under
    the global ``order_col`` order (``order_col`` must be unique, e.g. a
    key column); all intermediate bucketing columns are dropped."""
    probs = [i / num_buckets for i in range(1, num_buckets)]
    # num_buckets == 1 → no interior boundaries (approxQuantile rejects an
    # empty probability list, so don't ask)
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
    totals = {
        r["__bkt"]: r["w"]
        for r in bucketed.groupBy("__bkt")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("w"))
        .collect()
    }
    sizes = [totals.get(b, 0) for b in range(n_buckets)]
    offsets = [0, *accumulate(sizes)][:n_buckets]
    offset_map = F.create_map(
        *[F.lit(x) for b in range(n_buckets) for x in (b, offsets[b])]
    )
    w = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = (
        F.coalesce(F.sum(F.col(weight_col).cast("long")).over(w), F.lit(0))
        + offset_map[F.col("__bkt")].cast("long")
    )
    return (
        bucketed.withColumn(
            seq_col, F.floor(prefix / F.lit(float(budget))).cast("long")
        )
        .drop("__bkt")
    )
