"""Interval coalescing — the gaps-and-islands primitive for VARIABLE
length intervals.

The break test must be against the running max of ALL previous interval
ends, not the previous row's end: with variable lengths, a long interval
can swallow several later short ones, and ``lag(e)`` would wrongly split
the island at the first swallowed row. One shuffle on the key; the
running-max window, the cumulative island counter, and the final
aggregate all reuse that exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_intervals(
    iv: DataFrame,
    *,
    key_col: str = "user_id",
    start_col: str = "s",
    end_col: str = "e",
    order_col: str = "event_id",
) -> DataFrame:
    """(key, island, n_intervals, start_us, end_us) — maximal unions of
    overlapping-or-touching [start, end] intervals per key.
    ``order_col`` breaks start-time ties deterministically."""
    w = Window.partitionBy(key_col).orderBy(start_col, order_col)
    m = iv.withColumn(
        "prev_max_e",
        F.max(end_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    g = m.withColumn(
        "brk",
        F.when(
            F.col("prev_max_e").isNull()
            | (F.col(start_col) > F.col("prev_max_e")),
            1,
        ).otherwise(0),
    )
    isl = g.withColumn(
        "island",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy(key_col, "island").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.min(start_col).alias("start_us"),
        F.max(end_col).alias("end_us"),
    )
