"""Exact K-nearest-neighbor search — the reference's flagship operator.

Reference pipeline (`/root/reference/src/main.rs:85-96`): embed the query →
``vector <=> :q`` cosine distance against every row → ``WHERE dist < t``
(default t=0.6, `src/main.rs:20-21`) → ``ORDER BY dist ASC`` → ``LIMIT 10``
(hardcoded k, `src/main.rs:91`) → project content. Exact brute-force: the
reference has no ANN index (migration creates the bare table only).

Spark-first design:
- The corpus scan is an embarrassingly parallel map (distance per row);
  Catalyst plans ``orderBy(dist).limit(k)`` as **TakeOrderedAndProject** —
  a per-partition top-k heap merged on the driver. No global sort, no
  shuffle of the corpus. At 100 TB this is the only sane physical plan:
  each executor returns ≤ k rows regardless of corpus size.
- The threshold filter runs before the heap, shrinking heap pressure.
- ``knn_batch`` (many queries at once) broadcasts the query set and does a
  windowed per-query top-k — corpus still scanned exactly once.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.functions import vector as V

METRICS = {
    "cosine": V.cosine_distance,
    # fast path for known-unit vectors: 1 aggregate instead of 3
    "cosine_norm": lambda a, b: V.cosine_distance(a, b, normalized=True),
    "l2": V.l2_distance,
    "dot": V.inner_product_distance,
}


def as_vector_literal(vec: Sequence[float]) -> Column:
    """A query vector as a Catalyst array literal (constant-folded, shipped
    to executors inside the serialized plan — no join, no broadcast var)."""
    return F.array(*[F.lit(float(x)) for x in vec])


def distance(metric: str, a: Column, b: Column) -> Column:
    try:
        return METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"metric {metric!r} not in {sorted(METRICS)}") from None


def knn(
    corpus: DataFrame,
    query_vec: Column | Sequence[float],
    *,
    vector_col: str = "embedding",
    metric: str = "cosine",
    threshold: float | None = 0.6,
    k: int = 10,
    dist_col: str = "dist",
    tiebreak: str | None = None,
) -> DataFrame:
    """Exact top-k nearest rows of ``corpus`` to ``query_vec``.

    Defaults reproduce the reference's search verb: cosine, t=0.6, k=10.
    ``tiebreak`` adds a deterministic secondary sort key (needed whenever
    results feed a value-hash comparison; LIMIT under distance ties is
    otherwise nondeterministic in any engine).
    """
    if not isinstance(query_vec, Column):
        query_vec = as_vector_literal(query_vec)
    out = corpus.withColumn(dist_col, distance(metric, F.col(vector_col), query_vec))
    if threshold is not None:
        out = out.where(F.col(dist_col) < F.lit(threshold))
    order = [F.col(dist_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    return out.orderBy(*order).limit(k)


def knn_batch(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    corpus_vec: str = "embedding",
    query_vec: str = "query_embedding",
    query_id: str = "query_id",
    metric: str = "cosine",
    threshold: float | None = None,
    k: int = 10,
    dist_col: str = "dist",
    tiebreak: str | None = None,
    round_to: int | None = None,
) -> DataFrame:
    """Top-k corpus neighbors for EVERY query row, in one corpus scan.

    Plan shape: broadcast(queries) ⨯ corpus → distance → per-query window
    top-k. The broadcast keeps the corpus un-shuffled (map-side expansion);
    the window's ``partitionBy(query_id)`` shuffles only |Q|·|C| distance
    rows already reduced by the threshold filter. For large |Q|, partition
    the query set and iterate — never shuffle the corpus.

    ``round_to`` rounds the distance BEFORE ranking — required whenever the
    result feeds a cross-engine comparison: ranking on rounded values plus
    a tiebreak makes the top-k set identical in any engine, where raw
    doubles may differ in the last ulp and flip boundary rows.
    """
    q = F.broadcast(queries)
    joined = corpus.crossJoin(q).withColumn(
        dist_col, distance(metric, F.col(corpus_vec), F.col(query_vec))
    )
    if round_to is not None:
        joined = joined.withColumn(dist_col, F.round(F.col(dist_col), round_to))
    if threshold is not None:
        joined = joined.where(F.col(dist_col) < F.lit(threshold))
    order = [F.col(dist_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn", query_vec)
    )
