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

# Bound on the broadcast query side of knn_batch: 64k queries × 384-dim
# float64 ≈ 200 MB broadcast — about where a broadcast join side should
# stop. Larger query sets must be chunked by the caller.
MAX_BATCH_QUERIES = 65_536

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

    Physical shape: the query set is broadcast as a float64 matrix; each
    Arrow batch of the corpus computes its |batch|×|Q| distances in one
    BLAS matmul and keeps only its LOCAL top-k-plus-ties per query, so
    the final per-query window ranks ≤ batches·|Q|·(k+ties) candidate rows —
    never the |Q|·|C| cross product. (The previous crossJoin+window
    formulation shuffled all |Q|·|C| distance rows: 21 s for 50×200k vs
    ~2 s here, and unboundedly worse at corpus scale.)

    Determinism: BLAS matmul summation order varies with threading, so a
    distance at the rounding boundary can flip between runs (round-3
    driver hash failure with identical row counts). NumPy therefore only
    SELECTS candidates; the reported ``dist`` is recomputed on the
    surviving ≤ batches·|Q|·(k+ties) rows with the deterministic
    sequential-fold HOF kernel (functions/vector.py) via a broadcast join
    back to the query vectors — the same kernel every single-query path
    uses, so knn_batch(q)=knn(q) bit-for-bit. The local cut is
    VALUE-based, not position-based: it keeps every row within two
    rounding steps of the batch-local k-th distance (plus the same slack
    on the threshold). Two steps because the one-step BLAS-vs-HOF flip
    can move both the candidate row and the k-th anchor row; a
    position cut (top k+pad) is unsafe when rounding creates tie groups
    wider than the pad — a tie group spanning the k-th boundary could
    locally evict a row the final deterministic ranking needs.
    """
    import numpy as np
    import pandas as pd

    # The query set is this operator's broadcast BUILD side — the same
    # bounded-size contract every broadcast join lives with. Cap the
    # collect so a mistakenly huge query table fails fast with guidance
    # instead of silently materializing on the driver.
    qrows = queries.select(query_id, query_vec).limit(
        MAX_BATCH_QUERIES + 1
    ).collect()
    if len(qrows) > MAX_BATCH_QUERIES:
        raise ValueError(
            f"knn_batch: query set exceeds {MAX_BATCH_QUERIES} rows — it is "
            "the broadcast build side and must stay bounded. Partition the "
            "query table and call knn_batch per chunk (the corpus is "
            "scanned once per chunk either way)."
        )
    q_ids = [r[query_id] for r in qrows]
    q_mat = np.array([r[query_vec] for r in qrows], dtype=np.float64)
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_mat))

    # Selection margin: with round_to set, a BLAS-vs-HOF discrepancy is at
    # most one rounding step; unrounded it is ~1 ulp. The value cut below
    # admits 2·slack past the local k-th distance (candidate flip + anchor
    # flip); threshold slack likewise admits boundary rows locally — the
    # deterministic filter below makes the final cut.
    slack = 10.0 ** (-round_to) if round_to is not None else 1e-9

    out_fields = [f for f in corpus.schema.fields]
    qid_field = queries.schema[query_id]
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        out_fields + [StructField(query_id, qid_field.dataType, True)]
    )
    corpus_cols = [f.name for f in out_fields]

    def local_topk(batches):
        ids_q, mat_q = bc.value
        nq = len(ids_q)
        if nq == 0:
            return
        qn = np.linalg.norm(mat_q, axis=1)
        for pdf in batches:
            if pdf.empty:
                continue
            c = np.array(list(pdf[corpus_vec]), dtype=np.float64)
            dots = c @ mat_q.T
            if metric in ("cosine", "cosine_norm"):
                if metric == "cosine":
                    cn = np.linalg.norm(c, axis=1)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        dist = 1.0 - dots / np.outer(cn, qn)
                else:
                    dist = 1.0 - dots
            elif metric == "l2":
                c2 = (c * c).sum(axis=1)
                q2 = (mat_q * mat_q).sum(axis=1)
                dist = np.sqrt(
                    np.maximum(c2[:, None] + q2[None, :] - 2.0 * dots, 0.0)
                )
            elif metric == "dot":
                dist = -dots
            else:
                raise ValueError(f"metric {metric!r} not in {sorted(METRICS)}")
            if round_to is not None:
                dist = np.round(dist, round_to)
            # Value-based cut, vectorized across ALL queries at once
            # (the per-query Python loop with pdf.iloc/pd.concat was the
            # serial cost center: |Q| iterations per batch — guide §4.2).
            # Semantics identical to the per-query form: every row the
            # global deterministic top-k could need from this batch has
            # HOF dist ≤ the batch k-th HOF dist; both sides may flip
            # one rounding step vs the BLAS values we have, hence
            # 2·slack. Tie groups of any width survive intact.
            nc = dist.shape[0]
            if threshold is not None:
                valid = dist < threshold + slack
                # invalid rows pushed past every valid one so the
                # column-wise partition ranks only the valid candidates
                dmask = np.where(valid, dist, np.inf)
            else:
                valid = np.ones_like(dist, dtype=bool)
                dmask = dist
            if nc > k:
                kth = np.partition(dmask, k - 1, axis=0)[k - 1, :]
            else:
                # ≤ k candidates in the batch: keep-all, like the
                # per-query dk.max() (NaN columns select nothing either
                # way — comparisons with NaN are False in both forms)
                kth = dmask.max(axis=0)
            sel_mask = valid & (dmask <= kth[None, :] + 2.0 * slack)
            rows_ix, q_ix = np.nonzero(sel_mask)
            if rows_ix.size:
                sel = pdf.iloc[rows_ix][corpus_cols].reset_index(drop=True)
                sel[query_id] = np.asarray(ids_q, dtype=object)[q_ix]
                yield sel

    candidates = corpus.mapInPandas(local_topk, out_schema)

    # The final per-query window below needs candidates hash-partitioned
    # by query_id — that exchange is paid either way. Moving it BEFORE
    # the re-score join (repartition by the same key: the window reuses
    # the partitioning, no second shuffle) lifts the deterministic HOF
    # kernel — interpreted per array element (higher-order functions are
    # CodegenFallback), by far the heaviest per-row work here — off the
    # corpus scan's partitioning (one split on a small fixture = one
    # serial task) onto the full post-shuffle parallelism.
    candidates = candidates.repartition(query_id)

    # Deterministic re-score: broadcast-join the tiny query table back on
    # (map-side, no shuffle) and evaluate the HOF kernel — candidate count
    # is ≤ batches·|Q|·(k+ties), so the expensive exact kernel touches a
    # sliver of the corpus.
    qv = "__knn_batch_query_vec"
    rescored = candidates.join(
        F.broadcast(
            queries.select(
                F.col(query_id), F.col(query_vec).alias(qv)
            )
        ),
        on=query_id,
    ).withColumn(dist_col, distance(metric, F.col(corpus_vec), F.col(qv)))
    if round_to is not None:
        rescored = rescored.withColumn(
            dist_col, F.round(F.col(dist_col), round_to)
        )
    if threshold is not None:
        rescored = rescored.where(F.col(dist_col) < F.lit(threshold))
    order = [F.col(dist_col).asc()]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        rescored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn", qv)
    )
