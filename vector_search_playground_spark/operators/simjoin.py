"""Exact thresholded similarity self-join — distributed block-matrix kernel.

The semantics are the all-pairs query in ``queries/llm_pipeline.py``
(`sim_join`): every unordered pair (a_id < b_id) with cosine distance
below a threshold. All-pairs is O(n²) *distance evaluations* no matter
what; the engineering questions are (a) the cost per evaluation and
(b) whether any single machine ever has to hold the whole relation.

- Per-evaluation cost: a `zip_with`+`aggregate` HOF per pair is
  interpreted (Catalyst's higher-order functions are CodegenFallback),
  which at n=2000 means 4M interpreted 64-step folds — measured 135 s at
  sf0.1. Every distance here comes out of a BLAS matmul instead.
- Distribution: the corpus is hash-assigned to B blocks
  (``pmod(xxhash64(id), B)`` — deterministic, skew-free even for
  clustered id ranges). Each unordered block pair {i ≤ j} is one group
  of a ``groupBy(gi, gj).applyInPandas``: rows of block i arrive tagged
  side-A, rows of block j side-B (the diagonal group reuses its side-A
  rows for both), and one chunked ``A @ B.T`` per group emits exactly
  the pairs that pass the threshold and id-order masks.

Every row is replicated to exactly B groups, so the shuffle is B·n
vector rows — linear in the corpus for fixed B — and NOTHING is
collected to the driver (the earlier broadcast formulation materialized
the whole embedding relation driver-side; at 100× scale that is the
first thing to die). Per-task memory is the two block slices,
~2·(n/B)·d·8 bytes: pick ``num_blocks`` so a block fits an executor —
the default scales with cluster parallelism, and raising B trades
linearly more shuffle for quadratically more, smaller, tasks.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

PAIRS_SCHEMA = StructType(
    [
        StructField("a_id", LongType(), False),
        StructField("b_id", LongType(), False),
        StructField("dist", DoubleType(), False),
    ]
)

# Rows of side A processed per matmul inside a block-pair task, bounding the
# (chunk × |block|) distance matrix to a few MB regardless of block size.
_CHUNK_ROWS = 4096


def sim_join_exact(
    corpus: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
    num_blocks: int | None = None,
) -> DataFrame:
    """All pairs (a < b by id) with cosine_distance < threshold.

    ``num_blocks`` defaults to ~√(2·defaultParallelism) so the B(B+1)/2
    block-pair tasks saturate the cluster; at data scale, size it so one
    block (n/B vectors) fits comfortably in executor memory.
    """
    import numpy as np

    if num_blocks is None:
        par = corpus.sparkSession.sparkContext.defaultParallelism
        num_blocks = max(2, math.isqrt(2 * par))
    B = num_blocks

    p = F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).cast("int")
    # Row in block p joins group (p, j) as side A for every j ≥ p, and group
    # (i, p) as side B for every i < p — each unordered row pair meets in
    # exactly one group, the diagonal only from the A rule.
    a_entries = F.filter(
        F.array(*[
            F.struct(
                p.alias("gi"),
                F.lit(j).cast("int").alias("gj"),
                F.lit(0).cast("int").alias("side"),
            )
            for j in range(B)
        ]),
        lambda e: e["gj"] >= e["gi"],
    )
    b_entries = F.filter(
        F.array(*[
            F.struct(
                F.lit(i).cast("int").alias("gi"),
                p.alias("gj"),
                F.lit(1).cast("int").alias("side"),
            )
            for i in range(B)
        ]),
        lambda e: e["gi"] < e["gj"],
    )
    tagged = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.explode(F.concat(a_entries, b_entries)).alias("e"),
    ).select("__id", "__vec", "e.gi", "e.gj", "e.side")

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = key[0], key[1]
        a = pdf[pdf["side"] == 0]
        b = a if gi == gj else pdf[pdf["side"] == 1]
        if a.empty or b.empty:
            return pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"),
                 "b_id": pd.Series(dtype="int64"),
                 "dist": pd.Series(dtype="float64")}
            )
        a_ids = a["__id"].to_numpy(dtype=np.int64)
        a_mat = np.array(list(a["__vec"]), dtype=np.float64)
        a_norm = np.linalg.norm(a_mat, axis=1)
        b_ids = b["__id"].to_numpy(dtype=np.int64)
        b_mat = np.array(list(b["__vec"]), dtype=np.float64)
        b_norm = np.linalg.norm(b_mat, axis=1)
        frames = []
        for lo in range(0, len(a_ids), _CHUNK_ROWS):
            hi = lo + _CHUNK_ROWS
            dist = 1.0 - (a_mat[lo:hi] @ b_mat.T) / np.outer(
                a_norm[lo:hi], b_norm
            )
            keep = dist < threshold
            if gi == gj:
                # Same block on both sides: the grid holds both orientations
                # and the self-diagonal — keep the canonical half only.
                keep &= a_ids[lo:hi, None] < b_ids[None, :]
            ai, bi = np.nonzero(keep)
            if ai.size:
                # Distinct blocks meet each unordered pair exactly once, in
                # whichever orientation the block assignment produced —
                # canonicalize to (smaller id, larger id) on output.
                ids_a = a_ids[lo:hi][ai]
                ids_b = b_ids[bi]
                frames.append(pd.DataFrame(
                    {"a_id": np.minimum(ids_a, ids_b),
                     "b_id": np.maximum(ids_a, ids_b),
                     "dist": dist[ai, bi]}
                ))
        if not frames:
            return pd.DataFrame(
                {"a_id": pd.Series(dtype="int64"),
                 "b_id": pd.Series(dtype="int64"),
                 "dist": pd.Series(dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    out = tagged.groupBy("gi", "gj").applyInPandas(block_pairs, PAIRS_SCHEMA)
    return out.select("a_id", "b_id", F.round("dist", round_to).alias("dist"))
