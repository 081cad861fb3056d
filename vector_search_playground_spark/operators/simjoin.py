"""Exact thresholded similarity self-join — broadcast numpy kernel.

The semantics are the all-pairs query in ``queries/llm_pipeline.py``
(`sim_join`): every unordered pair (a_id < b_id) with cosine distance
below a threshold. All-pairs is O(n²) *distance evaluations* no matter
what; the engineering question is the cost per evaluation.

A `zip_with`+`aggregate` HOF per pair is interpreted (Catalyst's
higher-order functions are CodegenFallback), which at n=2000 means 4M
interpreted 64-step folds — measured 135 s at sf0.1. This operator keeps
the distances in one BLAS call instead:

- the smaller side is **collected and broadcast** — exactly what Spark's
  own BroadcastHashJoin does with its build side (collect to driver,
  ship to every executor once); as a (n×d) float64 matrix it is ~1 MB at
  fixture scale;
- the probe side streams through ``mapInPandas``: each Arrow batch
  becomes an (m×d) matrix, one ``A @ B.T`` produces every pairwise dot,
  and the threshold + id-order masks select output pairs.

Partition-parallel over the probe side, zero shuffle, one matmul per
batch. At 100 TB the exact form still only ever runs on bounded samples
(recall measurement for the LSH path — operators/dedup.py); the
broadcast-side bound is the same one every broadcast join lives with.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def sim_join_exact(
    corpus: DataFrame,
    *,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All pairs (a < b by id) with cosine_distance < threshold."""
    import numpy as np

    side = corpus.select(id_col, vec_col).collect()
    b_ids = np.array([r[id_col] for r in side], dtype=np.int64)
    b_mat = np.array([r[vec_col] for r in side], dtype=np.float64)
    b_norm = np.linalg.norm(b_mat, axis=1)
    bc = corpus.sparkSession.sparkContext.broadcast((b_ids, b_mat, b_norm))

    def pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b, norm_b = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            a_ids = pdf[id_col].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            a_norm = np.linalg.norm(a_mat, axis=1)
            dist = 1.0 - (a_mat @ mat_b.T) / np.outer(a_norm, norm_b)
            keep = (dist < threshold) & (a_ids[:, None] < ids_b[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "a_id": a_ids[ai],
                    "b_id": ids_b[bi],
                    "dist": dist[ai, bi],
                }
            )

    out = corpus.select(id_col, vec_col).mapInPandas(pairs, PAIRS_SCHEMA)
    return out.select("a_id", "b_id", F.round("dist", round_to).alias("dist"))
