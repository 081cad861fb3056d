"""Product quantization (PQ) — the codebook member of the quantization
family (int8 = ``quantize_embed``, 1-bit = ``quantize_binary``).

Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split the d-dim space into M subspaces, k-means each
subspace to K centroids, store each vector as M small codes (here M=8,
K=16 → 8 nibbles ≈ 4 bytes vs 256 bytes of f32 — 64×), and answer
queries with an asymmetric distance computation (ADC): a per-query
M×K lookup table of subspace distances, summed per code word.

Spark mapping:
- **Codebook fit** is driver-side numpy Lloyd iterations over a BOUNDED
  deterministic sample (vec_id-ordered). At 100 TB the sample, not the
  corpus, trains the codebook — standard PQ practice — and the corpus
  is never collected.
- **Encoding** is a vectorized Pandas UDF (argmin over K centroids per
  subspace, Arrow-batched) — genuinely inexpressible as built-in
  column ops without exploding M×K comparison expressions.
- **ADC scoring** stays JVM-side: the query's lookup table ships as a
  constant-folded literal array-of-arrays and the per-row sum is a
  zip_with/aggregate HOF over the M codes — no Python in the scan.
- Vectors are L2-normalized before fit/encode so ADC's L2² ranking is
  monotone with cosine distance (2 − 2cos), matching the engine's
  cosine surface.
"""

# NOTE: no `from __future__ import annotations` here — the pandas_udf
# signature below relies on evaluated pd.Series annotations.
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_SUB = 8  # subspaces
K_CODES = 16  # centroids per subspace
FIT_SAMPLE = 2000  # codebook training sample size
LLOYD_ITERS = 10


def _normalize(mat):
    import numpy as np

    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-30)


def fit_codebooks(emb: DataFrame, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", seed: int = 42):
    """M×K×d_sub codebooks from a deterministic bounded sample.

    Sample = first FIT_SAMPLE vectors by id (TakeOrderedAndProject —
    bounded collect); Lloyd with fixed-seed init, empty clusters
    re-seeded from the farthest points so K stays populated."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(FIT_SAMPLE)
        .collect()
    )
    x = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    d = x.shape[1]
    d_sub = d // M_SUB
    rng = np.random.RandomState(seed)
    books = []
    for m in range(M_SUB):
        sub = x[:, m * d_sub : (m + 1) * d_sub]
        cent = sub[rng.choice(len(sub), K_CODES, replace=False)].copy()
        for _ in range(LLOYD_ITERS):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for k in range(K_CODES):
                mask = assign == k
                if mask.any():
                    cent[k] = sub[mask].mean(axis=0)
                else:
                    cent[k] = sub[d2.min(axis=1).argmax()]
        books.append(cent)
    return np.stack(books)  # (M, K, d_sub)


def encode(emb: DataFrame, books, *, vec_col: str = "embedding",
           id_col: str = "vec_id",
           passthrough: tuple[str, ...] = ()) -> DataFrame:
    """(id, codes array<int>, *passthrough) — vectorized argmin per
    subspace in Arrow batches; the codebook rides along as a closure
    broadcast. ``passthrough`` columns (e.g. an IVF ``centroid_id``)
    ride the projection untouched so a partitioned-code sidecar can be
    written without a re-join."""
    from pyspark.sql.functions import pandas_udf

    m_sub, k_codes, d_sub = books.shape

    @pandas_udf("array<int>")
    def pq_encode(vecs: pd.Series) -> pd.Series:
        import numpy as np

        mat = _normalize(
            np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        )
        n = mat.shape[0]
        codes = np.empty((n, m_sub), dtype=np.int32)
        for m in range(m_sub):
            sub = mat[:, m * d_sub : (m + 1) * d_sub]
            d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return emb.select(
        id_col, pq_encode(F.col(vec_col)).alias("codes"), *passthrough
    )


def adc_table(books, qvec) -> list[list[float]]:
    """M×K lookup table of subspace L2² distances for one query."""
    import numpy as np

    q = _normalize(np.asarray(qvec, dtype=np.float64)[None, :])[0]
    m_sub, k_codes, d_sub = books.shape
    return [
        [
            float(((q[m * d_sub : (m + 1) * d_sub] - books[m][k]) ** 2).sum())
            for k in range(k_codes)
        ]
        for m in range(m_sub)
    ]


def adc_distance(codes_col, table: list[list[float]]):
    """JVM HOF: Σ_m table[m][code_m] with the table as a constant-folded
    literal array-of-arrays — the scan-side ADC never leaves codegen."""
    lut = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in table]
    )
    return F.aggregate(
        F.zip_with(
            codes_col,
            lut,
            lambda c, row: F.element_at(row, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def load_or_fit_codebooks(emb: DataFrame, sf_dir: str):
    """Codebooks cached per fixture content fingerprint (the ivf/lsh
    index-sidecar discipline): fit once, serve every subsequent search
    from the JSON sidecar. Returns (books, mse, was_cached) where mse is
    the mean squared reconstruction error over the training sample —
    the build-quality number ``index_build_pq`` surfaces."""
    import json
    import os

    import numpy as np

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    fp = _fixture_fingerprint(sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"pq_codebooks_{tag}_{fp}.json")
    if os.path.exists(path):
        with open(path) as f:
            state = json.load(f)
        return np.array(state["books"]), float(state["mse"]), True
    books = fit_codebooks(emb)
    # reconstruction error on the same deterministic sample the fit used
    rows = (
        emb.select("vec_id", "embedding").orderBy("vec_id").limit(FIT_SAMPLE).collect()
    )
    x = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    d_sub = x.shape[1] // M_SUB
    err = 0.0
    for m in range(M_SUB):
        sub = x[:, m * d_sub : (m + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        err += float(d2.min(axis=1).mean())
    mse = err / M_SUB
    tmp = f"{path}.tmp"
    os.makedirs(SCRATCH, exist_ok=True)
    with open(tmp, "w") as f:
        json.dump({"books": books.tolist(), "mse": mse}, f)
    os.replace(tmp, path)
    return books, mse, False
