"""Batch text embedding over Spark — the reference's ``create_embedding``.

Reference (`/root/reference/src/main.rs:52-60`): fastembed AllMiniLM-L6-v2,
model re-instantiated per call, batch size 1. The Spark-native version fixes
both pathologies: the model loads **once per executor process** (module-level
cache) and inference runs over **Arrow record batches** via ``mapInPandas``.

Two embedders behind one plumbing path:
- ``hash_embedder`` — deterministic seeded feature hashing → L2 normalize.
  Same contract as a sentence encoder (fixed dim, unit norm), fully
  reproducible, zero model deps → used by tests and the driver oracle.
- a real sentence-transformer would drop into ``_get_model`` unchanged; the
  heavy libs aren't in this container, so that path raises ImportError and
  is exercised only for its plumbing shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType

# --- deterministic hash embedder ------------------------------------------


def _token_vec(token: str, dim: int) -> tuple[int, float]:
    """(bucket, sign) for one token via a stable cryptographic hash.

    Deliberately NOT Python's salted ``hash()`` — results must be identical
    across executors and sessions.
    """
    h = hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest()
    val = int.from_bytes(h, "little")
    return val % dim, 1.0 if (val >> 63) & 1 else -1.0


def hash_embed_texts(texts: "pd.Series", dim: int = 64) -> "pd.Series":
    """Feature-hash each text into a unit ℝ^dim vector (pandas batch)."""
    out = []
    for t in texts:
        v = np.zeros(dim, dtype=np.float64)
        for tok in (t or "").lower().split():
            b, s = _token_vec(tok, dim)
            v[b] += s
        n = np.linalg.norm(v)
        if n > 0:
            v /= n
        out.append(v.astype(np.float32))
    return pd.Series(out)


# --- executor-side model cache (one load per executor, not per row) --------

_MODEL_CACHE: dict[str, object] = {}


def _get_model(name: str):
    if name in _MODEL_CACHE:
        return _MODEL_CACHE[name]
    if name == "hash64":
        model = lambda texts: hash_embed_texts(texts, 64)  # noqa: E731
    else:
        # Real-model path: any sentence-transformers checkpoint name (e.g.
        # "all-MiniLM-L6-v2", the reference's model). Loaded once per
        # executor process through this cache; encode runs over the Arrow
        # batch with normalized float32 output — the same contract the
        # hash embedder satisfies. Import-gated: environments without the
        # package (like this container) fail with a clear message and the
        # deterministic embedder remains the oracle default.
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as exc:
            raise ImportError(
                f"embedding model {name!r} requires sentence-transformers; "
                "only the deterministic 'hash64' embedder is available here"
            ) from exc
        st = SentenceTransformer(name)

        def model(texts: "pd.Series") -> "pd.Series":
            arr = st.encode(
                list(texts),
                convert_to_numpy=True,
                normalize_embeddings=True,
            )
            return pd.Series([v.astype(np.float32) for v in arr])

    _MODEL_CACHE[name] = model
    return model


def _resolve_model(model) -> "object":
    """String name → registry lookup; callable → treated as a zero-arg
    ENCODER FACTORY, invoked once per executor process and cached under
    its qualified name. The factory form is how a custom model (ONNX
    session, HTTP client, quantized local checkpoint) rides the same
    Arrow/mapInPandas plumbing: the factory is serialized to executors,
    the expensive construction happens executor-side exactly once, and
    every subsequent Arrow batch reuses the cached encoder."""
    if callable(model):
        key = f"__factory__:{model.__module__}.{model.__qualname__}"
        if key not in _MODEL_CACHE:
            _MODEL_CACHE[key] = model()
        return _MODEL_CACHE[key]
    return _get_model(model)


def embed_batch(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    model: str = "hash64",
    dim: int = 64,
) -> DataFrame:
    """Append an embedding column computed in Arrow batches via mapInPandas.

    mapInPandas (not a scalar pandas UDF) so a real encoder can control its
    own batch size / GPU dispatch inside the iterator; partitioning, schema
    and batch shape are identical for stub and real models.

    ``model`` is either a registry name ("hash64", or any
    sentence-transformers checkpoint when the package is installed) or a
    zero-arg ENCODER FACTORY callable — constructed once per executor and
    cached (see ``_resolve_model``), which is the integration seam for
    custom encoders.
    """
    schema = StructType(
        df.schema.fields
        + [StructField(out_col, ArrayType(FloatType(), containsNull=False))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = _resolve_model(model)
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = encoder(pdf[text_col])
            yield pdf

    return df.mapInPandas(run, schema=schema)


def embed_query(text: str, model: str = "hash64", dim: int = 64) -> list[float]:
    """Driver-side single-string embed (the reference's query-time path,
    `src/main.rs:85-86`); same encoder as the distributed batch path."""
    return [float(x) for x in _resolve_model(model)(pd.Series([text])).iloc[0]]
