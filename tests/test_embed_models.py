"""The embedding seam beyond the hash embedder: a custom encoder factory
rides the same Arrow plumbing with once-per-executor construction, and a
real sentence-transformers checkpoint drops in when the package exists
(skipped where it doesn't — this container has no model libs)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from vector_search_playground_spark.functions.embed import embed_batch


def test_callable_factory_loads_once_per_worker(spark, tmp_path):
    """1000 rows, 2 partitions, 50-row Arrow batches → ~20 encoder calls,
    but the FACTORY must run at most once per python worker (the
    per-executor model cache — the thing that makes real-model batch
    embedding viable; the reference reloads its model per call,
    src/main.rs:52-60)."""
    marker_dir = str(tmp_path / "loads")
    os.makedirs(marker_dir, exist_ok=True)

    def factory():
        import os as _os
        import uuid as _uuid

        open(
            _os.path.join(
                marker_dir, f"{_os.getpid()}_{_uuid.uuid4().hex}"
            ),
            "w",
        ).close()

        def encode(texts):
            import numpy as _np
            import pandas as _pd

            return _pd.Series(
                [_np.array([len(t), 1.0], dtype=_np.float32) for t in texts]
            )

        return encode

    df = (
        spark.range(1000)
        .select(F.concat(F.lit("doc "), F.col("id")).alias("text"))
        .repartition(2)
    )
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        rows = embed_batch(df, "text", model=factory).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert len(rows) == 1000
    for r in rows:
        assert r["embedding"][0] == float(len(r["text"]))
    n_loads = len(os.listdir(marker_dir))
    assert 1 <= n_loads <= 2, (
        f"factory ran {n_loads} times — expected once per worker "
        "(2 partitions), got per-batch construction"
    )


def test_minilm_factory_real_forward_pass(spark):
    """The round-7 gap: the real-model plumbing had never executed —
    only the hash embedder had. This runs an actual multi-layer
    transformer forward pass (seeded numpy MiniLM architecture) through
    embed_batch's factory path and checks the encoder contract."""
    import numpy as np

    from vector_search_playground_spark.functions.minilm import (
        DIM,
        minilm_factory,
    )

    df = spark.createDataFrame(
        [
            ("the quick brown fox",),
            ("a completely different sentence",),
            ("the quick brown fox",),  # duplicate text → identical vector
            ("",),  # empty text: [CLS]-only sequence must not NaN
        ],
        "text: string",
    ).repartition(3)
    rows = embed_batch(df, "text", model=minilm_factory).collect()
    assert len(rows) == 4
    by_text = {}
    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        assert v.shape[0] == DIM
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5
        by_text.setdefault(r["text"], []).append(v)
    a, b = by_text["the quick brown fox"]
    assert np.array_equal(a, b), "same text, different partitions, must match"
    # different sentences must not collapse to one point
    other = by_text["a completely different sentence"][0]
    assert float(a @ other) < 0.999


def test_minilm_attention_actually_mixes_tokens():
    """Architecture sanity, not plumbing: word ORDER must change the
    embedding (self-attention + positional embeddings), which no
    bag-of-words hash embedder satisfies — proof this is a genuinely
    different compute graph on the same seam."""
    import numpy as np

    from vector_search_playground_spark.functions.minilm import MiniEncoder

    enc = MiniEncoder()
    v = enc.encode(["alpha beta gamma", "gamma beta alpha"])
    a, b = np.asarray(v.iloc[0]), np.asarray(v.iloc[1])
    assert not np.array_equal(a, b)
    # and the two orderings still share vocabulary → far from orthogonal
    assert 0.2 < float(a.astype(np.float64) @ b.astype(np.float64)) < 0.99999


def test_minilm_weights_deterministic_across_processes():
    """Two independent constructions (as two executors would do) agree
    bit-for-bit — the certifiable-seeded-weights property."""
    import numpy as np

    from vector_search_playground_spark.functions.minilm import MiniEncoder

    v1 = MiniEncoder().encode(["reproducible"]).iloc[0]
    v2 = MiniEncoder().encode(["reproducible"]).iloc[0]
    assert np.array_equal(np.asarray(v1), np.asarray(v2))


def test_unknown_string_model_fails_with_guidance(spark):
    df = spark.createDataFrame([("hello",)], "text: string")
    with pytest.raises(Exception, match="sentence-transformers"):
        embed_batch(df, "text", model="no-such-model").collect()


def test_sentence_transformers_integration(spark):
    """Real-encoder path through the identical plumbing: normalized
    float32 vectors of the checkpoint's dimension. Runs only where the
    public package is installed."""
    pytest.importorskip("sentence_transformers")
    df = spark.createDataFrame(
        [("the quick brown fox",), ("a completely different sentence",)],
        "text: string",
    )
    rows = embed_batch(df, "text", model="all-MiniLM-L6-v2").collect()
    assert len(rows) == 2
    import numpy as np

    for r in rows:
        v = np.array(r["embedding"], dtype=np.float64)
        assert v.shape[0] == 384
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_embed_minilm_query_certificates(spark, sf_smoke):
    """The registered embed_minilm query's in-row certificates: dim is
    the model width and norm 1.0 on EVERY row (full corpus), and
    self_cos — the cross-partitioning bit-determinism witness — is 1.0
    on every row of the deterministic xxhash64(doc_id)%10 sample and
    NULL elsewhere (r9: the re-embed runs on the sample, not the full
    corpus; the sample must be non-empty or the certificate is vacuous)."""
    from vector_search_playground_spark import registry
    from vector_search_playground_spark.functions.minilm import DIM

    registry.load_all()
    rows = registry.QUERIES["embed_minilm"](spark, sf_smoke).collect()
    assert len(rows) == 500
    sampled = [r for r in rows if r["self_cos"] is not None]
    assert len(sampled) >= 20, "certificate sample vacuously small"
    assert len(sampled) < len(rows), "sampling must actually subset"
    for r in rows:
        assert r["dim"] == DIM
        assert r["norm"] == 1.0, r["doc_id"]
    for r in sampled:
        assert r["self_cos"] == 1.0, (
            f"doc {r['doc_id']}: partitioning changed the embedding"
        )


def test_minilm_parity_tool_injection_is_exact():
    """tools/minilm_parity.py's tier-1 machinery, proven in-sandbox: the
    post-embedding-state injection (tok_emb rows := states, pos_emb :=
    0, ids := [0..t-1]) must drive the PRODUCTION ``_forward`` to a
    bit-identical output — that reconstruction exactness is what makes
    the real-environment certificate a statement about the production
    code object rather than a reimplementation."""
    import numpy as np

    from tools.minilm_parity import run_layerstack
    from vector_search_playground_spark.functions import minilm

    enc = minilm.MiniEncoder()
    for text in ("alpha beta gamma", "one", "x " * 50):
        ids = np.array(minilm.tokenize(text), dtype=np.int64)
        t = len(ids)
        mask = np.ones(t, dtype=bool)
        want = enc._forward(ids[None, :], mask[None, :])[0]
        states = enc.tok_emb[ids] + enc.pos_emb[:t]
        got = run_layerstack(states, mask, enc.layers, minilm.HEADS)
        assert np.array_equal(got, want)
    # the patch of module config globals must be restored
    assert minilm.DIM == 32 and minilm.HEADS == 2


def test_minilm_golden_vectors_if_present():
    """Skip-unless-golden consumer of tools/minilm_parity.py --real:
    when a full environment has produced tests/golden/minilm_golden.json
    against the actual AllMiniLM-L6-v2 checkpoint, re-assert the
    certificate from the stored vectors — per-sentence cosine between
    the production-forward layer-stack output and the real model's
    sentence embedding >= the recorded bar, unit norms, width 384."""
    import json
    import os

    import numpy as np
    import pytest

    from tools.minilm_parity import GOLDEN_PATH

    if not os.path.exists(GOLDEN_PATH):
        pytest.skip(
            "no golden file: run tools/minilm_parity.py --real in an "
            "environment with transformers+torch"
        )
    with open(GOLDEN_PATH) as f:
        g = json.load(f)
    assert g["pass"] is True
    bar = g["cos_bar"]
    real = np.array(g["real"], dtype=np.float64)
    ours = np.array(g["numpy_layerstack"], dtype=np.float64)
    assert real.shape == ours.shape == (len(g["sentences"]), g["dim"])
    norms = np.linalg.norm(real, axis=1)
    assert np.abs(norms - 1.0).max() < 1e-3
    cos = (real * ours).sum(1) / (
        np.linalg.norm(real, axis=1) * np.linalg.norm(ours, axis=1)
    )
    assert cos.min() >= bar, f"stored vectors violate the bar: {cos.min()}"
    # the recorded per-sentence cosines must match what the vectors say
    assert np.abs(cos - np.array(g["cos_layerstack"])).max() < 1e-4
