"""Round-14 operators — properties BEYOND the driver hash gate.

knn_graph: graph-shape invariants (exact out-degree, no self edges,
monotone ranked dists), an engine-independent numpy brute-force
recompute of the full edge set, and a forced-multi-chunk equality pin
(the scale path — query side split into several knn_batch chunks —
must produce the single-chunk edge set row-for-row).

boilerplate_paragraphs: an exact Python recompute of the removal list
from the raw documents (splitter + counting, no Spark), plus row-level
consistency invariants.

doc_dup_fraction: cross-operator consistency — the per-doc dup counts
must be derivable from dedup_paragraph's published pair relation, and
every doc of the corpus must appear exactly once.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from vector_search_playground_spark import registry
from vector_search_playground_spark.sources import load_table

registry.load_all()


# --- knn_graph -----------------------------------------------------------------


@pytest.fixture(scope="module")
def knn_graph_rows(spark, sf_smoke):
    return registry.QUERIES["knn_graph"](spark, sf_smoke).collect()


def _quantize(vec):
    import numpy as np

    v = np.asarray(vec, dtype=np.float64)
    scale = max(np.abs(v).max(), 1e-30)
    # numpy rounds half-to-even; the engines round half-away-from-zero.
    # Emulate the engine: sign * floor(|x|*127/scale + 0.5).
    s = v * 127.0 / scale
    return np.sign(s) * np.floor(np.abs(s) + 0.5)


def test_knn_graph_shape(knn_graph_rows, spark, sf_smoke):
    from vector_search_playground_spark.queries.hybrid import KNN_GRAPH_K

    n = load_table(spark, sf_smoke, "embeddings").count()
    by_src = {}
    for r in knn_graph_rows:
        assert r["dst"] != r["src"]
        by_src.setdefault(r["src"], []).append(
            (r["rank"], r["dst"], r["dist"])
        )
    assert len(by_src) == n
    for src, edges in by_src.items():
        edges.sort()
        assert [e[0] for e in edges] == list(range(1, KNN_GRAPH_K + 1))
        dists = [e[2] for e in edges]
        assert dists == sorted(dists), (src, edges)


def test_knn_graph_matches_numpy_bruteforce(knn_graph_rows, spark, sf_smoke):
    """Engine-independent recompute: quantize in numpy, all-pairs exact
    integer dots, the same single-IEEE-op cosine and half-up micro-key
    ranking — the full edge set must match exactly (ids AND dists)."""
    import numpy as np

    from vector_search_playground_spark.queries.hybrid import KNN_GRAPH_K

    rows = (
        load_table(spark, sf_smoke, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = [r["vec_id"] for r in rows]
    q = np.stack([_quantize(r["embedding"]) for r in rows])
    dots = q @ q.T  # exact: int-valued doubles, |sum| << 2^53
    norms = np.sqrt(np.einsum("ij,ij->i", q, q))
    with np.errstate(invalid="ignore"):
        dist = 1.0 - dots / np.maximum(np.outer(norms, norms), 1e-30)
    expect = set()
    for i, src in enumerate(ids):
        cand = []
        for j, dst in enumerate(ids):
            if i == j:
                continue
            d = round(dist[i, j], 6)  # non-negative: round == half-up
            cand.append((math.floor(d * 1e6 + 0.5), dst, d))
        cand.sort()
        for rank, (_, dst, d) in enumerate(cand[:KNN_GRAPH_K], start=1):
            expect.add((src, rank, dst, d))
    got = {
        (r["src"], r["rank"], r["dst"], r["dist"]) for r in knn_graph_rows
    }
    assert got == expect


def test_knn_graph_chunked_equals_single_chunk(
    knn_graph_rows, spark, sf_smoke, monkeypatch
):
    """Force the scale path: shrink the chunk cap so the query side
    splits into 4 knn_batch chunks — the edge set must be identical
    (per-src top-k is independent of which chunk a src lands in)."""
    import importlib

    # operators/__init__ re-exports a `knn` FUNCTION that shadows the
    # submodule attribute; resolve the module itself
    knn_mod = importlib.import_module(
        "vector_search_playground_spark.operators.knn"
    )
    monkeypatch.setattr(knn_mod, "MAX_BATCH_QUERIES", 140)
    chunked = registry.QUERIES["knn_graph"](spark, sf_smoke).collect()
    assert {tuple(r) for r in chunked} == {
        tuple(r) for r in knn_graph_rows
    }
    assert len(chunked) == len(knn_graph_rows)


# --- boilerplate_paragraphs ---------------------------------------------------


def _split_paragraphs(doc_id, text, para_tokens, stride):
    if text is None:
        return
    w = text.split(" ")
    for idx, s in enumerate(range(0, len(w), para_tokens)):
        yield doc_id * stride + idx, " ".join(w[s : s + para_tokens])


def test_boilerplate_matches_python_recompute(spark, sf_smoke):
    from vector_search_playground_spark.queries.llm_pipeline import (
        PARA_ID_STRIDE,
        PARA_TOKENS,
    )

    docs = (
        load_table(spark, sf_smoke, "documents")
        .select("doc_id", "text")
        .collect()
    )
    by_text: dict[str, list[tuple[int, int]]] = {}
    for r in docs:
        for pid, ptext in _split_paragraphs(
            r["doc_id"], r["text"], PARA_TOKENS, PARA_ID_STRIDE
        ):
            by_text.setdefault(ptext, []).append((r["doc_id"], pid))
    expect = set()
    for ptext, occ in by_text.items():
        n_docs = len({d for d, _ in occ})
        if n_docs >= 2:
            expect.add(
                (
                    hashlib.md5(ptext.encode("utf-8")).hexdigest(),
                    n_docs,
                    len(occ),
                    min(p for _, p in occ),
                )
            )
    got = {
        (r["ptext_md5"], r["n_docs"], r["n_paras"], r["min_para_id"])
        for r in registry.QUERIES["boilerplate_paragraphs"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect
    assert all(nd >= 2 and np >= nd for _, nd, np, _ in got)


# --- doc_dup_fraction ---------------------------------------------------------


def test_doc_dup_fraction_consistent_with_dedup_paragraph(spark, sf_smoke):
    """The scorecard must be exactly derivable from dedup_paragraph's
    published pair relation: a doc's n_dup_paras = |its paragraphs in
    some CROSS-doc pair|, and the fraction is the half-up 6-dp of one
    exact division."""
    from vector_search_playground_spark.queries.llm_pipeline import (
        PARA_ID_STRIDE,
        paragraph_relation,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    paras = [
        r["doc_id"]
        for r in paragraph_relation(docs).select("doc_id").collect()
    ]
    pairs = registry.QUERIES["dedup_paragraph"](spark, sf_smoke).collect()
    dup = set()
    for r in pairs:
        if r["keep_id"] // PARA_ID_STRIDE != r["dup_id"] // PARA_ID_STRIDE:
            dup.add(r["keep_id"])
            dup.add(r["dup_id"])
    n_paras: dict[int, int] = {}
    n_dup: dict[int, int] = {}
    for pid in paras:
        d = pid // PARA_ID_STRIDE
        n_paras[d] = n_paras.get(d, 0) + 1
        n_dup[d] = n_dup.get(d, 0) + (1 if pid in dup else 0)
    expect = {
        (
            d,
            n_paras[d],
            n_dup[d],
            math.floor(n_dup[d] / n_paras[d] * 1e6 + 0.5) / 1e6,
        )
        for d in n_paras
    }
    got = {
        (r["doc_id"], r["n_paras"], r["n_dup_paras"], r["dup_fraction"])
        for r in registry.QUERIES["doc_dup_fraction"](
            spark, sf_smoke
        ).collect()
    }
    assert got == expect
    n_docs = docs.where(F.col("text").isNotNull()).count()
    assert len(got) == n_docs
    assert all(0.0 <= f <= 1.0 for _, _, _, f in got)
