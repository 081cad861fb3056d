"""Unit + property tests for the HOF distance kernels (SURVEY.md §5.3-5.4)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_search_playground_spark.functions import vector as V


def _eval(spark, a, b):
    df = spark.createDataFrame(
        [(a, b)], "a: array<float>, b: array<float>"
    ).select(
        V.cosine_distance(F.col("a"), F.col("b")).alias("cos"),
        V.l2_distance(F.col("a"), F.col("b")).alias("l2"),
        V.inner_product_distance(F.col("a"), F.col("b")).alias("ip"),
        V.dot_product(F.col("a"), F.col("b")).alias("dot"),
    )
    return df.first()


def test_golden_handcomputed(spark):
    # hand-computed: a=(1,0), b=(0,1): cos dist 1, l2 sqrt(2), ip 0
    r = _eval(spark, [1.0, 0.0], [0.0, 1.0])
    assert r.cos == pytest.approx(1.0)
    assert r.l2 == pytest.approx(math.sqrt(2))
    assert r.ip == pytest.approx(0.0)
    assert r.dot == pytest.approx(0.0)


def test_identical_vectors_distance_zero(spark):
    v = [0.6, 0.8, 0.0]
    r = _eval(spark, v, v)
    assert r.cos == pytest.approx(0.0, abs=1e-9)
    assert r.l2 == pytest.approx(0.0)
    assert r.dot == pytest.approx(1.0)


def test_zero_vector_nan_like_pgvector(spark):
    # pgvector <=> with a zero vector is NaN (0/0); NaN < t is false,
    # so thresholded search silently drops zero vectors — same here.
    r = _eval(spark, [0.0, 0.0], [1.0, 0.0])
    assert math.isnan(r.cos)


def test_matches_numpy_random(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(size=64).astype(np.float32)
    b = rng.normal(size=64).astype(np.float32)
    r = _eval(spark, [float(x) for x in a], [float(x) for x in b])
    ad, bd = a.astype(np.float64), b.astype(np.float64)
    assert r.dot == pytest.approx(float(ad @ bd), rel=1e-12)
    assert r.l2 == pytest.approx(float(np.linalg.norm(ad - bd)), rel=1e-12)
    cos = 1.0 - float(ad @ bd) / (np.linalg.norm(ad) * np.linalg.norm(bd))
    assert r.cos == pytest.approx(cos, rel=1e-9)


def test_normalized_fast_path_equivalence(spark):
    """normalized=True (1 − dot) ≡ general formula on unit vectors."""
    rng = np.random.default_rng(11)
    v = rng.normal(size=8).astype(np.float64)
    v /= np.linalg.norm(v)
    w = rng.normal(size=8).astype(np.float64)
    w /= np.linalg.norm(w)
    df = spark.createDataFrame(
        [([float(x) for x in v], [float(x) for x in w])],
        "a: array<float>, b: array<float>",
    )
    r = df.select(
        V.cosine_distance(F.col("a"), F.col("b")).alias("gen"),
        V.cosine_distance(F.col("a"), F.col("b"), normalized=True).alias("fast"),
    ).first()
    assert r.gen == pytest.approx(r.fast, abs=1e-6)


def test_quantized_knn_recall_vs_exact(spark, sf_smoke):
    """Int8 scalar quantization is lossy but must stay faithful on real
    embeddings: the quantized top-10 (quantize_embed) should recover most
    of the exact cosine top-10 for the same query vector. 384-dim unit
    vectors quantized at 127 levels keep relative error ~1e-2, so
    near-total overlap is the expectation, not a tuned threshold."""
    from vector_search_playground_spark.queries.vector_search import (
        quantize_embed,
        topk_limit,
    )

    q = {r["vec_id"] for r in quantize_embed(spark, sf_smoke).collect()}
    exact = {r["vec_id"] for r in topk_limit(spark, sf_smoke).collect()}
    assert len(q) == 10
    assert len(q & exact) >= 7, (sorted(q), sorted(exact))


def test_fn_vector_arith_parallelogram_law(spark, sf_smoke):
    """For unit vectors, ||a+b||^2 + ||a-b||^2 == 2(||a||^2+||b||^2) = 4,
    and sum_mul equals the inner product (cos sim) in [-1, 1]."""
    from vector_search_playground_spark.queries.vector_search import (
        fn_vector_arith,
    )

    rows = fn_vector_arith(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert abs(r["norm_sum"] ** 2 + r["norm_diff"] ** 2 - 4.0) < 1e-4
        assert -1.0 - 1e-6 <= r["sum_mul"] <= 1.0 + 1e-6
