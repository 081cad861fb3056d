"""KNN operator properties + physical-plan assertions (SURVEY.md §5.3/5.5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.operators.knn import knn, knn_batch
from vector_search_playground_spark.sources import load_table


def test_topk_subset_of_filtered(spark, sf_smoke):
    embs = load_table(spark, sf_smoke, "embeddings")
    q = embs.where(F.col("vec_id") == 3).first().embedding
    top = knn(embs, q, threshold=0.6, k=10, tiebreak="vec_id")
    rows = top.collect()
    assert len(rows) <= 10
    assert all(r.dist < 0.6 for r in rows)
    # self-match is the nearest neighbor at distance ~0
    assert rows[0].vec_id == 3
    assert abs(rows[0].dist) < 1e-6
    # sorted ascending
    dists = [r.dist for r in rows]
    assert dists == sorted(dists)


def test_flagship_plan_is_take_ordered(spark, sf_smoke):
    """Guard the physical plan: top-k must be TakeOrderedAndProject (per-
    partition heap + driver merge), never a global Sort+Limit shuffle."""
    embs = load_table(spark, sf_smoke, "embeddings")
    q = embs.where(F.col("vec_id") == 0).first().embedding
    plan = knn(embs, q, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_knn_batch_matches_single(spark, sf_smoke):
    embs = load_table(spark, sf_smoke, "embeddings")
    queries = (
        embs.where(F.col("vec_id").isin([0, 1, 2]))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_embedding"),
        )
    )
    batch = knn_batch(embs, queries, k=5, tiebreak="vec_id")
    got = {
        qid: sorted((r.vec_id, round(r.dist, 9)) for r in rows)
        for qid, rows in (
            (q, [r for r in batch.collect() if r.query_id == q]) for q in [0, 1, 2]
        )
    }
    for qid in [0, 1, 2]:
        qv = embs.where(F.col("vec_id") == qid).first().embedding
        single = knn(embs, qv, threshold=None, k=5, tiebreak="vec_id").collect()
        want = sorted((r.vec_id, round(r.dist, 9)) for r in single)
        assert got[qid] == want, f"query {qid}"


def test_knn_batch_has_no_corpus_shuffle_before_distance(spark, sf_smoke):
    """The corpus must reach the selection kernel un-shuffled (one Arrow
    map stage over the scan), the deterministic re-score join must be
    broadcast (map-side — never a shuffled join of the corpus), and the
    only exchange in the plan is the per-query window over the
    already-reduced local top-k candidates — never the |Q|·|C| cross
    product."""
    embs = load_table(spark, sf_smoke, "embeddings")
    queries = embs.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    plan = (
        knn_batch(embs, queries, k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_knn_batch_rejects_oversized_query_set(spark, sf_smoke, monkeypatch):
    """The query side is the broadcast build side: an over-cap query table
    must fail fast with guidance, never silently collect to the driver."""
    import importlib

    import pytest

    # operators/__init__ re-exports the knn *function* under the same name,
    # so fetch the module itself for the monkeypatch
    knn_mod = importlib.import_module(
        "vector_search_playground_spark.operators.knn"
    )

    embs = load_table(spark, sf_smoke, "embeddings")
    queries = embs.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    monkeypatch.setattr(knn_mod, "MAX_BATCH_QUERIES", 3)
    with pytest.raises(ValueError, match="broadcast build side"):
        knn_batch(embs, queries, k=5, tiebreak="vec_id")


def test_knn_batch_tie_group_wider_than_k_survives_local_cut(spark):
    """Regression (round-5 advice): when ``round_to`` collapses many
    distances into one tie group spanning the k-th boundary inside a
    single Arrow batch, the value-based local cut must keep the whole
    group — a position cut (top k+pad) would evict rows the final
    deterministic (dist, tiebreak) ranking needs."""
    import math

    # 40 corpus vectors at the SAME angle from the query (one rounded
    # tie group), plus one exact match. k=5 cuts inside the tie group.
    theta = 0.7
    rows = [(0, [1.0, 0.0])] + [
        (i, [math.cos(theta), math.sin(theta)]) for i in range(1, 41)
    ]
    corpus = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    # single partition → single Arrow batch → the whole tie group meets
    # the local cut at once
    corpus = corpus.coalesce(1)
    queries = spark.createDataFrame(
        [(0, [1.0, 0.0])], "query_id int, query_embedding array<double>"
    )
    got = knn_batch(
        corpus, queries, k=5, tiebreak="vec_id", round_to=4
    ).collect()
    # deterministic winner set: the exact match then tie-group members in
    # tiebreak order
    assert sorted(r.vec_id for r in got) == [0, 1, 2, 3, 4]
