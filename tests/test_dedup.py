"""Property tests for the MinHash-LSH near-dup pipeline (SURVEY §5.3):
planted near-duplicates must cluster to their source, unrelated docs must
not merge, and dedup must be idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.operators.dedup import (
    candidate_pairs,
    dedup_near,
    minhash_signatures,
    shingle_sets,
    verify_jaccard,
)
from vector_search_playground_spark.sources import load_table


def _planted_corpus(spark, sf_dir, n=50):
    """First n documents plus a near-copy of each (last token dropped)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < n)
        .select("doc_id", "text")
    )
    tok = F.split("text", " ")
    near = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1)))
        ).alias("text"),
    )
    return docs.unionByName(near)


def test_planted_near_dups_cluster(spark, sf_correct):
    corpus = _planted_corpus(spark, sf_correct, n=50)
    labels = dedup_near(corpus)
    got = {r["doc_id"]: r["rep_id"] for r in labels.collect()}
    assert len(got) == 100
    planted_hits = sum(
        1 for d in range(50) if got.get(1000000 + d) == d
    )
    # banding at J≈0.95 catches a pair with prob 1-(1-0.95^4)^8 ≈ 0.9998;
    # allow a couple of misses from shingle-boundary effects.
    assert planted_hits >= 45, f"only {planted_hits}/50 planted dups found"


def test_originals_stay_distinct(spark, sf_correct):
    corpus = _planted_corpus(spark, sf_correct, n=50)
    labels = dedup_near(corpus)
    reps = {
        r["rep_id"]
        for r in labels.where(F.col("doc_id") < 1000000).collect()
    }
    # fixture texts are random bags of words — no two originals should
    # merge (Jaccard verify at 0.7 kills banding false positives).
    assert len(reps) == 50


def test_dedup_idempotent(spark, sf_correct):
    corpus = _planted_corpus(spark, sf_correct, n=30)
    labels = dedup_near(corpus)
    survivors = corpus.join(
        labels.where(F.col("doc_id") == F.col("rep_id")).select("doc_id"),
        "doc_id",
    )
    again = dedup_near(survivors)
    # dedup of an already-deduped corpus must be the identity mapping
    assert again.where(F.col("doc_id") != F.col("rep_id")).count() == 0


def test_fused_arrow_pipeline_matches_sql_pipeline(spark, sf_correct):
    """The fused Arrow kernel (text → signature in one stage) and the SQL
    explode/aggregate kernel hash shingles differently, but at planted-dup
    Jaccard (~0.95) banding catches a pair with prob ≈ 0.9998 under ANY
    consistent hash and the verify stage is exact — so both pipelines must
    produce the same labels on the planted corpus."""
    corpus = _planted_corpus(spark, sf_correct, n=50)
    arrow = {(r["doc_id"], r["rep_id"])
             for r in dedup_near(corpus, kernel="arrow").collect()}
    sql = {(r["doc_id"], r["rep_id"])
           for r in dedup_near(corpus, kernel="sql").collect()}
    assert arrow == sql


def test_fused_minhash_emits_one_row_per_doc_no_exchange(spark, sf_correct):
    """The fused kernel's contract: signatures come out of a single Arrow
    map — no explode, no aggregation shuffle, one row per document. (A
    round-robin fan-out exchange IS allowed: it spreads a single-split
    scan across cores and carries each input row exactly once.)"""
    from vector_search_playground_spark.operators.dedup import (
        minhash_signatures_fused,
    )

    corpus = _planted_corpus(spark, sf_correct, n=30)
    sigs = minhash_signatures_fused(corpus)
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Generate" not in plan, plan  # no explode
    assert sigs.count() == 60
    assert len(sigs.columns) == 33


def test_fused_simhash_tracks_sql_simhash_pairs(spark, sf_correct):
    """Planted near-dups must land within the Hamming radius under the
    fused signature too (hash-agnostic property of SimHash)."""
    from vector_search_playground_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures_fused,
    )

    corpus = _planted_corpus(spark, sf_correct, n=100)
    sigs = simhash_signatures_fused(corpus)
    got = {(r["a_id"], r["b_id"])
           for r in simhash_pairs(sigs, max_hamming=7).collect()}
    planted = sum(1 for (x, y) in got if y - x == 1000000)
    assert planted >= 70, planted


def test_simhash_band_search_is_exact_within_radius(spark, sf_correct):
    """simhash_pairs with max_hamming < bands must return EXACTLY the
    brute-force pair set within the radius (pigeonhole exhaustiveness)."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures,
    )

    corpus = _planted_corpus(spark, sf_correct, n=100)
    sigs = simhash_signatures(shingle_sets(corpus)).persist()
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in simhash_pairs(sigs, max_hamming=7).collect()
    }
    a = sigs.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("sb"))
    brute = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id",
            F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 7)
        .collect()
    }
    sigs.unpersist()
    assert got == brute
    # perturbed copies mostly land inside the radius (measured ~85%)
    planted = sum(1 for (x, y, _) in got if y - x == 1000000)
    assert planted >= 70, planted


def test_simhash_radius_guard():
    import pytest as _pytest

    from vector_search_playground_spark.operators.dedup import simhash_pairs

    with _pytest.raises(ValueError):
        simhash_pairs(None, max_hamming=8, bands=8)


def test_banding_prunes_pair_space(spark, sf_correct):
    """The candidate set must be ~linear in planted dups, not O(n²)."""
    corpus = _planted_corpus(spark, sf_correct, n=50)
    shingled = shingle_sets(corpus)
    cands = candidate_pairs(minhash_signatures(shingled))
    n_cand = cands.count()
    assert n_cand < 500, f"candidate explosion: {n_cand} pairs"
    verified = verify_jaccard(cands, shingled, 0.7)
    assert verified.count() >= 45
