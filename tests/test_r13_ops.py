"""Round-13 operators — properties BEYOND the driver hash gate.

rerank_feature: page-shape invariants + an exact Python recompute of the
blend (the score column must be a pure function of its feature columns).

dedup_paragraph: the production splitter's coverage property (paragraphs
reconstruct every document exactly) and a Spark-side brute-force
no-false-negatives cross-check of the prefix-filter kernel at paragraph
granularity — independent of the DuckDB oracle that proves the same
thing hash-wise.

graph_label_propagation: the distributed loop (forced cutoff 0) must
produce the numpy path's exact labelling (the pagerank_topn pin
discipline), and LP communities must refine connected components.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vector_search_playground_spark import registry
from vector_search_playground_spark.sources import load_table

registry.load_all()


# --- rerank_feature -----------------------------------------------------------


@pytest.fixture(scope="module")
def rerank_rows(spark, sf_smoke):
    return (
        registry.QUERIES["rerank_feature"](spark, sf_smoke)
        .orderBy("rank")
        .collect()
    )


def test_rerank_page_shape(rerank_rows):
    from vector_search_playground_spark.queries.hybrid import RERANK_K

    assert len(rerank_rows) == RERANK_K
    assert [r["rank"] for r in rerank_rows] == list(range(1, RERANK_K + 1))
    ids = [r["vec_id"] for r in rerank_rows]
    assert len(set(ids)) == RERANK_K and 0 not in ids


def test_rerank_score_is_monotone_in_rank(rerank_rows):
    # ordering key is the half-up micro-integer (ties broken by vec_id),
    # so scores must be non-increasing at micro resolution
    keys = [math.floor(r["score"] * 1e6 + 0.5) for r in rerank_rows]
    assert keys == sorted(keys, reverse=True)


def test_rerank_features_in_range(rerank_rows):
    for r in rerank_rows:
        assert 0.0 <= r["tok_jaccard"] <= 1.0
        assert r["cos_sim"] <= 1.0 + 1e-9


def test_rerank_score_recomputes_from_features(rerank_rows):
    from vector_search_playground_spark.queries.hybrid import (
        RERANK_W_COS,
        RERANK_W_JAC,
        RERANK_W_LEN,
    )

    for r in rerank_rows:
        expect = (
            math.floor(
                (
                    RERANK_W_COS * r["cos_sim"]
                    + RERANK_W_JAC * r["tok_jaccard"]
                    + RERANK_W_LEN * r["len_logratio"]
                )
                * 1e6
                + 0.5
            )
            / 1e6
        )
        assert r["score"] == expect


# --- dedup_paragraph ----------------------------------------------------------


def test_paragraphs_reconstruct_documents(spark, sf_smoke):
    """Disjoint width-stride splitter ⇒ concatenating a doc's paragraphs
    in index order reproduces the document byte-for-byte: no token is
    dropped, duplicated, or reordered."""
    from vector_search_playground_spark.queries.llm_pipeline import (
        PARA_ID_STRIDE,
        paragraph_relation,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    paras = paragraph_relation(docs)
    rebuilt = (
        paras.select(
            (F.col("doc_id") / PARA_ID_STRIDE).cast("long").alias("doc_id"),
            (F.col("doc_id") % PARA_ID_STRIDE).alias("idx"),
            "text",
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("idx", "text"))).getField(
                    "text"
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    diff = (
        docs.join(rebuilt, "doc_id", "full")
        .where(
            F.col("text").isNull()
            | F.col("rebuilt").isNull()
            | (F.col("text") != F.col("rebuilt"))
        )
        .count()
    )
    assert diff == 0


def test_dedup_paragraph_matches_bruteforce(spark, sf_smoke):
    """Spark-side O(p²) brute force over the smoke fixture's paragraph
    relation must equal the prefix-filtered join EXACTLY (ids and
    rounded jaccard) — the no-false-negatives proof of the prefix
    principle at paragraph granularity, independent of DuckDB."""
    from vector_search_playground_spark.operators.dedup import shingle_sets
    from vector_search_playground_spark.queries.llm_pipeline import (
        paragraph_relation,
    )

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    sh = shingle_sets(paragraph_relation(docs)).collect()
    sets = {r["doc_id"]: set(r["shingles"]) for r in sh}
    ids = sorted(sets)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            j = inter / union
            if j >= 0.8:
                # the engine's half-up idiom (F.round is HALF_UP), not
                # Python round()'s half-to-even — keeps this cross-check
                # rounding-identical to jaccard_join by construction
                # even if PARA_TOKENS/shingle width ever change
                # (r14 ADVICE)
                brute.add((a, b, math.floor(j * 1e6 + 0.5) / 1e6))
    got = {
        (r["keep_id"], r["dup_id"], r["jaccard"])
        for r in registry.QUERIES["dedup_paragraph"](spark, sf_smoke).collect()
    }
    assert got == brute
    assert all(k < d for k, d, _ in got)


# --- graph_label_propagation ----------------------------------------------------


def test_label_prop_distributed_path_matches_numpy(spark, sf_correct):
    """Forced cutoff 0 drives the per-round join+min-agg loop; its
    labelling must be row-identical to the production numpy path — the
    two paths compute one exact integer recurrence (the pagerank pin)."""
    from vector_search_playground_spark.queries.graph import _label_prop

    numpy_rows = {
        tuple(r) for r in _label_prop(spark, sf_correct).collect()
    }
    dist_rows = {
        tuple(r)
        for r in _label_prop(
            spark, sf_correct, small_graph_cutoff=0
        ).collect()
    }
    assert numpy_rows == dist_rows and len(numpy_rows) > 0


def test_label_prop_refines_components(spark, sf_correct):
    """After any number of min-label rounds a label can only travel along
    edges, so every LP community must sit INSIDE one connected component
    of graph_components; and label(v) = min id within LP_ITERS hops of v
    is never above v, so each label lower-bounds its community's ids.
    (label == min(community) would be the CONVERGED claim — false at a
    fixed horizon: at sf0.01 exactly one community's label node has
    itself adopted a smaller label by round 8, measured while designing
    this test — so only the ≤ direction is asserted.)"""
    lp = registry.QUERIES["graph_label_propagation"](spark, sf_correct)
    cc = registry.QUERIES["graph_components"](spark, sf_correct)
    joined = lp.select("node", "label").join(
        cc.select("node", "rep"), "node"
    )
    cross = (
        joined.groupBy("label")
        .agg(F.countDistinct("rep").alias("n_reps"))
        .where(F.col("n_reps") > 1)
        .count()
    )
    assert cross == 0
    bad_bound = (
        lp.groupBy("label")
        .agg(F.min("node").alias("min_node"))
        .where(F.col("label") > F.col("min_node"))
        .count()
    )
    assert bad_bound == 0
