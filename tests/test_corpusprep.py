"""Shape- and semantics-level tests for the corpus-construction tier
(queries/corpusprep.py) — the oracle sweep covers value equality; these
guard the plan shapes and the operator laws the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.queries import corpusprep as C
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mix_sources_is_shuffle_free(spark, sf_smoke):
    # mixture construction must be a map-only pass: policy broadcasts,
    # hash test and epoch explode are row-local
    plan = _plan(C.mix_sources(spark, sf_smoke))
    assert "Exchange" not in plan or "BroadcastExchange" in plan, plan
    assert "ShuffleExchange" not in plan.replace(
        "BroadcastExchange", ""
    ), plan


def test_mix_sources_epoch_repeats(spark, sf_smoke):
    # class-0 docs that pass the rate filter appear exactly twice,
    # with epochs {0, 1}
    out = C.mix_sources(spark, sf_smoke)
    per_doc = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sort_array(F.collect_list("epoch")).alias("epochs"),
    )
    cls0 = per_doc.join(
        load_table(spark, sf_smoke, "documents").select(
            "doc_id", (F.substring("source", 4, 10).cast("int") % 3).alias("cls")
        ),
        "doc_id",
    )
    bad = cls0.where(
        ((F.col("cls") == 0) & (F.col("n") != 2))
        | ((F.col("cls") != 0) & (F.col("n") != 1))
    ).count()
    assert bad == 0


def test_shuffle_global_is_permutation(spark, sf_smoke):
    # every doc appears exactly once; positions within a shard are 1..n
    out = C.shuffle_global(spark, sf_smoke)
    n_docs = load_table(spark, sf_smoke, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    per_shard = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"),
        F.min("pos").alias("mn"),
    )
    assert per_shard.where(
        (F.col("mx") != F.col("n")) | (F.col("mn") != 1)
    ).count() == 0


def test_shuffle_global_no_single_partition_sort(spark, sf_smoke):
    # the rank must be a per-shard window (hashpartitioning on the shard
    # key), never a global single-partition window
    plan = _plan(C.shuffle_global(spark, sf_smoke))
    assert "SinglePartition" not in plan, plan


def test_ngram_topk_take_ordered(spark, sf_smoke):
    # top-k must plan as TakeOrderedAndProject (per-task heaps), not a
    # global sort followed by a limit
    plan = _plan(C.ngram_topk(spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan, plan


def test_quality_gopher_flags_planted_repetition(spark, sf_smoke):
    # a degenerate all-same-word doc must fail the gate; the fixture's
    # natural docs overwhelmingly pass the distinct-word test
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    out = C.quality_gopher(spark, sf_smoke)
    row = out.orderBy("doc_id").first()
    assert row.n_words >= row.n_distinct >= 1
    # planted: run the same pipeline body on a synthetic frame
    from vector_search_playground_spark.operators.dedup import shingle_sets

    bad = spark.createDataFrame(
        [(1, "spam " * 99 + "spam")], "doc_id long, text string"
    )
    tri = shingle_sets(bad).select(
        "doc_id", F.size("shingles").alias("n_tri")
    )
    assert tri.first().n_tri == 1  # one distinct trigram → dup fraction ~1


def test_dedup_incremental_anti_join_on_hash_only(spark, sf_smoke):
    # the join must key on the 16-byte hash with text projected away
    plan = _plan(C.dedup_incremental(spark, sf_smoke))
    assert "LeftAnti" in plan, plan
    # new-batch docs never collide with corpus: every survivor's hash is
    # absent from the corpus side
    out = C.dedup_incremental(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.md5("text").alias("h"),
        F.substring("source", 4, 10).cast("int").alias("si"),
    )
    corpus_h = docs.where(F.col("si") < C.NEW_SOURCE_MIN).select("h")
    leaked = (
        out.join(docs.select("doc_id", "h"), "doc_id")
        .join(corpus_h, "h", "left_semi")
        .count()
    )
    assert leaked == 0


def test_normalize_features_zero_mean_unit_var(spark, sf_smoke):
    # per-dimension z-scores must re-aggregate to mean≈0, var≈1
    out = C.normalize_features(spark, sf_smoke)
    chk = out.groupBy("dim").agg(
        F.avg("z").alias("mu"), F.var_samp("z").alias("v")
    )
    bad = chk.where(
        (F.abs(F.col("mu")) > 1e-3) | (F.abs(F.col("v") - 1) > 1e-3)
    ).count()
    assert bad == 0
