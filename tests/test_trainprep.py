"""Shape- and semantics-level tests for the training-data prep tier
(queries/trainprep.py) — the oracle sweep in test_oracle_diff.py covers
value equality; these guard the scale-relevant plan shapes and the
operator laws the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.queries import trainprep as T
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_benchmark(spark, sf_smoke):
    # the corpus side must never shuffle: the benchmark-shingle join is a
    # broadcast hash join, not a sort-merge on the 100 TB relation
    plan = _plan(T.decontaminate(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_unpivot_has_no_shuffle(spark, sf_smoke):
    plan = _plan(T.unpivot_long(spark, sf_smoke))
    assert "Exchange" not in plan, plan


def test_pii_redact_single_stage(spark, sf_smoke):
    # pure projection: no exchange, no python worker
    plan = _plan(T.pii_redact(spark, sf_smoke))
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_salted_join_equals_plain_join(spark, sf_smoke):
    # salting must be a pure physical rewrite — byte-identical result to
    # the plain join at any salt count
    li = load_table(spark, sf_smoke, "lineitem")
    sup = load_table(spark, sf_smoke, "supplier")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )
    salted = T.join_skew_salted(spark, sf_smoke)
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_cdc_upsert_key_unique_and_versioned(spark, sf_smoke):
    out = T.cdc_upsert(spark, sf_smoke)
    total = out.count()
    assert out.select("o_orderkey").distinct().count() == total
    # every key in the change batch surfaces as version 2, all others as 1
    v2 = out.where(F.col("version") == 2)
    assert v2.where(F.col("o_orderkey") % 10 != 0).count() == 0
    assert v2.where(F.col("o_orderstatus") != "U").count() == 0
    base = load_table(spark, sf_smoke, "orders")
    assert total == base.select("o_orderkey").distinct().count()


def test_sessionize_sessions_are_gap_separated(spark, sf_smoke):
    sess = T.sessionize_batch(spark, sf_smoke).cache()
    try:
        # session_seq is dense from 1 per user, and consecutive sessions of
        # one user are separated by more than the gap threshold
        per_user = sess.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("session_seq").alias("lo"),
            F.max("session_seq").alias("hi"),
        )
        assert per_user.where(
            (F.col("lo") != 1) | (F.col("hi") != F.col("n"))
        ).count() == 0
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("session_seq")
        gaps = sess.withColumn("prev_end", F.lag("end_us").over(w)).where(
            F.col("prev_end").isNotNull()
        )
        bad = gaps.where(
            F.col("start_us") - F.col("prev_end") <= T.SESSION_GAP_US
        )
        assert bad.count() == 0
        # sessions never overlap and events are conserved
        n_events = sess.agg(F.sum("n_events")).collect()[0][0]
        assert n_events == load_table(spark, sf_smoke, "events").count()
    finally:
        sess.unpersist()


def test_curriculum_shards_are_balanced_and_ordered(spark, sf_smoke):
    out = T.curriculum_shards(spark, sf_smoke).cache()
    try:
        n = out.count()
        sizes = {
            r["shard"]: r["n"]
            for r in out.groupBy("shard").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert set(sizes) == set(range(T.CURRICULUM_SHARDS))
        lo, hi = n // T.CURRICULUM_SHARDS, -(-n // T.CURRICULUM_SHARDS)
        assert all(lo <= s <= hi for s in sizes.values()), sizes
        # the order key respects shard order: max key of shard i < min of i+1
        keyed = out.withColumn(
            "ok", F.col("n_chars") * 100000 + F.col("doc_id")
        )
        bounds = (
            keyed.groupBy("shard")
            .agg(F.min("ok").alias("lo"), F.max("ok").alias("hi"))
            .orderBy("shard")
            .collect()
        )
        for a, b in zip(bounds, bounds[1:]):
            assert a["hi"] < b["lo"]
    finally:
        out.unpersist()


def test_bm25_prefers_term_dense_docs(spark, sf_smoke):
    # a doc stuffed with query terms must outrank one with a single hit;
    # check monotonicity on the fixture: top-scored doc has more query-term
    # occurrences per token than the bottom-scored one
    out = T.bm25_score(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    dens = docs.select(
        "doc_id",
        (
            F.size(F.filter(toks, lambda w: w.isin(*T.BM25_TERMS)))
            / F.size(toks)
        ).alias("density"),
    )
    j = out.join(dens, "doc_id").orderBy(F.desc("bm25")).collect()
    assert j[0]["density"] > j[-1]["density"]


def test_pii_redact_masks_everything(spark, sf_smoke):
    out = T.pii_redact(spark, sf_smoke)
    leaked = out.where(
        F.col("redacted").rlike(T.EMAIL_RE) | F.col("redacted").rlike(T.PHONE_RE)
    )
    assert leaked.count() == 0
    assert out.where((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
