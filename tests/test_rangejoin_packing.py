"""Bucketed interval join + sequence packing: exactness vs the naive
phrasing, and plan shapes that survive scale."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_search_playground_spark.operators.packing import pack_sequences
from vector_search_playground_spark.operators.rangejoin import interval_join
from vector_search_playground_spark.queries import llm_pipeline as L
from vector_search_playground_spark.queries import relational as R
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events_us(spark, sf):
    ev = load_table(spark, sf, "events")
    return ev.select("event_id", "ts_us")


def test_interval_join_matches_naive_theta(spark, sf_smoke):
    """The bucketed equi-join returns exactly the θ-join's pairs — for
    every bucket width that satisfies width ≥ interval length, and also
    for a narrower width (intervals then explode to >2 buckets; the
    result must not change, only the fan-out)."""
    window_us = 5 * 60 * 1_000_000
    ev = _events_us(spark, sf_smoke)
    iv = ev.select(
        F.col("event_id").alias("iv_id"),
        F.col("ts_us").alias("start_us"),
        (F.col("ts_us") + window_us).alias("end_us"),
    ).where(F.col("iv_id") % 17 == 0)
    pts = ev.select(F.col("event_id").alias("pt_id"), "ts_us")

    naive = {
        (r["iv_id"], r["pt_id"])
        for r in iv.crossJoin(pts)
        .where(
            (F.col("ts_us") >= F.col("start_us"))
            & (F.col("ts_us") < F.col("end_us"))
        )
        .collect()
    }
    assert naive  # fixture must exercise the join

    for width in (window_us, window_us // 3):
        got = {
            (r["iv_id"], r["pt_id"])
            for r in interval_join(
                iv, pts, start_col="start_us", end_col="end_us",
                ts_col="ts_us", bucket_width=width,
            ).collect()
        }
        assert got == naive, f"width={width}"


def test_join_range_plan_is_equi_join(spark, sf_smoke):
    """The registered join_range must never plan the θ-join literally: no
    nested-loop product anywhere; the match happens in a hash/merge
    equi-join on the time bucket."""
    plan = _plan(R.join_range(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan), plan


def test_pack_sequences_matches_global_window(spark, sf_smoke):
    """The bucketed two-pass prefix sum must equal the single-partition
    global-window phrasing row for row."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = {
        r["doc_id"]: r["seq_id"]
        for r in docs.withColumn(
            "seq_id",
            F.floor(
                F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
                / F.lit(512.0)
            ).cast("long"),
        ).collect()
    }
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(
            docs, order_col="doc_id", weight_col="n_tokens", budget=512
        ).collect()
    }
    assert got == expected
    assert len(set(got.values())) > 1  # fixture spans multiple sequences


def test_pack_sequences_window_is_bucketed(spark, sf_smoke):
    """The window in the plan partitions by the bucket column — the global
    single-partition window must never appear."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    plan = _plan(
        pack_sequences(
            docs, order_col="doc_id", weight_col="n_tokens", budget=512
        )
    )
    assert "windowspecdefinition(__bkt" in plan, plan
    assert "SinglePartition" not in plan, plan


def test_pack_sequences_output_is_contiguous(spark, sf_correct):
    """Registered-query invariant: sequences tile the corpus in order —
    token totals conserve, and doc ranges are disjoint and contiguous."""
    out = sorted(
        L.pack_sequences_q(spark, sf_correct).collect(),
        key=lambda r: r["seq_id"],
    )
    docs = load_table(spark, sf_correct, "documents").select(
        F.size(F.split("text", " ")).alias("n"), "doc_id"
    )
    total = docs.agg(F.sum("n").alias("s"), F.count("*").alias("c")).first()
    assert sum(r["seq_tokens"] for r in out) == total["s"]
    assert sum(r["n_docs"] for r in out) == total["c"]
    for prev, nxt in zip(out, out[1:]):
        assert prev["last_doc"] < nxt["first_doc"]


def test_rollup_hypertable_never_rescans_history(spark, sf_correct):
    """The served plan must read the materialized rollup for history (a
    scan of the rollup path) and aggregate raw events only behind a
    pushed time filter — the raw scan carries the ts >= split predicate."""
    df = R.rollup_hypertable(spark, sf_correct)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rollup_hourly_" in plan, plan
    # the raw parquet column is the int64 µs epoch (named `ts` on disk,
    # ts_us after normalize_events) — the split must reach it as a pushed
    # comparison, not evaluate post-scan on the derived µs timestamp
    assert "GreaterThanOrEqual(ts," in plan, plan
