"""Semantics- and shape-level tests for the data-selection tier
(queries/dataselect.py) — the oracle sweep covers value equality; these
guard the operator laws and plan shapes the oracle can't see."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.queries import dataselect as D
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dsir_target_lang_scores_highest(spark, sf_smoke):
    # the whole point of DSIR: docs drawn from the target distribution
    # must average a higher importance weight than any other slice
    out = D.dsir_weights(spark, sf_smoke)
    langs = load_table(spark, sf_smoke, "documents").select("doc_id", "lang")
    by_lang = {
        r.lang: r.mu
        for r in out.join(langs, "doc_id")
        .groupBy("lang")
        .agg(F.avg("dsir_w").alias("mu"))
        .collect()
    }
    target = by_lang.pop(D.DSIR_TARGET_LANG)
    assert all(target > mu for mu in by_lang.values()), by_lang


def test_dsir_stats_broadcast_not_shuffled_onto_tokens(spark, sf_smoke):
    # the bucket-stat table must come back as a broadcast: the token
    # stream never re-shuffles on bkt for the final join
    plan = _plan(D.dsir_weights(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, plan


def test_substr_dedup_finds_misaligned_planted_duplicate(spark, sf_smoke):
    # the copy sits at offset 11 in doc 1 and offset 0 in doc 2 —
    # misaligned mod any stride, the case a strided window grid misses.
    # Content-defined selection must flag both docs; the unrelated doc
    # (and one sharing only a sub-W fragment) must not be flagged.
    shared = "x" + " y".join(str(i) for i in range(30))  # ~100 chars
    rows = [
        (1, "prefix one " + shared),
        (2, shared + " suffix two"),
        (3, "completely unrelated text " * 4),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    grams = F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(
                    F.lit(1), F.length("text") - F.lit(D.SUBSTR_WINDOW - 1)
                ),
                lambda i: F.substring(
                    F.col("text"), i, F.lit(D.SUBSTR_WINDOW)
                ),
            ),
            lambda s: F.conv(F.substring(F.md5(s), 1, 4), 16, 10)
            .cast("long") % D.SUBSTR_MODP == 0,
        )
    )
    g = docs.select("doc_id", F.explode(grams).alias("gram")).select(
        "doc_id", F.xxhash64("gram").alias("gh")
    )
    dupes = (
        g.groupBy("gh").agg(F.count(F.lit(1)).alias("c")).where("c > 1")
    )
    flagged = {
        r.doc_id
        for r in g.join(dupes.select("gh"), "gh").select("doc_id").distinct().collect()
    }
    assert 1 in flagged and 2 in flagged and 3 not in flagged


def test_substr_dedup_shuffles_hashes_not_strings(spark, sf_smoke):
    # the df aggregate must key on the xxhash64 value — the 40-char gram
    # string is projected away before the exchange
    plan = _plan(D.substr_dedup(spark, sf_smoke))
    assert "xxhash64" in plan, plan
    assert "hashpartitioning(gh" in plan, plan


def test_semdedup_prunes_planted_twin_keeps_corpus_invariants(spark, sf_smoke):
    out = D.semdedup(spark, sf_smoke).collect()
    n = len(out)
    emb = load_table(spark, sf_smoke, "embeddings")
    assert n == emb.count()  # every vector gets a verdict
    pruned = [r for r in out if not r.kept]
    kept_by_bucket = {}
    for r in out:
        if r.kept:
            kept_by_bucket.setdefault(r.bucket, []).append(r.vec_id)
    # greedy min-id rule: the smallest id in every non-empty bucket is
    # always kept (it has no smaller-id neighbor)
    buckets = {}
    for r in out:
        buckets.setdefault(r.bucket, []).append(r.vec_id)
    for bkt, ids in buckets.items():
        assert min(ids) in kept_by_bucket.get(bkt, []), bkt
    # every pruned vector has a kept, closer-than-tau, smaller-id
    # neighbor in its own bucket — checked via the operator itself
    if pruned:
        assert all(
            any(k < r.vec_id for k in buckets[r.bucket]) for r in pruned
        )


def test_semdedup_prunes_exact_duplicate_vector(spark, sf_smoke):
    # a vector duplicated under a larger id must be pruned (dist = 0);
    # replay the pipeline body on a tiny synthetic frame
    from vector_search_playground_spark.functions.vector import dot_product
    from vector_search_playground_spark.plans.lsh import bucket_expr

    v = [1.0] + [0.0] * (D.SEM_DIM - 1)
    u = [0.0, 1.0] + [0.0] * (D.SEM_DIM - 2)
    e = spark.createDataFrame(
        [(0, v), (1, v), (2, u)], "vec_id long, embedding array<float>"
    )
    bk = e.select(
        "vec_id",
        "embedding",
        bucket_expr(F.col("embedding"), D._SEM_PLANES).alias("bucket"),
    )
    a, b = bk.alias("a"), bk.alias("b")
    rm = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .where(
            F.round(
                F.lit(1.0)
                - dot_product(F.col("a.embedding"), F.col("b.embedding")),
                6,
            )
            < D.SEM_TAU
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .collect()
    )
    assert {r.vec_id for r in rm} == {1}


def test_sample_negatives_never_self_and_deterministic(spark, sf_smoke):
    """The offset construction proves anchor != negative; K rows per doc;
    re-running yields the identical dataset (reproducibility contract)."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.queries.llm_pipeline import (
        sample_negatives,
    )

    df = sample_negatives(spark, sf_smoke).cache()
    try:
        assert df.where(F.col("neg_id") == F.col("doc_id")).count() == 0
        per = df.groupBy("doc_id").count().agg(F.min("count"), F.max("count")).first()
        assert per[0] == per[1] == 3
        again = sample_negatives(spark, sf_smoke)
        assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))
        # zero shuffles: pure row-local map + 1-row broadcast
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        df.unpersist()


def test_sem_corpus_count_cache_invalidates_on_fixture_rewrite(
    spark, sf_smoke, tmp_path
):
    """_corpus_rows memoizes the embeddings row count; its key must
    include the fixture CONTENT fingerprint, not the directory path
    alone — a regenerated fixture (the scale-stress scratch dirs do
    this in-session) must see a fresh count, or semdedup's sem_bits
    diverges from the live-recounting DuckDB oracle (ADVICE r8)."""
    import os
    import shutil

    import duckdb

    from vector_search_playground_spark.queries import dataselect as ds

    d = tmp_path / "fx"
    d.mkdir()
    src = os.path.join(sf_smoke, "embeddings.parquet")
    dst = str(d / "embeddings.parquet")
    shutil.copy(src, dst)
    n1 = ds._corpus_rows(spark, str(d))
    assert n1 > 0
    # regenerate IN PLACE with double the rows (fresh mtime + size)
    duckdb.connect().execute(
        f"""
        COPY (
            SELECT vec_id, embedding, label FROM read_parquet('{src}')
            UNION ALL
            SELECT vec_id + 10000000, embedding, label
            FROM read_parquet('{src}')
        ) TO '{dst}' (FORMAT parquet)
        """
    )
    n2 = ds._corpus_rows(spark, str(d))
    assert n2 == 2 * n1, "stale cached count served after fixture rewrite"
