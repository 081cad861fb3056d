"""Plan-level assertions for the LLM-pipeline tier — the physical shapes
that make these operators scale (same guard style as
tests/test_relational_plans.py)."""

from __future__ import annotations

from vector_search_playground_spark.queries import llm_pipeline as L


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sim_join_is_block_matrix_group_map(spark, sf_smoke):
    """Exact all-pairs runs as the block-matrix kernel: one exchange on the
    block-pair key into a grouped Arrow stage — no join operator anywhere,
    and the pairwise work never shows up as a plan-level cross product
    (operators/simjoin.py)."""
    plan = _plan(L.sim_join(spark, sf_smoke))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_sim_join_never_collects_to_driver(spark, sf_smoke, monkeypatch):
    """The registered sim_join must not materialize any relation on the
    driver — the earlier broadcast formulation collected the whole corpus
    (the first casualty at 100× scale). Building AND executing the query
    with DataFrame.collect forbidden proves the kernel is fully
    distributed."""
    from pyspark.sql import DataFrame

    def _no_collect(self):
        raise AssertionError("sim_join collected a DataFrame to the driver")

    monkeypatch.setattr(DataFrame, "collect", _no_collect)
    df = L.sim_join(spark, sf_smoke)
    df.write.format("noop").mode("overwrite").save()


def test_registered_ivf_search_prunes_partitions(spark, sf_smoke):
    """The registered ivf_search must hit the index through partition
    pruning: the nprobe predicate shows up as PartitionFilters on the scan
    (file-listing-time pruning), not as a data filter, and ranking is the
    TakeOrderedAndProject top-k shape."""
    plan = _plan(L.ivf_search_q(spark, sf_smoke))
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_registered_lsh_search_prunes_partitions(spark, sf_smoke):
    """The registered lsh_search must hit the bucket-partitioned index
    through partition pruning (PartitionFilters on `bucket`, not a data
    filter), with the TakeOrderedAndProject top-k shape — the same
    listing-time pruning contract as ivf_search."""
    plan = _plan(L.lsh_search_q(spark, sf_smoke))
    assert "PartitionFilters" in plan and "bucket" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_lsh_search_matches_in_memory_path(spark, sf_smoke):
    """The on-disk partitioned search returns exactly what the in-memory
    bucket filter returns — materializing the index must not change
    results, only the pruning mechanism."""
    from vector_search_playground_spark.plans.lsh import (
        build_lsh,
        hyperplanes,
        search_lsh,
    )
    from vector_search_playground_spark.sources import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke, "embeddings")
    dim = len(emb.where(F.col("vec_id") == 0).first()["embedding"])
    planes = hyperplanes(dim, nbits=8, seed=42)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    expected = [
        tuple(r)
        for r in search_lsh(build_lsh(emb, planes), planes, qvec, k=10).collect()
    ]
    got = [
        tuple(r)
        for r in L.lsh_search_q(spark, sf_smoke)
        .drop("recall_at_k")  # quality column added in round 5
        .collect()
    ]
    assert got == expected


def test_dedup_exact_is_single_shuffle_agg(spark, sf_smoke):
    """Hash aggregate with map-side partial: exactly one exchange, keyed
    on the dedup column."""
    plan = _plan(L.dedup_exact(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "HashAggregate" in plan, plan
    assert "Sort" not in plan, plan


def test_tfidf_broadcasts_vocabulary(spark, sf_smoke):
    """df (vocabulary-sized) and the corpus count join back via broadcast —
    scoring must not shuffle the token stream a second time."""
    plan = _plan(L.tfidf_topterms(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row count
    # the top-k window partitions by doc_id (never a global window), and
    # WindowGroupLimit prunes each group to k rows before the final sort
    assert "windowspecdefinition(doc_id" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_text_stats_single_exchange_on_group_key(spark, sf_smoke):
    plan = _plan(L.text_stats(spark, sf_smoke))
    assert "HashAggregate" in plan, plan
    # explode happens map-side, before the exchange
    assert "Generate explode" in plan, plan


def test_doc_fingerprint_is_pure_map(spark, sf_smoke):
    """No exchange at all — fingerprinting must stay on input partitions."""
    plan = _plan(L.doc_fingerprint(spark, sf_smoke))
    assert "Exchange" not in plan, plan


def test_split_train_val_is_pure_map_and_leak_free(spark, sf_smoke):
    """The split is a shuffle-free map, and identical texts always land in
    the same split (content-keyed hashing — the no-leakage property that
    id- or rand()-keyed splits lack)."""
    from pyspark.sql import functions as F
    from vector_search_playground_spark.sources import load_table

    plan = _plan(L.split_train_val(spark, sf_smoke))
    assert "Exchange" not in plan, plan

    docs = load_table(spark, sf_smoke, "documents").select("doc_id", "text")
    joined = (
        L.split_train_val(spark, sf_smoke)
        .join(docs, "doc_id")
        .select("text", "split")
    )
    n_multi = (
        joined.groupBy("text")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    assert n_multi == 0
    # and the assignment is a pure function of the row — stable across
    # recomputation
    a = {r["doc_id"]: r["split"]
         for r in L.split_train_val(spark, sf_smoke).collect()}
    b = {r["doc_id"]: r["split"]
         for r in L.split_train_val(spark, sf_smoke).collect()}
    assert a == b and len(set(a.values())) == 2


def test_sample_stratified_broadcasts_rates(spark, sf_smoke):
    """The rate table must come in as a broadcast join — never a shuffle
    keyed on the data-scale side."""
    plan = _plan(L.sample_stratified(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan


def test_tokenize_to_ids_contract(spark, sf_smoke):
    """ids length == n_tokens, ids within [-1, V), OOV present (V=20 <
    corpus vocab 31), and id 0 is the corpus's most frequent token."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.queries.llm_pipeline import (
        _VOCAB_V,
        tokenize_to_ids,
    )
    from vector_search_playground_spark.sources import load_table

    # ids is a comma-joined STRING (round-6: the driver canonicalizer
    # cannot hash array cells); re-split it to check sequence properties
    df = (
        tokenize_to_ids(spark, sf_smoke)
        .withColumn(
            "seq", F.transform(F.split("ids", ","), lambda s: s.cast("long"))
        )
        .cache()
    )
    try:
        bad = df.where(F.size("seq") != F.col("n_tokens")).count()
        assert bad == 0
        rng = df.select(
            F.min(F.array_min("seq")).alias("lo"),
            F.max(F.array_max("seq")).alias("hi"),
            F.sum("n_oov").alias("oov"),
        ).first()
        assert rng["lo"] >= -1 and rng["hi"] < _VOCAB_V
        assert rng["oov"] > 0
        # id 0 must be the modal token of the corpus
        docs = load_table(spark, sf_smoke, "documents")
        top = (
            docs.select(F.explode_outer(F.split("text", " ")).alias("t"))
            .where(F.col("t").isNotNull())
            .groupBy("t").count().orderBy(F.desc("count"), "t").first()
        )
        n_id0 = df.select(
            F.sum(F.size(F.filter("seq", lambda x: x == 0)))
        ).first()[0]
        assert n_id0 == top["count"]
    finally:
        df.unpersist()
