"""Operator persist hygiene (r14 verdict #3): repeated operator
invocations in one long-lived session must not accumulate executor
storage once the caller honors the cachectl ownership contract."""

from __future__ import annotations

from pyspark.sql import functions as F


def _tracked_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_repeated_operator_invocation_releases_storage(spark):
    """Three rounds of (jaccard_join + edit_distance_pairs), each fully
    consumed then released: the persistent-RDD registry must return to
    its pre-round size every time (no block-manager growth), and the
    operators must still produce identical results after release."""
    from vector_search_playground_spark.operators.cachectl import (
        release_operator_caches,
    )
    from vector_search_playground_spark.operators.passjoin import (
        edit_distance_pairs,
    )
    from vector_search_playground_spark.operators.setjoin import jaccard_join

    names = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("name-"), (F.col("id") % 7).cast("string"),
            F.lit("-"), (F.col("id") % 3).cast("string"),
        ).alias("name"),
    )
    shingled = spark.range(40).select(
        F.col("id").alias("doc_id"),
        F.array_distinct(
            F.array(
                F.concat(F.lit("s"), (F.col("id") % 5).cast("string")),
                F.concat(F.lit("t"), (F.col("id") % 4).cast("string")),
                F.concat(F.lit("u"), (F.col("id") % 3).cast("string")),
            )
        ).alias("shingles"),
    )

    # make the baseline deterministic: drop anything earlier tests left
    release_operator_caches()
    spark.catalog.clearCache()
    base = _tracked_rdd_count(spark)

    reference = None
    for _ in range(3):
        jj = sorted(
            (r["a_id"], r["b_id"], r["jaccard"])
            for r in jaccard_join(shingled, 0.6).collect()
        )
        ed = sorted(
            (r["a_id"], r["b_id"], r["dist"])
            for r in edit_distance_pairs(names, max_dist=2).collect()
        )
        if reference is None:
            reference = (jj, ed)
        else:
            assert (jj, ed) == reference  # release never changes results
        released = release_operator_caches()
        assert released >= 3  # shingled + prefixes + names this round
        assert _tracked_rdd_count(spark) <= base, (
            "operator caches leaked past release_operator_caches()"
        )
    assert reference[0] or reference[1]  # the fixtures produce pairs
