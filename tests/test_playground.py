"""End-to-end test of the reference's three verbs on the Spark facade."""

from __future__ import annotations

from vector_search_playground_spark.playground import Playground


def test_create_count_search_roundtrip(spark, tmp_path):
    pg = Playground(spark, str(tmp_path / "search"))
    assert pg.count() == 0

    pg.create(
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaps over a sleepy hound",
        "completely unrelated database migration guide",
    )
    assert pg.count() == 3

    pg.create("another unrelated text about spark executors")
    assert pg.count() == 4  # append, ids keep increasing

    hits = pg.search("quick brown fox", threshold=0.99, k=10).collect()
    assert 1 <= len(hits) <= 10
    # nearest hit should be the fox sentence, distances ascending
    assert "fox" in hits[0].content
    dists = [h.dist for h in hits]
    assert dists == sorted(dists)


def test_search_empty_table(spark, tmp_path):
    pg = Playground(spark, str(tmp_path / "empty"))
    assert pg.search("anything").collect() == []
