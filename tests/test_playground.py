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


def test_id_counter_recovers_without_sidecar(spark, tmp_path):
    """Deleting the sidecar (or data predating it) must not make new ids
    collide with existing rows: the counter re-seeds from max(id)."""
    import os

    path = str(tmp_path / "search")
    pg = Playground(spark, path)
    pg.create("alpha one", "beta two", "gamma three")
    os.remove(os.path.join(path, "_id_counter.json"))

    pg2 = Playground(spark, path)
    pg2.create("delta four")
    rows = pg2._table().collect()
    ids = [r.id for r in rows]
    assert len(ids) == 4
    assert len(set(ids)) == 4, f"id collision after sidecar loss: {ids}"


def test_id_counter_recovers_from_interrupted_append(spark, tmp_path):
    """A pending marker (crash between parquet append and counter update)
    must trigger the max(id) recovery probe, never a reused id range."""
    import json
    import os

    path = str(tmp_path / "search")
    pg = Playground(spark, path)
    pg.create("alpha one", "beta two", "gamma three")

    # Simulate the crash window: rows are on disk, counter still shows the
    # pre-append state with pending set.
    with open(os.path.join(path, "_id_counter.json"), "w") as f:
        json.dump({"next": 0, "pending": True}, f)

    pg2 = Playground(spark, path)
    pg2.create("delta four")
    ids = [r.id for r in pg2._table().collect()]
    assert len(ids) == 4
    assert len(set(ids)) == 4, f"id collision after interrupted append: {ids}"
    state = json.load(open(os.path.join(path, "_id_counter.json")))
    assert state["pending"] is False


def test_search_hybrid_fuses_both_rankings(spark, tmp_path):
    pg = Playground(spark, str(tmp_path / "hy"))
    pg.create(
        "the quick brown fox jumps over the lazy dog",
        "a fast auburn fox leaps over a sleepy hound",
        "completely unrelated database migration guide",
        "spark executors shuffle partitions broadcast join",
    )
    hits = pg.search_hybrid("quick brown fox", k=3).collect()
    assert 1 <= len(hits) <= 3
    # the literal-match sentence must fuse to the top (lexical rank 1 +
    # vector rank 1)
    assert "quick brown fox" in hits[0].content
    rrfs = [h.rrf for h in hits]
    assert rrfs == sorted(rrfs, reverse=True)


def test_dedup_groups_near_copies(spark, tmp_path):
    pg = Playground(spark, str(tmp_path / "dd"))
    base = "one two three four five six seven eight nine ten " * 3
    pg.create(base.strip(), base.strip() + " extra", "totally different words here")
    labels = {r.id: r.rep_id for r in pg.dedup().collect()}
    assert len(labels) == 3
    reps = set(labels.values())
    # the two near-copies share a representative; the outlier is alone
    assert len(reps) == 2
