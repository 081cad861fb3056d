"""End-to-end pipeline composition certificate (r10 verdict #3).

Per-ID certification proves each tier alone; what it cannot catch is
interface drift BETWEEN tiers — a schema/semantics mismatch that only
surfaces when one tier's output feeds the next. This test chains the
training-data pipeline chunk_documents → embed_batch → dedup_near →
index_build_ivf → ivf_search over the x10 fixture two ways:

- **composed**: one lazy DAG — the chunk expansion, the Arrow embed
  stage, the dedup label join and the rep filter all flow into the
  index build with NO intermediate materialization (the reference's
  create→search loop, src/main.rs:71-97, composed at corpus scale);
- **step-by-step**: every tier writes parquet and the next tier reads
  it back — the layout-perturbing arm (fresh file order, fresh
  partitioning at each seam).

Asserted: (1) the final pruned search returns IDENTICAL rows in both
arms; (2) recall of the pruned search vs exact KNN over the same final
corpus meets the ANN bar; (3) the composed plan introduces no NEW
exchanges over the sum of the step plans — composing must never add a
shuffle that the tiers individually don't have.

The x10 fixture replicates each document 10× under shifted ids with
identical text, so the dedup tier does real work here: ~10× collapse,
and the index is built over the surviving representatives only.

Determinism inventory (why byte-equality across arms is fair): chunking
is a pure row-local expansion; hash64 embedding is a pure function of
the text (partition-independence certified in
tests/test_partition_independence.py); dedup_near is min-id
deterministic with fixed minhash seeds; the one layout-SENSITIVE stage
is MLlib KMeans (seeded per-block init), so both arms canonicalize the
corpus layout at the build seam — repartition(8, vec_id) +
sortWithinPartitions — which is exactly the shuffle-on-write the IVF
build performs anyway.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.test_scale_stress import _build_dirs
from vector_search_playground_spark import registry
from vector_search_playground_spark.functions.embed import (
    embed_batch,
    embed_query,
)
from vector_search_playground_spark.operators.dedup import dedup_near
from vector_search_playground_spark.operators.knn import knn
from vector_search_playground_spark.plans.ivf import build_ivf, search_ivf

# chunk_id < 10 at fixture text lengths (<=100 tokens, 48-token stride
# -> <=2 windows); the uid packing just has to be collision-free
CHUNK_UID_MULT = 10
EMBED_DIM = 64
IVF_K = 16
TOP_K = 10
NPROBE = 10
RECALL_BAR = 0.5  # the ANN family's bar on structureless hash embeddings
QUERY_TEXT = "distributed vector search over deduplicated chunks"


def _chunks(spark, sf_dir):
    """Tier 1: registered chunker -> (doc_id = chunk uid, text)."""
    registry.load_all()
    return registry.QUERIES["chunk_documents"](spark, sf_dir).select(
        (F.col("doc_id") * CHUNK_UID_MULT + F.col("chunk_id")).alias(
            "doc_id"
        ),
        F.col("chunk_text").alias("text"),
    )


def _embedded(chunks):
    """Tier 2: Arrow-batched embedding of every chunk."""
    return embed_batch(chunks, text_col="text", model="hash64",
                       dim=EMBED_DIM)


def _rep_corpus(embedded, chunks):
    """Tiers 3: dedup labels from the chunk text, keep representatives,
    project the (vec_id, embedding) relation the index build consumes.
    Labels come from the text relation (same lazy `chunks` subtree in
    the composed arm), the embedding rides the join."""
    labels = dedup_near(chunks)
    reps = labels.where(F.col("doc_id") == F.col("rep_id")).select("doc_id")
    return (
        embedded.join(reps, "doc_id")
        .select(F.col("doc_id").alias("vec_id"), "embedding")
    )


def _canonical(corpus):
    """The build-seam layout canonicalization both arms share (see
    module docstring: KMeans is the one layout-sensitive stage)."""
    return corpus.repartition(8, "vec_id").sortWithinPartitions("vec_id")


def _search(spark, corpus, path):
    """Tiers 4-5: IVF build over the corpus, pruned top-k search."""
    centroids = build_ivf(_canonical(corpus), path, k=IVF_K, seed=42,
                          overwrite=True)
    qvec = embed_query(QUERY_TEXT, model="hash64", dim=EMBED_DIM)
    return search_ivf(
        spark, path, centroids, qvec, k=TOP_K, nprobe=NPROBE
    ), qvec


@pytest.fixture(scope="module")
def x10_dir(spark):
    return _build_dirs()[10]


def test_pipeline_composed_equals_stepwise(spark, x10_dir, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipeline_composition")

    # ---- composed arm: one lazy DAG into the build ----
    chunks_c = _chunks(spark, x10_dir)
    corpus_c = _rep_corpus(_embedded(chunks_c), chunks_c)
    plan_c = corpus_c._jdf.queryExecution().executedPlan().toString()
    found_c, qvec = _search(spark, corpus_c, str(tmp / "ivf_composed"))
    rows_c = [tuple(r) for r in found_c.collect()]

    # ---- step-by-step arm: parquet seam between every tier ----
    step_plans = []

    def materialize(df, name):
        step_plans.append(
            df._jdf.queryExecution().executedPlan().toString()
        )
        p = str(tmp / name)
        df.write.mode("overwrite").parquet(p)
        return spark.read.parquet(p)

    chunks_s = materialize(_chunks(spark, x10_dir), "chunks")
    embedded_s = materialize(_embedded(chunks_s), "embedded")
    corpus_s = materialize(
        _rep_corpus(embedded_s, chunks_s.select("doc_id", "text")),
        "corpus",
    )
    found_s, _ = _search(spark, corpus_s, str(tmp / "ivf_stepwise"))
    rows_s = [tuple(r) for r in found_s.collect()]

    # (1) identical final search results across the two arms
    assert rows_c == rows_s, (
        f"composed vs step-by-step search diverged:\n{rows_c}\n{rows_s}"
    )
    assert len(rows_c) == TOP_K

    # the dedup tier did real work: the x10 replication collapses ~10x
    n_chunks = chunks_s.count()
    n_corpus = corpus_s.count()
    assert n_corpus * 5 < n_chunks, (
        f"dedup tier vacuous: {n_corpus} reps from {n_chunks} chunks"
    )

    # (2) recall vs exact KNN over the same final corpus
    exact = {
        r["vec_id"]
        for r in knn(
            corpus_s, qvec, threshold=None, k=TOP_K, tiebreak="vec_id"
        ).collect()
    }
    got = {vid for vid, _ in rows_c}
    recall = len(exact & got) / float(TOP_K)
    print(f"# pipeline_composition: chunks={n_chunks} reps={n_corpus} "
          f"recall@{TOP_K}={recall}")
    assert recall >= RECALL_BAR, (
        f"composed-pipeline recall {recall} below {RECALL_BAR}"
    )

    # (3) composing introduced no NEW exchanges: every shuffle in the
    # composed corpus plan exists in some step plan; the parquet seams
    # only ever REMOVE exchange work from a single plan's view
    composed_exchanges = plan_c.count("Exchange")
    stepwise_exchanges = sum(p.count("Exchange") for p in step_plans)
    print(f"# pipeline_composition: exchanges composed={composed_exchanges} "
          f"stepwise_sum={stepwise_exchanges}")
    assert composed_exchanges <= stepwise_exchanges, (
        "composing the tiers added exchanges over the sum of the parts"
    )


def test_pipeline_composed_search_plan_prunes_partitions(
    spark, x10_dir, tmp_path_factory
):
    """The composed pipeline's search must keep the IVF contract: the
    centroid_id.isin predicate prunes at file-listing time — composing
    the upstream tiers cannot cost the search its PartitionFilters."""
    tmp = tmp_path_factory.mktemp("pipeline_composition_plan")
    chunks = _chunks(spark, x10_dir)
    corpus = _rep_corpus(_embedded(chunks), chunks)
    found, _ = _search(spark, corpus, str(tmp / "ivf_plan"))
    plan = found._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "TakeOrderedAndProject" in plan


def test_pipeline_composed_second_decade(spark, tmp_path_factory):
    """The composed chain at x10 AND x100 (r11 extension): the
    certificate above proves composed == stepwise; this proves the
    composed DAG's scale posture — wall grows sublinearly vs the decade
    bound, the pre-index plan is exchange-stable across the decade, and
    search quality holds at 10x the corpus. The x100 fixture is 100
    replicas per document, so the dedup tier collapses ~100x and the
    index corpus stays representative-sized — the pipeline's own
    defense against replicated data is part of what scales."""
    import time

    from tests.test_scale_stress import _MAX_RATIO_DECADE2

    tmp = tmp_path_factory.mktemp("pipeline_composition_decade")
    dirs = _build_dirs()

    def run(sf_dir, name):
        t0 = time.perf_counter()
        chunks = _chunks(spark, sf_dir)
        corpus = _rep_corpus(_embedded(chunks), chunks)
        plan = corpus._jdf.queryExecution().executedPlan().toString()
        found, qvec = _search(spark, corpus, str(tmp / name))
        rows = found.collect()
        wall = time.perf_counter() - t0
        exact = {
            r["vec_id"]
            for r in knn(
                corpus, qvec, threshold=None, k=TOP_K, tiebreak="vec_id"
            ).collect()
        }
        got = {r["vec_id"] for r in rows}
        return wall, plan, len(exact & got) / float(TOP_K)

    run(dirs[10], "warm")  # warm code paths / shuffles
    t10, plan10, rec10 = run(dirs[10], "ivf_x10")
    t100, plan100, rec100 = run(dirs[100], "ivf_x100")
    ratio = t100 / max(t10, 1e-6)
    print(f"# pipeline_decade: x10={t10:.2f}s x100={t100:.2f}s "
          f"ratio={ratio:.1f} recall {rec10}->{rec100}")
    assert ratio < _MAX_RATIO_DECADE2, (
        f"composed pipeline cost {ratio:.1f}x wall on 10x data"
    )
    assert plan100.count("Exchange") <= plan10.count("Exchange"), (
        "composed pipeline grew a new shuffle at 100x"
    )
    assert rec100 >= RECALL_BAR, (
        f"composed-pipeline recall at x100 fell to {rec100}"
    )
