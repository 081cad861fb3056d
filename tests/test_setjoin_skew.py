"""Skew certificate for the prefix-filtering jaccard join (r14 verdict
item 7, implemented in r15).

The jaccard kernel's 100 TB skew story is the RAREST-FIRST global
shingle order (``operators/setjoin.py``): the prefix of each document
keeps its ``|s| − ⌈t·|s|⌉ + 1`` rarest shingles, so the hottest
shingles — the ones that would turn the prefix self-join into an n²
hot key — never appear in any prefix. This probe FALSIFIES that claim
instead of trusting it: a corpus where one shingle occurs in EVERY
document (the worst single hot key possible) must still

1. produce exactly the true near-duplicate pairs (no false negatives
   from the pruning, no false positives), and
2. execute without any quadratic blow-up: were the hot shingle join-
   keyed, the candidate join would ship ~n²/2 pairs (≈ 2M rows here)
   through one key on one task; the certificate bounds every stage's
   shuffle-write volume AND the per-task shuffle-read skew from the
   UI status store, so a regression in the ordering (e.g. a sort
   direction flip) fails loudly rather than only at cluster scale.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import functions as F

N_DOCS = 2000
N_PLANTED = 50  # doc pairs (2i, 2i+1) for i < N_PLANTED share shingles


def _stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = (
        f"{base}/api/v1/applications/{app}/stages"
        "?status=complete&details=false"
    )
    with urllib.request.urlopen(url, timeout=30) as resp:
        return json.load(resp)


def _task_read_skew(spark, stage_id: int) -> float:
    """max/mean shuffle-read records across the stage's tasks."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = (
        f"{base}/api/v1/applications/{app}/stages/{stage_id}"
        "?details=true&taskStatus=SUCCESS"
    )
    with urllib.request.urlopen(url, timeout=30) as resp:
        attempts = json.load(resp)
    reads = [
        t.get("taskMetrics", {})
        .get("shuffleReadMetrics", {})
        .get("recordsRead", 0)
        for att in attempts
        for t in (att.get("tasks") or {}).values()
    ]
    reads = [r for r in reads if r > 0]
    if len(reads) < 2:
        return 1.0
    return max(reads) / (sum(reads) / len(reads))


def test_hot_shingle_never_reaches_the_prefix_join(spark):
    from vector_search_playground_spark.operators.cachectl import (
        release_operator_caches,
    )
    from vector_search_playground_spark.operators.setjoin import jaccard_join

    # every doc: 10 unique shingles + THE one hot shingle (freq = N).
    # Planted pairs (2i, 2i+1), i < N_PLANTED, share their whole set →
    # jaccard 1.0; every other pair shares ONLY the hot shingle →
    # jaccard 1/21 ≈ 0.048, far below the 0.8 threshold.
    group = F.when(
        F.col("id") < 2 * N_PLANTED, F.floor(F.col("id") / 2)
    ).otherwise(F.col("id") + 10_000)
    shingled = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array(
            *(
                [
                    F.concat(F.lit(f"u{j}-"), group.cast("string"))
                    for j in range(10)
                ]
                + [F.lit("~hot~")]
            )
        ).alias("shingles"),
    )

    mark = max((s.get("stageId", -1) for s in _stages(spark)), default=-1)
    pairs = sorted(
        (r["a_id"], r["b_id"], r["jaccard"])
        for r in jaccard_join(shingled, 0.8).collect()
    )
    release_operator_caches()

    # 1. exact result: precisely the planted pairs, nothing else
    expected = sorted((2 * i, 2 * i + 1, 1.0) for i in range(N_PLANTED))
    assert pairs == expected

    # 2. no quadratic blow-up anywhere: were "~hot~" join-keyed, the
    # candidate join alone would shuffle ~N²/2 ≈ 2M pair rows. All of
    # this query's stages together move corpus-linear volumes.
    picked = [s for s in _stages(spark) if s.get("stageId", -1) > mark]
    assert picked, "no stages captured for the probe"
    for s in picked:
        written = s.get("shuffleWriteRecords", 0)
        assert written < 150_000, (
            f"stage {s['stageId']} shuffled {written} records — "
            "quadratic fan-out; the hot shingle reached the join"
        )
    # 3. per-task balance on every shuffle-reading stage that does real
    # work: rarest-first ordering must keep the hot key out, so no
    # task may read a dominant share (bound is generous — an n² hot
    # key would put >90% of all records on one task)
    for s in picked:
        if s.get("shuffleReadRecords", 0) >= 10_000 and s.get(
            "numCompleteTasks", 0
        ) >= 4:
            skew = _task_read_skew(spark, s["stageId"])
            assert skew <= 6.0, (
                f"stage {s['stageId']} task-read skew {skew:.1f}× — "
                "the prefix self-join is not balanced under a hot "
                "shingle"
            )
