"""PassJoin: exact edit-distance self-join via partition pigeonholing.

Public algorithm (Li, Deng, Feng — "PASS-JOIN: A Partition-based Method
for Similarity Joins", PVLDB 2011): split each indexed string into D+1
contiguous segments. At most D edit operations can touch at most D of
them, so for any pair within edit distance D some segment survives
untouched and appears in the other string as an EXACT substring whose
start is shifted by the net indel count before it (≤ D). Candidates are
therefore an equi-join on (length class, segment slot, segment text) —
never a cartesian product — and an exact Levenshtein verify touches only
the candidates.

Why this instead of q-gram (Ed-Join) blocking: on low-entropy text (the
fixture corpus draws from a ~20-word vocabulary, 305 distinct 3-grams)
even rarest-first gram prefixes put hundreds of rows per block — a
measured 31M candidate pairs at sf0.1 vs ~190k for PassJoin. Exact
segment keys stay selective because they are long (|name|/(D+1) chars).

Scale shape: both key generators are per-row maps (explode of int
sequences + substring, no shuffle); the candidate join shuffles on the
segment key; unordered-pair dedup runs on bare int ids BEFORE names are
joined back, so no wide rows ride the shuffle. Everything is
corpus-linear except the verify, which is bounded by true-near-pair
density — the same discipline as the LSH-banded dedup family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_search_playground_spark.operators.cachectl import track


def edit_distance_pairs(
    names: DataFrame,
    *,
    id_col: str = "doc_id",
    name_col: str = "name",
    max_dist: int = 4,
) -> DataFrame:
    """All unordered pairs of ``names`` rows within ``max_dist`` edits.

    Input: (id_col: integral, name_col: string, NULL-free). Output:
    (a_id, b_id, dist) with a_id < b_id — exactly the brute-force
    θ-join's answer, computed without forming the n² pair space.
    """
    D = max_dist
    NSEG = D + 1

    # the name relation feeds SIX subtrees (idx, probe, both tiny
    # sentinels, and the two verify sides) — persist it once or every
    # consumer re-runs the upstream scan + fan-out exchange as its own
    # job (r14 measurement: the unpersisted form ran the doc scan 6×,
    # each a separate 1-task broadcast-build job). Bounded by design:
    # id + ≤40-char blocking key per row, never the full document.
    # Cache ownership: operators/cachectl (explicit storage level;
    # caller releases after consuming the result — bench.py's per-rep
    # clearCache subsumes it).
    names = track(
        names.select(
            F.col(id_col).alias("doc_id"), F.col(name_col).alias("name")
        ).withColumn("len", F.length("name"))
    )

    def seg_start(l, i):  # 1-based; even partition of length l into NSEG
        return (F.floor((i - 1) * l / NSEG) + 1).cast("int")

    def seg_len(l, i):
        return (F.floor(i * l / NSEG) - F.floor((i - 1) * l / NSEG)).cast(
            "int"
        )

    idx = (
        names.select(
            "doc_id",
            "name",
            F.col("len").alias("l"),
            F.explode(F.sequence(F.lit(1), F.lit(NSEG))).alias("i"),
        )
        .select(
            "doc_id",
            "l",
            "i",
            F.col("name")
            .substr(
                seg_start(F.col("l"), F.col("i")),
                seg_len(F.col("l"), F.col("i")),
            )
            .alias("seg"),
        )
        .where(F.length("seg") > 0)
    )
    probe = (
        names.select(
            "doc_id",
            "name",
            "len",
            F.explode(
                F.sequence(
                    F.greatest(F.col("len") - D, F.lit(1)),
                    F.col("len") + D,
                )
            ).alias("l"),
        )
        .select(
            "doc_id", "name", "len", "l",
            F.explode(F.sequence(F.lit(1), F.lit(NSEG))).alias("i"),
        )
        .select(
            "doc_id", "name", "len", "l", "i",
            # first-untouched-segment shift window (PassJoin multi-match
            # bound): if slot i is the FIRST untouched segment, the i-1
            # earlier slots each consumed an edit, so ≤ D-i+1 edits remain
            # after it and the shift is within Δ ± (D-i+1), Δ = len-l
            F.explode(
                F.sequence(
                    F.greatest(
                        F.lit(-D),
                        (F.col("len") - F.col("l")) - (D + 1 - F.col("i")),
                    ),
                    F.least(
                        F.lit(D),
                        (F.col("len") - F.col("l")) + (D + 1 - F.col("i")),
                    ),
                )
            ).alias("sh"),
        )
        .withColumn("slen", seg_len(F.col("l"), F.col("i")))
        .withColumn(
            "s", (seg_start(F.col("l"), F.col("i")) + F.col("sh")).cast("int")
        )
        .where(
            (F.col("slen") > 0)
            & (F.col("s") >= 1)
            & (F.col("s") + F.col("slen") - 1 <= F.col("len"))
        )
        .select(
            "doc_id", "l", "i",
            F.col("name").substr(F.col("s"), F.col("slen")).alias("seg"),
        )
        # no dedup here: (l, i) is in the key, so duplicate keys only
        # arise from identical same-slot substrings (measured 9 rows in
        # 795k at sf0.1) — a distinct would cost a full extra shuffle
    )

    # degenerate-length sentinel: if min(|a|,|b|) <= D then both <= 2D,
    # and segment pigeonholing degenerates below D+1 chars
    tiny = names.where(F.col("len") <= 2 * D).select(
        "doc_id",
        F.lit(-1).alias("l"),
        F.lit(0).alias("i"),
        F.lit("~tiny~").alias("seg"),
    )
    idx = idx.unionByName(tiny)
    probe = probe.unionByName(tiny)

    # All three joins are hinted shuffle_hash — re-measured in r15
    # after trying the jaccard kernel's no-hints discipline here, and
    # the hints WON both times (isolated min-of-5, same box,
    # back-to-back: all-hints 2.97 s, candidate-hint-only 4.66 s,
    # no hints 4.07 s at sf0.1): unlike jaccard's vocabulary-sized
    # freq side, every relation here is corpus-derived, and the
    # post-explode size estimates are garbage — without hints the
    # static planner was observed broadcasting the ~800k-row probe
    # expansion. Under the forced-spill certificate's no-broadcast
    # probe these joins stay SHJ, whose pressure story is BOUNDED
    # per-partition build memory rather than a sort spill; the
    # certificate (tests/test_scale_stress.py) pins exactly that:
    # plan = ShuffledHashJoin ×3, peak execution memory bounded,
    # result oracle-equal under pressure.
    pair = (
        idx.select(F.col("doc_id").alias("x_id"), "l", "i", "seg")
        .join(
            probe.select(
                F.col("doc_id").alias("y_id"), "l", "i", "seg"
            ).hint("shuffle_hash"),
            ["l", "i", "seg"],
        )
        .where(F.col("x_id") != F.col("y_id"))
        .select(
            F.least("x_id", "y_id").alias("a_id"),
            F.greatest("x_id", "y_id").alias("b_id"),
        )
        .distinct()
    )
    n1 = names.select(
        F.col("doc_id").alias("a_id"), F.col("name").alias("a_name")
    )
    n2 = names.select(
        F.col("doc_id").alias("b_id"), F.col("name").alias("b_name")
    )
    return (
        pair.join(n1.hint("shuffle_hash"), "a_id")
        .join(n2.hint("shuffle_hash"), "b_id")
        .withColumn("dist", F.levenshtein("a_name", "b_name"))
        .where(F.col("dist") <= D)
        .select("a_id", "b_id", F.col("dist").cast("long").alias("dist"))
    )
