"""Exact set-similarity join (n-gram Jaccard) via prefix filtering.

North-star dedup family (BASELINE.json): alongside MinHash-LSH
(operators/dedup.py, approximate) this is the EXACT n-gram-Jaccard join,
using the prefix-filtering principle from the set-similarity-join
literature (Chaudhuri et al. 2006 SSJoin; Vernica et al. 2010 showed the
same construction scales on MapReduce): fix any global total order over
the shingle universe; if J(A, B) ≥ t, then the first
``|s| − ⌈t·|s|⌉ + 1`` elements of each set under that order (the
"prefix") must intersect. Joining on prefix shingles therefore finds
every qualifying pair — no false negatives — while examining a tiny
fraction of the O(n²) pair space.

Spark shape (all built-ins, no Python):
1. explode shingles → global frequency count (one shuffle);
2. rank each document's shingles rarest-first (window by doc_id) and
   keep only the prefix;
3. self-join on prefix shingle (shuffle keyed on the *rare* shingles —
   frequency-ascending order is what keeps this join skew-free);
4. verify exact Jaccard on the candidate pairs only.

At 100 TB every stage stays a hash shuffle on bounded keys; the
frequency relation is vocabulary-sized and broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.operators.cachectl import track


def jaccard_join(
    shingled: DataFrame,
    threshold: float,
    *,
    round_to: int = 6,
) -> DataFrame:
    """All pairs (a_id < b_id) with shingle-set Jaccard ≥ threshold.

    ``shingled``: (doc_id, shingles: array<string>) with distinct
    elements per row (operators/dedup.py::shingle_sets produces this).
    Returns (a_id, b_id, jaccard) — exact, oracle-checkable.
    """
    # shingled feeds four subtrees (frequency count, prefix ranking, both
    # verify sides) — persist or each one re-tokenizes the corpus.
    # Cache ownership: operators/cachectl (explicit storage level;
    # caller releases after consuming the result)
    shingled = track(shingled)
    ex = shingled.select(
        "doc_id", F.size("shingles").alias("n"),
        F.explode_outer("shingles").alias("shingle"),  # non-empty by
        # construction; outer avoids the Generate-injected filter
        # re-evaluating the shingle expression below the exchange
    ).where(F.col("shingle").isNotNull())  # null-text doc → null array
    freq = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))

    # All ceil() thresholds below get a tiny epsilon pulled off first:
    # f64 products like 0.8·n can land an ulp ABOVE the exact integer,
    # and an over-rounded ceil flips each filter in the false-negative
    # direction (shorter prefix / over-eager prune). Subtracting 1e-9
    # biases every boundary the safe way (at most a few extra candidates)
    # while counts stay far below the 1e7 scale where the epsilon itself
    # could matter.
    EPS = 1e-9

    # Global order: (frequency asc, shingle asc). Rarest-first minimizes
    # candidate fan-out AND join skew (the hottest shingles never appear
    # in any prefix).
    w = Window.partitionBy("doc_id").orderBy("freq", "shingle")
    prefix_len = (
        F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - EPS) + 1
    )
    # freq is the vocabulary-sized side (module contract above) — say so
    # with an explicit broadcast hint. Without it the static planner,
    # working from garbage post-explode size estimates, was observed
    # broadcasting the EXPLODED (doc, shingle) fact relation instead:
    # every BroadcastHashJoin build re-ran the whole upstream subtree as
    # its own 32-task job (doc_dup_fraction: 34 jobs, 12-25 s at sf0.1).
    prefixes = (
        ex.join(F.broadcast(freq), "shingle")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= prefix_len)
        .select("doc_id", "n", "rk", "shingle")
    )
    # both sides of the candidate self-join read this relation: persist
    # or the freq-join + rank-window pipeline runs twice (cachectl
    # ownership contract, as above)
    prefixes = track(prefixes)

    a = prefixes.select(
        F.col("doc_id").alias("a_id"), F.col("n").alias("an"),
        F.col("rk").alias("ark"), "shingle",
    )
    b = prefixes.select(
        F.col("doc_id").alias("b_id"), F.col("n").alias("bn"),
        F.col("rk").alias("brk"), "shingle",
    )
    # PPJoin-family pruning (Xiao et al. 2008), both exact:
    # - length filter: J ≥ t forces t·|A| ≤ |B| (and symmetrically);
    # - positional filter: matching at prefix positions (i, j) bounds the
    #   overlap by min(|A|−i, |B|−j)+1, which must reach the required
    #   overlap ⌈t/(1+t)·(|A|+|B|)⌉ for J ≥ t to be possible.
    required = F.ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("an") + F.col("bn"))
        - EPS
    )
    overlap_ub = (
        F.least(F.col("an") - F.col("ark"), F.col("bn") - F.col("brk")) + 1
    )
    # Join strategy (guide §3.1), r14 measured twice: the original
    # pathology was the static planner broadcasting from GARBAGE
    # post-explode estimates (every broadcast build re-ran its upstream
    # subtree). The two persists above are the actual fix — once the
    # prefix/shingle relations are cached, size estimates are honest and
    # the planner + autoBroadcastJoinThreshold pick correctly at every
    # scale (corpus-sized sides exceed the threshold and shuffle).
    # Forcing shuffle_hash on top of the persists was measured SLOWER on
    # all three consumers (in-session variant A/B, OPTIMIZATION_r14):
    # it denies the planner legitimately-broadcastable small sides. So:
    # persists + explicit broadcast(freq) only, no join-strategy hints.
    cand = (
        a.join(b, "shingle")
        .where(
            (F.col("a_id") < F.col("b_id"))
            & (F.col("an") >= F.ceil(F.lit(threshold) * F.col("bn") - EPS))
            & (F.col("bn") >= F.ceil(F.lit(threshold) * F.col("an") - EPS))
            & (overlap_ub >= required)
        )
        .select("a_id", "b_id")
        .distinct()
    )

    sa = shingled.select(F.col("doc_id").alias("a_id"),
                         F.col("shingles").alias("a_sh"))
    sb = shingled.select(F.col("doc_id").alias("b_id"),
                         F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = (
        F.size("a_sh") + F.size("b_sh")
        - F.size(F.array_intersect("a_sh", "b_sh"))
    )
    # Verify side: same reasoning — the persisted shingle relation gives
    # the planner honest sizes, so it broadcasts the candidate set when
    # small and shuffles when not (no hint; see strategy note above).
    return (
        cand.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("jaccard", inter / union)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id",
                F.round("jaccard", round_to).alias("jaccard"))
    )
