"""Near-duplicate detection: MinHash signatures → LSH banding → candidate
pairs → exact Jaccard verification → min-id connected components.

SURVEY §2 Tier C ``dedup_near`` — the scale path the exact operators
(``dedup_exact``, ``sim_join`` in ``queries/llm_pipeline.py``) anchor. The
reference has no dedup at all; this is driver-north-star surface
(BASELINE.json), designed for the 100 TB case:

- Shingling/minhashing is explode → hash-aggregate: map-side shingle
  generation, ONE shuffle on doc_id for the k min-hash aggregates
  (`xxhash64` is a codegen'd JVM expression — no Python anywhere).
- LSH banding turns the O(n²) pair space into per-bucket joins: docs only
  meet if they collide in ≥1 of b bands, so the shuffle is on
  (band, band_hash) and the join output is ~|near-dup pairs|, not n².
- Verification computes exact shingle Jaccard only for candidates.
- Connected components is min-label propagation over the (tiny) verified
  edge set, bounded iterations; near-dup clusters have small diameter so
  propagation converges in a handful of rounds.

Probability a pair at Jaccard J becomes a candidate with b bands of r
rows: 1-(1-J^r)^b. Defaults (b=8, r=4): J=0.7 → 0.89, J=0.3 → 0.06.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS
DEFAULT_JACCARD = 0.7


def shingle_sets(docs: DataFrame, *, id_col: str = "doc_id",
                 text_col: str = "text", n: int = 3,
                 kernel: str = "sql") -> DataFrame:
    """(id, shingles: array<string>) — distinct whitespace-token n-grams.

    Documents shorter than ``n`` tokens fall back to their token set, so
    no document produces an empty shingle set (an empty set would make
    min-hash undefined and Jaccard 0/0).

    Two kernels, same output set:
    - ``sql``: pure Column expressions (transform/slice/concat_ws).
      Catalyst's array HOFs are CodegenFallback (interpreted per
      element), so this is NOT the fast path — it is the dependency-free
      one, and the one whose construction mirrors the DuckDB oracle SQL.
    - ``arrow``: ``mapInPandas`` with plain Python string ops per Arrow
      batch. 4× faster warm in ISOLATION at sf0.1 (0.35 s vs 1.5 s for
      10k docs) but NOT end-to-end in the dedup pipelines — downstream
      JVM consumers pay Arrow transfer of the large array column back,
      which eats the win (measured net-negative; hence ``sql`` stays the
      default and the pipelines use it). Kept as the template for a real
      tokenizer (BPE etc.) that has no SQL expression at all. Shingle
      ORDER within the array differs run-to-run (Python set iteration),
      which every consumer (min-hash, intersect/union, bit votes) is
      insensitive to.

    Either kernel fans the input across full parallelism first
    (``sources.fan_out``): per-row shingling — interpreted HOFs or
    Python alike — is the cost center, and a single-split fixture scan
    would otherwise serialize it on one core.
    """
    from vector_search_playground_spark.sources import fan_out

    docs = fan_out(docs)
    if kernel == "arrow":
        import pandas as pd
        from pyspark.sql.types import (
            ArrayType,
            StringType,
            StructField,
            StructType,
        )

        in_df = docs.select(F.col(id_col).alias("doc_id"),
                            F.col(text_col).alias("__text"))
        schema = StructType(
            [in_df.schema["doc_id"],
             StructField("shingles", ArrayType(StringType(), False), False)]
        )

        def gen(batches):
            for pdf in batches:
                out = []
                for t in pdf["__text"]:
                    w = t.split(" ")
                    if len(w) >= n:
                        sh = list({
                            " ".join(w[i:i + n]) for i in range(len(w) - n + 1)
                        })
                    else:
                        sh = list(set(w))
                    out.append(sh)
                yield pd.DataFrame({"doc_id": pdf["doc_id"], "shingles": out})

        return in_df.mapInPandas(gen, schema)

    # Materialize the token array ONCE per row in its own projection. The
    # obvious single-projection form — tok = F.split(...) referenced from
    # inside the transform lambda — re-evaluates the split for EVERY
    # sequence element (HOF lambdas are interpreted; no CSE reaches a
    # captured expression), turning shingling O(tokens²) in string work:
    # measured 2.6 s for 5k×54-token docs, ~8× the materialized form.
    # CollapseProject leaves the two projections apart because the token
    # array is referenced more than once downstream.
    tokenized = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__tok"),
    )
    tok = F.col("__tok")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(tok) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
    )
    shingles = F.array_distinct(
        F.when(F.size(tok) >= n, grams).otherwise(tok)
    )
    return tokenized.select("doc_id", shingles.alias("shingles"))


def _shingle_py(text: str, n: int) -> set[str]:
    """Python twin of the SQL shingle kernel: distinct whitespace-token
    n-grams, falling back to the token set for documents shorter than n."""
    w = text.split(" ")
    if len(w) >= n:
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}
    return set(w)


def _base_hashes(shingle_lists: list, np, pd):
    """Flat uint64 hash array + per-doc segment offsets for a batch of
    shingle sets. ``pd.util.hash_array`` is SipHash with a fixed key —
    deterministic across processes and executors, vectorized in C."""
    counts = np.array([len(s) for s in shingle_lists], dtype=np.int64)
    flat = np.concatenate([np.array(s, dtype=object) for s in shingle_lists])
    base = pd.util.hash_array(flat)
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    return base, offsets


def minhash_signatures_fused(docs: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text", n: int = 3,
                             num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, h0..h{k-1}) straight from text in ONE Arrow stage.

    The fusion the split pipeline can't express: tokenize → shingle → k
    min-hashes all inside ``mapInPandas``, so the wide shingle array never
    crosses the Arrow boundary back to the JVM — only the k-integer
    signature does (one output row per document, no explode, no shuffle).
    The split SQL pipeline (``shingle_sets`` → ``minhash_signatures``)
    pays interpreted HOF shingling plus an explode of every (doc, shingle)
    row into a hash-aggregate exchange; here the per-batch work is one
    vectorized SipHash pass and k universal-hash transforms
    (h_i = A_i·x + B_i over uint64) reduced with segment-min.

    Hash values differ from the SQL kernel's xxhash64 — irrelevant to the
    LSH family, which only needs hash consistency across the corpus, and
    the banding/verify/CC stages downstream are shared verbatim.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from vector_search_playground_spark.sources import fan_out

    rng = np.random.default_rng(20260813)
    A = (rng.integers(1, 2**63, size=num_hashes, dtype=np.uint64) * 2 + 1)
    B = rng.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    # single-split fixtures would serialize the Arrow stage on one core
    in_df = fan_out(docs.select(F.col(id_col).alias("doc_id"),
                                F.col(text_col).alias("__text")))
    schema = StructType(
        [in_df.schema["doc_id"]]
        + [StructField(f"h{i}", LongType(), False) for i in range(num_hashes)]
    )

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            sh = [list(_shingle_py(t, n)) for t in pdf["__text"]]
            base, offsets = _base_hashes(sh, np, pd)
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for i in range(num_hashes):
                h = A[i] * base + B[i]  # uint64 wraparound = mod 2^64
                out[f"h{i}"] = np.minimum.reduceat(h, offsets).view(np.int64)
            yield pd.DataFrame(out)

    return in_df.mapInPandas(gen, schema)


def simhash_signatures_fused(docs: DataFrame, *, id_col: str = "doc_id",
                             text_col: str = "text", n: int = 3,
                             nbits: int = 64) -> DataFrame:
    """(doc_id, simhash) straight from text in ONE Arrow stage — the
    SimHash twin of ``minhash_signatures_fused``: per batch, one SipHash
    pass over the shingles, ±1 bit votes reduced with segment-sum, sign
    pattern packed to a single int64. One output row per document; the
    64-aggregate explode/exchange of the SQL path disappears."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    from vector_search_playground_spark.sources import fan_out

    in_df = fan_out(docs.select(F.col(id_col).alias("doc_id"),
                                F.col(text_col).alias("__text")))
    schema = StructType(
        [in_df.schema["doc_id"], StructField("simhash", LongType(), False)]
    )
    shifts = np.arange(nbits, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            sh = [list(_shingle_py(t, n)) for t in pdf["__text"]]
            base, offsets = _base_hashes(sh, np, pd)
            bits = ((base[:, None] >> shifts) & np.uint64(1)).astype(np.int32)
            votes = np.add.reduceat(bits * 2 - 1, offsets, axis=0)
            packed = (
                ((votes > 0).astype(np.uint64) << shifts)
                .sum(axis=1, dtype=np.uint64)
                .view(np.int64)
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"].to_numpy(),
                                "simhash": packed})

    return in_df.mapInPandas(gen, schema)


def minhash_signatures(shingled: DataFrame,
                       num_hashes: int = NUM_HASHES) -> DataFrame:
    """(doc_id, h0..h{k-1}) — k independent min-hashes per document.

    Explode the shingle set once, then k ``min(xxhash64(seed_i, shingle))``
    aggregates in a single hash-aggregate pass: one shuffle on doc_id,
    whole-stage-codegen'd hashing, no per-seed re-scan.
    """
    # explode_outer, not explode: plain explode makes Generate inject a
    # size(...)>0 AND isnotnull(...) filter, and predicate pushdown drags
    # that filter (with the WHOLE array expression substituted back in,
    # pre-materialization form) below the fan-out exchange — the shingle
    # computation then runs twice, once single-threaded at the scan.
    # Shingle arrays are non-empty by construction, so outer ≡ inner here.
    exploded = shingled.select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    ).where(F.col("shingle").isNotNull())  # null-text doc → null array
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def simhash_signatures(shingled: DataFrame, *, nbits: int = 64) -> DataFrame:
    """(doc_id, simhash): Charikar's SimHash over the shingle set — each
    shingle's xxhash64 votes ±1 per bit position, the signature is the
    sign pattern of the vote sums. Hamming distance between signatures
    tracks set overlap, so near-dup candidates are pairs within a small
    Hamming radius (banded lookup + ``bit_count(a ^ b)`` verify).

    Same execution shape as ``minhash_signatures``: explode once, one
    hash-aggregate shuffle on doc_id, all JVM-side. 64 conditional-sum
    aggregates (one per bit) then a bitwise pack.
    """
    # explode_outer: see minhash_signatures — avoids the Generate filter
    # re-evaluating the shingle expression below the exchange
    ex = shingled.select(
        "doc_id", F.explode_outer("shingles").alias("shingle")
    ).where(F.col("shingle").isNotNull()  # null-text doc → null array
    ).select("doc_id", F.xxhash64("shingle").alias("h"))
    aggs = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(nbits)
    ]
    votes = ex.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(nbits):
        sim = sim.bitwiseOR(
            F.when(
                F.col(f"v{b}") > 0,
                F.shiftleft(F.lit(1).cast("long"), b),
            ).otherwise(F.lit(0).cast("long"))
        )
    return votes.select("doc_id", sim.alias("simhash"))


def simhash_pairs(signatures: DataFrame, *, max_hamming: int = 7,
                  bands: int = 8, nbits: int = 64) -> DataFrame:
    """(a_id, b_id, hamming) — ALL pairs within the Hamming radius, found
    by band-collision: split the signature into ``bands`` equal bit
    chunks; with ``max_hamming < bands`` the pigeonhole principle
    guarantees any pair within the radius agrees on ≥1 whole chunk, so
    the (band, chunk)-keyed join is EXACT for that radius (property-
    tested against brute force in tests/test_dedup.py), and the
    ``bit_count`` check runs only on collisions."""
    if max_hamming >= bands:
        raise ValueError(
            f"max_hamming={max_hamming} must be < bands={bands} for the "
            "band-collision search to be exhaustive (pigeonhole)"
        )
    # both join sides read the signature relation — persist it once.
    # Cache ownership: operators/cachectl (caller releases after
    # consuming the result)
    from vector_search_playground_spark.operators.cachectl import track

    signatures = track(signatures)
    width = nbits // bands
    mask = (1 << width) - 1
    entries = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright("simhash", b * width)
            .bitwiseAND(F.lit(mask))
            .alias("chunk"),
        )
        for b in range(bands)
    ])
    buckets = signatures.select(
        "doc_id", "simhash", F.explode(entries).alias("e")
    ).select("doc_id", "simhash", "e.band", "e.chunk")
    a = buckets.select(
        F.col("doc_id").alias("a_id"), F.col("simhash").alias("a_sim"),
        "band", "chunk",
    )
    b = buckets.select(
        F.col("doc_id").alias("b_id"), F.col("simhash").alias("b_sim"),
        "band", "chunk",
    )
    ham = F.bit_count(F.col("a_sim").bitwiseXOR(F.col("b_sim")))
    return (
        a.join(b, ["band", "chunk"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def candidate_pairs(signatures: DataFrame, *, bands: int = BANDS,
                    rows_per_band: int = ROWS_PER_BAND) -> DataFrame:
    """(a_id, b_id) candidate pairs from LSH banding, a_id < b_id.

    Each band hashes its r signature slots into one bucket key; the
    self-join is on (band, bucket) — near-dups collide with probability
    1-(1-J^r)^b, everything else almost never, so the join output is
    linear in the number of true near-dup pairs, not quadratic in corpus
    size.
    """
    band_entries = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.lit(b),
                *[F.col(f"h{b * rows_per_band + r}")
                  for r in range(rows_per_band)],
            ).alias("bucket"),
        )
        for b in range(bands)
    ])
    buckets = signatures.select(
        "doc_id", F.explode(band_entries).alias("e")
    ).select("doc_id", "e.band", "e.bucket")
    a = buckets.withColumnRenamed("doc_id", "a_id")
    b = buckets.withColumnRenamed("doc_id", "b_id")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )


def verify_jaccard(pairs: DataFrame, shingled: DataFrame,
                   threshold: float = DEFAULT_JACCARD) -> DataFrame:
    """Keep candidate pairs whose exact shingle Jaccard ≥ threshold.

    Two hash joins against the shingle-set relation (shuffle on doc id);
    the set algebra runs as codegen'd array expressions. Only candidates
    pay this cost — the point of LSH.
    """
    sa = shingled.select(F.col("doc_id").alias("a_id"),
                         F.col("shingles").alias("a_sh"))
    sb = shingled.select(F.col("doc_id").alias("b_id"),
                         F.col("shingles").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh"))
    union = F.size(F.array_union("a_sh", "b_sh"))
    return (
        pairs.join(sa, "a_id").join(sb, "b_id")
        .withColumn("jaccard", inter.cast("double") / union)
        .where(F.col("jaccard") >= threshold)
        .select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))
    )


def verify_jaccard_text(pairs: DataFrame, docs: DataFrame,
                        threshold: float = DEFAULT_JACCARD, *,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Exact-Jaccard verification joining candidates back to TEXT, with the
    shingle sets rebuilt inside one Arrow stage — the fused pipeline's twin
    of ``verify_jaccard``. Only candidate pairs (~|true near-dup pairs|,
    never corpus-scale) carry text through the two id joins, and no shingle
    array ever exists JVM-side."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    da = docs.select(F.col(id_col).alias("a_id"),
                     F.col(text_col).alias("a_text"))
    db = docs.select(F.col(id_col).alias("b_id"),
                     F.col(text_col).alias("b_text"))
    joined = pairs.join(da, "a_id").join(db, "b_id")
    schema = StructType([
        StructField("a_id", LongType(), False),
        StructField("b_id", LongType(), False),
        StructField("jaccard", DoubleType(), False),
    ])

    def jac(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            keep_a, keep_b, keep_j = [], [], []
            for a_id, b_id, ta, tb in zip(pdf["a_id"], pdf["b_id"],
                                          pdf["a_text"], pdf["b_text"]):
                sa = _shingle_py(ta, n)
                sb = _shingle_py(tb, n)
                inter = len(sa & sb)
                j = inter / (len(sa) + len(sb) - inter)
                if j >= threshold:
                    keep_a.append(a_id)
                    keep_b.append(b_id)
                    keep_j.append(round(j, 6))
            yield pd.DataFrame(
                {"a_id": pd.Series(keep_a, dtype="int64"),
                 "b_id": pd.Series(keep_b, dtype="int64"),
                 "jaccard": pd.Series(keep_j, dtype="float64")}
            )

    return joined.mapInPandas(jac, schema)


def _union_find_labels(edge_rows) -> dict[int, int]:
    """Min-root union-find with path compression over collected edges —
    {touched node: min id of its component}."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent} | {
        x: x for ab in edge_rows for x in ab if x not in parent
    }


# Edge sets at or below this size are solved driver-side (union-find) —
# ~1.6 MB of longs, the same metadata scale as k-means centroids or
# quantile boundaries. The distributed loop below exists for edge sets
# that are data-scale.
SMALL_GRAPH_EDGES = 100_000


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_iter: int = 10,
                         num_partitions: int | None = None,
                         small_graph_cutoff: int = SMALL_GRAPH_EDGES,
                         ) -> DataFrame:
    """(doc_id, rep_id): min doc_id of each connected component.

    Contract: ``edges`` reference ids present in ``nodes`` (callers derive
    both from the same corpus). Output has exactly one row per node.

    Two execution paths, chosen by the MEASURED edge count (the runtime
    decision AQE makes for broadcast joins, applied to graph state):

    - **edge set ≤ small_graph_cutoff** → driver-side union-find. The
      collected relation is the *edge list*, bounded by the cutoff
      (default 100k pairs ≈ 1.6 MB) — never the node relation, which
      stays distributed: labels for edge-touched nodes broadcast-join
      back onto ``nodes``, and untouched nodes are their own rep. Near-dup
      edge sets are usually tiny even when the corpus is not (output ~
      |true duplicate pairs|), and the iterative loop's per-round job
      overhead (~1.4 s × O(log d) rounds) dwarfs a 1 ms union-find.
    - **larger** → min-label propagation WITH pointer jumping: each round
      a node adopts the smallest label among itself and its neighbors,
      then short-circuits through its representative's representative
      (rep ← rep[rep], valid because labels only ever decrease). The jump
      halves label-chain lengths every round, so convergence is
      O(log diameter) rounds; ``max_iter`` rounds cover components of
      diameter ~2^max_iter. Each round is two shuffle joins + one
      aggregate — no driver-side graph at any size.

    ``num_partitions`` sizes the iterative phase. The label/edge
    relations are node- and pair-scale — orders of magnitude smaller
    than the corpus they came from — so running the loop at the corpus's
    task count pays per-round scheduling for empty work (measured 6.6 s
    → 4.3 s at sf0.1 by shrinking). Default: defaultParallelism/8,
    floor 4, which scales with the cluster rather than hardcoding.
    """
    spark = edges.sparkSession
    edges = edges.persist()
    n_edges = edges.count()
    if n_edges <= small_graph_cutoff:
        labels = _union_find_labels(
            [(r["a_id"], r["b_id"]) for r in edges.collect()]
        )
        edges.unpersist()
        if not labels:
            return nodes.select(
                "doc_id", F.col("doc_id").alias("rep_id")
            )
        label_df = spark.createDataFrame(
            list(labels.items()), "doc_id: long, __rep: long"
        )
        return (
            nodes.join(F.broadcast(label_df), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("__rep", "doc_id").alias("rep_id"),
            )
        )
    if num_partitions is None:
        num_partitions = max(
            4, spark.sparkContext.defaultParallelism // 8
        )
    nodes = nodes.repartition(num_partitions, "doc_id")
    edges = edges.repartition(num_partitions, "a_id")
    # Materialize the edge set once AND truncate its lineage: every
    # propagation round references it, and without materialization each
    # round would re-run the whole upstream candidate pipeline (measured
    # 4× the total dedup cost at sf0.1). localCheckpoint (not persist) is
    # load-bearing for the LOOP itself too: a persisted DataFrame keeps
    # its logical plan, so each round's union(labels, join(sym, labels))
    # DOUBLES the plan tree — by round ~15 the driver OOMs just
    # stringifying it. Checkpointing resets the plan to a leaf each round,
    # keeping plan size constant across iterations. (On a cluster with
    # executor churn, swap for a reliable checkpoint dir — localCheckpoint
    # stores blocks on executors.)
    sym = edges.select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).unionByName(
        edges.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    ).localCheckpoint(eager=True)
    edges.unpersist()  # the size-probe cache; sym supersedes it
    # Convergence check: labels only ever decrease (min-propagation), so
    # Σ rep_id strictly decreases until the fixpoint. The checkpoint must
    # be EAGER: a lazy one never materializes through the sum-aggregate's
    # plan (the agg executes its own RDD, not the checkpoint RDD), so
    # every later round silently recomputes the full lineage — measured
    # 2-3× slower end-to-end than paying the explicit per-round
    # materialization job.
    labels = nodes.select(
        F.col("doc_id"), F.col("doc_id").alias("rep_id")
    ).localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("rep_id")).first()[0]
    converged = False
    for _ in range(max_iter):
        msgs = (
            sym.join(labels, sym.src == labels.doc_id)
            .select(F.col("dst").alias("doc_id"), "rep_id")
        )
        prop = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("rep_id").alias("rep_id"))
        )
        # pointer jump: rep ← rep[rep]. Every rep is itself a node with a
        # label row, so the left join always matches; coalesce guards the
        # degenerate empty-graph case.
        reps = prop.select(
            F.col("doc_id").alias("__r"), F.col("rep_id").alias("__r2")
        )
        labels = (
            prop.join(reps, prop.rep_id == reps.__r, "left")
            .select(
                "doc_id", F.coalesce("__r2", "rep_id").alias("rep_id")
            )
            .localCheckpoint(eager=True)
        )
        new_sum = labels.agg(F.sum("rep_id")).first()[0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Labels were still moving when the iteration budget ran out — a
        # component with diameter > max_iter would silently under-merge,
        # so make the truncation loud.
        import warnings

        warnings.warn(
            f"connected_components: min-label propagation did not converge "
            f"within max_iter={max_iter} rounds; components with larger "
            f"diameter are under-merged. Raise max_iter.",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels


def dedup_near(docs: DataFrame, *, id_col: str = "doc_id",
               text_col: str = "text",
               jaccard_threshold: float = DEFAULT_JACCARD,
               kernel: str = "arrow") -> DataFrame:
    """Full near-dup pipeline → (doc_id, rep_id); keep rows where
    doc_id == rep_id to deduplicate. Deterministic: min-hash seeds are
    fixed, representatives are min-id.

    ``kernel="arrow"`` (default) runs the fused pipeline: signatures come
    straight from text in one Arrow stage (no shingle explode/exchange)
    and verification rebuilds shingles Arrow-side for candidates only —
    the shingle array never exists in the JVM. ``kernel="sql"`` is the
    dependency-free all-builtin construction whose shingling mirrors the
    DuckDB oracle SQL (kept as the exact reference; measured ~2× slower
    end-to-end at sf0.1 because HOF shingling is interpreted and the
    shingle relation feeds an explode-shuffle plus two verify joins)."""
    if kernel == "arrow":
        # Both LSH band-join sides read the signature relation — persist it
        # (one narrow row per doc) or the Arrow stage runs twice. AQE
        # materializes the self-join's two shuffle stages concurrently and
        # both race into the cold cache, so the Arrow kernel can run once
        # per side; an eager count() to pin the cache first was tried in
        # r14 and REVERTED — the racing duplicates run concurrently on
        # idle cores while the extra action serializes (honest isolated
        # A/B: 2.08 s → 2.81 s with the count).
        sigs = minhash_signatures_fused(
            docs, id_col=id_col, text_col=text_col
        ).persist()
        try:
            cands = candidate_pairs(sigs)
            edges = verify_jaccard_text(
                cands, docs, jaccard_threshold,
                id_col=id_col, text_col=text_col,
            )
            nodes = docs.select(F.col(id_col).alias("doc_id"))
            return connected_components(nodes, edges)
        finally:
            sigs.unpersist(blocking=False)
    # The shingle relation feeds four subtrees (minhash, both sides of the
    # Jaccard verify, the node list) — persist it once or each consumer
    # re-tokenizes the corpus.
    shingled = shingle_sets(docs, id_col=id_col, text_col=text_col).persist()
    try:
        sigs = minhash_signatures(shingled)
        cands = candidate_pairs(sigs)
        edges = verify_jaccard(cands, shingled, jaccard_threshold)
        nodes = shingled.select("doc_id")
        return connected_components(nodes, edges)
    finally:
        shingled.unpersist(blocking=False)
