"""Corpus-construction tier: the operators that turn a deduped document
pool into an actual training mixture — incremental snapshot dedup, source
mixing with epoch repeats, deterministic global shuffle/sharding,
repetition-based quality gates (Gopher/C4 style), corpus n-gram stats,
and per-dimension feature normalization.

The reference stores and searches one static corpus
(`/root/reference/src/main.rs:85-96`); a production pipeline re-ingests
snapshots, weighs sources, and fixes a training order. Every query here
is oracle-backed.

Scale discipline per query:
- ``dedup_incremental`` — only 16-byte content hashes ever shuffle; the
  text column is dropped before the anti-join. The corpus side can
  additionally be turned into a bloom filter pushed to the scan.
- ``mix_sources`` — ZERO shuffles: the keep-decision is a deterministic
  per-row hash test, the policy is a broadcast literal, and epoch
  repeats are a row-local explode.
- ``shuffle_global`` — no global window: shard assignment is a pure
  hash, and the position is a window PARTITIONED BY shard, so the sort
  fans out across shards (each shard is |corpus|/S rows).
- ``quality_gopher`` — integer-only outputs (counts + cross-multiplied
  boolean), so the hash check is float-free; two doc_id-keyed hash-aggs.
- ``ngram_topk`` — explode → hash-agg → TakeOrderedAndProject; the
  driver only ever sees k rows.
- ``normalize_features`` — per-dimension moments are |dims| rows
  broadcast back; the long form never re-shuffles on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import ROUND_DIST, query
from vector_search_playground_spark.sources import load_table

# --- dedup_incremental ------------------------------------------------------

# Snapshot split: sources src15..src19 are "this week's crawl", the rest
# are the already-ingested corpus.
NEW_SOURCE_MIN = 15


@query(
    "dedup_incremental",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, source, md5(text) AS h,
               CAST(substr(source, 4) AS INT) AS si
        FROM documents
    ),
    corpus AS (SELECT DISTINCT h FROM h WHERE si < {NEW_SOURCE_MIN}),
    fresh AS (
        SELECT n.doc_id, n.source, n.h
        FROM h n WHERE n.si >= {NEW_SOURCE_MIN}
          AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = n.h)
    )
    SELECT doc_id, source
    FROM (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
          FROM fresh)
    WHERE rn = 1
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental snapshot dedup: keep new-crawl docs that are neither
    already in the corpus nor duplicated within the batch (min doc_id
    wins inside the batch).

    This is the production shape of exact dedup — you never re-dedupe
    the whole 100 TB corpus when a 1 TB snapshot lands. Both sides
    project down to (id, 16-byte md5) BEFORE any join, so the shuffle
    moves hashes, not text; the anti-join keys and the within-batch
    group key are the same hash, so Catalyst reuses one partitioning.
    At even larger corpus/batch ratios the corpus hash set becomes a
    bloom filter applied map-side to the snapshot scan.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.substring("source", 4, 10).cast("int").alias("si"),
    )
    corpus = docs.where(F.col("si") < NEW_SOURCE_MIN).select("h").distinct()
    fresh = docs.where(F.col("si") >= NEW_SOURCE_MIN).join(
        corpus, "h", "left_anti"
    )
    return (
        fresh.groupBy("h")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("source", "doc_id").alias("source"),
        )
        .select("doc_id", "source")
    )


# --- mix_sources ------------------------------------------------------------

# Mixture policy: source class (suffix % 3) → (keep %, epoch repeats).
# Class 0 is "high quality, oversample 2 epochs"; class 2 is heavily
# downsampled. Literal VALUES on both engines.
MIX_POLICY = ((0, 100, 2), (1, 50, 1), (2, 20, 1))


@query(
    "mix_sources",
    oracle=f"""
    WITH cls AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS INT) % 3 AS cls,
               CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 100 AS u
        FROM documents
    ),
    pol AS (
        SELECT * FROM (VALUES {", ".join(str(p) for p in MIX_POLICY)})
               t(cls, rate_pct, repeats)
    ),
    kept AS (
        SELECT c.doc_id, c.source, p.repeats
        FROM cls c JOIN pol p USING (cls)
        WHERE c.u < p.rate_pct
    )
    SELECT doc_id, source, CAST(unnest(range(repeats)) AS INT) AS epoch
    FROM kept
    """,
)
def mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: each source class gets a sampling
    rate and an epoch-repeat factor (the "books ×2, web ×0.5" knob every
    LLM data recipe has).

    Zero shuffles end to end: membership is a deterministic content-hash
    test (same md5-bucket trick as split_train_val, so the sample is
    reproducible across runs AND engines), the 3-row policy joins as a
    broadcast, and repeats explode row-locally. The output is exactly
    what a shard-writer downstream consumes. At 100 TB this is a single
    map-only pass over the corpus.
    """
    policy = spark.createDataFrame(
        list(MIX_POLICY), "cls int, rate_pct int, repeats int"
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (F.substring("source", 4, 10).cast("int") % 3).alias("cls"),
        (F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long") % 100)
        .alias("u"),
    )
    kept = docs.join(F.broadcast(policy), "cls").where(
        F.col("u") < F.col("rate_pct")
    )
    return kept.select(
        "doc_id",
        "source",
        F.explode(
            F.sequence(F.lit(0), F.col("repeats") - 1)
        ).alias("epoch"),
    )


# --- shuffle_global ---------------------------------------------------------

SHUFFLE_SHARDS = 16


@query(
    "shuffle_global",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS knum
        FROM documents
    )
    SELECT doc_id,
           CAST(knum % {SHUFFLE_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY knum % {SHUFFLE_SHARDS}
                                   ORDER BY knum, doc_id) AS BIGINT) AS pos
    FROM k
    """,
)
def shuffle_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every doc gets a
    pseudorandom 60-bit key (md5 of its id), a shard (key mod S), and a
    position within its shard (ordered by key).

    Reading shards 0..S-1 sequentially, each in pos order, visits the
    corpus in a reproducible pseudorandom permutation — the exact
    contract a dataloader needs. Crucially there is NO global window —
    and no per-shard whale either: with S fixed at 16 (SHUFFLE_SHARDS),
    a ``row_number() OVER (PARTITION BY shard)`` would sort corpus/16
    docs on one task, so the within-shard position comes from
    ``operators/prefix.grouped_bucketed_rank`` instead — the uniform
    60-bit key space is quantile-bucketed and each (shard, bucket)
    slice ranks in parallel, offsets broadcast back as metadata.

    Cache scope, stated honestly: the ``.cache()`` serves the two EAGER
    driver passes inside ``grouped_bucketed_rank``; the rank window is
    lazy in the returned DataFrame and re-derives the (scan + md5-key)
    projection after the ``finally`` unpersist — one cheap extra scan,
    chosen over leaking a corpus-sized cache past the return.
    """
    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    keyed = docs.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("knum"),
    ).withColumn("shard", (F.col("knum") % SHUFFLE_SHARDS).cast("int")).cache()
    try:
        return grouped_bucketed_rank(
            keyed, ["shard"], "knum", tiebreak_col="doc_id"
        ).select("doc_id", "shard", F.col("rk").cast("long").alias("pos"))
    finally:
        keyed.unpersist()


# --- quality_gopher ---------------------------------------------------------

# Gopher-style repetition gates, as integer cross-multiplications:
#   distinct-word ratio  >  0.3   ⇔  10·n_distinct > 3·n_words
#   top-word fraction    <  0.2   ⇔  10·top_c      < 2·n_words
#   dup-trigram fraction <  0.3   ⇔  10·n_tri      > 7·(n_words − 2)


@query(
    "quality_gopher",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    wc AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
    agg AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_words,
               CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_c
        FROM wc GROUP BY doc_id
    ),
    tri AS (
        SELECT doc_id,
               CAST(len(list_distinct(
                 CASE WHEN len(string_split(text, ' ')) >= 3
                      THEN list_transform(
                             range(1, len(string_split(text, ' ')) - 1),
                             i -> array_to_string(
                                    string_split(text, ' ')[i:i+2], ' '))
                      ELSE string_split(text, ' ') END)) AS BIGINT) AS n_tri
        FROM documents
    )
    SELECT a.doc_id, n_words, n_distinct, top_c, n_tri,
           (10 * n_distinct > 3 * n_words
            AND 10 * top_c < 2 * n_words
            AND 10 * n_tri > 7 * (n_words - 2)) AS gopher_pass
    FROM agg a JOIN tri USING (doc_id)
    """,
)
def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate (the Gopher/C4 family): per-doc
    word count, distinct-word count, top-word count, distinct-trigram
    count, and a pass/fail combining three repetition thresholds.

    Everything the hash sees is an integer or a boolean — the ratio
    thresholds are applied by cross-multiplication, so no float ever
    reaches the output (complementing ``text_quality``, which emits the
    rounded ratios). Word stats are one explode → two stacked hash-aggs
    on doc_id; trigram distinct-count reuses the dedup shingle kernel.
    Both branches key on doc_id, so the final join co-partitions.
    """
    from vector_search_playground_spark.operators.dedup import shingle_sets
    from vector_search_playground_spark.sources import fan_out

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    wc = (
        docs.select(
            "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
        )
        .where(F.col("w").isNotNull())  # null-doc guard (unnest semantics)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    tri = shingle_sets(docs).select(
        "doc_id", F.size("shingles").cast("long").alias("n_tri")
    )
    j = agg.join(tri, "doc_id")
    return j.select(
        "doc_id",
        "n_words",
        "n_distinct",
        "top_c",
        "n_tri",
        (
            (10 * F.col("n_distinct") > 3 * F.col("n_words"))
            & (10 * F.col("top_c") < 2 * F.col("n_words"))
            & (10 * F.col("n_tri") > 7 * (F.col("n_words") - 2))
        ).alias("gopher_pass"),
    )


# --- ngram_topk -------------------------------------------------------------

NGRAM_K = 50


@query(
    "ngram_topk",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               unnest(list_distinct(
                 CASE WHEN len(string_split(text, ' ')) >= 3
                      THEN list_transform(
                             range(1, len(string_split(text, ' ')) - 1),
                             i -> array_to_string(
                                    string_split(text, ' ')[i:i+2], ' '))
                      ELSE string_split(text, ' ') END)) AS s
        FROM documents
    )
    SELECT s AS ngram, CAST(count(*) AS BIGINT) AS df
    FROM sh GROUP BY s
    ORDER BY df DESC, s LIMIT {NGRAM_K}
    """,
)
def ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram census: the K most document-frequent trigrams —
    the "what is my corpus full of" diagnostic run before and after
    filtering.

    Explode → hash-agg (partial map-side combine carries only distinct
    trigrams per task) → ``orderBy().limit()``, which Catalyst plans as
    TakeOrderedAndProject: each task keeps a K-row heap and the driver
    merges S·K rows, never the full trigram distribution. Deterministic
    tiebreak on the ngram string keeps the LIMIT stable.
    """
    from vector_search_playground_spark.operators.dedup import shingle_sets

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        shingle_sets(docs)
        .select(F.explode_outer("shingles").alias("ngram"))
        .where(F.col("ngram").isNotNull())  # null-doc guard
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "ngram")
        .limit(NGRAM_K)
    )


# --- normalize_features -----------------------------------------------------


@query(
    "normalize_features",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ),
    long AS (
        SELECT vec_id, unnest(range(len(emb))) AS dim, unnest(emb) AS v
        FROM e
    ),
    st AS (
        SELECT dim, avg(v) AS mu, stddev_samp(v) AS sigma
        FROM long GROUP BY dim
    )
    SELECT l.vec_id, CAST(l.dim AS INT) AS dim,
           ROUND((l.v - s.mu) / s.sigma, {ROUND_DIST}) AS z
    FROM long l JOIN st s USING (dim)
    """,
)
def normalize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score normalization of the embedding table — the
    feature-scaling pass before clustering/IVF training.

    The long form (posexplode) feeds one hash-agg whose output is
    |dims| rows — map-side partial aggregation means the shuffle moves
    |dims|·|tasks| partial moments, not |corpus|·|dims| values. The
    stats broadcast back onto the long form, so the big relation is
    never shuffled. Emitted long (vec_id, dim, z) — the array re-pack
    is a downstream ``collect_list`` keyed on vec_id if needed.
    """
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    long = emb.select(
        "vec_id", F.posexplode("emb").alias("dim", "v")
    )
    st = long.groupBy("dim").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sigma")
    )
    return long.join(F.broadcast(st), "dim").select(
        "vec_id",
        F.col("dim").cast("int").alias("dim"),
        F.round((F.col("v") - F.col("mu")) / F.col("sigma"), ROUND_DIST)
        .alias("z"),
    )


# --- lm_score ---------------------------------------------------------------


@query(
    "lm_score",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents WHERE text IS NOT NULL
    ),
    freq AS (
        SELECT w, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY w
    ),
    total AS (SELECT sum(c) AS n FROM freq)
    SELECT tok.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           ROUND(avg(-ln(freq.c / total.n)), {ROUND_DIST}) AS xent
    FROM tok JOIN freq USING (w) CROSS JOIN total
    GROUP BY tok.doc_id
    """,
)
def lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under a corpus-estimated unigram LM —
    the self-contained core of the CCNet/Gopher 'perplexity filter':
    documents whose tokens are corpus-improbable score high and get
    culled. Estimating the LM from the corpus itself keeps the whole
    query SQL-expressible (hash-certified), unlike external-KenLM
    variants.

    Plan: one explode→hash-agg shuffle builds the frequency relation
    (vocabulary-sized — Zipf-bounded far below corpus size); the
    token→logprob join is keyed on the word, and AQE chooses broadcast
    vs shuffle by the MEASURED vocabulary size rather than a hint, which
    is the right call at 100 TB where the vocabulary can outgrow a
    broadcast. Final per-doc aggregation reuses the doc_id partitioning
    of the explode."""
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    tok = docs.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("w")
    )
    freq = tok.groupBy("w").agg(
        F.count(F.lit(1)).cast("double").alias("c")
    )
    total = freq.agg(F.sum("c").alias("n"))
    return (
        tok.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("c") / F.col("n"))), ROUND_DIST
            ).alias("xent"),
        )
    )
