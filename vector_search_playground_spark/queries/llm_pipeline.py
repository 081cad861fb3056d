"""LLM-data-pipeline tier, oracle-backed half (SURVEY.md §2 Tier C vector /
LLM pipeline; driver north star BASELINE.json).

The reference stores embedded documents and brute-force-searches them
(`/root/reference/src/main.rs:85-96`); a training-data pipeline at 100 TB
additionally needs dedup, similarity joins, and text analysis. This module
holds every LLM-tier operator with an exact SQL semantics — the approximate
/ index-backed scale paths live in ``operators/dedup.py`` and ``plans/``.

Scale discipline per query:
- ``dedup_exact`` is a hash groupBy on the content key — map-side partial
  aggregation, one shuffle on the dedup key, no sort. The keep-min-id rule
  makes the representative deterministic.
- ``sim_join`` (exact variant) is the oracle anchor for similarity joins;
  all-pairs is inherently O(n²) so the *registered* query broadcasts the
  smaller (deduplicated) side and lets the distance filter run inside one
  codegen stage. At 100 TB you run the LSH-bucketed path
  (``operators/dedup.py``) and use this exact form only to validate recall
  on samples — that division of labor is the design, documented here.
- text queries are explode → hash-aggregate pipelines: one shuffle on the
  group key, no windows over the raw token stream.
- ``tfidf_topterms`` broadcasts the document-frequency side (vocabulary ≪
  corpus) and the per-doc top-k window partitions by doc_id — high
  cardinality, no single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import ROUND_DIST, query
from vector_search_playground_spark.sources import load_table

# Tiny stopword list used by the quality heuristics — fixed here and inlined
# into the oracle SQL so both engines share one definition.
STOPWORDS = ("a", "the")

SIM_JOIN_THRESHOLD = 0.7  # 990 pairs of 124 750 at sf0.01 — selective


@query(
    "dedup_exact",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
    )
    SELECT min(doc_id) AS doc_id, text
    FROM corpus
    GROUP BY text
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup with keep-min-id representatives.

    The fixture texts are all distinct, so the corpus is unioned with a
    re-keyed copy of itself to make the dedup observable: every text has
    exactly two ids and the canonical keep-min rule must pick the original.

    Plan shape: hash aggregate on ``text`` (map-side partial min, one
    shuffle on the dedup key). At 100 TB dedup on a long text column should
    group on ``xxhash64(text)`` instead and keep the text via ``min_by`` —
    same plan, 8-byte shuffle key; the full-text key is used here so the
    oracle is engine-portable.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup)
    return corpus.groupBy("text").agg(F.min("doc_id").alias("doc_id")).select(
        "doc_id", "text"
    )


@query(
    "sim_join",
    oracle=f"""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(1 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])),
                 {ROUND_DIST}) AS dist
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE 1 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
          < {SIM_JOIN_THRESHOLD}
    """,
)
def sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact thresholded similarity self-join over the embedding corpus.

    This is the *exact* variant from SURVEY §2 — the oracle anchor for the
    approximate paths (``dedup_near``'s MinHash-LSH, ``index_build_lsh``'s
    bucketed join). Semantics: all unordered pairs (a < b by id) with
    cosine distance below the threshold.

    Physical shape (operators/simjoin.py): the build side is broadcast as
    a float64 matrix, the probe side streams through ``mapInPandas``, and
    every pairwise distance comes out of one BLAS matmul per Arrow batch —
    zero shuffle, partition-parallel. A BroadcastNestedLoopJoin with the
    HOF cosine kernel has the same plan shape but evaluates 4M interpreted
    folds (Catalyst HOFs are CodegenFallback): 135 s vs ~2 s at sf0.1.
    All-pairs is O(n²) by definition; at 100 TB this exact form is only
    ever run on samples to measure the LSH path's recall (SURVEY §2).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    from vector_search_playground_spark.operators.simjoin import sim_join_exact

    return sim_join_exact(
        emb,
        threshold=SIM_JOIN_THRESHOLD,
        id_col="vec_id",
        vec_col="embedding",
        round_to=ROUND_DIST,
    ).select(
        F.col("a_id"), F.col("b_id"), F.col("dist")
    )


@query(
    "text_stats",
    oracle="""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_tokens,
           count(DISTINCT token) AS n_distinct_tokens,
           ROUND(count(*) / count(DISTINCT doc_id), 6) AS avg_tokens_per_doc
    FROM tok
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics per language: tokenize → explode → hash agg.

    One shuffle on ``lang``; the tokenization and explode are map-side.
    The two count-distincts expand the aggregate (Catalyst plans a
    two-phase distinct agg) — still a single exchange on the group key.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode_outer(F.split("text", " ")).alias("token")
    ).where(F.col("token").isNotNull())  # null text → null split; drop like
    # SQL unnest(NULL) does, so a null doc adds neither tokens nor a doc_id
    return tok.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct_tokens"),
        F.round(
            F.count(F.lit(1)) / F.countDistinct("doc_id"), 6
        ).alias("avg_tokens_per_doc"),
    ).select(
        "lang", "n_docs", "n_tokens", "n_distinct_tokens", "avg_tokens_per_doc"
    )


@query(
    "text_quality",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, n_chars, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT doc_id,
           any_value(n_chars) AS n_chars,
           count(*) AS n_tokens,
           ROUND(avg(length(token)), 6) AS avg_token_len,
           ROUND(count(DISTINCT token) / count(*), 6) AS type_token_ratio,
           ROUND(count(*) FILTER (token IN {STOPWORDS!r}) / count(*), 6)
             AS stopword_ratio
    FROM tok
    GROUP BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality scoring (north-star text analysis): token
    count, mean token length, type-token ratio, stopword ratio — the
    standard cheap filters in a pretraining-data pipeline.

    Explode → hash aggregate on ``doc_id`` (high cardinality, no skew).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "n_chars", F.explode_outer(F.split("text", " ")).alias("token")
    ).where(F.col("token").isNotNull())  # null-doc guard (unnest semantics)
    n = F.count(F.lit(1))
    return tok.groupBy("doc_id").agg(
        F.any_value("n_chars").alias("n_chars"),
        n.alias("n_tokens"),
        F.round(F.avg(F.length("token")), 6).alias("avg_token_len"),
        F.round(F.countDistinct("token") / n, 6).alias("type_token_ratio"),
        F.round(
            F.count(F.when(F.col("token").isin(*STOPWORDS), 1)) / n, 6
        ).alias("stopword_ratio"),
    ).select(
        "doc_id",
        "n_chars",
        "n_tokens",
        "avg_token_len",
        "type_token_ratio",
        "stopword_ratio",
    )


# Marker vocabularies for the language-ID heuristic — tiny per-language
# stopword lists, shared verbatim with the oracle SQL. The fixture texts are
# synthetic bags of words, so most score 0 everywhere and fall back to 'und'
# (ISO 639 "undetermined") — which is the honest output of a marker-based
# classifier on vocabulary-less text, and exactly what the oracle computes.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "ein"),
    "es": ("el", "la", "los", "una"),
    "fr": ("le", "la", "les", "une"),
}

BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


@query(
    "lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang AS lang_actual,
               len(list_intersect(string_split(text, ' '),
                                  {list(LANG_MARKERS['en'])!r})) AS s_en,
               len(list_intersect(string_split(text, ' '),
                                  {list(LANG_MARKERS['de'])!r})) AS s_de,
               len(list_intersect(string_split(text, ' '),
                                  {list(LANG_MARKERS['es'])!r})) AS s_es,
               len(list_intersect(string_split(text, ' '),
                                  {list(LANG_MARKERS['fr'])!r})) AS s_fr
        FROM documents
    )
    SELECT doc_id, lang_actual,
           CASE WHEN greatest(s_en, s_de, s_es, s_fr) = 0 THEN 'und'
                WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
                WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
                WHEN s_es >= s_fr THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM scored
    """,
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language-ID heuristic (north-star text analysis):
    score each document against tiny per-language stopword sets, argmax
    with a fixed priority tiebreak, 'und' when nothing matches. Pure map
    — array_intersect against broadcast literal arrays, no shuffle. The
    oracle runs the identical decision procedure, so the guess column
    value-hashes."""
    docs = load_table(spark, sf_dir, "documents")
    tok = F.split("text", " ")
    s = {
        lang: F.size(
            F.array_intersect(tok, F.array(*[F.lit(m) for m in marks]))
        )
        for lang, marks in LANG_MARKERS.items()
    }
    best = F.greatest(s["en"], s["de"], s["es"], s["fr"])
    guess = (
        F.when(best == 0, F.lit("und"))
        .when(s["en"] >= F.greatest(s["de"], s["es"], s["fr"]), F.lit("en"))
        .when(s["de"] >= F.greatest(s["es"], s["fr"]), F.lit("de"))
        .when(s["es"] >= s["fr"], F.lit("es"))
        .otherwise(F.lit("fr"))
    )
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        guess.alias("lang_guess"),
    )


@query(
    "token_count",
    oracle=f"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS bpe_ish_tokens
    FROM documents
    """,
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting both ways the north star names: whitespace split and
    a BPE-ish regex (letter runs / digit runs / single punctuation — the
    GPT-2 pre-tokenizer shape without the unicode classes). Pure map;
    both regex engines (Java, DuckDB/RE2) agree on this ASCII pattern."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
        ).alias("bpe_ish_tokens"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
             AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint (north-star fingerprinting):
    MD5 over the sorted token multiset, so texts that are permutations of
    the same bag of words collide — the canonical cheap near-dup key.

    Pure map (no shuffle); MD5 is bit-identical across engines, which is
    why it is the portable choice here over xxhash64.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.array_join(F.array_sort(F.split("text", " ")), " ")
        ).alias("fingerprint"),
    )


@query(
    "tfidf_topterms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n FROM documents WHERE text IS NOT NULL),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * ln(n.n / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 5
    """,
)
def tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per document by TF-IDF, SQL-only (no MLlib HashingTF —
    exact term identities, portable to the oracle).

    Plan: tf = hash agg on (doc_id, term); df = second agg on term over the
    already-tiny tf relation; df (vocabulary-sized, ≪ corpus) and the
    1-row corpus count are both broadcast back, so scoring is map-side.
    The top-k window partitions by doc_id — high cardinality, per-group
    heaps, no global sort. Ranking uses the *rounded* score so float noise
    below 1e-6 cannot flip the order between engines; ties break on term.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode_outer(F.split("text", " ")).alias("term")
    ).where(F.col("term").isNotNull())  # null-doc guard (unnest semantics)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # IDF corpus size = docs that can contribute terms; a null-text doc is
    # not a document for TF-IDF purposes (keeps null docs fully inert)
    n = docs.where(F.col("text").isNotNull()).agg(
        F.count(F.lit(1)).alias("n")
    )
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "dedup_ngram",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
               array_to_string(
                 string_split(text, ' ')[1:greatest(len(string_split(text,' '))-1,1)],
                 ' ') AS text
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(
                 CASE WHEN len(string_split(text, ' ')) >= 3
                      THEN list_transform(
                             range(1, len(string_split(text, ' ')) - 1),
                             i -> array_to_string(
                                    string_split(text, ' ')[i:i+2], ' '))
                      ELSE string_split(text, ' ') END) AS s
        FROM corpus
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    """,
)
def dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity join via prefix filtering
    (operators/setjoin.py) over documents ∪ perturbed copies — the exact
    member of the dedup family (MinHash-LSH in ``dedup_near`` is its
    approximate sibling and is anchored by this result).

    The oracle computes the same pairs the brute-force O(n²) way; the
    engine's prefix-filter join must agree exactly — that equality IS the
    no-false-negatives guarantee of the prefix principle, value-hashed.
    """
    from vector_search_playground_spark.operators.dedup import shingle_sets
    from vector_search_playground_spark.operators.setjoin import jaccard_join

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    near = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near)
    return jaccard_join(shingle_sets(corpus), threshold=0.8)


DEDUP_EMBED_THRESHOLD = 0.6  # 59 pairs / 443 components at sf0.01 —
# real near-dup structure (small clusters), no giant component


@query(
    "dedup_embed",
    oracle=f"""
    WITH RECURSIVE pairs AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE 1 - list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
              < {DEDUP_EMBED_THRESHOLD}
    ),
    edges AS (
        SELECT a_id AS src, b_id AS dst FROM pairs
        UNION ALL
        SELECT b_id, a_id FROM pairs
    ),
    reach(src, dst) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    )
    SELECT src AS vec_id, min(dst) AS rep_id FROM reach GROUP BY src
    """,
)
def dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection — the fifth dedup family
    member from the driver north star (exact = ``dedup_exact``, MinHash-LSH
    = ``dedup_near``, SimHash = ``dedup_simhash``, n-gram Jaccard =
    ``dedup_ngram``): rows whose embeddings sit within cosine distance
    ``0.6`` of each other merge into one cluster, represented by min id.

    Fully oracle-backed, unlike the signature-based members: the pair step
    is the exact block-matrix similarity join (operators/simjoin.py — BLAS
    per block pair, no driver materialization) and the clustering is
    min-label-propagation connected components (operators/dedup.py), which
    the oracle replays as a recursive-CTE transitive closure. Both engines
    compute the identical component structure, so (vec_id, rep_id)
    value-hashes. Threshold margin to the nearest pair is ~1e-4 at sf0.01
    (~1e-5 at sf0.1) — far above cross-engine f64 summation noise.

    At 100 TB: the pair join is the block-matrix kernel (B·n shuffle rows);
    component diameter under a *near-dup* threshold stays small, so the CC
    loop converges in a few checksum-guarded rounds.
    """
    from vector_search_playground_spark.operators.dedup import (
        connected_components,
    )
    from vector_search_playground_spark.operators.simjoin import sim_join_exact

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = sim_join_exact(
        emb,
        threshold=DEDUP_EMBED_THRESHOLD,
        id_col="vec_id",
        vec_col="embedding",
    )
    nodes = emb.select(F.col("vec_id").alias("doc_id"))
    labels = connected_components(
        nodes, pairs.select("a_id", "b_id"), max_iter=20
    )
    return labels.select(
        F.col("doc_id").alias("vec_id"), F.col("rep_id")
    )


@query(
    "split_train_val",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 100 < 90
                THEN 'train' ELSE 'val' END AS split
    FROM documents
    """,
)
def split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-keyed train/val split (training-data op):
    hash the TEXT, not the id, so the assignment survives re-ingestion,
    re-partitioning, and id reshuffles — and duplicate texts always land
    in the same split (no train/val leakage between near-identical rows).
    MD5 is bit-identical across engines; the first 4 hex chars give a
    uniform 16-bit bucket. Pure map — no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10).cast(
        "long"
    )
    return docs.select(
        "doc_id",
        "source",
        F.when(bucket % 100 < 90, F.lit("train"))
        .otherwise(F.lit("val"))
        .alias("split"),
    )


@query(
    "sample_stratified",
    oracle="""
    SELECT doc_id, source
    FROM documents
    JOIN (VALUES (0, 100), (1, 50), (2, 20), (3, 5)) r(grp, rate_pct)
      ON CAST(substr(source, 4) AS INT) % 4 = grp
    WHERE CAST('0x' || substr(md5(text), 1, 4) AS BIGINT) % 100 < rate_pct
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified (per-source weighted) sampling — the dataset-mixing
    primitive of a training pipeline: each source keeps a configured
    percentage of its documents, selected by the same content hash as
    ``split_train_val`` so the sample is deterministic and reproducible
    (never ``rand()``, which differs per run/partitioning). The rate table
    is O(sources) and broadcast; the filter is a pure map after it —
    at 100 TB this is one scan, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [(0, 100), (1, 50), (2, 20), (3, 5)], "grp: int, rate_pct: int"
    )
    grp = (F.substring("source", 4, 10).cast("int") % 4).alias("grp")
    bucket = F.conv(F.substring(F.md5(F.col("text")), 1, 4), 16, 10).cast(
        "long"
    )
    return (
        docs.withColumn("grp", grp)
        .withColumn("__bucket", bucket)
        .join(F.broadcast(rates), "grp")
        .where(F.col("__bucket") % 100 < F.col("rate_pct"))
        .select("doc_id", "source")
    )


@query(
    "pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS tok_before
      FROM t
    )
    SELECT CAST(FLOOR(tok_before / 512.0) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY seq_id
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (training-data op): assign documents to contiguous
    512-token training sequences in corpus order, then summarize each
    sequence. The oracle states the semantics as the global running sum;
    the Spark plan is the bucketed two-pass prefix sum from
    operators/packing.py — a window partitioned into P balanced buckets
    plus metadata-sized offsets, never the single-partition global window
    the literal phrasing implies."""
    from vector_search_playground_spark.operators.packing import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    packed = pack_sequences(
        docs, order_col="doc_id", weight_col="n_tokens", budget=512
    )
    return packed.groupBy("seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


# ---------------------------------------------------------------------------
# Approximate scale paths — rows-only by design (SURVEY §2: never value-hash
# an approximate algorithm); correctness is property-tested in
# tests/test_dedup.py and tests/test_index.py.
# ---------------------------------------------------------------------------

SCRATCH = "/root/repo/.scratch"

# Bump whenever the code that WRITES any .scratch artifact changes shape or
# semantics (schema, units, aggregation logic). Mixing this into the
# fingerprint invalidates every derived cache at once — without it, a writer
# bug fix (e.g. round 3's timestamp-unit error) would keep serving the stale
# materialization because the fixture itself never changed.
CACHE_VERSION = "r9"  # bumped with the avro writer's byte-bounded block flush


def _fixture_fingerprint(sf_dir: str, table: str) -> str:
    """Content fingerprint of a fixture table: (name, size, mtime_ns) of
    every file under the parquet path, hashed together with CACHE_VERSION
    (the writer-code revision). Index caches key on this so a rewritten
    fixture — or a rewritten writer — invalidates the cached artifact
    instead of silently serving stale cells; "cache keyed by directory name
    only" was the staleness bug called out in round 2's close-out notes."""
    import hashlib
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    parts: list[str] = [CACHE_VERSION]
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
    elif os.path.exists(path):
        st = os.stat(path)
        parts.append(f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}")
    digest = hashlib.blake2b("|".join(parts).encode(), digest_size=8)
    return digest.hexdigest()


@query("dedup_near")  # rows-only: MinHash-LSH is approximate by design
def dedup_near_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection over documents ∪ perturbed copies.

    Each planted copy drops the document's last token (shingle Jaccard
    ≈ 0.95 vs its original), so the expected output is every planted id
    mapping back to its source via the keep-min-id rule. Pipeline:
    fused Arrow text→MinHash signatures (32 hashes, no shingle
    explode/exchange) → LSH bands (8×4) → candidate-only exact-Jaccard
    verify ≥ 0.7 rebuilt Arrow-side → min-id connected components
    (operators/dedup.py).
    """
    from vector_search_playground_spark.operators.dedup import dedup_near

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    near = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near)
    labels = dedup_near(corpus)
    return (
        labels.where(F.col("doc_id") != F.col("rep_id"))
        .orderBy("doc_id")
        .select("doc_id", "rep_id")
    )


@query("dedup_simhash")  # rows-only: hash-signature method, no SQL oracle
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup detection over documents ∪ perturbed copies —
    the third dedup family member (exact n-gram = ``dedup_ngram``,
    MinHash-LSH = ``dedup_near``): 64-bit sign-vote signatures computed in
    one fused Arrow stage (text → votes → packed signature, no 64-aggregate
    explode), 8-band collision search, exact Hamming verify ≤ 7 (exhaustive
    within that radius by pigeonhole — operators/dedup.py::simhash_pairs)."""
    from vector_search_playground_spark.operators.dedup import (
        simhash_pairs,
        simhash_signatures_fused,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    near = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1)))
        ).alias("text"),
    )
    corpus = docs.unionByName(near)
    sigs = simhash_signatures_fused(corpus)
    return simhash_pairs(sigs, max_hamming=7).orderBy("a_id", "b_id")


def _recall_at_k(approx: DataFrame, emb: DataFrame,
                 qvec: list[float], k: int) -> float:
    """recall@k of an approximate search result vs the exact KNN — the
    quality number the driver's rows-only check pins (round-4 verdict
    item 5: shape-only certification says nothing about an ANN's answer).
    Two bounded collects (k rows each); the exact side reuses the same
    deterministic knn kernel every exact path uses."""
    from vector_search_playground_spark.operators.knn import knn

    exact = {
        r["vec_id"]
        for r in knn(
            emb, qvec, threshold=None, k=k, tiebreak="vec_id"
        ).collect()
    }
    got = {r["vec_id"] for r in approx.collect()}
    return len(exact & got) / float(k)


@query("index_build_ivf")  # rows-only: pruned search is approximate
def index_build_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the IVF index (k-means → centroid_id-partitioned parquet)
    and run a pruned top-10 search for vec 0's embedding (plans/ivf.py).
    Recall vs exact knn is property-tested, not hashed.

    The destination is keyed by fixture tag + fingerprint AND the build
    runs with ``overwrite=True``: this ID deliberately re-measures the
    one-off build each call, and a rebuild must actually replace the
    artifact — the r9 cache-semantics atomic_build silently kept a
    stale index (built from a DIFFERENT corpus at the shared
    un-fingerprinted path) while returning fresh centroids, so
    search_ivf read the wrong corpus (ADVICE r9, high)."""
    import os

    from vector_search_playground_spark.plans.ivf import build_ivf, search_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/"))
    fp = _fixture_fingerprint(sf_dir, "embeddings")
    path = os.path.join(SCRATCH, f"ivf_index_build_{tag}_{fp}")
    centroids = build_ivf(emb, path, k=16, seed=42, overwrite=True)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    return search_ivf(spark, path, centroids, qvec, k=10, nprobe=4)


def load_or_build_ivf(spark, sf_dir: str, emb: DataFrame):
    """(index_path, centroids) for the fixture's IVF index, building the
    centroid_id-partitioned parquet + centroid JSON sidecar on first use
    (fingerprint-keyed, the codebook-cache discipline). Shared by
    ``ivf_search`` and ``ivf_pq_search``."""
    import json
    import os

    from vector_search_playground_spark.plans.ivf import build_ivf

    tag = os.path.basename(sf_dir.rstrip("/"))
    fp = _fixture_fingerprint(sf_dir, "embeddings")
    path = os.path.join(SCRATCH, f"ivf_index_{tag}_{fp}")
    meta = f"{path}.centroids.json"
    if os.path.exists(meta):
        with open(meta) as f:
            centroids = json.load(f)
    else:
        centroids = build_ivf(emb, path, k=16, seed=42)
        tmp = f"{meta}.tmp"
        with open(tmp, "w") as f:
            json.dump(centroids, f)
        os.replace(tmp, meta)
    return path, centroids


@query("ivf_search")  # rows-only: pruned search is approximate
def ivf_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pruned IVF *search* over a pre-built index — the user-facing half of
    the IVF pair (``index_build_ivf`` measures the one-off build; a user's
    first question to an index is a query against it).

    The index (centroid_id-partitioned parquet + centroid metadata JSON)
    is built once per fixture directory and reused across invocations, so
    this ID times the steady-state search path: rank 16 centroids
    driver-side, scan only the nprobe=4 nearest cells — partition pruning
    at file-listing time (PartitionFilters in the scan, asserted in
    tests/test_llm_plans.py) — and TakeOrderedAndProject the top-10.
    """
    from vector_search_playground_spark.plans.ivf import search_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    path, centroids = load_or_build_ivf(spark, sf_dir, emb)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    # nprobe=10/16: the fixture embeddings are structureless (uniform
    # 64-dim — no cluster gaps), so the pruning-to-recall curve is weak
    # by nature; 10 probes is the measured knee where recall@10 reaches
    # 0.9 (sf0.1) / 1.0 (sf0.01). On clustered real embeddings the same
    # plan hits that recall at far lower nprobe.
    found = search_ivf(spark, path, centroids, qvec, k=10, nprobe=10)
    recall = _recall_at_k(found, emb, qvec, 10)
    return found.withColumn("recall_at_k", F.lit(round(recall, 2)))


_RANGE_T = 0.8  # keeps 29-108 rows across fixture SFs (non-vacuous)


@query(
    "range_search_ivf",
    oracle=f"""
    SELECT e.vec_id,
           ROUND(1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            q.qe), {ROUND_DIST}) AS dist
    FROM embeddings e,
         (SELECT CAST(embedding AS DOUBLE[]) AS qe
          FROM embeddings WHERE vec_id = 0) q
    WHERE ROUND(1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           q.qe), {ROUND_DIST}) < {_RANGE_T}
    """,
)
def range_search_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-assisted RADIUS search (pgvector's ``WHERE embedding <=> q
    < t`` with an IVFFlat index): every vector within cosine distance
    0.8 of the standing query, scanning only cells the angular triangle
    inequality cannot rule out (plans/ivf.py::range_search_ivf).

    Unlike ivf_search's nprobe cut this pruning is exactly COMPLETE —
    θ(q,x) ≥ θ(q,c) − r_cell — so the query carries a full value-hash
    oracle (the brute-force scan) rather than a rows-only check. The
    per-cell covering radii are one cached linear pass over the index
    (`.radii.json` beside the centroid metadata, same
    fixture-fingerprint key).
    """
    import json
    import os

    from vector_search_playground_spark.plans.ivf import (
        cell_radii,
        range_search_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    path, centroids = load_or_build_ivf(spark, sf_dir, emb)
    rmeta = f"{path}.radii.json"
    if os.path.exists(rmeta):
        with open(rmeta) as f:
            radii = json.load(f)
    else:
        radii = cell_radii(spark, path, centroids)
        tmp = f"{rmeta}.tmp"
        with open(tmp, "w") as f:
            json.dump(radii, f)
        os.replace(tmp, rmeta)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    return range_search_ivf(
        spark, path, centroids, radii, qvec, _RANGE_T, round_to=ROUND_DIST
    )


@query("index_build_lsh")  # rows-only: bucketed search is approximate
def index_build_lsh_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the random-hyperplane LSH table, run a multiprobe top-10
    search for vec 0's embedding (plans/lsh.py), and ride the BUILD
    SCORECARD in-row (r8 verdict #5 — the index_build_pq discipline):
    ``bucket_balance`` is the normalized occupancy entropy over the
    2^nbits sign buckets (1.0 = perfectly even split, the property that
    keeps per-bucket probe cost constant at scale; a collapsed table
    scores near 0 and would make every probe a corpus scan),
    ``buckets_used_frac`` the fraction of possible buckets with ≥1
    member (dead-cell detector at fixture density), and ``recall_at_k``
    the multiprobe search's overlap with the exact top-10 — the same
    honest quality surface lsh_search carries. The occupancy aggregate
    is one ≤2^nbits-row collect: metadata math, never corpus-scale."""
    import math

    from vector_search_playground_spark.plans.lsh import (
        build_lsh,
        hyperplanes,
        search_lsh,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.where(F.col("vec_id") == 0).first()["embedding"])
    nbits = 8
    planes = hyperplanes(dim, nbits=nbits, seed=42)
    indexed = build_lsh(emb, planes)
    occ = [
        r["c"]
        for r in indexed.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("c")
        ).collect()
    ]
    total = sum(occ)
    balance = (
        -sum((c / total) * math.log(c / total) for c in occ)
        / math.log(1 << nbits)
        if total and len(occ) > 1
        else 0.0
    )
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    found = search_lsh(indexed, planes, qvec, k=10)
    recall = _recall_at_k(found, emb, qvec, 10)
    return (
        found.withColumn("bucket_balance", F.lit(round(balance, 4)))
        .withColumn(
            "buckets_used_frac",
            F.lit(round(len(occ) / (1 << nbits), 4)),
        )
        .withColumn("recall_at_k", F.lit(round(recall, 2)))
    )


@query("lsh_search")  # rows-only: bucketed search is approximate
def lsh_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe LSH *search* over a pre-built, bucket-partitioned index —
    the steady-state half of the LSH pair, mirroring ``ivf_search``:
    ``index_build_lsh`` measures the one-off signature build; this ID
    times what a user pays per query.

    The index is the corpus written as parquet **partitioned by bucket**
    (256 cells for nbits=8), cached per (fixture, content-fingerprint);
    the hyperplanes are a seeded constant rebuilt from metadata. Search
    hashes the query driver-side (nbits dot products on one vector),
    probes its bucket plus every 1-bit flip, and the ``isin`` predicate on
    the partition column prunes at file-listing time — PartitionFilters in
    the scan (asserted in tests/test_llm_plans.py), so cost is
    O(N·probed/256), not O(N), with exact cosine ranking only inside the
    probed cells."""
    import json
    import os

    from vector_search_playground_spark.plans.lsh import (
        build_lsh,
        hyperplanes,
    )
    from vector_search_playground_spark.plans.lsh import (
        search_lsh_partitioned,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    tag = os.path.basename(sf_dir.rstrip("/"))
    fp = _fixture_fingerprint(sf_dir, "embeddings")
    path = os.path.join(SCRATCH, f"lsh_index_{tag}_{fp}")
    meta = f"{path}.meta.json"
    if os.path.exists(meta):
        with open(meta) as f:
            dim = json.load(f)["dim"]
    else:
        dim = len(emb.where(F.col("vec_id") == 0).first()["embedding"])
        planes = hyperplanes(dim, nbits=8, seed=42)
        from vector_search_playground_spark.sources import atomic_build

        atomic_build(
            lambda p: build_lsh(emb, planes)
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(p),
            path,
        )
        tmp = f"{meta}.tmp"
        with open(tmp, "w") as f:
            json.dump({"dim": dim, "nbits": 8, "seed": 42}, f)
        os.replace(tmp, meta)
    planes = hyperplanes(dim, nbits=8, seed=42)
    qvec = [
        float(x)
        for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    found = search_lsh_partitioned(spark, path, planes, qvec, k=10)
    # Honest quality surface: on the structureless fixture vectors
    # (uniform 64-dim, no distance gaps for the hash to exploit) 1-bit
    # multiprobe over 9/256 buckets lands recall@10 ≈ 0.1-0.4 — measured,
    # and inherent to hyperplane LSH on gap-free data rather than a bug
    # (probing 31% of cells at nbits=4 still only reaches 0.7). The
    # planted-near-dup property tests (tests/test_index.py) are the
    # contract this index actually serves: true near-duplicates collide
    # with probability → 1. The recall column keeps the driver's
    # rows-only check pinned to a number instead of a shape.
    recall = _recall_at_k(found, emb, qvec, 10)
    return found.withColumn("recall_at_k", F.lit(round(recall, 2)))


@query("multimodal_features")  # rows-only: feature values are codec output
def multimodal_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column pipeline, REAL decode end-to-end: documents →
    genuine WAV/PPM/Y4M bytestreams (binary payload + typed metadata) →
    mapInPandas decode → frame-sample → signal-statistic featurize
    (functions/multimodal.py). Compressed codecs (png/mp4/…) remain a
    documented NotImplementedError seam at the same call site; plumbing
    and codecs are property-tested in tests/test_multimodal.py.

    r14 optimization: synth and featurize are fused into one
    ``mapInPandas`` stage (functions/multimodal.py::
    synthesize_and_featurize_real) so the payload column never crosses
    the Arrow boundary — row-identical by shared helpers, equivalence
    pinned by tests/test_multimodal.py::test_fused_matches_unfused."""
    from vector_search_playground_spark.functions.multimodal import (
        synthesize_and_featurize_real,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = synthesize_and_featurize_real(docs)
    return feats.select(
        "media_id",
        "kind",
        "payload_bytes",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x), 6)
        .alias("feature_sum"),
        F.coalesce(F.size("sampled_frames"), F.lit(0)).alias("n_sampled"),
    )


# --- eval_minhash -----------------------------------------------------------


@query("eval_minhash")  # rows-only: the estimator itself is the subject
def eval_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash accuracy scorecard — the measurement loop that makes
    ``dedup_near``'s signatures trustworthy (the eval_retrieval
    discipline applied to dedup): for every document we pair it with a
    planted near-duplicate twin (last token dropped — true Jaccard near
    1) and with its id-neighbor (unrelated — true Jaccard near 0), then
    emit per pair the 32-hash MinHash estimate, the EXACT shingle
    Jaccard, and the absolute error. Expected |err| ≈ √(J(1−J)/32) ≤
    0.09; the property suite pins the mean, the driver's rows-only
    check pins shape + execution.

    Scale shape: signatures come from the same fused one-pass Arrow
    kernel dedup_near uses (no shingle explode); the exact side is the
    candidate-bounded verify_jaccard join — pairs are O(n), never n².
    The estimate is a codegen'd mean of 32 column equalities."""
    from vector_search_playground_spark.operators.dedup import (
        NUM_HASHES,
        minhash_signatures_fused,
        shingle_sets,
        verify_jaccard,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    twins = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1)))
        ).alias("text"),
    )
    corpus = docs.unionByName(twins)

    ids = docs.select("doc_id")
    pair_twin = ids.select(
        F.col("doc_id").alias("a_id"),
        (F.col("doc_id") + 1000000).alias("b_id"),
        F.lit("twin").alias("kind"),
    )
    nxt = ids.select((F.col("doc_id") - 1).alias("a_id"),
                     F.col("doc_id").alias("b_id"))
    pair_neighbor = (
        ids.select(F.col("doc_id").alias("a_id"))
        .join(nxt, "a_id")
        .select("a_id", "b_id", F.lit("neighbor").alias("kind"))
    )
    pairs = pair_twin.unionByName(pair_neighbor)

    sigs = minhash_signatures_fused(corpus)
    sa = sigs.select(
        F.col("doc_id").alias("a_id"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("b_id"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(NUM_HASHES)
    )
    est = pairs.join(sa, "a_id").join(sb, "b_id").select(
        "a_id",
        "b_id",
        "kind",
        (matches.cast("double") / NUM_HASHES).alias("est_jaccard"),
    )
    shingled = shingle_sets(corpus)
    truth = verify_jaccard(pairs.select("a_id", "b_id"), shingled,
                           threshold=0.0)
    return (
        est.join(truth, ["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            "kind",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.col("jaccard").alias("true_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - F.col("jaccard")), 6)
            .alias("abs_err"),
        )
        .orderBy("a_id", "b_id")
    )


# --- eval_dedup -------------------------------------------------------------


@query("eval_dedup")  # rows-only: scores an approximate pipeline
def eval_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup scorecard: run the full MinHash-LSH pipeline
    (``dedup_near``) on documents ∪ planted near-dup twins and emit ONE
    row of (n_truth, n_pred, n_hit, precision, recall, f1) against the
    known ground truth — eval_retrieval pins the quantized index,
    eval_minhash pins the signature estimator, this pins the PIPELINE
    (banding + verify + connected components together).

    All three scores reduce distributively: recall is a self-join of the
    label relation on (i, i+1M) twin keys; the predicted-pair count is
    Σ_cluster C(|cluster|,2) from one hash-agg on rep_id — the pair SET
    is never materialized, so the scorecard costs two aggregates over
    |docs| rows regardless of corpus size."""
    from vector_search_playground_spark.operators.dedup import dedup_near

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = F.split("text", " ")
    twins = docs.select(
        (F.col("doc_id") + F.lit(1000000)).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(tok, 1, F.greatest(F.size(tok) - 1, F.lit(1)))
        ).alias("text"),
    )
    labels = dedup_near(docs.unionByName(twins)).persist()
    try:
        la = labels.select(
            F.col("doc_id").alias("a_id"), F.col("rep_id").alias("rep_a")
        )
        lb = labels.select(
            (F.col("doc_id") - 1000000).alias("a_id"),
            F.col("rep_id").alias("rep_b"),
        ).where(F.col("a_id") >= 0)
        hit = (
            la.join(lb, "a_id")
            .agg(
                F.count(F.lit(1)).alias("n_truth"),
                F.count(
                    F.when(F.col("rep_a") == F.col("rep_b"), 1)
                ).alias("n_hit"),
            )
        )
        pred = (
            labels.groupBy("rep_id")
            .agg(F.count(F.lit(1)).alias("sz"))
            .agg(
                F.sum(F.col("sz") * (F.col("sz") - 1) / 2)
                .cast("long")
                .alias("n_pred")
            )
        )
        prec = F.col("n_hit") / F.col("n_pred")
        rec = F.col("n_hit") / F.col("n_truth")
        return (
            hit.crossJoin(pred)
            .select(
                "n_truth",
                "n_pred",
                "n_hit",
                F.round(prec, 6).alias("precision"),
                F.round(rec, 6).alias("recall"),
                F.round(2 * prec * rec / (prec + rec), 6).alias("f1"),
            )
        )
    finally:
        labels.unpersist(blocking=False)


_NEG_K = 3


@query(
    "sample_negatives",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT d.doc_id, s.j AS neg_rank,
           (d.doc_id + 1 +
            ((CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)
                   AS BIGINT) >> (15 * s.j)) % (n.n_docs - 1))
           ) % n.n_docs AS neg_id
    FROM documents d
    CROSS JOIN n
    CROSS JOIN (SELECT unnest(range({_NEG_K})) AS j) s
    """,
)
def sample_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive retrieval training
    (the (anchor, negative) pair generator behind every dual-encoder /
    InfoNCE fine-tune): K={k} pseudo-random negatives per document,
    derived from md5 bit-slices of the doc_id so the dataset is exactly
    reproducible across runs, engines, and repartitioning — and the
    offset construction (1 + h mod N-1, added mod N) PROVES no document
    is ever its own negative.

    Shape at 100 TB: a pure row-local map (corpus count broadcast as a
    1-row literal) — zero shuffles, K output rows per doc. Swap-in
    point for hard-negative mining: replace the hash offset with a
    shortlist from ``knn_batch``/``pq_search`` and keep the same output
    contract.
    """.format(k=_NEG_K)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        docs.crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_docs",
            F.explode(
                F.array(*[F.lit(j) for j in range(_NEG_K)])
            ).alias("neg_rank"),
            h.alias("h"),
        )
        .select(
            "doc_id",
            F.col("neg_rank").cast("long").alias("neg_rank"),
            F.pmod(
                F.col("doc_id")
                + 1
                + F.pmod(
                    F.expr("shiftright(h, cast(15 * neg_rank as int))"),
                    F.col("n_docs") - 1,
                ),
                F.col("n_docs"),
            ).alias("neg_id"),
        )
    )


_VOCAB_V = 20
_OOV_ID = -1


@query(
    "tokenize_to_ids",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t.tok, t.pos FROM documents,
        LATERAL (
            SELECT unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
        ) t
        WHERE t.tok IS NOT NULL
    ),
    ranked AS (
        SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) - 1
                   AS id
        FROM tok GROUP BY tok
    ),
    vocab AS (SELECT tok, id FROM ranked WHERE id < {_VOCAB_V})
    SELECT tok.doc_id,
           array_to_string(
               array_agg(CAST(COALESCE(v.id, {_OOV_ID}) AS VARCHAR)
                         ORDER BY tok.pos),
               ',') AS ids,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.id IS NULL) AS BIGINT) AS n_oov
    FROM tok LEFT JOIN vocab v USING (tok)
    GROUP BY tok.doc_id
    """,
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization to vocabulary IDs — the text→ids step every
    training pipeline runs between cleaning and ``pack_sequences``: a
    frequency-ranked vocabulary of the top {v} tokens (deterministic
    count-then-lexicographic tiebreak), every document re-emitted as its
    ordered id sequence with OOV tokens mapped to {oov}, plus per-doc
    token/OOV counts (the tokenizer-coverage signal).

    Shape at 100 TB: the vocabulary is MODEL METADATA — built with a
    TakeOrdered top-V (driver sees V rows, the one legitimate collect)
    and broadcast back; the corpus path is posexplode → broadcast-join →
    one doc_id hash-agg whose collect_list is re-ordered row-locally by
    position (sort_array on (pos, id) structs — never an ordered-window
    whale). Token text crosses the wire once, as (doc, pos, token)
    triples.
    """.format(v=_VOCAB_V, oov=_OOV_ID)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode_outer(F.split("text", " ")).alias("pos", "tok"),
    ).where(F.col("tok").isNotNull())
    top = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "tok")
        .limit(_VOCAB_V)
        .collect()
    )
    vocab = spark.createDataFrame(
        [(r["tok"], i) for i, r in enumerate(top)], "tok string, id int"
    )
    with_ids = tok.join(F.broadcast(vocab), "tok", "left").select(
        "doc_id",
        "pos",
        F.coalesce(F.col("id"), F.lit(_OOV_ID)).cast("long").alias("id"),
    )
    return (
        with_ids.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "id"))
            ).alias("seq"),
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum((F.col("id") == _OOV_ID).cast("long"))
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            # Comma-joined string, not array<long>: the external driver's
            # canonicalizer hashes cell values and cannot hash list cells
            # (round-5 TypeError). Comma, not dash: the OOV id is -1 and a
            # dash delimiter would be ambiguous against its sign.
            F.concat_ws(
                ",", F.expr("transform(seq, s -> cast(s.id as string))")
            ).alias("ids"),
            "n_tokens",
            "n_oov",
        )
    )


# --- dedup_paragraph ----------------------------------------------------------

PARA_TOKENS = 32  # disjoint paragraph width (tokens)
PARA_ID_STRIDE = 1_000_000  # para_id = doc_id*STRIDE + index — collision-
# free for documents up to PARA_TOKENS*STRIDE (32M) tokens; widen the
# stride (or switch to a struct key) before any corpus exceeds that.
# The limit is ENFORCED at runtime (raise_error in paragraph_relation),
# so an over-long document fails loudly instead of silently colliding
# para_ids and corrupting the pair relation (r13 ADVICE).


def paragraph_relation(docs: DataFrame) -> DataFrame:
    """(doc_id=para_id, text) — disjoint PARA_TOKENS-token paragraphs of
    every document, para_id = doc_id*PARA_ID_STRIDE + paragraph index.
    Module-level so the coverage property test drives the exact
    production splitter (tests/test_r13_ops.py)."""
    w = F.col("w")
    return (
        docs.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            w,
            F.explode_outer(
                F.sequence(F.lit(1), F.size(w), F.lit(PARA_TOKENS))
            ).alias("s"),
        )
        .where(F.col("s").isNotNull())  # null-doc guard (unnest semantics)
        .select(
            (
                F.col("doc_id") * F.lit(PARA_ID_STRIDE)
                # loud overflow guard: the paragraph index must stay
                # below the stride or para_ids collide across documents
                + F.when(
                    ((F.col("s") - 1) / F.lit(PARA_TOKENS)).cast("long")
                    < F.lit(PARA_ID_STRIDE),
                    ((F.col("s") - 1) / F.lit(PARA_TOKENS)).cast("long"),
                ).otherwise(
                    F.raise_error(
                        F.lit(
                            "paragraph_relation: paragraph index reached "
                            f"PARA_ID_STRIDE ({PARA_ID_STRIDE}) — para_id "
                            "would collide across documents; widen the "
                            "stride before splitting documents over "
                            f"{PARA_TOKENS * PARA_ID_STRIDE} tokens"
                        )
                    )
                )
            ).alias("doc_id"),
            F.array_join(F.slice(w, F.col("s"), PARA_TOKENS), " ").alias(
                "text"
            ),
        )
    )



@query(
    "dedup_paragraph",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    para AS (
        SELECT doc_id * {PARA_ID_STRIDE}
                 + CAST(s - 1 AS BIGINT) // {PARA_TOKENS} AS para_id,
               w[s:s + {PARA_TOKENS} - 1] AS pw
        FROM tok, unnest(range(1, len(w) + 1, {PARA_TOKENS})) AS t(s)
    ),
    sh AS (
        SELECT para_id,
               list_distinct(
                 CASE WHEN len(pw) >= 3
                      THEN list_transform(
                             range(1, len(pw) - 1),
                             i -> array_to_string(pw[i:i+2], ' '))
                      ELSE pw END) AS s
        FROM para
    )
    SELECT a.para_id AS keep_id, b.para_id AS dup_id,
           ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))),
                 6) AS jaccard
    FROM sh a JOIN sh b ON a.para_id < b.para_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    """,
)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup: split every document into
    disjoint PARA_TOKENS-token paragraphs (the chunk_documents splitter
    with stride = width), then find all paragraph pairs with 3-gram
    shingle Jaccard >= 0.8 via the SAME prefix-filter kernel dedup_ngram
    certified (operators/setjoin.py) — the granularity an LLM-corpus
    pipeline actually dedups at, where boilerplate repeats inside
    otherwise-distinct documents. Output (keep_id, dup_id, jaccard) with
    keep_id = min(para_id) of the pair — the survivor under the
    keep-smallest-id policy.

    The oracle replicates the splitter arithmetically and brute-forces
    the O(p^2) pair space with list_intersect (the dedup_ngram oracle
    discipline): engine/oracle equality IS the prefix principle's
    no-false-negatives proof at paragraph granularity, value-hashed.

    Scale: the splitter is a pure row-local posexplode (zero shuffles,
    expansion factor tokens/PARA_TOKENS bounded by construction); the
    join inherits jaccard_join's plan — one vocabulary-sized frequency
    shuffle, prefix self-join keyed on the RAREST shingles (skew-free
    by frequency-ascending prefix order), exact verify only on surviving
    candidates. Composition of two individually decade-certified stages;
    the composed x10 certificate lives in tests/test_scale_stress.py."""
    from vector_search_playground_spark.operators.dedup import shingle_sets
    from vector_search_playground_spark.operators.setjoin import jaccard_join

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = jaccard_join(shingle_sets(paragraph_relation(docs)), threshold=0.8)
    return pairs.select(
        F.col("a_id").alias("keep_id"),
        F.col("b_id").alias("dup_id"),
        "jaccard",
    )


# --- boilerplate_paragraphs ---------------------------------------------------


@query(
    "boilerplate_paragraphs",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    para AS (
        SELECT doc_id,
               doc_id * {PARA_ID_STRIDE}
                 + CAST(s - 1 AS BIGINT) // {PARA_TOKENS} AS para_id,
               array_to_string(w[s:s + {PARA_TOKENS} - 1], ' ') AS ptext
        FROM tok, unnest(range(1, len(w) + 1, {PARA_TOKENS})) AS t(s)
    )
    SELECT md5(ptext) AS ptext_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_paras,
           min(para_id) AS min_para_id
    FROM para
    GROUP BY ptext
    HAVING count(DISTINCT doc_id) >= 2
    """,
)
def boilerplate_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection — the CCNet-style removal list: paragraphs
    whose EXACT text occurs in >= 2 DISTINCT documents (headers, footers,
    license blocks — the text a corpus pipeline strips before near-dedup
    even runs). One row per boilerplate paragraph text: its md5 (the
    removal-list key — engine-portable, unlike xxhash64), how many
    distinct documents carry it, total occurrences, and the smallest
    para_id as the canonical example. The sf0.01 fixture has real
    structure: 27 texts (24 in two docs, 2 in three, 1 in four —
    measured while designing the oracle, no planting).

    Plan shape: the certified ``paragraph_relation`` splitter (pure
    row-local explode, zero shuffles) -> ONE hash aggregate keyed on the
    paragraph text (map-side partial counts; the distinct-doc count
    rides the same shuffle via partial sets) -> HAVING filter. At
    100 TB the only change worth making is grouping on xxhash64(ptext)
    with the text kept via min_by — same plan, 8-byte shuffle key (the
    dedup_exact note); the full-text key here keeps the oracle
    engine-portable."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pt = paragraph_relation(docs).select(
        F.col("doc_id").alias("para_id"),
        (F.col("doc_id") / F.lit(PARA_ID_STRIDE)).cast("long").alias(
            "src_doc"
        ),
        F.col("text").alias("ptext"),
    )
    return (
        pt.groupBy("ptext")
        .agg(
            F.countDistinct("src_doc").alias("n_docs"),
            F.count(F.lit(1)).alias("n_paras"),
            F.min("para_id").alias("min_para_id"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            F.md5("ptext").alias("ptext_md5"),
            "n_docs",
            "n_paras",
            "min_para_id",
        )
    )


# --- doc_dup_fraction ---------------------------------------------------------


@query(
    "doc_dup_fraction",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    para AS (
        SELECT doc_id * {PARA_ID_STRIDE}
                 + CAST(s - 1 AS BIGINT) // {PARA_TOKENS} AS para_id,
               w[s:s + {PARA_TOKENS} - 1] AS pw
        FROM tok, unnest(range(1, len(w) + 1, {PARA_TOKENS})) AS t(s)
    ),
    sh AS MATERIALIZED (
        SELECT para_id,
               list_distinct(
                 CASE WHEN len(pw) >= 3
                      THEN list_transform(
                             range(1, len(pw) - 1),
                             i -> array_to_string(pw[i:i+2], ' '))
                      ELSE pw END) AS s
        FROM para
    ),
    pairs AS MATERIALIZED (
        SELECT a.para_id AS ka, b.para_id AS kb
        FROM sh a JOIN sh b ON a.para_id < b.para_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
              >= 0.8
          AND a.para_id // {PARA_ID_STRIDE} <> b.para_id // {PARA_ID_STRIDE}
    ),
    dup AS (
        SELECT ka AS pid FROM pairs UNION SELECT kb AS pid FROM pairs
    )
    SELECT p.para_id // {PARA_ID_STRIDE} AS doc_id,
           CAST(count(*) AS BIGINT) AS n_paras,
           CAST(count(d.pid) AS BIGINT) AS n_dup_paras,
           floor(CAST(count(d.pid) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS dup_fraction
    FROM para p LEFT JOIN dup d ON p.para_id = d.pid
    GROUP BY p.para_id // {PARA_ID_STRIDE}
    """,
)
def doc_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplication scorecard — the corpus-quality gate a
    dedup pipeline feeds: for every document, the fraction of its
    paragraphs that are >= 0.8-Jaccard duplicated in SOME OTHER
    document (cross-doc pairs only; intra-doc repetition is a different
    signal, text_quality's territory). Output (doc_id, n_paras,
    n_dup_paras, dup_fraction) for every document, dup_fraction
    half-up-rounded to 6 dp from one exact-int division. At sf0.01: 57
    of 500 docs carry cross-doc duplicated paragraphs (measured, no
    planting).

    Composition of two value-proven kernels: ``dedup_paragraph``'s pair
    relation (paragraph_relation -> shingle_sets -> prefix-filter exact
    Jaccard join, operators/setjoin.py) filtered to cross-doc pairs,
    unpivoted to the distinct duplicated-paragraph id set, then ONE
    left join back onto the paragraph relation and ONE hash aggregate
    to doc granularity. The oracle reuses dedup_paragraph's brute-force
    O(p^2) pair CTE (already the no-false-negatives proof of the prefix
    filter) plus the same per-doc aggregation.

    Scale: inherits jaccard_join's bounded-key shuffles (rare-shingle
    prefix blocks); the dup-id relation is the duplicated SUBSET of
    paragraphs (shuffle equi-join on para_id, no skew — para_ids are
    unique), and the final aggregate shuffles on doc_id. Nothing
    driver-side; every stage is a hash-partitioned join/agg."""
    from vector_search_playground_spark.operators.dedup import shingle_sets
    from vector_search_playground_spark.operators.setjoin import jaccard_join

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    para = paragraph_relation(docs).select(F.col("doc_id").alias("para_id"))
    pairs = jaccard_join(
        shingle_sets(paragraph_relation(docs)), threshold=0.8
    ).select("a_id", "b_id")
    cross = pairs.where(
        (F.col("a_id") / F.lit(PARA_ID_STRIDE)).cast("long")
        != (F.col("b_id") / F.lit(PARA_ID_STRIDE)).cast("long")
    )
    # explode, not union: a union of two selects DUPLICATES the whole
    # pairs subtree (prefix join + verify ran twice — half the observed
    # 12-25 s at sf0.1); explode emits both ids from ONE pass.
    dup = (
        cross.select(
            F.explode(F.array(F.col("a_id"), F.col("b_id"))).alias("pid")
        )
        .distinct()
    )
    return (
        para.join(dup, para.para_id == dup.pid, "left")
        .groupBy(
            (F.col("para_id") / F.lit(PARA_ID_STRIDE))
            .cast("long")
            .alias("doc_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.count("pid").alias("n_dup_paras"),
        )
        .select(
            "doc_id",
            "n_paras",
            "n_dup_paras",
            (
                F.floor(
                    F.col("n_dup_paras").cast("double")
                    / F.col("n_paras").cast("double")
                    * F.lit(1e6)
                    + F.lit(0.5)
                )
                / F.lit(1e6)
            ).alias("dup_fraction"),
        )
    )
