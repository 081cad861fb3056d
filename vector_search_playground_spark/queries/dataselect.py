"""Data-selection tier: the operators that decide WHICH documents a
training run should see — DSIR importance weights, duplicated-substring
detection, and semantic (embedding-cluster) dedup.

These complete the public training-data-curation canon next to the
corpus-construction tier (``queries/corpusprep.py``) and the dedup
family (``operators/dedup.py``): DSIR (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling"), substring-level dedup
(Lee et al. 2021, "Deduplicating Training Data Makes Language Models
Better" — the ExactSubstr variant's find-phase), and SemDeDup (Abbas et
al. 2023). The reference stores one static corpus
(`/root/reference/src/main.rs:85-96`); selecting what goes INTO such a
corpus is the north-star surface (BASELINE.json).

Scale discipline per query:
- ``dsir_weights`` — the classifier is a BUCKET TABLE, not a model: one
  conditional hash-agg produces |buckets| rows of n-gram statistics
  (target + raw counts together), broadcast back onto the token stream;
  the corpus shuffles once (doc_id hash-agg for the per-doc
  log-likelihood sum). No Python, no driver state.
- ``substr_dedup`` — strided char-grams hash to 8-byte ``xxhash64``
  keys BEFORE the document-frequency shuffle, so the wire carries ints,
  not 40-char strings; the df side that joins back is only the
  duplicated grams (df > 1), a tiny fraction of the gram space.
- ``semdedup`` — bucket assignment is a pure map of codegen'd dot
  products against literal hyperplanes (zero shuffle); the pairwise
  prune joins WITHIN buckets only, so the pair space is Σ|bucket|² —
  bounded by construction, never corpus². At 100 TB you raise the bit
  count (or swap in the IVF centroids from ``plans/ivf.py``) so bucket
  sizes stay constant; the query shape does not change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.plans.lsh import bucket_expr, hyperplanes
from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table

# --- dsir_weights -----------------------------------------------------------

DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


@query(
    "dsir_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
        FROM documents
    ),
    b AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(w), 1, 4) AS BIGINT)
                 % {DSIR_BUCKETS} AS bkt
        FROM tok
    ),
    raw AS (SELECT bkt, count(*) AS cr FROM b GROUP BY bkt),
    tgt AS (SELECT bkt, count(*) AS ct FROM b
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY bkt),
    tot AS (SELECT (SELECT sum(cr) FROM raw) AS nr,
                   (SELECT coalesce(sum(ct), 0) FROM tgt) AS nt),
    stat AS (
        SELECT r.bkt,
               ln((coalesce(t.ct, 0) + 1.0) / (tot.nt + {DSIR_BUCKETS}))
             - ln((r.cr + 1.0) / (tot.nr + {DSIR_BUCKETS})) AS llr
        FROM raw r LEFT JOIN tgt t USING (bkt) CROSS JOIN tot
    )
    SELECT doc_id, ROUND(sum(llr), 6) AS dsir_w
    FROM b JOIN stat USING (bkt) GROUP BY doc_id
    """,
)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per-doc log-likelihood ratio of a
    hashed-unigram bag-of-words model of the TARGET distribution
    (here: the ``lang = 'en'`` slice) vs the RAW corpus, with add-one
    smoothing over a fixed bucket space (Xie et al. 2023 §3).

    Docs scoring high look like the target; resampling by these weights
    is the paper's selection rule. Verified directional on the fixture:
    en docs average the highest weight of the five languages.

    The hashed feature space is what makes this a Spark-native op: both
    "models" are |buckets|-row aggregate tables (two hash-aggs whose
    map-side partials are bucket-sized), broadcast back onto the token
    stream — the corpus itself shuffles exactly once, for the per-doc
    sum. The bucket hash (first 16 bits of md5) is engine-portable, so
    the DuckDB oracle replays the identical featurization.
    """
    from vector_search_playground_spark.sources import fan_out

    tok = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    ).select(  # explode_outer: split() is never empty; avoids the
        # Generate filter re-running split at the scan (operators/dedup.py)
        "doc_id", "lang", F.explode_outer(F.split("text", " ")).alias("w")
    ).where(F.col("w").isNotNull())  # null-doc guard (unnest semantics)
    b = tok.select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("w"), 1, 4), 16, 10).cast("long")
         % DSIR_BUCKETS).alias("bkt"),
    )
    # ONE conditional aggregate produces both models; the corpus totals
    # are global-window sums over the |buckets|-row stats frame — a
    # single-partition window is fine at metadata scale (1024 rows) and
    # avoids re-deriving (and re-scanning for) the stats subtree, which
    # a totals-crossJoin would recompute. Net: 2 corpus scans (stats +
    # probe), not 4.
    stats = b.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cr"),
        F.count(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.lit(1))
        ).alias("ct"),
    )
    wall = Window.partitionBy()
    stat = stats.select(
        "bkt",
        (
            F.log((F.col("ct") + 1.0)
                  / (F.sum("ct").over(wall) + DSIR_BUCKETS))
            - F.log((F.col("cr") + 1.0)
                    / (F.sum("cr").over(wall) + DSIR_BUCKETS))
        ).alias("llr"),
    )
    return (
        b.join(F.broadcast(stat), "bkt")
        .groupBy("doc_id")
        .agg(F.round(F.sum("llr"), 6).alias("dsir_w"))
    )


# --- substr_dedup -----------------------------------------------------------

SUBSTR_WINDOW = 40
SUBSTR_MODP = 8


@query(
    "substr_dedup",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(
                 list_transform(
                   range(1, len(text) - {SUBSTR_WINDOW} + 2),
                   i -> substr(text, CAST(i AS BIGINT), {SUBSTR_WINDOW})),
                 s -> CAST('0x' || substr(md5(s), 1, 4) AS BIGINT)
                        % {SUBSTR_MODP} = 0))) AS gram
        FROM documents WHERE len(text) >= {SUBSTR_WINDOW}
    ),
    df AS (SELECT gram, count(*) AS c FROM g GROUP BY gram)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans
    FROM g JOIN df USING (gram) WHERE c > 1
    GROUP BY doc_id
    """,
)
def substr_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-substring detection (Lee et al. 2021's ExactSubstr
    find-phase): every doc contributes a content-defined sample of its
    40-char windows; a sampled window seen in ≥2 docs is a duplicated
    span, and the output is each affected doc with its dup-span count —
    the removal/trimming decision is downstream policy.

    Window selection is the mod-p fingerprinting scheme that underlies
    winnowing/MOSS (Schleimer et al. 2003): generate ALL W-char windows,
    keep those whose content hash ≡ 0 (mod p). Because selection depends
    only on window CONTENT, a span duplicated at arbitrary, differently
    aligned offsets selects the exact same fingerprints in both docs —
    offset-invariant by construction, where a strided grid misses any
    copy whose offsets differ mod the stride. A duplicated span of
    length L escapes sampling with probability ≈ (1−1/p)^(L−W+1); at
    the defaults a 100-char copy is caught with p ≈ 0.9997.

    Scale shape: window generation + selection is one map-side
    ``transform``+``filter`` (keeps 1/p of windows); survivors are
    immediately reduced to ``xxhash64`` — the document-frequency
    shuffle and the join back both carry 8-byte ints, never the 40-char
    strings (at 100 TB that is a 5× wire saving; a 64-bit collision
    changes a count with p ≈ n²/2⁶⁵). The df>1 side is duplicated grams
    only, so the join back onto the gram stream broadcasts in the
    common case where duplication is rare.
    """
    from vector_search_playground_spark.sources import fan_out

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ).where(F.length("text") >= SUBSTR_WINDOW)
    grams = F.array_distinct(
        F.filter(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.length("text") - F.lit(SUBSTR_WINDOW - 1),
                ),
                lambda i: F.substring(
                    F.col("text"), i, F.lit(SUBSTR_WINDOW)
                ),
            ),
            lambda s: F.conv(F.substring(F.md5(s), 1, 4), 16, 10)
            .cast("long") % SUBSTR_MODP == 0,
        )
    )
    # explode_outer + explicit null drop: grams CAN be empty (the md5
    # stride filter may reject every window of a doc); plain explode's
    # injected non-empty filter would re-evaluate the whole gram pipeline
    # (substring transform + md5 per window) below the exchange. The
    # post-generate isNotNull runs on the exploded column — free.
    g = (
        docs.select("doc_id", F.explode_outer(grams).alias("gram"))
        .where(F.col("gram").isNotNull())
        .select("doc_id", F.xxhash64("gram").alias("gh"))
    )
    dupes = (
        g.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .select("gh")
    )
    return (
        g.join(dupes, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup_spans"))
    )


# --- semdedup ---------------------------------------------------------------

SEM_BITS = 6          # bit-count floor (fixture scale)
SEM_MAX_BITS = 24     # hyperplane pool; 2^24 buckets serves ~134M rows
SEM_TARGET_BUCKET = 8  # expected vectors per bucket the bit count holds
SEM_DIM = 64
SEM_TAU = 0.6
_SEM_PLANES = hyperplanes(SEM_DIM, SEM_MAX_BITS, seed=42)


# corpus-size lookups memoized per (fixture dir, content fingerprint):
# the count is one cheap footer-statistics job, but the query constructor
# runs per bench rep / certification pass. Keying on the directory path
# ALONE was an ADVICE-r8 bug: a fixture regenerated in-session (the
# scale-stress scratch dirs do this) would leave the Spark side on a
# stale sem_bits while the DuckDB oracle recounts live — the fingerprint
# (file size + mtime_ns, same discipline as llm_pipeline's index caches)
# self-invalidates on any rewrite.
_SEM_N_CACHE: dict[tuple[str, str], int] = {}


def _corpus_rows(spark: SparkSession, sf_dir: str) -> int:
    from vector_search_playground_spark.queries.llm_pipeline import (
        _fixture_fingerprint,
    )

    key = (sf_dir, _fixture_fingerprint(sf_dir, "embeddings"))
    n = _SEM_N_CACHE.get(key)
    if n is None:
        n = load_table(spark, sf_dir, "embeddings").count()
        _SEM_N_CACHE[key] = n
    return n


def sem_bits(n: int) -> int:
    """Bucket bits for an n-row corpus: the smallest b in
    [SEM_BITS, SEM_MAX_BITS] with 2^b * SEM_TARGET_BUCKET >= n — i.e.
    expected bucket size stays <= SEM_TARGET_BUCKET as the corpus
    grows, which is what keeps the within-bucket pair space LINEAR in n
    (Σ|bucket|² ≈ n·target). Pure integer arithmetic so the SQL oracle
    computes the identical value with no float-log knife edge."""
    for b in range(SEM_BITS, SEM_MAX_BITS + 1):
        if (1 << b) * SEM_TARGET_BUCKET >= n:
            return b
    return SEM_MAX_BITS


def _planes_sql() -> str:
    return ", ".join(
        "({}, [{}])".format(j, ", ".join(repr(float(v)) for v in row))
        for j, row in enumerate(_SEM_PLANES)
    )


@query(
    "semdedup",
    oracle=f"""
    WITH hp AS (SELECT * FROM (VALUES {_planes_sql()}) t(j, h)),
    nb AS (
        -- COALESCE mirrors sem_bits()'s saturation: past 2^24·8 rows
        -- the filtered range is empty and MIN returns NULL, which would
        -- silently disable every plane (and all dedup) without it
        SELECT COALESCE(MIN(b), {SEM_MAX_BITS}) AS bits
        FROM range({SEM_BITS}, {SEM_MAX_BITS + 1}) t(b)
        WHERE (CAST(1 AS BIGINT) << b) * {SEM_TARGET_BUCKET}
              >= (SELECT count(*) FROM embeddings)
    ),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
    bk AS (
        SELECT e.vec_id,
               CAST(sum(CASE WHEN list_dot_product(e.emb, hp.h) >= 0
                             THEN CAST(pow(2, hp.j) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS bucket
        FROM e CROSS JOIN hp CROSS JOIN nb
        WHERE hp.j < nb.bits
        GROUP BY e.vec_id
    ),
    rm AS (
        SELECT DISTINCT a.vec_id
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id > b.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE ROUND(1 - list_dot_product(ea.emb, eb.emb), 6) < {SEM_TAU}
    )
    SELECT bk.vec_id, bk.bucket, (rm.vec_id IS NULL) AS kept
    FROM bk LEFT JOIN rm USING (vec_id)
    """,
)
def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster the embedding space, then
    within each cluster drop every vector that has a semantically-close
    (cosine distance < τ) neighbor with a smaller id — the greedy
    keep-one-representative rule. Output is the full corpus with its
    cluster id and the keep/prune verdict.

    Clusters here are seeded random-hyperplane sign buckets (the same
    Charikar construction as ``plans/lsh.py``, reused directly) instead
    of the paper's k-means — deterministic, literal-expressible, so the
    DuckDB oracle replays the identical partition and the whole
    pipeline is hash-verified, clustering included. ``plans/ivf.py``'s
    KMeans centroids are the drop-in alternative when approximate
    clusters are acceptable.

    Scale shape: bucket assignment is a shuffle-free map of codegen'd
    dot products against literal hyperplanes; the prune self-join is
    keyed on bucket, so the candidate-pair space is Σ|bucket|². The bit
    count now TURNS ITSELF with corpus size (``sem_bits``: smallest b
    with 2^b·target ≥ n, integer-exact on both engines from one count
    job — footer statistics only, memoized per fixture dir so repeated
    constructions don't re-pay it) so expected bucket size — and with
    it the pair space per row — stays constant as n grows. Round 8's second-decade
    stress run measured the fixed-6-bit variant at 67× wall for 10×
    data (quadratic, exactly the drift the added decade exists to
    catch); with adaptive bits the same blow-up is linear. The
    threshold compares the ROUNDED distance so the boundary is
    engine-stable.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bits = sem_bits(_corpus_rows(spark, sf_dir))
    bk = e.select(
        "vec_id",
        "embedding",
        bucket_expr(F.col("embedding"), _SEM_PLANES[:bits]).alias("bucket"),
    )
    a, b = bk.alias("a"), bk.alias("b")
    # Fixture embeddings are L2-normalized (FIXTURES.md) ⇒ dist = 1 − dot,
    # mirroring the oracle's `1 - list_dot_product` exactly.
    from vector_search_playground_spark.functions.vector import dot_product

    rm = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") > F.col("b.vec_id")),
        )
        .where(
            F.round(
                F.lit(1.0)
                - dot_product(F.col("a.embedding"), F.col("b.embedding")),
                6,
            )
            < SEM_TAU
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("rm", F.lit(True))
    )
    # rm is |pruned| rows — broadcast it so the corpus side takes the
    # kept-flag join without an exchange (SMJ here would shuffle the
    # whole relation against a near-empty set).
    return (
        bk.select("vec_id", "bucket")
        .join(F.broadcast(rm), "vec_id", "left")
        .select("vec_id", "bucket", F.col("rm").isNull().alias("kept"))
    )
