"""Hybrid retrieval tier: lexical ⊕ vector rank fusion, retrieval-quality
evaluation, and per-group KNN.

The reference is a pure-vector playground (`/root/reference/src/main.rs:85-96`
— one cosine top-k verb). Real deployments of the same stack (pgvector +
Postgres full-text) almost always run HYBRID retrieval: a lexical ranking
(``tsvector``/BM25) and a vector ranking fused with reciprocal-rank fusion.
This module adds that surface plus the measurement loop a user needs before
trusting an approximate/quantized index:

- ``hybrid_search_rrf`` — BM25 list ⊕ exact-cosine list, RRF(k0=60).
- ``eval_retrieval``    — recall@k / MRR of the int8-quantized ranking vs
  the exact ranking, as a hash-certified 1-row scorecard.
- ``knn_per_group``     — top-k neighbours within every label partition.

Scale discipline:
- Both RRF input lists are bounded (top ``LIST_K``), produced by
  ``TakeOrderedAndProject`` over a shuffle-free broadcast-query scan, so the
  fusion join is a ≤2·LIST_K-row driver-negligible relation no matter the
  corpus size.
- ``eval_retrieval`` reduces two bounded top-k lists to one row — the 100 TB
  cost is two corpus scans (exact + quantized), both single-pass.
- ``knn_per_group`` is one shuffle on ``label`` + a per-group sort; with
  bounded k the window emits ≤ k·|labels| rows.

Hash-stability: every score is rounded (ROUND_DIST) BEFORE ranking so Spark
and DuckDB rank identical values identically; all ranks tiebreak on id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import ROUND_DIST, query
from vector_search_playground_spark.sources import load_table
from vector_search_playground_spark.queries.trainprep import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
)
from vector_search_playground_spark.queries.vector_search import (
    _DDIST,
    _Q0,
    _QE,
    _with_query_vec,
)

LIST_K = 20  # depth of each input ranking fed to the fusion
RRF_K0 = 60  # standard RRF constant (Cormack et al. 2009)
K = 10  # emitted result depth / eval cutoff

# DuckDB CTE fragments ------------------------------------------------------

# BM25 per-doc scores for the standing term set — same math as the
# registered `bm25_score` oracle (queries/trainprep.py), kept in one place
# here so the fusion oracle stays readable.
_BM25_CTES = f"""
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n, avg(dl) AS avgdl FROM dl
    ),
    tf AS (
        SELECT doc_id, w, CAST(count(*) AS DOUBLE) AS tf
        FROM tok WHERE w IN {BM25_TERMS!r} GROUP BY doc_id, w
    ),
    dfs AS (
        SELECT w, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY w
    ),
    bm AS (
        SELECT tf.doc_id,
               ROUND(SUM(ln(1 + (n - df + 0.5) / (df + 0.5))
                         * tf * ({BM25_K1} + 1)
                         / (tf + {BM25_K1}
                            * (1 - {BM25_B} + {BM25_B} * dl / avgdl))),
                     {ROUND_DIST}) AS bm25
        FROM tf
        JOIN dl USING (doc_id)
        JOIN dfs USING (w)
        CROSS JOIN stats
        GROUP BY tf.doc_id
    )
"""


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for the standing BM25_TERMS query — the Spark twin of
    ``_BM25_CTES`` (same plan discipline as queries/trainprep.py:bm25_score:
    one explode→hash-agg shuffle; df/stats sides broadcast)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    dl = docs.select("doc_id", F.size(toks).cast("double").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select("doc_id", F.explode_outer(toks).alias("w"))
        .where(F.col("w").isin(*BM25_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfs = tf.groupBy("w").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tfn = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dfs), "w")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(idf * tfn), ROUND_DIST).alias("bm25"))
    )


@query(
    "hybrid_search_rrf",
    oracle=f"""
    WITH {_BM25_CTES},
    bmr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r_lex
        FROM bm
        ORDER BY r_lex LIMIT {LIST_K}
    ),
    vd AS (
        SELECT e.vec_id AS doc_id, {_DDIST} AS dist
        FROM embeddings e, {_Q0}
    ),
    vr AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY dist ASC, doc_id ASC) AS r_vec
        FROM vd
        ORDER BY r_vec LIMIT {LIST_K}
    )
    SELECT COALESCE(bmr.doc_id, vr.doc_id) AS doc_id,
           CAST(COALESCE(bmr.r_lex, 0) AS INT) AS r_lex,
           CAST(COALESCE(vr.r_vec, 0) AS INT) AS r_vec,
           ROUND(COALESCE(1.0 / ({RRF_K0} + bmr.r_lex), 0)
                 + COALESCE(1.0 / ({RRF_K0} + vr.r_vec), 0),
                 {ROUND_DIST}) AS rrf
    FROM bmr FULL OUTER JOIN vr ON bmr.doc_id = vr.doc_id
    ORDER BY rrf DESC, doc_id ASC
    LIMIT {K}
    """,
)
def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion: the top-LIST_K BM25
    list and the top-LIST_K exact-cosine list are fused with
    RRF(d) = Σ 1/(k0 + rank_list(d)) over the lists containing d.

    Plan shape: each list collapses to ≤LIST_K rows via
    TakeOrderedAndProject before the fusion join, so the full-outer join
    is between two bounded relations — at 100 TB the only corpus-sized
    work is the two scans that build the rankings, and neither shuffles
    the corpus (BM25 shuffles the tf relation keyed on (doc_id, term);
    the vector side is a broadcast-query scan)."""
    # TakeOrderedAndProject bounds the list BEFORE any window: the global
    # row_number then ranks LIST_K rows, not the corpus-sized relation (a
    # full-relation unpartitioned window is a single-partition sort at
    # scale).
    bmr = (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(LIST_K)
        .withColumn(
            "r_lex",
            F.row_number().over(
                Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_lex")
    )
    vr = (
        _with_query_vec(spark, sf_dir)
        .select(F.col("vec_id").alias("doc_id"), "dist")
        .orderBy(F.asc("dist"), F.asc("doc_id"))
        .limit(LIST_K)
        .withColumn(
            "r_vec",
            F.row_number().over(
                Window.orderBy(F.asc("dist"), F.asc("doc_id"))
            ),
        )
        .select("doc_id", "r_vec")
    )
    fused = bmr.join(vr, "doc_id", "full_outer")
    rrf = F.round(
        F.coalesce(1.0 / (RRF_K0 + F.col("r_lex")), F.lit(0.0))
        + F.coalesce(1.0 / (RRF_K0 + F.col("r_vec")), F.lit(0.0)),
        ROUND_DIST,
    )
    return (
        fused.select(
            "doc_id",
            F.coalesce("r_lex", F.lit(0)).cast("int").alias("r_lex"),
            F.coalesce("r_vec", F.lit(0)).cast("int").alias("r_vec"),
            rrf.alias("rrf"),
        )
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
        .limit(K)
    )


@query(
    "eval_retrieval",
    oracle=f"""
    WITH vd AS (
        SELECT e.vec_id, {_DDIST} AS dist
        FROM embeddings e, {_Q0}
        WHERE e.vec_id <> 0
    ),
    exact AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY dist ASC, vec_id ASC) AS r
        FROM vd ORDER BY r LIMIT {K}
    ),
    qz AS (
        SELECT vec_id, {_QE.format(col='embedding')} AS qv FROM embeddings
    ),
    q0 AS (SELECT qv AS q0v FROM qz WHERE vec_id = 0),
    qd AS (
        SELECT vec_id,
               ROUND(1 - list_inner_product(CAST(qv AS DOUBLE[]),
                                            CAST(q0v AS DOUBLE[]))
                     / GREATEST(sqrt(list_inner_product(CAST(qv AS DOUBLE[]),
                                                        CAST(qv AS DOUBLE[])))
                              * sqrt(list_inner_product(CAST(q0v AS DOUBLE[]),
                                                        CAST(q0v AS DOUBLE[]))),
                                1e-30),
                     {ROUND_DIST}) AS dist_q
        FROM qz, q0 WHERE vec_id <> 0
    ),
    approx AS (
        SELECT vec_id,
               row_number() OVER (ORDER BY dist_q ASC, vec_id ASC) AS r_q
        FROM qd ORDER BY r_q LIMIT {K}
    )
    SELECT CAST({K} AS INT) AS k,
           CAST(count(approx.vec_id) AS BIGINT) AS n_hits,
           ROUND(count(approx.vec_id) / CAST({K} AS DOUBLE),
                 {ROUND_DIST}) AS recall_at_k,
           ROUND(COALESCE(max(CASE WHEN exact.r = 1
                                   THEN 1.0 / approx.r_q END), 0),
                 {ROUND_DIST}) AS mrr
    FROM exact LEFT JOIN approx USING (vec_id)
    """,
)
def eval_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality scorecard for the int8-quantized index vs exact
    cosine: recall@k (fraction of the exact top-k the quantized top-k
    keeps) and MRR of the true nearest neighbour inside the quantized
    ranking. The query vector itself (vec_id=0) is excluded from both
    rankings — self-match recall is vacuous.

    This is the measurement loop `quantize_embed` needs before a user
    trusts 4×-cheaper IO at 100 TB: both rankings are bounded top-k
    (TakeOrderedAndProject over single-pass scans), the comparison join
    is k×k, and the output is one row."""
    exact = (
        _with_query_vec(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select("vec_id", "dist")
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(K)
        .withColumn(
            "r",
            F.row_number().over(
                Window.orderBy(F.asc("dist"), F.asc("vec_id"))
            ),
        )
        .select("vec_id", "r")
    )

    # Int8 symmetric quantization — same kernel discipline as
    # quantize_embed (queries/vector_search.py): integer dots exact in
    # f64, query shipped as a constant-folded literal.
    embs = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))), F.lit(1e-30)
    )
    qv = F.transform(
        emb, lambda x: F.round(x * F.lit(127.0) / scale).cast("long")
    )
    qz = embs.select("vec_id", qv.alias("qv"))
    q0_row = qz.where(F.col("vec_id") == 0).first()["qv"]
    q0_lit = F.array(*[F.lit(int(x)) for x in q0_row])
    q0_norm = float(sum(x * x for x in q0_row)) ** 0.5

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dot = idot(F.col("qv"), q0_lit)
    norm = F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double")) * F.lit(
        q0_norm
    )
    approx = (
        qz.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                F.lit(1.0) - dot.cast("double") / F.greatest(norm, F.lit(1e-30)),
                ROUND_DIST,
            ).alias("dist_q"),
        )
        .orderBy(F.asc("dist_q"), F.asc("vec_id"))
        .limit(K)
        .withColumn(
            "r_q",
            F.row_number().over(
                Window.orderBy(F.asc("dist_q"), F.asc("vec_id"))
            ),
        )
        .select("vec_id", "r_q")
    )

    joined = exact.join(approx, "vec_id", "left")
    return joined.agg(
        F.lit(K).cast("int").alias("k"),
        F.count("r_q").alias("n_hits"),
        F.round(F.count("r_q") / F.lit(float(K)), ROUND_DIST).alias(
            "recall_at_k"
        ),
        F.round(
            F.coalesce(
                F.max(F.when(F.col("r") == 1, 1.0 / F.col("r_q"))), F.lit(0.0)
            ),
            ROUND_DIST,
        ).alias("mrr"),
    )


GROUP_K = 3  # neighbours kept per label


@query(
    "knn_per_group",
    oracle=f"""
    WITH vd AS (
        SELECT e.label, e.vec_id, {_DDIST} AS dist
        FROM embeddings e, {_Q0}
        WHERE e.vec_id <> 0
    )
    SELECT label, vec_id, dist, CAST(rnk AS INT) AS rnk FROM (
        SELECT label, vec_id, dist,
               row_number() OVER (PARTITION BY label
                                  ORDER BY dist ASC, vec_id ASC) AS rnk
        FROM vd
    ) WHERE rnk <= {GROUP_K}
    ORDER BY label, rnk
    """,
)
def knn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-GROUP_K nearest neighbours of the standing query WITHIN each
    label partition — 'best match per category', the faceted-search twin
    of `topk_per_group`.

    One shuffle keyed on ``label``, then a bounded per-group sort; the
    distance kernel runs before the exchange so the shuffle carries
    (label, vec_id, dist) triples, never vectors. At 100 TB the output
    is ≤ k·|labels| rows."""
    w = Window.partitionBy("label").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        _with_query_vec(spark, sf_dir)
        .where(F.col("vec_id") != 0)
        .select("label", "vec_id", "dist")
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= GROUP_K)
        .select("label", "vec_id", "dist", F.col("rnk").cast("int"))
        .orderBy("label", "rnk")
    )


# --- quantize_binary --------------------------------------------------------

HAMMING_SHORTLIST = 30  # candidates the Hamming prefilter keeps for rerank

# Bit-pack the sign vector into two 32-bit words (kept in BIGINTs) — the
# portable form: neither engine's signed << can overflow at shift ≤ 31.
_BQ_DUCK = """
        SELECT vec_id,
               sum(CASE WHEN v > 0 AND i <= 32
                        THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS lo,
               sum(CASE WHEN v > 0 AND i > 32
                        THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS hi
        FROM (SELECT vec_id, unnest(embedding) AS v,
                     generate_subscripts(embedding, 1) AS i
              FROM embeddings)
        GROUP BY vec_id
"""


def _pack_bits(emb):
    """(lo, hi) sign-bit words of a 64-dim array column — JVM HOF only."""

    def word(offset):
        # 2^i (i ≤ 31) is exact in double, so pow stands in for a
        # variable-amount shiftleft (whose shift arg must be a literal).
        return F.aggregate(
            F.transform(
                F.slice(emb, offset + 1, 32),
                lambda x, i: F.when(
                    x > 0, F.pow(F.lit(2.0), i).cast("long")
                ).otherwise(F.lit(0).cast("long")),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return word(0), word(32)


@query(
    "quantize_binary",
    oracle=f"""
    WITH codes AS ({_BQ_DUCK}),
    q0 AS (SELECT lo AS qlo, hi AS qhi FROM codes WHERE vec_id = 0),
    ham AS (
        SELECT vec_id,
               CAST(bit_count(xor(lo, qlo)) + bit_count(xor(hi, qhi))
                    AS INT) AS hamming
        FROM codes, q0 WHERE vec_id <> 0
    ),
    shortlist AS (
        SELECT vec_id, hamming FROM ham
        ORDER BY hamming ASC, vec_id ASC LIMIT {HAMMING_SHORTLIST}
    )
    SELECT s.vec_id, s.hamming, {_DDIST} AS dist
    FROM shortlist s
    JOIN embeddings e ON e.vec_id = s.vec_id, {_Q0}
    ORDER BY dist ASC, s.vec_id ASC
    LIMIT {K}
    """,
)
def quantize_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (1-bit sign) quantization + Hamming-distance shortlist +
    exact-cosine rerank — pgvector's ``bit(n)``/hamming path, the 32×
    compression extreme of the quantization family (int8 is
    ``quantize_embed``). The corpus scan reads two BIGINT code words
    instead of 64 floats; XOR+popcount is a handful of ALU ops per row;
    only the HAMMING_SHORTLIST survivors touch full vectors again.

    Plan: code packing is a constant-folded HOF projection (no shuffle),
    the shortlist is TakeOrderedAndProject, and the rerank joins
    ≤HAMMING_SHORTLIST rows back to the vector table — at 100 TB the
    rerank side is constant-size while the scan side reads 32× less."""
    embs = load_table(spark, sf_dir, "embeddings")
    lo, hi = _pack_bits(F.col("embedding").cast("array<double>"))
    codes = embs.select("vec_id", lo.alias("lo"), hi.alias("hi"))
    q0 = codes.where(F.col("vec_id") == 0).select(
        F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    ham = (
        codes.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            (
                F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    shortlist = ham.orderBy(F.asc("hamming"), F.asc("vec_id")).limit(
        HAMMING_SHORTLIST
    )
    rerank = shortlist.join(
        _with_query_vec(spark, sf_dir).select("vec_id", "dist"), "vec_id"
    )
    return (
        rerank.select("vec_id", "hamming", "dist")
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(K)
    )


# --- maxsim_multivector -----------------------------------------------------

MAXSIM_Q = 5  # query-token count (first MAXSIM_Q vectors of label 0)


@query(
    "maxsim_multivector",
    oracle=f"""
    WITH q AS (
        SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
        FROM embeddings WHERE label = 0
        ORDER BY vec_id LIMIT {MAXSIM_Q}
    ),
    best AS (
        SELECT e.label, q.qid,
               max(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                                q.qv),
                         {ROUND_DIST})) AS m
        FROM embeddings e CROSS JOIN q
        GROUP BY e.label, q.qid
    )
    SELECT label, ROUND(sum(m), {ROUND_DIST}) AS maxsim
    FROM best GROUP BY label ORDER BY maxsim DESC, label ASC
    """,
)
def maxsim_multivector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late interaction: each label group is a multi-vector
    'document' (its member embeddings are the token vectors), the query
    is the first MAXSIM_Q vectors of label 0, and
    score(doc) = Σ_q max_t cos(q, t). This is the retrieval model
    single-vector KNN cannot express — a document matches if EVERY query
    token finds some similar region in it.

    Plan: the bounded query set broadcasts; similarities are JVM HOF
    kernels on the corpus scan; then two hash-aggs (max per (doc, token),
    sum per doc) whose shuffle carries (label, qid, sim) triples — never
    vectors. At 100 TB the cost is |corpus|·|Q| fused scan work plus a
    metadata-sized aggregation tree. Per-token sims round before the max
    so both engines pick identical argmaxes."""
    from vector_search_playground_spark.functions import vector as V

    embs = load_table(spark, sf_dir, "embeddings")
    q = (
        embs.where(F.col("label") == 0)
        .orderBy("vec_id")
        .limit(MAXSIM_Q)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qv"),
        )
    )
    sims = embs.crossJoin(F.broadcast(q)).select(
        "label",
        "qid",
        F.round(
            F.lit(1.0) - V.cosine_distance(F.col("embedding"), F.col("qv")),
            ROUND_DIST,
        ).alias("sim"),
    )
    best = sims.groupBy("label", "qid").agg(F.max("sim").alias("m"))
    return (
        best.groupBy("label")
        .agg(F.round(F.sum("m"), ROUND_DIST).alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc("label"))
    )


# --- pq_search --------------------------------------------------------------

PQ_SHORTLIST = 50  # ADC candidates kept for the exact rerank


@query("pq_search")  # rows-only: PQ is approximate; recall rides in-row
def pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized search (plans/pq.py): 8×16 codebooks fit on a
    bounded sample, vectors stored as 8 nibble codes (64× smaller than
    f32), queries answered by an asymmetric-distance scan — the query's
    8×16 lookup table ships as a constant-folded literal and the per-row
    sum is a zip_with/aggregate HOF, so the 100 TB scan reads 4-byte
    codes and never touches Python. The ADC top-PQ_SHORTLIST rerank
    against true vectors (bounded join) yields the emitted top-10, and
    ``recall_at_k`` vs the exact cosine KNN rides in-row so the driver's
    rows-only check pins quality, not just shape (the ivf/lsh
    discipline)."""
    from vector_search_playground_spark.plans.pq import (
        adc_distance,
        adc_table,
        encode,
        load_or_fit_codebooks,
    )
    from vector_search_playground_spark.queries.llm_pipeline import (
        _recall_at_k,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books, _mse, _cached = load_or_fit_codebooks(emb, sf_dir)
    qvec = [
        float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    codes = encode(emb.where(F.col("vec_id") != 0), books)
    lut = adc_table(books, qvec)
    shortlist = (
        codes.select(
            "vec_id", adc_distance(F.col("codes"), lut).alias("dist_adc")
        )
        .orderBy(F.asc("dist_adc"), F.asc("vec_id"))
        .limit(PQ_SHORTLIST)
    )
    rerank = shortlist.join(
        _with_query_vec(spark, sf_dir).select("vec_id", "dist"), "vec_id"
    )
    found = (
        rerank.select(
            "vec_id",
            F.round("dist_adc", ROUND_DIST).alias("dist_adc"),
            "dist",
        )
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(K)
    )
    recall = _recall_at_k(
        found, emb.where(F.col("vec_id") != 0), qvec, K
    )
    return found.withColumn("recall_at_k", F.lit(round(recall, 2)))


# --- topk_diverse (MMR) -----------------------------------------------------

MMR_LAMBDA = 0.5
MMR_CANDIDATES = 50

# int8 symmetric quantization, verbatim the certified quantize_embed pair
# (queries/vector_search.py _QE): per-vector scale max|x|/127, round()
# half-away-from-zero on both engines.
_MMR_QE = (
    "list_transform(CAST({col} AS DOUBLE[]), "
    "x -> CAST(round(x * 127.0 / GREATEST("
    "list_max(list_transform(CAST({col} AS DOUBLE[]), y -> abs(y))), "
    "1e-30)) AS BIGINT))"
)

# cosine over the int8 codes: the dots are EXACT int64 (|sum| <= 127^2*dim
# << 2^53), so sqrt/divide are single correctly-rounded IEEE ops on
# identical operands — bit-equal across engines, no reduction-order hazard.
_MMR_QCOS = (
    "list_inner_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / GREATEST("
    "sqrt(list_inner_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_inner_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))),"
    " 1e-30)"
)


def _mmr_oracle() -> str:
    """Unrolled K-step greedy MMR as DuckDB CTEs (the pagerank_topn
    discipline: a sequential recurrence becomes one CTE per step with
    identical IEEE op order on both engines). MATERIALIZED is load-
    bearing: DuckDB inlines plain CTEs per reference, and the s1→sK
    chain would re-expand cand/sims exponentially without it."""
    lam, inv = MMR_LAMBDA, 1 - MMR_LAMBDA
    parts = [
        "WITH qz AS MATERIALIZED (",
        f"    SELECT vec_id, {_MMR_QE.format(col='embedding')} AS qv"
        " FROM embeddings",
        "),",
        "q0 AS MATERIALIZED (SELECT qv AS q0v FROM qz WHERE vec_id = 0),",
        "cand AS MATERIALIZED (",
        "    SELECT vec_id, qv,",
        f"           ROUND(1 - {_MMR_QCOS.format(a='qv', b='q0v')},"
        f" {ROUND_DIST}) AS dist_q",
        "    FROM qz, q0 WHERE vec_id <> 0",
        f"    ORDER BY dist_q ASC, vec_id ASC LIMIT {MMR_CANDIDATES}",
        "),",
        "rel AS MATERIALIZED"
        " (SELECT vec_id, 1 - dist_q AS rel FROM cand),",
        "sims AS MATERIALIZED (",
        "    SELECT a.vec_id AS va, b.vec_id AS vb,",
        f"           {_MMR_QCOS.format(a='a.qv', b='b.qv')} AS sim",
        "    FROM cand a JOIN cand b ON a.vec_id <> b.vec_id",
        "),",
        "p1 AS MATERIALIZED (SELECT vec_id, rel,"
        " CAST(1 AS INT) AS rank FROM rel",
        f"       ORDER BY floor({lam} * rel * 1e9 + 0.5) DESC, vec_id"
        " LIMIT 1),",
        "s1 AS MATERIALIZED (SELECT vec_id FROM p1),",
    ]
    for i in range(2, K + 1):
        p = i - 1
        parts += [
            f"p{i} AS MATERIALIZED (SELECT r.vec_id, r.rel,"
            f" CAST({i} AS INT) AS rank",
            f"       FROM rel r JOIN sims s ON s.va = r.vec_id"
            f" AND s.vb IN (SELECT vec_id FROM s{p})",
            f"       WHERE r.vec_id NOT IN (SELECT vec_id FROM s{p})",
            "       GROUP BY r.vec_id, r.rel",
            f"       ORDER BY floor(({lam} * r.rel - {inv} * max(s.sim))"
            " * 1e9 + 0.5) DESC, r.vec_id LIMIT 1),",
            f"s{i} AS MATERIALIZED (SELECT vec_id FROM s{p}"
            f" UNION ALL SELECT vec_id FROM p{i}),",
        ]
    sel_union = " UNION ALL ".join(
        f"SELECT * FROM p{i}" for i in range(1, K + 1)
    )
    parts += [
        f"sel AS MATERIALIZED ({sel_union}),",
        "mmr_pairs AS MATERIALIZED"
        " (SELECT floor(s.sim * 1e6 + 0.5) AS sim_micro",
        f"              FROM sims s WHERE s.va IN (SELECT vec_id FROM s{K})",
        f"               AND s.vb IN (SELECT vec_id FROM s{K})"
        " AND s.va < s.vb),",
        "plain AS MATERIALIZED"
        " (SELECT vec_id FROM cand ORDER BY dist_q, vec_id"
        f" LIMIT {K}),",
        "plain_pairs AS MATERIALIZED"
        " (SELECT floor(s.sim * 1e6 + 0.5) AS sim_micro",
        "              FROM sims s WHERE s.va IN (SELECT vec_id FROM plain)",
        "               AND s.vb IN (SELECT vec_id FROM plain)"
        " AND s.va < s.vb)",
        "SELECT sel.rank, sel.vec_id, sel.rel AS relevance,",
        "       (SELECT CAST(floor(CAST(sum(sim_micro) AS DOUBLE)"
        " / count(*) + 0.5) AS BIGINT) FROM mmr_pairs)"
        " AS avg_sim_mmr_micro,",
        "       (SELECT CAST(floor(CAST(sum(sim_micro) AS DOUBLE)"
        " / count(*) + 0.5) AS BIGINT) FROM plain_pairs)"
        " AS avg_sim_plain_micro",
        "FROM sel ORDER BY sel.rank",
    ]
    return "\n".join(parts)


@query("topk_diverse", oracle=_mmr_oracle())
def topk_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance top-k (Carbonell & Goldstein 1998):
    re-rank the exact top-MMR_CANDIDATES so each pick balances query
    relevance against redundancy with what's already picked —
    MMR = lam*sim(q,d) - (1-lam)*max_{s in S} sim(d,s) — the
    diversified result page single-metric KNN can't produce.

    GRADUATED from rows-only to a full value oracle (round 7) by moving
    the similarity space onto the certified int8 quantization
    (quantize_embed, queries/vector_search.py): every dot product is an
    EXACT int64, so relevance, redundancy, and the greedy argmax keys
    are single IEEE ops on identical operands — bit-equal across
    engines with NO summation-order knife edge anywhere (the barrier
    that kept float-space MMR rows-only). The oracle unrolls the K-step
    greedy as one MATERIALIZED CTE per pick (the pagerank_topn
    discipline); argmax keys are floor(score*1e9+0.5) with a vec_id
    tiebreak, and the in-row diversity scorecard (mean pairwise sim of
    the MMR page vs the plain top-k page, micro-units) sums exact
    integers so even the averages are engine-independent.

    Distribution boundary drawn where the data is: candidate generation
    is the corpus-scale shuffle-free scan + TakeOrdered(50) (constant-
    folded quantized query, the quantize_embed plan); the greedy loop
    runs driver-side over the BOUNDED candidate set (K passes over <=50
    rows — the same bounded-metadata-collect discipline as knn's query
    set). At 100 TB only the candidate scan grows; the MMR stage is
    O(K * MMR_CANDIDATES) regardless of corpus size."""
    import math

    embs = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))), F.lit(1e-30)
    )
    qv_expr = F.transform(
        emb, lambda x: F.round(x * F.lit(127.0) / scale).cast("long")
    )
    qz = embs.select("vec_id", qv_expr.alias("qv"))
    q0_row = qz.where(F.col("vec_id") == 0).first()["qv"]
    q0_lit = F.array(*[F.lit(int(x)) for x in q0_row])
    q0_norm = float(sum(x * x for x in q0_row)) ** 0.5

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dot = idot(F.col("qv"), q0_lit)
    norm = F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double")) * F.lit(
        q0_norm
    )
    cand = (
        qz.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "qv",
            F.round(
                F.lit(1.0)
                - dot.cast("double") / F.greatest(norm, F.lit(1e-30)),
                ROUND_DIST,
            ).alias("dist_q"),
        )
        .orderBy(F.asc("dist_q"), F.asc("vec_id"))
        .limit(MMR_CANDIDATES)
        .collect()
    )
    ids = [r["vec_id"] for r in cand]
    rel = {r["vec_id"]: 1.0 - r["dist_q"] for r in cand}
    codes = {r["vec_id"]: list(r["qv"]) for r in cand}
    norms = {v: math.sqrt(float(sum(x * x for x in codes[v]))) for v in ids}

    def sim(a: int, b: int) -> float:
        d = float(sum(x * y for x, y in zip(codes[a], codes[b])))
        return d / max(norms[a] * norms[b], 1e-30)

    picked: list[int] = []
    remaining = list(ids)
    while remaining and len(picked) < K:
        best, best_key = None, None
        for v in remaining:
            red = max((sim(v, p) for p in picked), default=0.0)
            score = MMR_LAMBDA * rel[v] - (1 - MMR_LAMBDA) * red
            key = (math.floor(score * 1e9 + 0.5), -v)
            if best is None or key > best_key:
                best, best_key = v, key
        picked.append(best)
        remaining.remove(best)

    # In-row diversity proof: mean pairwise sim (exact-int micro-units)
    # of the MMR page vs the plain top-K page — the diversified page
    # must never be MORE redundant than plain KNN (asserted in tests,
    # visible to the driver in every row).
    def avg_micro(sel: list[int]) -> int | None:
        ms = [
            math.floor(sim(a, b) * 1e6 + 0.5)
            for i, a in enumerate(sel)
            for b in sel[i + 1 :]
        ]
        if not ms:
            return None
        return int(math.floor(float(sum(ms)) / len(ms) + 0.5))

    mmr_m = avg_micro(picked)
    plain_m = avg_micro(ids[:K])
    rows = [
        (r + 1, int(v), rel[v], mmr_m, plain_m)
        for r, v in enumerate(picked)
    ]
    return spark.createDataFrame(
        rows,
        "rank int, vec_id long, relevance double, "
        "avg_sim_mmr_micro long, avg_sim_plain_micro long",
    )


@query("index_build_pq")  # rows-only: build metrics, not a relation
def index_build_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index BUILD step (the one-off cost ``pq_search`` amortizes,
    mirroring the index_build_ivf / ivf_search pair): fit the 8×16
    codebooks on the deterministic sample, persist them as a
    fingerprint-keyed sidecar, and emit the build scorecard — subspace
    layout, sample size, the mean squared reconstruction error over the
    training sample (the number that predicts ADC ranking quality before
    any query runs), and two codebook-BALANCE stats over the same
    sample's code assignments: ``code_balance`` (mean normalized usage
    entropy across subspaces, 1.0 = all 16 codes equally used — a
    collapsed codebook scores near 0 and would rank garbage) and
    ``codes_used_frac`` (fraction of the m×k codewords with ≥1 training
    assignment — dead-centroid detector). The driver's rows-only check
    pins the build contract (shape + error/balance bounds asserted in
    tests)."""
    import math

    import numpy as np

    from vector_search_playground_spark.plans.pq import (
        FIT_SAMPLE,
        K_CODES,
        M_SUB,
        _normalize,
        load_or_fit_codebooks,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    books, mse, cached = load_or_fit_codebooks(emb, sf_dir)
    # balance over the SAME deterministic sample the fit used; the
    # assignment pass is FIT_SAMPLE×K distances per subspace — driver-side
    # metadata math, never corpus-scale
    rows = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(FIT_SAMPLE)
        .collect()
    )
    x = _normalize(np.array([r["embedding"] for r in rows], dtype=np.float64))
    d_sub = x.shape[1] // M_SUB
    entropies = []
    used = 0
    for m in range(M_SUB):
        sub = x[:, m * d_sub : (m + 1) * d_sub]
        d2 = ((sub[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
        counts = np.bincount(d2.argmin(axis=1), minlength=K_CODES)
        used += int((counts > 0).sum())
        p = counts[counts > 0] / counts.sum()
        entropies.append(float(-(p * np.log(p)).sum()) / math.log(K_CODES))
    return spark.createDataFrame(
        [
            (
                M_SUB,
                K_CODES,
                int(books.shape[2]),
                FIT_SAMPLE,
                round(float(mse), 6),
                round(sum(entropies) / M_SUB, 6),
                round(used / (M_SUB * K_CODES), 6),
                bool(cached),
            )
        ],
        "m_sub int, k_codes int, d_sub int, fit_sample int, "
        "mse double, code_balance double, codes_used_frac double, "
        "served_from_cache boolean",
    )


# --- ivf_pq_search ----------------------------------------------------------

IVFPQ_NPROBE = 10  # same measured 0.9-recall knee as ivf_search


@query("ivf_pq_search")  # rows-only: doubly-approximate; recall rides in-row
def ivf_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF×PQ search — the FAISS-IVFPQ / pgvector-roadmap shape that
    actually serves billion-vector corpora: the IVF index prunes the
    scan to nprobe cells at FILE-LISTING time (PartitionFilters on
    centroid_id), and within those cells the scan reads 4-byte PQ codes
    (64× less IO than f32 vectors), ranks by asymmetric distance with
    the query's lookup table constant-folded into a JVM HOF, then
    exact-reranks the bounded shortlist against true vectors.

    The code sidecar is built ONCE per fixture fingerprint: the
    centroid-partitioned IVF store is re-encoded to (vec_id, codes)
    parquet partitioned by the SAME centroid_id — so the steady-state
    cost this query times is `nprobe/k · 4-byte-codes` scan + top-50
    rerank, the compounding of both index families' savings. Recall@10
    vs the exact KNN rides in-row (the ivf/lsh/pq discipline)."""
    import os

    from vector_search_playground_spark.plans.ivf import _rank_centroids
    from vector_search_playground_spark.plans.pq import (
        adc_distance,
        adc_table,
        encode,
        load_or_fit_codebooks,
    )
    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
        _recall_at_k,
        load_or_build_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ivf_path, centroids = load_or_build_ivf(spark, sf_dir, emb)
    books, _mse, _cached = load_or_fit_codebooks(emb, sf_dir)

    tag = os.path.basename(sf_dir.rstrip("/"))
    fp = _fixture_fingerprint(sf_dir, "embeddings")
    codes_path = os.path.join(SCRATCH, f"ivfpq_codes_{tag}_{fp}")
    if not os.path.exists(os.path.join(codes_path, "_SUCCESS")):
        indexed = spark.read.parquet(ivf_path)
        encode(indexed, books, passthrough=("centroid_id",)).write.mode(
            "overwrite"
        ).partitionBy("centroid_id").parquet(codes_path)

    qvec = [
        float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    probe = _rank_centroids(centroids, qvec)[:IVFPQ_NPROBE]
    codes = (
        spark.read.parquet(codes_path)
        .where(F.col("centroid_id").isin(probe))
        .where(F.col("vec_id") != 0)
    )
    lut = adc_table(books, qvec)
    shortlist = (
        codes.select(
            "vec_id", adc_distance(F.col("codes"), lut).alias("dist_adc")
        )
        .orderBy(F.asc("dist_adc"), F.asc("vec_id"))
        .limit(PQ_SHORTLIST)
    )
    rerank = shortlist.join(
        _with_query_vec(spark, sf_dir).select("vec_id", "dist"), "vec_id"
    )
    found = (
        rerank.select(
            "vec_id",
            F.round("dist_adc", ROUND_DIST).alias("dist_adc"),
            "dist",
        )
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(K)
    )
    recall = _recall_at_k(found, emb.where(F.col("vec_id") != 0), qvec, K)
    return found.withColumn("recall_at_k", F.lit(round(recall, 2)))


# --- rerank_feature ----------------------------------------------------------

RERANK_CANDIDATES = 50  # ANN-stage depth feeding the reranker
RERANK_K = 10  # emitted page
# fixed blend weights: semantic similarity dominates, lexical overlap
# second, length prior last — the classic L1-rerank feature mix
RERANK_W_COS = 0.6
RERANK_W_JAC = 0.3
RERANK_W_LEN = 0.1


def _rerank_oracle() -> str:
    """Feature rerank as one SQL pass: the topk_diverse MATERIALIZED
    candidate discipline (identical int8-quantized cosine page), then
    per-candidate feature arithmetic with the shared half-up 6-dp
    rounding (floor(x*1e6+0.5)/1e6 — signed-safe, unlike engine-native
    ROUND whose half-away-from-zero diverges from half-up on negative
    log-ratios)."""
    return f"""
    WITH qz AS MATERIALIZED (
        SELECT vec_id, {_MMR_QE.format(col='embedding')} AS qv
        FROM embeddings
    ),
    q0 AS MATERIALIZED (SELECT qv AS q0v FROM qz WHERE vec_id = 0),
    cand AS MATERIALIZED (
        SELECT vec_id,
               ROUND(1 - {_MMR_QCOS.format(a='qv', b='q0v')},
                     {ROUND_DIST}) AS dist_q
        FROM qz, q0 WHERE vec_id <> 0
        ORDER BY dist_q ASC, vec_id ASC LIMIT {RERANK_CANDIDATES}
    ),
    qdoc AS MATERIALIZED (
        SELECT list_distinct(string_split(text, ' ')) AS qt,
               CAST(len(string_split(text, ' ')) AS DOUBLE) AS qn
        FROM documents WHERE doc_id = 0
    ),
    feats AS MATERIALIZED (
        SELECT c.vec_id,
               1 - c.dist_q AS cos_sim,
               floor(CAST(len(list_intersect(
                            list_distinct(string_split(d.text, ' ')),
                            q.qt)) AS DOUBLE)
                     / (len(list_distinct(string_split(d.text, ' ')))
                        + len(q.qt)
                        - len(list_intersect(
                            list_distinct(string_split(d.text, ' ')),
                            q.qt)))
                     * 1e6 + 0.5) / 1e6 AS tok_jaccard,
               floor(ln(CAST(len(string_split(d.text, ' ')) AS DOUBLE)
                        / q.qn) * 1e6 + 0.5) / 1e6 AS len_logratio
        FROM cand c JOIN documents d ON d.doc_id = c.vec_id, qdoc q
    ),
    scored AS MATERIALIZED (
        SELECT vec_id, cos_sim, tok_jaccard, len_logratio,
               floor(({RERANK_W_COS} * cos_sim
                      + {RERANK_W_JAC} * tok_jaccard
                      + {RERANK_W_LEN} * len_logratio)
                     * 1e6 + 0.5) / 1e6 AS score
        FROM feats
    )
    SELECT CAST(row_number() OVER (
                  ORDER BY floor(score * 1e6 + 0.5) DESC, vec_id)
                AS INT) AS rank,
           vec_id, cos_sim, tok_jaccard, len_logratio, score
    FROM scored
    ORDER BY floor(score * 1e6 + 0.5) DESC, vec_id
    LIMIT {RERANK_K}
    """


@query("rerank_feature", oracle=_rerank_oracle())
def rerank_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: ANN candidate page -> feature-based rerank —
    the L1 reranker a production search stack puts between the vector
    index and the result page (the reference stops at stage 1,
    src/main.rs:71-97's `search` verb; this is the capability layered on
    top of that candidate set).

    Stage 1 reuses topk_diverse's CERTIFIED candidate space verbatim:
    top-RERANK_CANDIDATES by int8-quantized cosine (exact int64 dots ->
    single IEEE sqrt/divide, bit-equal across engines). Stage 2 scores
    each candidate against the query document with three deterministic
    features — exact quantized cosine, token-set Jaccard (exact integer
    intersect/union -> one IEEE divide), and log token-length ratio —
    blended with fixed weights and rounded via the shared signed-safe
    half-up floor(x*1e6+0.5). Unlike MMR's greedy chain, the scorer is
    pairwise against the query only, so the whole rerank stays a
    DataFrame plan: no driver loop, no collect of the candidate page.

    Scale: stage 1 is the shuffle-free corpus scan + TakeOrdered
    (constant-folded query literal, the knn_search plan); stage 2 joins
    the 50-row candidate page — broadcast — against documents on the
    primary key, so the expensive side is again one pushed-down scan.
    The final rank window sorts 50 rows bounded by the upstream LIMIT
    in-plan (GlobalLimit -> the SINGLE_PARTITION_SORT_OK audit entry);
    at 100 TB only the two scans grow."""
    embs = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))), F.lit(1e-30)
    )
    qz = embs.select(
        "vec_id",
        F.transform(
            emb, lambda x: F.round(x * F.lit(127.0) / scale).cast("long")
        ).alias("qv"),
    )
    q0_row = qz.where(F.col("vec_id") == 0).first()["qv"]  # 1-row metadata
    q0_lit = F.array(*[F.lit(int(x)) for x in q0_row])
    q0_norm = float(sum(x * x for x in q0_row)) ** 0.5

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dot = idot(F.col("qv"), q0_lit)
    norm = F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double")) * F.lit(
        q0_norm
    )
    cand = (
        qz.where(F.col("vec_id") != 0)
        .select(
            "vec_id",
            F.round(
                F.lit(1.0)
                - dot.cast("double") / F.greatest(norm, F.lit(1e-30)),
                ROUND_DIST,
            ).alias("dist_q"),
        )
        .orderBy(F.asc("dist_q"), F.asc("vec_id"))
        .limit(RERANK_CANDIDATES)
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    qdoc = docs.where(F.col("doc_id") == 0).first()  # 1-row metadata
    q_tokens = qdoc["text"].split(" ")
    qt_lit = F.array(*[F.lit(t) for t in sorted(set(q_tokens))])
    qn = float(len(q_tokens))

    def half_up6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    tok = F.split("text", " ")
    dt = F.array_distinct(tok)
    inter = F.size(F.array_intersect(dt, qt_lit)).cast("double")
    feats = (
        docs.join(
            F.broadcast(cand), docs.doc_id == cand.vec_id
        )
        .select(
            "vec_id",
            (F.lit(1.0) - F.col("dist_q")).alias("cos_sim"),
            half_up6(
                inter
                / (
                    F.size(dt)
                    + F.lit(len(set(q_tokens)))
                    - inter
                )
            ).alias("tok_jaccard"),
            half_up6(
                F.log(F.size(tok).cast("double") / F.lit(qn))
            ).alias("len_logratio"),
        )
    )
    scored = feats.withColumn(
        "score",
        half_up6(
            F.lit(RERANK_W_COS) * F.col("cos_sim")
            + F.lit(RERANK_W_JAC) * F.col("tok_jaccard")
            + F.lit(RERANK_W_LEN) * F.col("len_logratio")
        ),
    )
    key = F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5))
    w = Window.orderBy(F.desc(key.cast("long")), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= RERANK_K)
        .select(
            "rank", "vec_id", "cos_sim", "tok_jaccard", "len_logratio",
            "score",
        )
    )


# --- knn_graph -----------------------------------------------------------------

KNN_GRAPH_K = 5  # out-degree of the built graph


def _knn_graph_oracle() -> str:
    """All-pairs quantized cosine + a per-source rank window (rank<=K) —
    the brute-force form of the graph build, affordable at sf0.01
    (500 vectors -> 250k pairs). Ranking key is the exact micro-unit
    integer floor(dist*1e6+0.5) with a dst tiebreak, the knn_batch
    ordering discipline."""
    return f"""
    WITH qz AS MATERIALIZED (
        SELECT vec_id, {_MMR_QE.format(col='embedding')} AS qv
        FROM embeddings
    ),
    pairs AS MATERIALIZED (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               ROUND(1 - {_MMR_QCOS.format(a='a.qv', b='b.qv')},
                     {ROUND_DIST}) AS dist
        FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT src, dst, dist,
               row_number() OVER (
                   PARTITION BY src
                   ORDER BY floor(dist * 1e6 + 0.5) ASC, dst ASC) AS rank
        FROM pairs
    )
    SELECT src, CAST(rank AS INT) AS rank, dst, dist
    FROM ranked WHERE rank <= {KNN_GRAPH_K}
    """


@query("knn_graph", oracle=_knn_graph_oracle())
def knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN GRAPH build: the top-KNN_GRAPH_K neighbors of EVERY vector in
    the certified int8-quantized cosine space — the construction step
    every graph-based ANN index (HNSW/NSG/DiskANN) starts from, and the
    one index family the IVF/LSH/PQ tier doesn't cover. Output one edge
    row (src, rank, dst, dist) per (vector, neighbor), dist rounded
    ROUND_DIST before ranking with a dst tiebreak so the edge set is
    engine-independent.

    Kernel: the certified blocked-BLAS ``knn_batch`` (operators/knn.py)
    with the corpus itself as the query side — each Arrow batch of the
    corpus computes its |batch|x|Q| int-exact dots in one matmul and
    keeps a value-cut local top-k, then the deterministic HOF kernel
    re-scores the surviving sliver and a per-src window makes the final
    cut (never the |Q|x|C| cross product; the BLAS pass only SELECTS
    candidates). Self-edges are excluded after the k+1 cut: top-(K+1)
    minus self is provably the top-K of the others whether or not self
    survives the cut (self can lose a dist-0 tie only to another dist-0
    row, which then belongs in the page).

    Scale: |Q| = |corpus|, so the query side is processed in bounded
    chunks of MAX_BATCH_QUERIES (the knn_batch broadcast contract; the
    chunk predicate is a mod filter on vec_id, correct because per-src
    top-k is independent of which chunk a src lands in). Each chunk is
    one shuffle-free corpus scan + one window over the value-cut
    candidates — O(ceil(N/B)) scans total, the exact-build baseline a
    graph index amortizes. At 100 TB the exact build runs per-shard /
    on samples and the NN-descent refinement takes over; this operator
    is the certified bootstrap + recall anchor for that path."""
    from vector_search_playground_spark.operators.knn import (
        MAX_BATCH_QUERIES,
        knn_batch,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))), F.lit(1e-30)
    )
    qz = embs.select(
        "vec_id",
        F.transform(
            emb, lambda x: F.round(x * F.lit(127.0) / scale).cast("long")
        ).alias("qv"),
    )
    # (r14: a persist here — qz feeds 3 + 2·chunks subtrees — was landed
    # mid-round on leaky-harness evidence and REVERTED after the honest
    # persist-toggle A/B came out no-persist-faster in every interleaved
    # round: the consumers' recomputed quantization HOFs run concurrently
    # on idle cores, while the cache materialization serializes and the
    # un-persisted sizing count below gets column-pruned to a cheap row
    # count. At real corpus scale a production graph build would
    # materialize this artifact once — revisit with cluster memory.)

    n = qz.count()  # one count job to size the chunking
    n_chunks = max(1, -(-n // MAX_BATCH_QUERIES))
    chunks = []
    for i in range(n_chunks):
        q_i = qz.where(
            (F.col("vec_id") % F.lit(n_chunks)) == F.lit(i)
        ).select(
            F.col("vec_id").alias("src"), F.col("qv").alias("src_qv")
        )
        edges = knn_batch(
            qz,
            q_i,
            corpus_vec="qv",
            query_vec="src_qv",
            query_id="src",
            metric="cosine",
            k=KNN_GRAPH_K + 1,  # +1 admits the self-edge, dropped below
            round_to=ROUND_DIST,
            tiebreak="vec_id",
        )
        chunks.append(edges.where(F.col("vec_id") != F.col("src")))
    allc = chunks[0]
    for c in chunks[1:]:
        allc = allc.unionByName(c)
    w = Window.partitionBy("src").orderBy(
        F.asc("dist"), F.asc("vec_id")
    )
    return (
        allc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= KNN_GRAPH_K)
        .select("src", "rank", F.col("vec_id").alias("dst"), "dist")
    )
