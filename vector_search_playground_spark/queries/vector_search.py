"""Tier A + Tier B vector-search queries (SURVEY.md §2).

These reproduce the reference's entire query surface on Spark. The corpus is
``documents ⋈ embeddings`` (≡ the reference's ``search(id, content, vector)``
table — FIXTURES.md mapping note). The standing query vector is the
embedding of ``vec_id = 0``, fetched relationally (broadcast 1-row join) so
the DuckDB oracle can express the identical computation.

Reference citations per query are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_playground_spark.functions import vector as V
from vector_search_playground_spark.functions.embed import embed_batch, embed_query
from vector_search_playground_spark.operators.ids import dense_ids
from vector_search_playground_spark.registry import ROUND_DIST, query
from vector_search_playground_spark.sources import load_table

THRESHOLD = 0.6  # reference default, src/main.rs:20-21
K = 10  # hardcoded,          src/main.rs:91

# DuckDB fragment for the standing query vector (vec_id = 0). The engine
# accumulates distances in f64 (functions/vector.py); DuckDB's list_* kernels
# compute in f32 when given FLOAT lists, so cast to DOUBLE[] for parity.
_Q0 = (
    "(SELECT CAST(embedding AS DOUBLE[]) AS query_embedding "
    "FROM embeddings WHERE vec_id = 0) q"
)
_EMB = "CAST(e.embedding AS DOUBLE[])"
# DuckDB cosine distance vs the standing query, rounded like the engine.
_DDIST = f"ROUND(1 - list_cosine_similarity({_EMB}, q.query_embedding), {ROUND_DIST})"


def _with_query_vec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ⨯ broadcast(1-row query vector) with rounded cosine dist.

    The broadcast keeps the corpus scan shuffle-free: the plan is
    Scan → BroadcastNestedLoopJoin(1 row) → Project, one codegen stage.
    """
    embs = load_table(spark, sf_dir, "embeddings")
    q0 = (
        embs.where(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("query_embedding"))
    )
    return embs.crossJoin(F.broadcast(q0)).withColumn(
        "dist",
        F.round(
            V.cosine_distance(F.col("embedding"), F.col("query_embedding")),
            ROUND_DIST,
        ),
    )


# --- Tier A ----------------------------------------------------------------


@query("count_all", oracle="SELECT count(*) AS n FROM lineitem")
def count_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT COUNT(*) — the reference's `count` verb (src/main.rs:81-84)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "scan_all",
    oracle="""
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars, e.label
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def scan_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan of the logical `search` table (src/main.rs:88,92-93) —
    documents ⋈ embeddings on the 1:1 key."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return d.join(e, d.doc_id == e.vec_id).select(
        "doc_id", "text", "lang", "source", "n_chars", "label"
    )


@query("project_content", oracle="SELECT text FROM documents")
def project_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Output projection to content only (src/main.rs:94-95); Catalyst prunes
    the scan to one column — strictly better than the reference, which
    fetches full rows then prints one field."""
    return load_table(spark, sf_dir, "documents").select("text")


@query(
    "cosine_distance",
    oracle=f"SELECT e.vec_id, {_DDIST} AS dist FROM embeddings e, {_Q0}",
)
def cosine_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `<=>` scalar expression per row (src/main.rs:86-87)."""
    return _with_query_vec(spark, sf_dir).select("vec_id", "dist")


@query(
    "dist_filter",
    oracle=f"""
    SELECT e.vec_id, {_DDIST} AS dist
    FROM embeddings e, {_Q0} WHERE {_DDIST} < {THRESHOLD}
    """,
)
def dist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta predicate on the computed distance (src/main.rs:89)."""
    return (
        _with_query_vec(spark, sf_dir)
        .where(F.col("dist") < THRESHOLD)
        .select("vec_id", "dist")
    )


@query(
    "order_by_dist",
    oracle=f"""
    SELECT e.vec_id, {_DDIST} AS dist FROM embeddings e, {_Q0}
    ORDER BY dist ASC, e.vec_id ASC
    """,
)
def order_by_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort ascending by computed distance (src/main.rs:90)."""
    return (
        _with_query_vec(spark, sf_dir)
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .select("vec_id", "dist")
    )


@query(
    "topk_limit",
    oracle=f"""
    SELECT e.vec_id, {_DDIST} AS dist FROM embeddings e, {_Q0}
    ORDER BY dist ASC, e.vec_id ASC LIMIT {K}
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY dist LIMIT 10 (src/main.rs:90-91). Physical plan is
    TakeOrderedAndProject — per-partition heap, no global sort."""
    return (
        _with_query_vec(spark, sf_dir)
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(K)
        .select("vec_id", "dist")
    )


@query(
    "knn_search",
    oracle=f"""
    SELECT d.doc_id, d.text, {_DDIST} AS dist
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id, {_Q0}
    WHERE {_DDIST} < {THRESHOLD}
    ORDER BY dist ASC, d.doc_id ASC
    LIMIT {K}
    """,
)
def knn_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — the reference's `search` verb end-to-end
    (src/main.rs:85-96): distance vs every row → threshold → top-10 →
    project content. Threshold + heap run on the embeddings scan BEFORE the
    1:1 join to documents, so at scale the join input is ≤ k·partitions
    rows, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    hits = (
        _with_query_vec(spark, sf_dir)
        .where(F.col("dist") < THRESHOLD)
        .select("vec_id", "dist")
    )
    return (
        hits.join(docs, hits.vec_id == docs.doc_id)
        .orderBy(F.asc("dist"), F.asc("doc_id"))
        .limit(K)
        .select("doc_id", "text", "dist")
    )


@query(
    "ids_dense",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS rid,
           doc_id FROM documents
    """,
)
def ids_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense id assignment — semantic match for Postgres serial
    (migration/src/m20250414_131949_create_search.rs:27-31). Computed with
    the bucketed two-pass operator (operators/ids.py): per-bucket
    row_number + cumulative offsets — P balanced window groups instead of
    the single-partition global window a naive row_number would plan."""
    docs = load_table(spark, sf_dir, "documents")
    return dense_ids(docs, "doc_id").select("rid", "doc_id")


@query(
    "knn_prefiltered",
    oracle=f"""
    SELECT e.vec_id, {_DDIST} AS dist
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id, {_Q0}
    WHERE d.lang = 'en'
    ORDER BY dist ASC, e.vec_id ASC
    LIMIT {K}
    """,
)
def knn_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-prefiltered KNN — the pgvector pattern the reference's
    users hit the moment they add a WHERE clause to the search verb
    (`SELECT ... WHERE lang='en' ORDER BY vector <=> q LIMIT k`). The
    metadata predicate applies BEFORE the distance kernel, so the HOF
    aggregate runs only on surviving rows and the top-k heap
    (TakeOrderedAndProject) sees the filtered stream. The doc↔embedding
    join is 1:1 on the id; at scale the metadata lives as columns of the
    vector table (zero join) or in bucketed storage co-located on the id
    (exchange-free SortMergeJoin, sources/bucketed.py) — here AQE picks
    the physical join for the fixture layout. Filtered-ANN recall decay
    (the reason pgvector added iterative index scans) is an index-path
    concern; this exact path is the oracle-checkable anchor.

    No distance threshold here: combined with the metadata predicate it
    left ≤1 surviving row at every fixture SF (0 at sf0.1 — caught by the
    sf0.1 vacuity guard), so the certification was nearly empty. The
    filtered pattern users actually run is `WHERE lang = .. ORDER BY dist
    LIMIT k`, which certifies k real rows at every scale."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    embs = _with_query_vec(spark, sf_dir)
    return (
        embs.join(docs, embs.vec_id == docs.doc_id)
        .where(F.col("lang") == "en")
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(K)
        .select("vec_id", "dist")
    )


_QE = (
    "list_transform(CAST({col} AS DOUBLE[]), "
    "x -> CAST(round(x * 127.0 / GREATEST("
    "list_max(list_transform(CAST({col} AS DOUBLE[]), y -> abs(y))), "
    "1e-30)) AS BIGINT))"
)


@query(
    "quantize_embed",
    oracle=f"""
    WITH qz AS (
        SELECT vec_id, {_QE.format(col='embedding')} AS qv FROM embeddings
    ),
    q0 AS (SELECT qv AS q0v FROM qz WHERE vec_id = 0)
    SELECT vec_id,
           CAST(list_inner_product(CAST(qv AS DOUBLE[]),
                                   CAST(q0v AS DOUBLE[])) AS BIGINT) AS dot_q,
           ROUND(1 - list_inner_product(CAST(qv AS DOUBLE[]),
                                        CAST(q0v AS DOUBLE[]))
                     / GREATEST(sqrt(list_inner_product(CAST(qv AS DOUBLE[]),
                                                        CAST(qv AS DOUBLE[])))
                              * sqrt(list_inner_product(CAST(q0v AS DOUBLE[]),
                                                        CAST(q0v AS DOUBLE[]))),
                                1e-30),
                 {ROUND_DIST}) AS dist_q
    FROM qz, q0
    ORDER BY dist_q ASC, vec_id ASC
    LIMIT {K}
    """,
)
def quantize_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization + quantized KNN — the pgvector
    halfvec/quantization direction: per-vector symmetric scale
    (max|x|/127), cosine computed on the int8 codes. 4× less vector
    memory/IO at 100 TB; the int×int dot products are EXACT in f64
    (|Σ| ≤ 127²·dim ≪ 2⁵³), so the emitted dot_q is a hash-stable
    integer on both engines and only the final normalized distance
    rounds — no summation-order hazard anywhere. All JVM HOF kernels;
    the corpus scan stays shuffle-free with a 1-row broadcast of the
    quantized query, and the top-k is TakeOrderedAndProject."""
    embs = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    scale = F.greatest(
        F.array_max(F.transform(emb, lambda x: F.abs(x))), F.lit(1e-30)
    )
    qv = F.transform(
        emb, lambda x: F.round(x * F.lit(127.0) / scale).cast("long")
    )
    qz = embs.select("vec_id", qv.alias("qv"))
    # The query side is ONE bounded row — quantize it driver-side and ship
    # it as a constant-folded literal (same pattern as knn's
    # as_vector_literal). Leaving it as a 1-row broadcast join made the
    # interpreted HOF fold over q0v (dot + its self-norm) re-evaluate per
    # corpus row against a joined column instead of a constant: measured
    # 7.3 s vs ~1 s at sf0.1.
    q0_row = qz.where(F.col("vec_id") == 0).first()["qv"]
    q0_lit = F.array(*[F.lit(int(x)) for x in q0_row])
    q0_norm = float(sum(x * x for x in q0_row)) ** 0.5

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dot = idot(F.col("qv"), q0_lit)
    norm = F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double")) * F.lit(
        q0_norm
    )
    return (
        qz.select(
            "vec_id",
            dot.alias("dot_q"),
            F.round(
                F.lit(1.0)
                - dot.cast("double") / F.greatest(norm, F.lit(1e-30)),
                ROUND_DIST,
            ).alias("dist_q"),
        )
        .orderBy(F.asc("dist_q"), F.asc("vec_id"))
        .limit(K)
    )


@query("ids_fast")  # rows-only: values are partition-dependent by design
def ids_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable unique-id assignment: monotonically_increasing_id — no
    shuffle, unique but not dense (like Postgres serial with gaps)."""
    return load_table(spark, sf_dir, "documents").select(
        F.monotonically_increasing_id().alias("rid"), "doc_id"
    )


@query("embed_text")  # rows-only: model inference is not SQL-expressible
def embed_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-text embed (src/main.rs:52-60) via the deterministic hash
    embedder; dim/norm checks computed driver-side in NumPy — a 1-row
    Spark round-trip for a scalar sanity check is pure overhead."""
    import math

    vec = embed_query("hello vector search world")
    norm = round(math.sqrt(sum(float(x) * float(x) for x in vec)), 4)
    return spark.createDataFrame([(len(vec), norm)], "dim: int, norm: double")


@query("embed_batch")  # rows-only: model inference is not SQL-expressible
def embed_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed batch embedding of documents.text (mapInPandas, Arrow
    batches, per-executor model cache) — the fixed version of the
    reference's per-call model reload (src/main.rs:52-60)."""
    docs = load_table(spark, sf_dir, "documents")
    out = embed_batch(docs.select("doc_id", "text"), "text", "embedding")
    return out.select(
        "doc_id",
        F.size("embedding").alias("dim"),
        F.round(V.l2_norm(F.col("embedding")), 4).alias("norm"),
    )


# deterministic ~1-in-10 certificate sample: both partitionings agree on
# membership by construction (a pure function of doc_id), so the sampled
# re-embed still compares the same texts across different partitionings
_MINILM_SELF_COS_MOD = 10


@query("embed_minilm")  # rows-only: transformer inference isn't SQL
def embed_minilm_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-model serving path, end to end: a seeded pure-numpy
    MiniLM-architecture transformer (functions/minilm.py — multi-head
    self-attention, GELU FFN, masked mean-pool; the reference's model
    family, src/main.rs:52-60) rides the SAME factory/mapInPandas/
    per-executor-cache plumbing a production checkpoint would
    (functions/embed.py:96-109). In-row certificates: ``dim`` must be
    the model width and ``norm`` 1.0 (L2-normalized head) for EVERY
    row; ``self_cos`` compares the SAME text embedded through two
    independently-partitioned runs — 1.0 proves the executor-side
    weight materialization is bit-deterministic across partitionings
    (the property that makes seeded weights certifiable at all). The
    re-embed runs on a deterministic xxhash64(doc_id)%10 sample (r8
    verdict: double-embedding the full corpus made this the bench's
    slowest query; determinism is a per-row property, so a fixed ~10%
    witness set certifies it at a tenth of the second pass — NULL
    self_cos marks the unsampled rows, never a skipped check). The
    full-corpus pass rides ``fan_out``: the fixture scan is ONE parquet
    split, which would serialize every forward pass through a single
    task regardless of core count (r9 bench archaeology: the
    transformer stage, not the certificate, was 70% of the old wall) —
    at production scale the scan has natural splits and fan_out is a
    no-op.
    """
    from vector_search_playground_spark.functions.minilm import (
        minilm_factory,
    )
    from vector_search_playground_spark.sources import fan_out

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = embed_batch(fan_out(docs), "text", "ea", model=minilm_factory)
    sample = docs.where(
        F.pmod(F.xxhash64("doc_id"), F.lit(_MINILM_SELF_COS_MOD)) == 0
    )
    b = embed_batch(
        sample.repartition(7, "doc_id"), "text", "eb", model=minilm_factory
    )
    return (
        a.join(b.select("doc_id", "eb"), "doc_id", "left")
        .select(
            "doc_id",
            F.size("ea").alias("dim"),
            F.round(V.l2_norm(F.col("ea")), 4).alias("norm"),
            F.round(
                V.dot_product(F.col("ea"), F.col("eb")), 4
            ).alias("self_cos"),
        )
        # NOTE (r14, measured and rejected): persisting before this
        # global sort — so the range-exchange boundary sampling would
        # not re-execute the transformer — was tried and REVERTED: the
        # honest isolated A/B went 1.88 s → 3.74 s. The sampling pass's
        # re-execution runs concurrently on idle cores, while the cache
        # materialization serializes the pipeline; see OPTIMIZATION_r14.
        .orderBy("doc_id")
    )


# --- Tier B: the rest of the pgvector operator family ----------------------

_DL2 = f"ROUND(list_distance({_EMB}, q.query_embedding), {ROUND_DIST})"
_DIP = f"ROUND(-list_inner_product({_EMB}, q.query_embedding), {ROUND_DIST})"


@query(
    "l2_distance",
    oracle=f"SELECT e.vec_id, {_DL2} AS dist FROM embeddings e, {_Q0}",
)
def l2_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pgvector `<->` (imported at src/main.rs:5, unused by the CLI)."""
    embs = load_table(spark, sf_dir, "embeddings")
    q0 = embs.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_embedding")
    )
    return (
        embs.crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            F.round(
                V.l2_distance(F.col("embedding"), F.col("query_embedding")),
                ROUND_DIST,
            ).alias("dist"),
        )
    )


@query(
    "inner_product",
    oracle=f"SELECT e.vec_id, {_DIP} AS dist FROM embeddings e, {_Q0}",
)
def inner_product_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pgvector `<#>` negative inner product (imported at src/main.rs:5)."""
    embs = load_table(spark, sf_dir, "embeddings")
    q0 = embs.where(F.col("vec_id") == 0).select(
        F.col("embedding").alias("query_embedding")
    )
    return (
        embs.crossJoin(F.broadcast(q0))
        .select(
            "vec_id",
            F.round(
                V.inner_product_distance(F.col("embedding"), F.col("query_embedding")),
                ROUND_DIST,
            ).alias("dist"),
        )
    )


@query(
    "knn_l2",
    oracle=f"""
    SELECT e.vec_id, {_DL2} AS dist FROM embeddings e, {_Q0}
    ORDER BY dist ASC, e.vec_id ASC LIMIT {K}
    """,
)
def knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k under Euclidean distance."""
    return l2_distance_q(spark, sf_dir).orderBy(F.asc("dist"), F.asc("vec_id")).limit(K)


@query(
    "knn_batch",
    oracle=f"""
    SELECT query_id, vec_id, dist FROM (
      SELECT q.vec_id AS query_id, e.vec_id,
             ROUND(1 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])),
                   {ROUND_DIST}) AS dist,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY ROUND(1 - list_cosine_similarity(
                          CAST(e.embedding AS DOUBLE[]),
                          CAST(q.embedding AS DOUBLE[])), {ROUND_DIST}),
                        e.vec_id) AS rn
      FROM embeddings e, (SELECT * FROM embeddings WHERE vec_id < 5) q
    ) WHERE rn <= 5
    """,
)
def knn_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-queries KNN in ONE corpus scan (operators/knn.py:knn_batch):
    broadcast query set → per-query windowed top-k. The many-queries case
    a retrieval user hits immediately; the reference would re-run its
    whole CLI per query (src/main.rs:85-96). Ranks on rounded distance +
    vec_id tiebreak so the top-k set is engine-independent."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries_df = embs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    from vector_search_playground_spark.operators.knn import knn_batch

    out = knn_batch(
        embs,
        queries_df,
        metric="cosine",
        k=5,
        tiebreak="vec_id",
        round_to=ROUND_DIST,
    )
    return out.select("query_id", "vec_id", "dist")


@query(
    "knn_dot",
    oracle=f"""
    SELECT e.vec_id, {_DIP} AS dist FROM embeddings e, {_Q0}
    ORDER BY dist ASC, e.vec_id ASC LIMIT {K}
    """,
)
def knn_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k under (negative) inner product."""
    return (
        inner_product_q(spark, sf_dir).orderBy(F.asc("dist"), F.asc("vec_id")).limit(K)
    )


@query(
    "fn_vector_arith",
    oracle=f"""
    SELECT a.vec_id,
           ROUND(sqrt(list_sum(list_transform(
               list_zip(CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])),
               x -> (x[1] + x[2]) * (x[1] + x[2])))), {ROUND_DIST})
               AS norm_sum,
           ROUND(sqrt(list_sum(list_transform(
               list_zip(CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])),
               x -> (x[1] - x[2]) * (x[1] - x[2])))), {ROUND_DIST})
               AS norm_diff,
           ROUND(list_sum(list_transform(
               list_zip(CAST(a.embedding AS DOUBLE[]),
                        CAST(b.embedding AS DOUBLE[])),
               x -> x[1] * x[2])), {ROUND_DIST}) AS sum_mul
    FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    WHERE a.vec_id < 50
    """,
)
def fn_vector_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pgvector's vector ARITHMETIC operator family (`+`, `-`,
    elementwise `*` — the same operator table that ships `<=>`,
    pgvector docs): consecutive embedding pairs combined elementwise,
    summarized as ‖a+b‖, ‖a−b‖ and Σ(a·b) (the latter doubling as the
    inner product identity check). Completes Tier B next to the three
    distance metrics.

    Implementation is the same codegen'd ``zip_with``/``aggregate`` HOF
    discipline as the distance kernels — elementwise arithmetic never
    leaves the JVM, no UDF. The pair join is an equi-join on vec_id+1
    bounded to 50 rows; parity: both engines compute in f64 over the
    cast arrays, 6-dp rounding.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.where(F.col("vec_id") < 50).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("va")
    )
    b = emb.select(
        (F.col("vec_id") - 1).alias("vec_id"),
        F.col("embedding").cast("array<double>").alias("vb"),
    )

    def fold_sq(expr):
        return F.sqrt(
            F.aggregate(expr, F.lit(0.0), lambda s, x: s + x * x)
        )

    plus = F.zip_with("va", "vb", lambda x, y: x + y)
    minus = F.zip_with("va", "vb", lambda x, y: x - y)
    mul = F.zip_with("va", "vb", lambda x, y: x * y)
    return a.join(b, "vec_id").select(
        "vec_id",
        F.round(fold_sq(plus), ROUND_DIST).alias("norm_sum"),
        F.round(fold_sq(minus), ROUND_DIST).alias("norm_diff"),
        F.round(
            F.aggregate(mul, F.lit(0.0), lambda s, x: s + x),
            ROUND_DIST,
        ).alias("sum_mul"),
    )


_KNNC_K = 5
_KNNC_MOD = 5


@query(
    "knn_classify",
    oracle=f"""
    WITH d AS (
        SELECT q.vec_id AS q, e.vec_id AS c, e.label,
               ROUND(1 - list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]),
                         CAST(q.embedding AS DOUBLE[])), {ROUND_DIST})
                   AS dist
        FROM embeddings e,
             (SELECT * FROM embeddings WHERE vec_id % {_KNNC_MOD} = 0) q
        WHERE e.vec_id % {_KNNC_MOD} <> 0
    ),
    nn AS (
        SELECT q, label FROM (
            SELECT q, label,
                   row_number() OVER (PARTITION BY q ORDER BY dist, c)
                       AS rn
            FROM d
        ) WHERE rn <= {_KNNC_K}
    ),
    votes AS (SELECT q, label, count(*) AS cnt FROM nn GROUP BY q, label),
    pred AS (
        SELECT q, label AS pred_label, cnt FROM (
            SELECT q, label, cnt,
                   row_number() OVER (
                       PARTITION BY q ORDER BY cnt DESC, label
                   ) AS rk
            FROM votes
        ) WHERE rk = 1
    )
    SELECT t.vec_id, CAST(t.label AS INT) AS true_label,
           CAST(p.pred_label AS INT) AS pred_label,
           CAST(p.cnt AS BIGINT) AS n_votes,
           p.pred_label = t.label AS correct
    FROM pred p JOIN embeddings t ON p.q = t.vec_id
    """,
)
def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN CLASSIFICATION over the labeled embedding table — the
    lazy-learner baseline every vector-quality audit starts with: every
    {m}-th vector is held out and labeled by the majority vote of its
    {k} nearest training neighbors (cosine; rounded-distance + id
    ranking so the neighbor SET is engine-independent; vote ties break
    to the smallest label). The per-row `correct` column makes held-out
    accuracy a one-agg follow-up, and a collapse here is the earliest
    signal an embedding pipeline regressed.

    Shape at 100 TB: the held-out queries ride ``operators/knn.knn_batch``
    — broadcast query matrix, per-Arrow-batch BLAS with a value-based
    local cut, deterministic HOF recompute on survivors; the corpus is
    scanned ONCE and never shuffled. Voting is one |Q|·{k}-row hash-agg
    with a deterministic max_by; the oracle replays it as the O(|Q|·|C|)
    cross join (certification only).
    """.format(m=_KNNC_MOD, k=_KNNC_K)
    from vector_search_playground_spark.operators.knn import knn_batch

    embs = load_table(spark, sf_dir, "embeddings")
    test = embs.where(F.col("vec_id") % _KNNC_MOD == 0)
    train = embs.where(F.col("vec_id") % _KNNC_MOD != 0)
    queries_df = test.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_embedding"),
    )
    nn = knn_batch(
        train,
        queries_df,
        metric="cosine",
        k=_KNNC_K,
        tiebreak="vec_id",
        round_to=ROUND_DIST,
    ).select("query_id", "vec_id")
    labels = train.select("vec_id", "label")
    votes = (
        nn.join(labels, "vec_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pred = votes.groupBy("query_id").agg(
        F.max_by(
            F.struct(
                F.col("label").alias("pred_label"),
                F.col("cnt").alias("n_votes"),
            ),
            F.struct(F.col("cnt"), -F.col("label")),
        ).alias("p")
    )
    truth = test.select("vec_id", F.col("label").alias("true_label"))
    return (
        pred.join(truth, pred.query_id == truth.vec_id)
        .select(
            "vec_id",
            F.col("true_label").cast("int").alias("true_label"),
            F.col("p.pred_label").cast("int").alias("pred_label"),
            F.col("p.n_votes").cast("long").alias("n_votes"),
            (F.col("p.pred_label") == F.col("true_label")).alias("correct"),
        )
    )


_OUT_TOP = 3


@query(
    "embedding_outliers",
    oracle=f"""
    WITH x AS (
        SELECT vec_id, label,
               unnest(CAST(embedding AS DOUBLE[])) AS v,
               generate_subscripts(embedding, 1) AS d
        FROM embeddings
    ),
    c AS (
        SELECT label, d, floor(avg(v) * 1e9 + 0.5) / 1e9 AS cv
        FROM x GROUP BY label, d
    ),
    dist AS (
        SELECT x.vec_id, x.label,
               ROUND(sqrt(sum((x.v - c.cv) * (x.v - c.cv))), {ROUND_DIST})
                   AS dist
        FROM x JOIN c USING (label, d)
        GROUP BY x.vec_id, x.label
    ),
    ranked AS (
        SELECT vec_id, label, dist,
               row_number() OVER (
                   PARTITION BY label ORDER BY dist DESC, vec_id
               ) AS rk
        FROM dist
    )
    SELECT vec_id, CAST(label AS INT) AS label, dist,
           CAST(rk AS BIGINT) AS rank
    FROM ranked WHERE rk <= {_OUT_TOP}
    """,
)
def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster embedding outliers: each label's top-{t} vectors by
    L2 distance to the LABEL CENTROID — the vector-quality audit that
    surfaces mislabeled or corrupted embeddings before they poison
    retrieval (the per-vector sibling of ``embedding_drift``'s
    slice-level monitor, same rounded-centroid discipline: means pass
    through the module-wide half-up ``floor(avg*1e9+0.5)/1e9`` on BOTH
    engines before the distance, which narrows — not eliminates — the
    summation-order knife edge; a residual last-ulp avg difference that
    straddles a 9-dp boundary would still diverge).

    Shape at 100 TB: centroids via posexplode → ONE (label, dim)
    hash-agg carrying partial sums (never vectors) — |labels|·d rows =
    model metadata, folded back as a broadcast map-of-array literals;
    the distance is a row-local codegen'd HOF fold, and the per-label
    top-{t} window ranks |corpus| rows on the already-computed scalar.
    """.format(t=_OUT_TOP)
    from pyspark.sql import Window

    embs = load_table(spark, sf_dir, "embeddings")
    cent = (
        embs.select(
            "label", F.posexplode("embedding").alias("d", "v")
        )
        .groupBy("label", "d")
        .agg(
            (
                F.floor(F.avg(F.col("v").cast("double")) * 1e9 + 0.5) / 1e9
            ).alias("cv")
        )
        .collect()
    )
    by_label: dict[int, dict[int, float]] = {}
    for r in cent:
        by_label.setdefault(r["label"], {})[r["d"]] = r["cv"]
    cmap = F.create_map(
        *[
            x
            for lbl, dims in sorted(by_label.items())
            for x in (
                F.lit(lbl),
                F.array(*[F.lit(dims[i]) for i in range(len(dims))]),
            )
        ]
    )
    dist = F.round(
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    cmap[F.col("label")],
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, y: acc + y,
            )
        ),
        ROUND_DIST,
    )
    w = Window.partitionBy("label").orderBy(F.desc("dist"), "vec_id")
    return (
        embs.select("vec_id", "label", dist.alias("dist"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _OUT_TOP)
        .select("vec_id", F.col("label").cast("int").alias("label"), "dist", "rank")
    )


# --- knn_mips ---------------------------------------------------------------

_MIPS_SHORTLIST = 3 * K  # L2 shortlist margin before the exact dot rerank
_MIPS_Q1 = (
    "(SELECT CAST(embedding AS DOUBLE[]) AS query_embedding "
    "FROM embeddings WHERE vec_id = 1) q"
)


@query(
    "knn_mips",
    oracle=f"""
    SELECT e.vec_id,
           ROUND(list_inner_product({_EMB}, q.query_embedding),
                 {ROUND_DIST}) AS dot
    FROM embeddings e, {_MIPS_Q1}
    ORDER BY dot DESC, e.vec_id ASC LIMIT {K}
    """,
)
def knn_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search via the asymmetric L2 reduction
    (Bachrach 2014 / Neyshabur-Srebro 2015, the trick behind every
    'L2 index serving a dot-product model' deployment): corpus vectors
    augment to [x, √(M²−‖x‖²)] (constant norm M), the query to [q, 0] —
    then L2 order on the augmented space IS inner-product order, so any
    Euclidean index (the IVF/PQ family here) can serve MIPS unchanged.
    This query runs the reduction end-to-end: augmented-L2 shortlist of
    {s} via the same HOF kernel knn_l2 uses, then an EXACT rerank by
    rounded dot + vec_id tiebreak to the final top-{k} — certified
    against the direct inner-product oracle, proving the reduction
    returns the true MIPS answer (the shortlist margin swamps any
    last-ulp L2 reordering; the rerank makes the emitted order
    engine-independent — the ivf_search rerank discipline).

    Shape at 100 TB: M² is one corpus agg (a scalar broadcast); the
    augmented scan is the same single codegen stage as knn_l2
    (Scan → 1-row broadcast join → Project) feeding
    TakeOrderedAndProject({s}); the rerank touches {s} rows.
    """.format(s=_MIPS_SHORTLIST, k=K)
    embs = load_table(spark, sf_dir, "embeddings")
    m2 = embs.agg(
        F.max(
            V.dot_product(F.col("embedding"), F.col("embedding"))
        ).alias("m2")
    ).first()["m2"]
    q1 = embs.where(F.col("vec_id") == 1).select(
        F.col("embedding").alias("query_embedding")
    )
    aug = embs.crossJoin(F.broadcast(q1)).select(
        "vec_id",
        "embedding",
        "query_embedding",
        F.concat(
            F.col("embedding").cast("array<double>"),
            F.array(
                F.sqrt(
                    F.greatest(
                        F.lit(m2)
                        - V.dot_product(
                            F.col("embedding"), F.col("embedding")
                        ),
                        F.lit(0.0),
                    )
                )
            ),
        ).alias("x_aug"),
        F.concat(
            F.col("query_embedding").cast("array<double>"),
            F.array(F.lit(0.0)),
        ).alias("q_aug"),
    )
    shortlist = (
        aug.select(
            "vec_id",
            "embedding",
            "query_embedding",
            V.l2_distance(F.col("x_aug"), F.col("q_aug")).alias("l2_aug"),
        )
        .orderBy(F.asc("l2_aug"), F.asc("vec_id"))
        .limit(_MIPS_SHORTLIST)
    )
    return (
        shortlist.select(
            "vec_id",
            F.round(
                V.dot_product(F.col("embedding"), F.col("query_embedding")),
                ROUND_DIST,
            ).alias("dot"),
        )
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(K)
    )


# --- eval_classification ----------------------------------------------------

from vector_search_playground_spark.registry import ORACLES as _ORACLES


@query(
    "eval_classification",
    oracle=f"""
    WITH preds AS ({_ORACLES["knn_classify"]}),
    labels AS (SELECT DISTINCT CAST(label AS BIGINT) AS label
               FROM embeddings),
    m AS (
        SELECT l.label,
               (SELECT count(*) FROM preds p
                WHERE p.true_label = l.label
                  AND p.pred_label = l.label) AS tp,
               (SELECT count(*) FROM preds p
                WHERE p.pred_label = l.label
                  AND p.true_label <> l.label) AS fp,
               (SELECT count(*) FROM preds p
                WHERE p.true_label = l.label
                  AND p.pred_label <> l.label) AS fn
        FROM labels l
    )
    SELECT label,
           CAST(tp AS BIGINT) AS tp,
           CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CAST(tp + fn AS BIGINT) AS support,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE floor(CAST(tp AS DOUBLE) / (tp + fp) * 1e6 + 0.5)
                     / 1e6 END AS precision,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE floor(CAST(tp AS DOUBLE) / (tp + fn) * 1e6 + 0.5)
                     / 1e6 END AS recall,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE floor(2.0 * tp / (2 * tp + fp + fn) * 1e6 + 0.5)
                     / 1e6 END AS f1
    FROM m
    """,
)
def eval_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label precision / recall / F1 scorecard over the
    ``knn_classify`` held-out predictions — the evaluation verb that
    turns the classifier into a monitorable metric (the eval_retrieval /
    eval_minhash discipline applied to classification). Every label in
    the table appears (absent-from-predictions labels emit zero rows
    with NULL metrics, deterministically, not missing rows); counts are
    exact integers, ratios half-up floored at 6 dp.

    Shape at 100 TB: the prediction relation is |held-out| rows (already
    bounded by knn_classify's scan-once design); the confusion collapse
    is ONE hash-agg on (true, pred) — a |labels|² relation — joined to
    the |labels| spine broadcast. The oracle replays knn_classify's own
    certified SQL as a CTE, so both layers stay in lockstep by
    construction.
    """
    preds = knn_classify(spark, sf_dir).select("true_label", "pred_label")
    cells = preds.groupBy("true_label", "pred_label").agg(
        F.count(F.lit(1)).alias("n")
    )
    labels = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.col("label").cast("long").alias("label"))
        .distinct()
    )
    tp = cells.where(F.col("true_label") == F.col("pred_label")).select(
        F.col("true_label").cast("long").alias("label"),
        F.col("n").alias("tp"),
    )
    fp = (
        cells.where(F.col("true_label") != F.col("pred_label"))
        .groupBy(F.col("pred_label").cast("long").alias("label"))
        .agg(F.sum("n").alias("fp"))
    )
    fn = (
        cells.where(F.col("true_label") != F.col("pred_label"))
        .groupBy(F.col("true_label").cast("long").alias("label"))
        .agg(F.sum("n").alias("fn"))
    )
    m = (
        labels.join(F.broadcast(tp), "label", "left")
        .join(F.broadcast(fp), "label", "left")
        .join(F.broadcast(fn), "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
        )
    )
    ratio = lambda num, den: F.when(  # noqa: E731
        den == 0, F.lit(None)
    ).otherwise(F.floor(num / den * 1e6 + F.lit(0.5)) / 1e6)
    return m.select(
        "label",
        "tp",
        "fp",
        "fn",
        (F.col("tp") + F.col("fn")).alias("support"),
        ratio(
            F.col("tp").cast("double"), F.col("tp") + F.col("fp")
        ).alias("precision"),
        ratio(
            F.col("tp").cast("double"), F.col("tp") + F.col("fn")
        ).alias("recall"),
        ratio(
            2.0 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")
        ).alias("f1"),
    )
