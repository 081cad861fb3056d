"""Corpus-mining tier — statistical text mining and ingest operators a
tokenizer/embedding pipeline runs over the raw corpus: PMI collocation
extraction, the first BPE merge statistics, hashing-trick featurization,
a raw-bytes (binaryFile) ingest source, and a distributed PCA over the
embedding table.

Reference parity: extends past the reference CLI (`src/main.rs:5,85-96`)
under SURVEY §2's addenda contract — the text→tokens→features steps that
sit between ``tokenize_to_ids`` / ``pack_sequences`` and model training.

All counting queries are exact-integer end to end; the two float outputs
(PMI, PCA loadings) follow the shared half-up floor(x·10^k + 0.5)/10^k
rounding evaluated identically on both engines, and any top-k ORDER BY
on a float orders the ROUNDED value with string tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table

_TOK_CTE = """
    tok AS (
        SELECT doc_id, t.tok, t.pos FROM documents,
        LATERAL (
            SELECT unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
        ) t
        WHERE t.tok IS NOT NULL
    )
"""

# --- collocations_pmi -------------------------------------------------------

_PMI_MIN_PAIR = 5
_PMI_TOP = 20


@query(
    "collocations_pmi",
    oracle=f"""
    WITH {_TOK_CTE},
    bg AS (
        SELECT tok AS w1,
               lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
        FROM tok
    ),
    bgc AS (
        SELECT w1, w2, count(*) AS cbg FROM bg
        WHERE w2 IS NOT NULL GROUP BY w1, w2
    ),
    uni AS (SELECT tok, count(*) AS cu FROM tok GROUP BY tok),
    tot AS (
        SELECT (SELECT sum(cbg) FROM bgc) AS nb,
               (SELECT sum(cu) FROM uni) AS m
    )
    SELECT w1, w2, CAST(cbg AS BIGINT) AS n_pair,
           floor(ln((cbg * 1.0 / tot.nb)
                    / ((u1.cu * 1.0 / tot.m) * (u2.cu * 1.0 / tot.m)))
                 * 1e6 + 0.5) / 1e6 AS pmi
    FROM bgc
    JOIN uni u1 ON bgc.w1 = u1.tok
    JOIN uni u2 ON bgc.w2 = u2.tok
    CROSS JOIN tot
    WHERE cbg >= {_PMI_MIN_PAIR}
    ORDER BY pmi DESC, w1, w2 LIMIT {_PMI_TOP}
    """,
)
def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction by pointwise mutual information — the
    corpus-linguistics 'which word pairs co-occur more than chance'
    verb behind multi-word-expression detection and tokenizer-merge
    seeding: adjacent-bigram counts vs unigram expectations,
    PMI = ln(p(w1,w2) / (p(w1)·p(w2))), minimum pair support {mp},
    top {t} by rounded PMI with (w1, w2) tiebreak.

    Shape at 100 TB: bigrams come from a per-document lead() window
    (documents are bounded, never a global sort); ONE hash-agg each for
    bigram and unigram counts; the support filter cuts the bigram
    relation to heavy hitters BEFORE the two unigram joins; totals are
    two collected scalars (metadata). The ranked result is a global
    top-{t} (TakeOrdered), driver sees {t} rows.
    """.format(mp=_PMI_MIN_PAIR, t=_PMI_TOP)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode_outer(F.split("text", " ")).alias("pos", "tok"),
    ).where(F.col("tok").isNotNull())
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        tok.withColumn("w2", F.lead("tok").over(w))
        .where(F.col("w2").isNotNull())
        .select(F.col("tok").alias("w1"), "w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbg")).cache()
    uni = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cu")).cache()
    try:
        nb = bgc.agg(F.sum("cbg")).first()[0]
        m = uni.agg(F.sum("cu")).first()[0]
        u1 = uni.select(F.col("tok").alias("w1"), F.col("cu").alias("cu1"))
        u2 = uni.select(F.col("tok").alias("w2"), F.col("cu").alias("cu2"))
        pmi = F.log(
            (F.col("cbg") * 1.0 / F.lit(nb))
            / (
                (F.col("cu1") * 1.0 / F.lit(m))
                * (F.col("cu2") * 1.0 / F.lit(m))
            )
        )
        return (
            bgc.where(F.col("cbg") >= _PMI_MIN_PAIR)
            .join(u1, "w1")
            .join(u2, "w2")
            .select(
                "w1",
                "w2",
                F.col("cbg").cast("long").alias("n_pair"),
                (F.floor(pmi * 1e6 + 0.5) / 1e6).alias("pmi"),
            )
            .orderBy(F.desc("pmi"), "w1", "w2")
            .limit(_PMI_TOP)
        )
    finally:
        # top-N output is fully materialized by the driver compare before
        # these caches could be re-scanned; safe to release eagerly
        bgc.unpersist()
        uni.unpersist()


# --- bpe_merge_step ---------------------------------------------------------

_BPE_TOP = 20


@query(
    "bpe_merge_step",
    oracle=f"""
    WITH {_TOK_CTE},
    v AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY tok),
    p AS (
        SELECT substring(v.tok, i.i, 1) AS a,
               substring(v.tok, i.i + 1, 1) AS b,
               v.cnt
        FROM v, LATERAL (
            SELECT unnest(range(1, length(v.tok))) AS i
        ) i
    )
    SELECT a, b, CAST(sum(cnt) AS BIGINT) AS freq
    FROM p GROUP BY a, b
    ORDER BY freq DESC, a, b LIMIT {_BPE_TOP}
    """,
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The statistics pass of ONE byte-pair-encoding merge round — the
    inner loop of tokenizer training (Sennrich 2016): weight every
    adjacent symbol pair by corpus frequency (pair occurrences within a
    word × word count) and rank the merge candidates. Top-{t} pairs by
    frequency with (a, b) tiebreak; a full trainer iterates this with
    the winning pair fused.

    Shape at 100 TB: the corpus collapses to its VOCABULARY (distinct
    token, count) in one hash-agg — the pair enumeration then runs over
    vocab-sized data (a row-local transform/explode, zero shuffles),
    which is the whole trick: char-pair stats over 100 TB of text cost
    one corpus agg plus work proportional to |vocab|. Exact integers
    end to end.
    """.format(t=_BPE_TOP)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.posexplode_outer(F.split("text", " ")).alias("pos", "tok")
    ).where(F.col("tok").isNotNull())
    v = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    pairs = v.where(F.length("tok") >= 2).select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> named_struct("
                "'a', substring(tok, i, 1),"
                " 'b', substring(tok, i + 1, 1)))"
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "a", "b")
        .limit(_BPE_TOP)
    )


# --- feature_hashing --------------------------------------------------------

_FH_DIM = 64
_FH_DOC_MOD = 5


@query(
    "feature_hashing",
    oracle=f"""
    WITH {_TOK_CTE}
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_FH_DIM}
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt
    FROM tok
    WHERE doc_id % {_FH_DOC_MOD} = 0
    GROUP BY doc_id, bucket
    """,
)
def feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger 2009): bag-of-words features
    hashed into a FIXED {d}-dim space — the vocabulary-free
    featurization that makes streaming/online text models possible (no
    vocab build pass, no OOV problem, memory bounded by d forever).
    Sparse long-format output (doc, bucket, count); the shared hash is
    the first 8 hex digits of md5 mod {d}, identical on both engines.

    Shape at 100 TB: tokenize → hash is a pure row-local map (the hash
    IS the feature id — no vocabulary join, which is the point of the
    trick); ONE (doc, bucket) hash-agg bounded by |docs|·{d} emits the
    sparse matrix. The doc_id filter is pushed to the parquet scan.
    """.format(d=_FH_DIM)
    docs = load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % _FH_DOC_MOD == 0
    )
    tok = docs.select(
        "doc_id",
        F.posexplode_outer(F.split("text", " ")).alias("pos", "tok"),
    ).where(F.col("tok").isNotNull())
    bucket = F.pmod(
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long"),
        F.lit(_FH_DIM),
    )
    return (
        tok.groupBy(
            "doc_id", bucket.cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


# --- scan_binaryfile --------------------------------------------------------


@query(
    "scan_binaryfile",
    oracle="""
    SELECT source, CAST(1 AS BIGINT) AS n_files,
           CAST(sum(strlen(text) + 1) AS BIGINT) AS bytes
    FROM documents WHERE text IS NOT NULL
    GROUP BY source
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw-bytes ingest via the ``binaryFile`` source — the front door
    for multimodal corpora (images/audio land as whole files, not
    rows). The documents table is materialized once per fixture
    fingerprint as source-partitioned raw text files; the query then
    scans them as OPAQUE BINARY (path, length, content) and aggregates
    per source dir. The oracle recomputes the exact byte accounting
    (Σ utf8len(text)+1 newline per row, one file per source — the
    writer hash-partitions by source) from the parquet view: the
    binary reader must report sizes byte-exactly.

    Shape at 100 TB: binaryFile lists files in parallel and never
    splits them (whole-file semantics are the contract for opaque
    blobs); the metadata agg reads (path, length) only — column
    pruning means file CONTENT is never materialized for this plan.
    Downstream decode (functions/multimodal) consumes the content
    column batch-wise.
    """
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("text").isNotNull()
    )
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(SCRATCH, f"documents_rawtext_{tag}_{fp}")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (
            docs.select("source", "text")
            .repartition("source")
            .write.mode("overwrite")
            .partitionBy("source")
            .format("text")
            .save(base)
        )
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(base)
    )
    # the writer escapes partition values Hive-style (%XX for '/', ':',
    # space, '%', ...); url_decode inverts that — EXCEPT it also maps a
    # raw '+' to space (form-encoding rule the writer never uses), so
    # protect literal '+' first. A literal '%' in the value arrives as
    # %25 and decodes back exactly.
    raw = F.regexp_extract("path", r"source=([^/]+)", 1)
    decoded = F.url_decode(F.replace(raw, F.lit("+"), F.lit("%2B")))
    return (
        files.select(
            decoded.alias("source"),
            "length",
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("length").cast("long").alias("bytes"),
        )
    )


# --- scan_avro ---------------------------------------------------------------


@query(
    "scan_avro",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def scan_avro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro ingest via a from-scratch Object Container File codec
    (sources/avro.py) — the one mainstream batch format this container
    cannot serve natively (the spark-avro data-source jar is not in the
    distribution and is unfetchable offline; only the avro *core* jars
    ship). The documents table is written ONCE per fixture fingerprint
    as deflate-codec .avro files by a distributed mapInPandas sink, then
    scanned back through binaryFile + a schema-driven block decoder. The
    oracle is the original relation, so the certificate covers the full
    write→zigzag/varint-encode→deflate→decode round trip value-for-value
    (tests/test_formats.py additionally cross-checks the bytes against
    the JVM's own org.apache.avro DataFileReader on Spark's classpath).

    Shape at 100 TB: binaryFile parallelizes whole files (the natural
    Avro unit — blocks are delimited by each file's own sync marker) and
    the decoder yields one Arrow batch per Avro BLOCK, so executor
    memory is bounded by block size, never file size.
    """
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.sources.avro import (
        scan_avro_dataset,
        write_avro_dataset,
    )

    fields = [
        ("doc_id", "long"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "long"),
    ]
    result_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(SCRATCH, f"documents_avro_{tag}_{fp}")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        write_avro_dataset(docs, base, "document", fields)
    return scan_avro_dataset(spark, base, result_schema)


@query(
    "scan_avro_split",
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def scan_avro_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro ingest through the BYTE-RANGE split path
    (sources/avro.py::scan_avro_dataset_split): the documents table is
    written as ONE deflate OCF (the single-huge-file layout the plain
    ``scan_avro`` path honestly documents as its boundary — binaryFile
    serializes such a file through one 2 GB-capped task), then scanned
    back with split_bytes sized to cut the file into several ranges;
    each task seeks into its range, resynchronizes on the 16-byte sync
    marker, and decodes exactly the blocks whose first byte it owns —
    the Hadoop AvroInputFormat split discipline, implemented in the
    Python decode task. The oracle is the original relation, so the
    certificate is value-for-value: every block decoded exactly once
    across range boundaries, no loss where a block straddles a cut.

    Shape at 100 TB: driver work is one small header read per file (a
    parquet-footer-scale metadata pass); the (file, start, end) range
    rows fan out like parquet row-groups, so one multi-GB OCF
    parallelizes across the cluster; task memory is one block.
    """
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.sources.avro import (
        scan_avro_dataset_split,
        write_avro_dataset,
    )

    fields = [
        ("doc_id", "long"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "long"),
    ]
    result_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(SCRATCH, f"documents_avro1_{tag}_{fp}")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        docs = load_table(spark, sf_dir, "documents")
        write_avro_dataset(docs, base, "document", fields, n_files=1)
    fsize = max(
        os.path.getsize(os.path.join(base, f))
        for f in os.listdir(base)
        if f.endswith(".avro")
    )
    # cut the one file into ~8 ranges so the split machinery (resync,
    # ownership, boundary blocks) actually exercises at fixture scale
    return scan_avro_dataset_split(
        spark, base, result_schema, split_bytes=max(1, fsize // 8 + 1)
    )


# --- embedding_pca ----------------------------------------------------------

_PCA_ROUND = 6


@query("embedding_pca")  # rows-only: float-sum order varies; property-tested
def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table — the spectral
    summary behind whitening, anisotropy diagnostics ('is the embedding
    space collapsing?'), and PCA-based dimensionality reduction before
    coarse quantization (the IVF-PQ preprocessing step).

    Distributed shape (the part that must scale): the d×d Gram matrix
    Σ xxᵀ is computed as PER-PARTITION PARTIALS in one ``mapInPandas``
    pass (each worker emits its d² partial, a few KB), reduced by one
    d²-row hash-agg — the classic tree-aggregation pattern; the corpus
    is read ONCE and never shuffled. The eigensolve then runs on the
    driver over d² = {dd} numbers (model metadata, like the KMeans
    centroids in plans/ivf). Loadings are sign-fixed (largest-|loading|
    coordinate positive) and floor-rounded; ``evr`` is the explained
    variance ratio λ₁/trace.

    No SQL oracle: the Gram reduction's float summation order is
    engine-dependent; tests/test_corpusmine.py pins the result against
    an exact in-memory numpy PCA at sf0.001 instead.
    """.format(dd="4096")
    import math

    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    d = len(emb.first()["embedding"])

    def gram_partials(batches):
        g = np.zeros((d, d), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            g += x.T @ x
            seen = True
        if seen:
            flat = g.ravel()
            yield pd.DataFrame(
                {"idx": np.arange(d * d, dtype=np.int64), "v": flat}
            )

    g_rows = (
        emb.mapInPandas(gram_partials, "idx long, v double")
        .groupBy("idx")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    g = np.zeros(d * d, dtype=np.float64)
    for r in g_rows:
        g[r["idx"]] = r["v"]
    g = g.reshape(d, d)
    vals, vecs = np.linalg.eigh(g)
    top = vecs[:, -1]
    top = top * np.sign(top[int(np.argmax(np.abs(top)))])
    evr = float(vals[-1] / vals.sum())

    def _r(x: float) -> float:
        return math.floor(x * 10**_PCA_ROUND + 0.5) / 10**_PCA_ROUND

    rows = [(i, _r(float(top[i])), _r(evr)) for i in range(d)]
    return spark.createDataFrame(
        rows, "dim long, loading double, evr double"
    )


# --- bpe_train --------------------------------------------------------------

_BPE_ROUNDS = 10


@query("bpe_train")  # rows-only: iterative merges are not one-shot SQL;
# pinned against a pure-Python Sennrich-style reference in tests
def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE tokenizer TRAINING (Sennrich 2016) — {r} full merge
    rounds, not just the first round's statistics (``bpe_merge_step``):
    each round scores every adjacent symbol pair by corpus frequency,
    fuses the winner (ties: lexicographic) left-to-right non-overlapping
    in every vocabulary word, and repeats on the merged symbols. Output
    is the learned merge table (rank, a, b, freq) — the artifact a BPE
    tokenizer ships.

    Shape at 100 TB: the corpus collapses ONCE to its (token, count)
    vocabulary; all {r} rounds then run over the VOCAB-sized relation —
    pair scoring is one hash-agg + TakeOrdered(1) per round, and the
    merge application is a row-local codegen'd ``aggregate`` HOF fold
    (carrying a just-merged flag for non-overlap semantics) — no Python
    in the loop, no shuffle of anything corpus-sized. Each round
    materializes via localCheckpoint so plan depth stays O(1), the same
    iterative discipline as pagerank_topn.

    r14 optimization: the per-round checkpoints are LAZY
    (``eager=False``) — the next round's pair-scoring collect is the
    action that materializes them, so each round runs ONE Spark job
    instead of two (checkpoint job + collect job). A superseded
    checkpoint is unpersisted only after the collect that materialized
    its successor (its blocks are the successor's lineage — a lazy
    checkpoint cannot recompute an unpersisted parent), and the final
    round's never-scored checkpoint is never materialized at all.
    """.format(r=_BPE_ROUNDS)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.posexplode_outer(F.split("text", " ")).alias("pos", "tok")
    ).where(F.col("tok").isNotNull())
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.expr(
                "transform(sequence(1, length(tok)),"
                " i -> substring(tok, i, 1))"
            ).alias("syms"),
            "cnt",
        )
        .localCheckpoint(eager=False)
    )
    merges = []
    retired = None  # superseded checkpoint still feeding `vocab`'s lineage
    for rank in range(1, _BPE_ROUNDS + 1):
        top = (
            vocab.where(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1),"
                        " i -> named_struct("
                        "'a', element_at(syms, i),"
                        " 'b', element_at(syms, i + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), "a", "b")
            .limit(1)
            .collect()
        )
        # `vocab` is materialized now; its parent checkpoint is no longer
        # anyone's lineage and can be released
        if retired is not None:
            retired.unpersist()
            retired = None
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], top[0]["freq"]
        merges.append((rank, a, b, int(freq)))
        # left-to-right non-overlapping fuse of (a, b) -> a||b: the fold
        # carries (acc, just_merged) so a symbol created this round never
        # re-merges with the following input symbol ('aaa' -> [aa, a])
        retired = vocab
        vocab = vocab.select(
            F.expr(
                "aggregate(syms,"
                " struct(cast(array() as array<string>) as acc,"
                "        false as jm),"
                " (st, s) -> if(NOT st.jm AND size(st.acc) > 0"
                f"   AND element_at(st.acc, -1) = {a!r} AND s = {b!r},"
                "   struct(concat(slice(st.acc, 1, size(st.acc) - 1),"
                f"                array({a + b!r})), true),"
                "   struct(concat(st.acc, array(s)), false)),"
                " st -> st.acc)"
            ).alias("syms"),
            "cnt",
        ).localCheckpoint(eager=False)
    vocab.unpersist()
    if retired is not None:
        retired.unpersist()
    return spark.createDataFrame(
        merges, "merge_rank long, a string, b string, freq long"
    )


# --- zipf_fit ---------------------------------------------------------------

_ZIPF_TOP = 100


@query(
    "zipf_fit",
    oracle=f"""
    WITH {_TOK_CTE},
    freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    top AS (
        SELECT tok, c,
               row_number() OVER (ORDER BY c DESC, tok ASC) AS rk
        FROM freq
        ORDER BY c DESC, tok ASC LIMIT {_ZIPF_TOP}
    )
    SELECT CAST(count(*) AS BIGINT) AS n,
           ROUND(regr_slope(ln(CAST(c AS DOUBLE)),
                            ln(CAST(rk AS DOUBLE))), 6) AS slope,
           ROUND(regr_intercept(ln(CAST(c AS DOUBLE)),
                                ln(CAST(rk AS DOUBLE))), 6) AS intercept,
           ROUND(regr_r2(ln(CAST(c AS DOUBLE)),
                         ln(CAST(rk AS DOUBLE))), 6) AS r2
    FROM top
    """,
)
def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: log-log OLS of token
    frequency against frequency rank for the top {k} tokens — the
    classic corpus-health diagnostic (a natural corpus shows slope near
    −1; template/boilerplate floods flatten it, OCR noise steepens the
    tail). Regression formulas mirror DuckDB's regr_* (covar_pop /
    var_pop), values rounded 6 dp — the ``trend_fit`` float discipline.

    Shape at 100 TB: ONE token hash-agg (the tfidf/vocab shuffle) →
    TakeOrderedAndProject to the top-{k} metadata relation; the rank
    window and the regression run over {k} rows. Nothing corpus-sized
    past the first agg.
    """.format(k=_ZIPF_TOP)
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(_ZIPF_TOP)
    )
    w = Window.orderBy(F.desc("c"), F.asc("tok"))  # 100-row metadata
    pts = freq.withColumn("rk", F.row_number().over(w)).select(
        F.log(F.col("rk").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.round(
            (F.col("mxy") - F.col("mx") * F.col("my"))
            / (F.col("mxx") - F.col("mx") * F.col("mx")),
            6,
        ).alias("slope"),
        F.round(
            F.col("my")
            - (F.col("mxy") - F.col("mx") * F.col("my"))
            / (F.col("mxx") - F.col("mx") * F.col("mx"))
            * F.col("mx"),
            6,
        ).alias("intercept"),
        F.round(
            F.pow(F.col("mxy") - F.col("mx") * F.col("my"), 2)
            / (
                (F.col("mxx") - F.col("mx") * F.col("mx"))
                * (F.col("myy") - F.col("my") * F.col("my"))
            ),
            6,
        ).alias("r2"),
    )


# --- vocab_growth -----------------------------------------------------------


@query(
    "vocab_growth",
    oracle=f"""
    WITH {_TOK_CTE},
    nd AS (SELECT count(*) AS n FROM documents),
    first_seen AS (
        SELECT tok, min(doc_id) AS first_doc FROM tok GROUP BY tok
    ),
    newt AS (
        SELECT least(first_doc * 10 // (SELECT n FROM nd), 9) AS decile,
               count(*) AS new_types
        FROM first_seen GROUP BY 1
    ),
    toks AS (
        SELECT least(doc_id * 10 // (SELECT n FROM nd), 9) AS decile,
               count(*) AS n_tokens
        FROM tok GROUP BY 1
    )
    SELECT CAST(d.decile AS BIGINT) AS decile,
           CAST(coalesce(new_types, 0) AS BIGINT) AS new_types,
           CAST(sum(coalesce(new_types, 0)) OVER (ORDER BY d.decile)
                AS BIGINT) AS cum_types,
           CAST(sum(coalesce(n_tokens, 0)) OVER (ORDER BY d.decile)
                AS BIGINT) AS cum_tokens
    FROM (SELECT unnest(range(10)) AS decile) d
    LEFT JOIN newt USING (decile)
    LEFT JOIN toks USING (decile)
    """,
)
def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct-token
    count (and cumulative token count) after each tenth of the corpus in
    doc_id order — the dataset-scaling diagnostic that tells you whether
    more data still buys vocabulary (sublinear growth = healthy natural
    text; linear growth = id/hash pollution).

    Shape at 100 TB: 'first time a token appears' is min(doc_id) per
    token — ONE hash-agg, the ``running_distinct`` first-seen discipline
    (never a count-distinct-over-window whale). Decile bucketing is
    row-local integer math on the dense doc_id space; the cumulative
    window runs over the 10-row decile spine.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok").isNotNull())
    dec = F.least(
        F.expr(f"doc_id * 10 div {n_docs}"), F.lit(9)
    ).cast("long")
    newt = (
        tok.groupBy("tok")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy(
            F.least(
                F.expr(f"first_doc * 10 div {n_docs}"), F.lit(9)
            ).cast("long").alias("decile")
        )
        .agg(F.count(F.lit(1)).alias("new_types"))
    )
    toks = tok.groupBy(dec.alias("decile")).agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    spine = spark.range(10).select(F.col("id").alias("decile"))
    w = Window.orderBy("decile")  # 10-row spine
    return (
        spine.join(F.broadcast(newt), "decile", "left")
        .join(F.broadcast(toks), "decile", "left")
        .select(
            "decile",
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
            F.sum(F.coalesce("new_types", F.lit(0)))
            .over(w)
            .alias("cum_types"),
            F.sum(F.coalesce("n_tokens", F.lit(0)))
            .over(w)
            .alias("cum_tokens"),
        )
    )


# --- ngram_stats ------------------------------------------------------------

_NGRAM_MAX_R = 5


@query(
    "ngram_stats",
    oracle=f"""
    WITH {_TOK_CTE},
    grams AS (
        SELECT 1 AS n, tok AS g FROM tok
        UNION ALL
        SELECT 2, tok || ' ' || lead(tok) OVER w2
        FROM tok WINDOW w2 AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(tok) OVER w2 IS NOT NULL
        UNION ALL
        SELECT 3, tok || ' ' || lead(tok) OVER w3 || ' '
                  || lead(tok, 2) OVER w3
        FROM tok WINDOW w3 AS (PARTITION BY doc_id ORDER BY pos)
        QUALIFY lead(tok, 2) OVER w3 IS NOT NULL
    ),
    gc AS (SELECT n, g, count(*) AS c FROM grams GROUP BY n, g),
    coc AS (
        SELECT n, least(c, {_NGRAM_MAX_R + 1}) AS r, count(*) AS n_r
        FROM gc GROUP BY 1, 2
    ),
    tot AS (
        SELECT n, sum(c) AS total_ngrams, count(*) AS distinct_ngrams
        FROM gc GROUP BY n
    )
    SELECT CAST(s.n AS BIGINT) AS n, CAST(s.r AS BIGINT) AS r,
           CAST(coalesce(coc.n_r, 0) AS BIGINT) AS n_r,
           CAST(tot.total_ngrams AS BIGINT) AS total_ngrams,
           CAST(tot.distinct_ngrams AS BIGINT) AS distinct_ngrams
    FROM (
        SELECT nn.n, rr.r
        FROM (SELECT unnest(range(1, 4)) AS n) nn
        CROSS JOIN (SELECT unnest(range(1, {_NGRAM_MAX_R + 2})) AS r) rr
    ) s
    LEFT JOIN coc ON coc.n = s.n AND coc.r = s.r
    JOIN tot ON tot.n = s.n
    """,
)
def ngram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram frequency-of-frequency tables (n = 1..3): for each order,
    the count N_r of distinct n-grams occurring exactly r times
    (r capped at {rmax}+, the Good–Turing smoothing statistics every
    count-based LM needs), plus total and distinct n-gram counts — all
    exact integers on a generated (n, r) spine so absent cells are
    deterministic zeros, never missing rows.

    Shape at 100 TB: n-grams come from lead() windows partitioned by
    doc_id (one corpus shuffle, shared by all three orders via the
    union) → gram hash-agg → a second agg over the VOCAB-sized count
    relation; the spine join is broadcast metadata.
    """.format(rmax=_NGRAM_MAX_R)
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    ).where(F.col("tok").isNotNull())
    w = Window.partitionBy("doc_id").orderBy("pos")
    with_leads = tok.select(
        "tok",
        F.lead("tok", 1).over(w).alias("t1"),
        F.lead("tok", 2).over(w).alias("t2"),
    )
    # all three orders fan out of ONE window pass (a union of three
    # branches would re-shuffle the corpus per branch): each row emits
    # its unigram plus conditional bi/trigram structs, then one explode
    grams = with_leads.select(
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.lit(1).alias("n"), F.col("tok").alias("g")
                    )
                ),
                F.when(
                    F.col("t1").isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(2).alias("n"),
                            F.concat_ws(" ", "tok", "t1").alias("g"),
                        )
                    ),
                ).otherwise(F.expr("array()").cast("array<struct<n:int,g:string>>")),
                F.when(
                    F.col("t2").isNotNull(),
                    F.array(
                        F.struct(
                            F.lit(3).alias("n"),
                            F.concat_ws(" ", "tok", "t1", "t2").alias("g"),
                        )
                    ),
                ).otherwise(F.expr("array()").cast("array<struct<n:int,g:string>>")),
            )
        ).alias("x")
    ).select(F.col("x.n").alias("n"), F.col("x.g").alias("g"))
    # coc and tot both consume gc: materialize the vocab-sized count
    # relation once so the corpus window/explode never runs twice
    gc = (
        grams.groupBy("n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    coc = gc.groupBy(
        "n",
        F.least(F.col("c"), F.lit(_NGRAM_MAX_R + 1)).alias("r"),
    ).agg(F.count(F.lit(1)).alias("n_r"))
    tot = gc.groupBy("n").agg(
        F.sum("c").alias("total_ngrams"),
        F.count(F.lit(1)).alias("distinct_ngrams"),
    )
    spine = (
        spark.range(1, 4)
        .select(F.col("id").alias("n"))
        .crossJoin(
            spark.range(1, _NGRAM_MAX_R + 2).select(F.col("id").alias("r"))
        )
    )
    return (
        spine.join(F.broadcast(coc), ["n", "r"], "left")
        .join(F.broadcast(tot), "n")
        .select(
            "n",
            "r",
            F.coalesce("n_r", F.lit(0)).alias("n_r"),
            "total_ngrams",
            "distinct_ngrams",
        )
    )


# --- tokenizer_fertility ----------------------------------------------------


@query(
    "tokenizer_fertility",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           floor(CAST(sum(len(string_split(text, ' '))) AS DOUBLE)
                 / count(*) * 1e6 + 0.5) / 1e6 AS tokens_per_doc,
           floor(CAST(sum(length(text)) AS DOUBLE)
                 / sum(len(string_split(text, ' '))) * 1e6 + 0.5) / 1e6
               AS chars_per_token
    FROM documents
    GROUP BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-fertility profile per language: docs, tokens, chars,
    tokens/doc and chars/token — the multilingual-budget numbers that
    decide vocabulary allocation (a language whose chars/token runs hot
    is being over-fragmented and pays more sequence length per content).
    Counts are exact integers; the two ratios follow the shared half-up
    floor(x·1e6 + 0.5)/1e6 on both engines.

    Shape at 100 TB: ONE hash-agg to |langs| rows; token counts are
    row-local size(split()) — no explode, the cheapest possible pass.
    """
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_tokens",
        "n_chars",
        (
            F.floor(
                F.col("n_tokens").cast("double")
                / F.col("n_docs") * 1e6 + F.lit(0.5)
            ) / 1e6
        ).alias("tokens_per_doc"),
        (
            F.floor(
                F.col("n_chars").cast("double")
                / F.col("n_tokens") * 1e6 + F.lit(0.5)
            ) / 1e6
        ).alias("chars_per_token"),
    )


# --- readability_score ------------------------------------------------------

_SYL_RE = "[aeiouyAEIOUY]+"


@query(
    "readability_score",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               greatest(len(string_split(text, ' ')), 1) AS n_words,
               greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
               greatest(len(regexp_extract_all(text, '{_SYL_RE}')), 1)
                   AS n_syllables
        FROM documents
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           floor((0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                  + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                  - 15.59) * 1e4 + 0.5) / 1e4 AS fk_grade,
           floor((206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                  - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words))
                 * 1e4 + 0.5) / 1e4 AS flesch_ease
    FROM base
    """,
)
def readability_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid grade level and Flesch reading-ease per document —
    the readability member of the quality-scoring family (text_quality /
    quality_gopher), using the standard vowel-group syllable heuristic.
    A corpus-curation filter keys on these directly (C4 kept 3 ≤ grade;
    textbook-style selection keys on ease bands).

    Shape at 100 TB: entirely row-local (two regexp counts and a split
    size per row — no explode, no shuffle at all); the floats are fixed
    rational functions of three per-row integers under the shared
    half-up floor at 4 dp, computed identically on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.greatest(F.size(F.split("text", " ")), F.lit(1)).alias("n_words"),
        F.greatest(
            F.regexp_count("text", F.lit("[.!?]+")), F.lit(1)
        ).alias("n_sentences"),
        F.greatest(
            F.regexp_count("text", F.lit(_SYL_RE)), F.lit(1)
        ).alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return base.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_sentences").cast("long").alias("n_sentences"),
        F.col("n_syllables").cast("long").alias("n_syllables"),
        (F.floor((0.39 * wps + 11.8 * spw - 15.59) * 1e4 + F.lit(0.5)) / 1e4)
        .alias("fk_grade"),
        (
            F.floor(
                (206.835 - 1.015 * wps - 84.6 * spw) * 1e4 + F.lit(0.5)
            ) / 1e4
        ).alias("flesch_ease"),
    )


# --- scan_xml ---------------------------------------------------------------


@query(
    "scan_xml",
    oracle="SELECT doc_id, lang, text FROM documents",
)
def scan_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingest through Spark 4's built-in ``xml`` source (the
    spark-xml package merged into core) — the enterprise-interchange
    front door next to scan_csv/scan_jsonl/scan_orc: the documents
    table is written ONCE per fixture fingerprint as row-tagged XML by
    the same source's writer, then read back with an explicit schema.
    The oracle is the original relation, so the certificate covers the
    full write→escape→parse→read round trip (entity escaping, row
    tagging, type restoration) value-for-value.

    Shape at 100 TB: the XML reader splits by row tag across files and
    streams records — the plan is a plain FileScan feeding the hash
    compare; explicit schema avoids the inference pass a 100 TB corpus
    could not afford (schema inference reads everything twice).
    """
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(SCRATCH, f"documents_xml_{tag}_{fp}")
    if not os.path.exists(os.path.join(base, "_SUCCESS")):
        (
            docs.repartition(4)
            .write.mode("overwrite")
            .format("xml")
            .option("rowTag", "doc")
            .option("rootTag", "docs")
            .save(base)
        )
    return (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema("doc_id long, lang string, text string")
        .load(base)
    )
