"""Training-data preparation tier: the operators a 100 TB LLM corpus
pipeline runs between raw ingest and tokenized shards.

The reference embeds and searches documents (`/root/reference/src/main.rs:
85-96`); a production corpus additionally needs sessionization, PII
scrubbing, benchmark decontamination, retrieval scoring, CDC upserts,
reshaping, skew-safe joins, anomaly scoring, and curriculum sharding.
Every query here is oracle-backed (exact SQL semantics on both engines).

Scale discipline per query:
- ``sessionize_batch`` — one shuffle on user_id; both the gap window and
  the session aggregate reuse that partitioning (no second shuffle key).
- ``pii_redact`` — pure per-row regexp in one codegen stage; no shuffle.
- ``decontaminate`` — the benchmark suite is tiny by construction, so its
  distinct shingles broadcast; the corpus side streams map-side. This is
  the canonical asymmetric semi-join: never shuffle the 100 TB side.
- ``bm25_score`` — explode → one hash-agg shuffle on (doc_id, term);
  document frequencies and corpus stats are metadata-sized broadcasts.
- ``cdc_upsert`` — latest-wins merge = one shuffle on the key + a
  per-key window; the Delta/Iceberg MERGE INTO pattern expressed on
  plain parquet.
- ``unpivot_long`` — wide→long is a zero-shuffle projection (Spark's
  ``unpivot`` expands rows inside the scan stage).
- ``join_skew_salted`` — replicates the small build side S ways and
  splits each hot probe key across S tasks; result is identical to the
  plain join, which is exactly what the oracle checks.
- ``anomaly_zscore`` — per-group moments via one hash-agg, broadcast
  back; no window over the raw stream.
- ``curriculum_shards`` — global rank without a global window via the
  bucketed two-pass ``dense_ids`` operator (operators/ids.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import ROUND_DIST, ROUND_MONEY, query
from vector_search_playground_spark.sources import load_table

# --- sessionize_batch ------------------------------------------------------

SESSION_GAP_US = 360 * 60 * 1_000_000  # 6 h — median inter-event gap per
# user in the fixture is ~7 h, so sessions are non-trivially multi-event


@query(
    "sessionize_batch",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
    ),
    g AS (
        SELECT user_id, event_id, ts_us,
               CASE WHEN lag(ts_us) OVER w IS NULL
                         OR ts_us - lag(ts_us) OVER w > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS brk
        FROM o
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
    ),
    s AS (
        SELECT user_id, ts_us,
               CAST(sum(brk) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS session_seq
        FROM g
    )
    SELECT user_id, session_seq,
           count(*) AS n_events,
           min(ts_us) AS start_us,
           max(ts_us) AS end_us
    FROM s
    GROUP BY user_id, session_seq
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts after a >6 h silence.

    The lag window, the cumulative session counter, and the final
    aggregate all key on ``user_id`` — Catalyst reuses one hash
    partitioning for all three, so the whole query is a single shuffle
    no matter the corpus size. All outputs are integers (epoch-µs),
    so the hash comparison is float-free.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts_us"
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    sess = ev.withColumn(
        "brk", F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
    ).withColumn(
        "session_seq",
        F.sum("brk")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


# --- pii_redact ------------------------------------------------------------

# Both patterns avoid alternation and lookaround so Java's backtracking
# regex and DuckDB's RE2 pick the identical (greedy, leftmost) match.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


@query(
    "pii_redact",
    oracle=f"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com call +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count and mask emails/phones in one projection pass.

    The fixture text carries no PII, so a deterministic contact line is
    appended on BOTH engines before redaction — the redactor then has
    real matches to find. Everything is per-row regexp inside a single
    whole-stage-codegen projection: zero shuffles, trivially linear at
    100 TB, and the only operator state is the compiled automaton.
    """
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", aug.alias("t"))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("t", F.lit(PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.regexp_replace(
            F.regexp_replace("t", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("redacted"),
    )


# --- decontaminate ---------------------------------------------------------


@query(
    "decontaminate",
    oracle="""
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
    SELECT a.doc_id AS doc_id, count(*) AS n_shared
    FROM (SELECT doc_id, s FROM sh WHERE doc_id % 20 <> 0) a
    JOIN (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0) b USING (s)
    GROUP BY a.doc_id
    """,
)
def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any token
    trigram with the held-out benchmark suite (docs with id % 20 == 0).

    The scale shape is the whole point: the benchmark suite is small and
    fixed (eval sets are KBs, the corpus is TBs), so its distinct
    shingles BROADCAST and the corpus side is filtered map-side — the
    100 TB relation is never shuffled. Shingling reuses the dedup
    kernel (operators/dedup.py shingle_sets), so one tokenizer
    definition serves dedup and decontamination.
    """
    from vector_search_playground_spark.operators.dedup import shingle_sets

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def shingled(pred):
        # Filter BEFORE shingling: the modulo predicate reaches the
        # parquet scan (PushedFilters can't take a modulo, but column
        # pruning + an early Filter before the expensive HOF projection
        # still apply), and each branch shingles only its own slice —
        # a shared post-shingle DataFrame would re-shingle the full
        # corpus once per consumer.
        return shingle_sets(docs.where(pred)).select(
            "doc_id", F.explode_outer("shingles").alias("s")
        ).where(F.col("s").isNotNull())  # null-doc guard

    bench = shingled(F.col("doc_id") % 20 == 0).select("s").distinct()
    train = shingled(F.col("doc_id") % 20 != 0)
    return (
        train.join(F.broadcast(bench), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# --- bm25_score ------------------------------------------------------------

BM25_TERMS = ("join", "hash", "scan")
BM25_K1 = 1.2
BM25_B = 0.75


@query(
    "bm25_score",
    oracle=f"""
    WITH tok AS (
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
    )
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
    """,
)
def bm25_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document to a fixed query term set —
    the retrieval-side sibling of ``tfidf_topterms``.

    One explode→hash-agg shuffle keyed on (doc_id, term) builds term
    frequencies; document frequencies (|terms| rows) and corpus stats
    (1 row) are broadcast. Scoring is then a per-row expression. At
    100 TB nothing here grows beyond the tf relation, which is bounded
    by |corpus| × |query terms|.
    """
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


# --- cdc_upsert ------------------------------------------------------------


@query(
    "cdc_upsert",
    oracle="""
    WITH base AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice, 1 AS version
        FROM orders
    ),
    upd AS (
        SELECT o_orderkey, 'U' AS o_orderstatus,
               o_totalprice + 100 AS o_totalprice, 2 AS version
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    merged AS (
        SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                     ORDER BY version DESC) AS rn
        FROM (SELECT * FROM base UNION ALL SELECT * FROM upd)
    )
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           CAST(version AS INT) AS version
    FROM merged WHERE rn = 1
    """,
)
def cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins CDC upsert (the MERGE INTO pattern on plain parquet):
    a change batch (10% of keys, bumped price, status 'U') is merged
    into the base table; highest version per key survives.

    One shuffle on the merge key feeds a per-key window — the same plan
    a Delta/Iceberg MERGE compiles to for the copy-on-write case. The
    price is deliberately NOT re-rounded: ``+ 100`` is an exact binary
    op on the stored double, so both engines emit bit-identical values
    (re-rounding at 2 dp would instead expose the engines' different
    decimal-tie rules on already-2 dp data).
    """
    orders = load_table(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", F.lit(1).alias("version")
    )
    upd = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") + 100).alias("o_totalprice"),
        F.lit(2).alias("version"),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("version"))
    return (
        base.unionByName(upd)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "version")
    )


# --- unpivot_long ----------------------------------------------------------

UNPIVOT_METRICS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@query(
    "unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS val FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape of the four lineitem measures (melt).

    ``DataFrame.unpivot`` expands rows inside the scan's projection —
    no shuffle, no UDF; the long form feeds per-metric aggregation or
    ML feature pipelines. Values pass through untouched (bit-identical
    doubles on both engines), so no rounding is needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        list(UNPIVOT_METRICS),
        "metric",
        "val",
    )


# --- join_skew_salted ------------------------------------------------------

SALT_BUCKETS = 8


@query(
    "join_skew_salted",
    oracle=f"""
    SELECT s.s_nationkey,
           count(*) AS n_items,
           ROUND(SUM(l.l_extendedprice), {ROUND_MONEY}) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact⋈dim join via salting: the dim side is replicated
    S× (one copy per salt), the fact side deterministically picks a salt,
    and the join key becomes (suppkey, salt) — a single hot supplier's
    rows now spread across S tasks instead of one straggler.

    The oracle is the PLAIN join: salting must be a pure physical
    rewrite with zero semantic effect, and the hash check proves it.
    Here the dim also broadcasts (it is tiny), which already avoids the
    shuffle; the salt plumbing is exercised so the same query shape
    survives when the dim is too big to broadcast and AQE's skew
    handling is unavailable (e.g. bucketed sort-merge joins).
    """
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey"), F.lit(SALT_BUCKETS)).cast("int")
    )
    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    salts = spark.range(SALT_BUCKETS).select(F.col("id").cast("int").alias("salt"))
    sup_rep = sup.crossJoin(salts)
    j = li.join(
        F.broadcast(sup_rep),
        (li.l_suppkey == sup_rep.s_suppkey) & (li.salt == sup_rep.salt),
    )
    return j.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), ROUND_MONEY).alias("revenue"),
    )


# --- anomaly_zscore --------------------------------------------------------


@query(
    "anomaly_zscore",
    oracle=f"""
    WITH stats AS (
        SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - s.mu) / s.sigma, {ROUND_DIST}) AS z
    FROM events e JOIN stats s USING (event_type)
    """,
)
def anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score of every event's value — the streaming-adjacent
    anomaly primitive, computed the scale-correct way: one hash-agg for
    the per-group moments (|event types| rows), broadcast back onto the
    stream. No window over the raw events, so the fact side is read
    once and never shuffled (the agg's shuffle moves only partial
    moments). Thresholding is the caller's policy; emitting all scores
    keeps the oracle free of float-boundary membership flips.
    """
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    return ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        F.round((F.col("value") - F.col("mu")) / F.col("sigma"), ROUND_DIST).alias(
            "z"
        ),
    )


# --- curriculum_shards -----------------------------------------------------

CURRICULUM_SHARDS = 10


@query(
    "curriculum_shards",
    oracle=f"""
    SELECT doc_id, n_chars,
           CAST(((row_number() OVER (ORDER BY n_chars * 100000 + doc_id) - 1)
                 * {CURRICULUM_SHARDS})
                // (SELECT count(*) FROM documents) AS BIGINT) AS shard
    FROM documents
    """,
)
def curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum sharding: order the corpus by a difficulty proxy
    (document length, doc_id tiebreak) and cut it into equal rank-range
    shards — shard 0 trains first.

    The global rank does NOT use a global window (single-partition
    collapse at scale); it reuses the bucketed two-pass ``dense_ids``
    operator (operators/ids.py): quantile boundaries → per-bucket
    row_number + offset, so the sort fans out across buckets. The
    oracle states the same rank with a plain window — equality proves
    the distributed rank is exact, and integer arithmetic end-to-end
    makes the hash float-free.
    """
    from vector_search_playground_spark.operators.ids import dense_ids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    n = docs.count()
    keyed = docs.withColumn(
        "__ok", F.col("n_chars") * 100000 + F.col("doc_id")
    )
    ranked = dense_ids(keyed, "__ok", "rid")
    return ranked.select(
        "doc_id",
        "n_chars",
        F.expr(f"(rid * {CURRICULUM_SHARDS}) div {n}").alias("shard"),
    )


# --- impute_missing ---------------------------------------------------------

_IMPUTE_MOD = 7  # event_id % MOD == 0 rows are the synthetic missing set


@query(
    "impute_missing",
    oracle=f"""
    WITH e AS (
        SELECT event_type, value,
               event_id % {_IMPUTE_MOD} = 0 AS miss
        FROM events
    ),
    med AS (
        SELECT event_type,
               quantile_cont(value, 0.5) FILTER (WHERE NOT miss) AS med
        FROM e GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(*) FILTER (WHERE e.miss) AS BIGINT) AS n_missing,
           floor(max(med.med) * 1e6 + 0.5) / 1e6 AS median_micro,
           CAST(sum(CASE WHEN e.miss
                         THEN floor(med.med * 100 + 0.5)
                         ELSE floor(e.value * 100 + 0.5) END) AS BIGINT)
               AS total_cents_imputed
    FROM e JOIN med USING (event_type)
    GROUP BY e.event_type
    """,
)
def impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-median imputation — the feature-cleaning verb every
    training pipeline runs before normalization: rows in the synthetic
    missing set (event_id ≡ 0 mod {m} — a deterministic stand-in for
    real NULLs, which the fixture lacks) receive their event type's
    median of OBSERVED values. Median, not mean: imputation with the
    mean drags toward the outliers the robust tier (``outliers_mad``)
    exists to resist.

    Shape at 100 TB: the per-group medians come from the distributed
    3-pass width-bucket selection (``operators/selection``) over the
    observed subset — no holistic percentile buffer — broadcast back as
    literals into ONE conditional hash-agg. Each imputed row's cents
    are floored per-row, so the audited totals are exact int64 on both
    engines.
    """.format(m=_IMPUTE_MOD)
    from vector_search_playground_spark.operators.selection import (
        exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        (F.col("event_id") % _IMPUTE_MOD == 0).alias("miss"),
    )
    ev = ev.cache()
    try:
        med = exact_quantiles(
            ev.where(~F.col("miss")), "event_type", "value", [0.5]
        )
        med_map = F.create_map(
            *[F.lit(x) for k, q in med.items() for x in (k, q[0.5])]
        )
        m = med_map[F.col("event_type")]
        cents = F.when(
            F.col("miss"), F.floor(m * 100 + 0.5)
        ).otherwise(F.floor(F.col("value") * 100 + 0.5))
        return ev.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.col("miss").cast("long")).cast("long").alias(
                "n_missing"
            ),
            F.first(F.floor(m * 1e6 + 0.5) / 1e6).alias("median_micro"),
            F.sum(cents).cast("long").alias("total_cents_imputed"),
        )
    finally:
        ev.unpersist()


# --- span_corruption --------------------------------------------------------

_SPAN_A = 1103515245  # glibc LCG (the bootstrap_ci constants — shared
_SPAN_C = 12345       # deterministic-randomness discipline)
_SPAN_M = 2147483648
_SPAN_MEAN_LEN = 3          # T5 mean span length
_SPAN_CORRUPT_PCT = 15      # target corruption rate, percent


@query(
    "span_corruption",
    oracle=f"""
    WITH base AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    spans AS (
        SELECT doc_id, n_tok,
               greatest(n_tok * {_SPAN_CORRUPT_PCT} // 100
                        // {_SPAN_MEAN_LEN}, 1) AS n_spans
        FROM base WHERE n_tok >= {_SPAN_MEAN_LEN}
    ),
    drawn AS (
        SELECT s.doc_id, s.n_tok, s.n_spans, k.k,
               ({_SPAN_A} * (s.doc_id * 100 + k.k) + {_SPAN_C})
                   % {_SPAN_M} % s.n_tok AS start_tok,
               1 + ({_SPAN_A} * (s.doc_id * 100 + k.k + 50) + {_SPAN_C})
                   % {_SPAN_M} % (2 * {_SPAN_MEAN_LEN} - 1) AS span_len
        FROM spans s,
             LATERAL (SELECT unnest(range(s.n_spans)) AS k) k
    )
    SELECT doc_id, CAST(k AS BIGINT) AS span_id,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least(span_len, n_tok - start_tok) AS BIGINT) AS span_len,
           CAST(n_tok AS BIGINT) AS n_tok
    FROM drawn
    """,
)
def span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption PLAN (Raffel 2020 §3.1.4): for every doc
    long enough, draw ~{p}% worth of mask spans (mean length {m}) whose
    starts and lengths come from the shared explicit-LCG discipline
    (bootstrap_ci's constants) — deterministic, seedless, and therefore
    fully hash-certifiable, unlike rand()-based masking. Emits the
    (doc, span) plan a masking executor applies downstream; spans are
    clipped at the doc end (overlaps are the applier's concern — T5's
    own sampler draws i.i.d. too).

    Shape at 100 TB: one row-local projection computes n_spans per doc;
    the span fan-out is an explode of a generated range — work and
    output are Θ(corpus · corruption-rate), no shuffle at all.
    """.format(p=_SPAN_CORRUPT_PCT, m=_SPAN_MEAN_LEN)
    docs = load_table(spark, sf_dir, "documents")
    spans = (
        docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_tok")
        )
        .where(F.col("n_tok") >= _SPAN_MEAN_LEN)
        .select(
            "doc_id",
            "n_tok",
            F.greatest(
                F.expr(
                    f"n_tok * {_SPAN_CORRUPT_PCT} div 100"
                    f" div {_SPAN_MEAN_LEN}"
                ),
                F.lit(1),
            ).alias("n_spans"),
        )
    )
    drawn = spans.select(
        "doc_id",
        "n_tok",
        F.explode(F.expr("sequence(0, n_spans - 1)")).alias("k"),
    ).select(
        "doc_id",
        F.col("k").cast("long").alias("span_id"),
        (
            (_SPAN_A * (F.col("doc_id") * 100 + F.col("k")) + _SPAN_C)
            % _SPAN_M
            % F.col("n_tok")
        ).alias("start_tok"),
        (
            1
            + (
                _SPAN_A * (F.col("doc_id") * 100 + F.col("k") + 50)
                + _SPAN_C
            )
            % _SPAN_M
            % (2 * _SPAN_MEAN_LEN - 1)
        ).alias("span_len_raw"),
        "n_tok",
    )
    return drawn.select(
        "doc_id",
        "span_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(
            F.col("span_len_raw"), F.col("n_tok") - F.col("start_tok")
        ).cast("long").alias("span_len"),
        F.col("n_tok").cast("long").alias("n_tok"),
    )


# --- kfold_split ------------------------------------------------------------

_KFOLD_K = 5


@query(
    "kfold_split",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, lang,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT) % {_KFOLD_K} AS BIGINT) AS fold
        FROM documents
    )
    SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(count(*)) OVER (PARTITION BY lang) AS BIGINT)
               AS lang_total,
           floor(CAST(count(*) AS DOUBLE)
                 / sum(count(*)) OVER (PARTITION BY lang)
                 * 1e6 + 0.5) / 1e6 AS fold_share
    FROM f GROUP BY fold, lang
    """,
)
def kfold_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-fold assignment audit (k={k}): every doc lands in
    exactly one fold via md5(doc_id) — the content-independent,
    order-independent split a cross-validation harness needs (the
    split_train_val discipline generalized to k folds) — and the output
    is the per-(fold, lang) stratification scorecard: a fold whose
    fold_share strays far from 1/k for some language signals a skewed
    split before any training run pays for it.

    Shape at 100 TB: fold id is row-local hash math; ONE hash-agg to the
    k·|langs| grid; the lang-total window runs over that grid. The hash
    (first 8 md5 hex chars mod k) is evaluated identically by both
    engines — the feature_hashing discipline.
    """.format(k=_KFOLD_K)
    docs = load_table(spark, sf_dir, "documents")
    f = docs.select(
        "lang",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % _KFOLD_K
        ).alias("fold"),
    )
    g = f.groupBy("fold", "lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("lang")
    return g.select(
        "fold",
        "lang",
        "n_docs",
        F.sum("n_docs").over(w).alias("lang_total"),
        (
            F.floor(
                F.col("n_docs").cast("double")
                / F.sum("n_docs").over(w)
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("fold_share"),
    )


# --- label_weights ----------------------------------------------------------


@query(
    "label_weights",
    oracle="""
    WITH c AS (
        SELECT label, count(*) AS n FROM embeddings GROUP BY label
    ),
    t AS (SELECT sum(n) AS total, count(*) AS k FROM c)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(n AS BIGINT) AS n,
           floor(CAST(t.total AS DOUBLE) / (t.k * c.n) * 1e6 + 0.5) / 1e6
               AS weight
    FROM c CROSS JOIN t
    """,
)
def label_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-frequency class weights (sklearn's 'balanced' formula
    w_c = N/(k·n_c)) over the embedding labels — the one-line relation
    every imbalanced-classification loss needs, emitted as a certified
    query so the weights a trainer consumes are auditable.

    Shape at 100 TB: ONE hash-agg to |labels| rows; totals broadcast.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    c = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("k")
    )
    return c.crossJoin(F.broadcast(t)).select(
        F.col("label").cast("long").alias("label"),
        "n",
        (
            F.floor(
                F.col("total").cast("double")
                / (F.col("k") * F.col("n"))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("weight"),
    )


# --- contrastive_pairs ------------------------------------------------------

_CP_MOD = 10  # every 10th vector anchors a triplet
_CP_HA, _CP_HB, _CP_HP = 1000003, 7919, 999983  # negative-pick hash


@query(
    "contrastive_pairs",
    oracle=f"""
    WITH a AS (
        SELECT vec_id AS anchor_id, label AS anchor_label,
               embedding AS aemb
        FROM embeddings WHERE vec_id % {_CP_MOD} = 0
    ),
    pos AS (
        SELECT anchor_id, cand AS pos_id, dist AS pos_dist FROM (
            SELECT a.anchor_id, e.vec_id AS cand,
                   ROUND(1 - list_cosine_similarity(
                             CAST(e.embedding AS DOUBLE[]),
                             CAST(a.aemb AS DOUBLE[])), {ROUND_DIST})
                       AS dist,
                   row_number() OVER (
                       PARTITION BY a.anchor_id
                       ORDER BY ROUND(1 - list_cosine_similarity(
                                    CAST(e.embedding AS DOUBLE[]),
                                    CAST(a.aemb AS DOUBLE[])),
                                {ROUND_DIST}), e.vec_id) AS rn
            FROM a JOIN embeddings e
              ON e.label = a.anchor_label AND e.vec_id <> a.anchor_id
        ) WHERE rn = 1
    ),
    neg AS (
        SELECT anchor_id, cand AS neg_id, cand_label AS neg_label FROM (
            SELECT a.anchor_id, e.vec_id AS cand, e.label AS cand_label,
                   row_number() OVER (
                       PARTITION BY a.anchor_id
                       ORDER BY (a.anchor_id * {_CP_HA}
                                 + e.vec_id * {_CP_HB}) % {_CP_HP},
                                e.vec_id) AS rn
            FROM a JOIN embeddings e ON e.label <> a.anchor_label
        ) WHERE rn = 1
    )
    SELECT a.anchor_id,
           CAST(a.anchor_label AS INT) AS anchor_label,
           p.pos_id, p.pos_dist,
           n.neg_id, CAST(n.neg_label AS INT) AS neg_label
    FROM a
    JOIN pos p ON p.anchor_id = a.anchor_id
    JOIN neg n ON n.anchor_id = a.anchor_id
    ORDER BY a.anchor_id
    """,
)
def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-triplet mining (anchor, positive, negative) — the
    batch-assembly step for embedding-model training (SimCLR/InfoNCE
    style): every {m}-th vector anchors a triplet whose positive is its
    nearest same-label neighbor (cosine, rounded-distance + id ranking
    so the pick is engine-independent) and whose negative is a
    deterministic hash-pick over the different-label corpus — RNG-free,
    so the same triplet set falls out on every engine and every rerun
    (the `sample_negatives`/`split_train_val` discipline applied to
    triplets). The pos_dist column rides along so a margin audit
    (pos_dist vs the implied negative distance) is a one-agg follow-up.

    The oracle replays both picks as row_number() windows over the pair
    fan-out (the knn_classify oracle discipline) while the Spark side
    phrases them as min_by-over-struct hash-agg argmins — both reduce
    to "argmin under (key, id) lexicographic order", certified equal by
    the value hash. The oracle's dist ORDER key is rounded exactly like
    the engine side, so a float knife-edge cannot flip the argmin.

    Shape at 100 TB: positives are LABEL-BLOCKED (pair space Σ|label|²,
    the semdedup bound — never corpus²) and shuffle once on label;
    negatives broadcast the bounded anchor sample and stream the corpus
    map-side in ONE pass, reduced by a hash-agg argmin (no window, no
    sort, no second corpus scan). At training scale anchors are the
    batch sample, so the broadcast side stays small by construction;
    a billion-anchor variant would bucket the hash-pick instead
    (operators/setjoin.py discipline).
    """.format(m=_CP_MOD)
    from vector_search_playground_spark.functions.vector import (
        cosine_distance,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.where(F.col("vec_id") % _CP_MOD == 0).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("aemb"),
    )

    # positives: label-blocked self-join, argmin (rounded dist, cand id)
    cands = emb.select(
        F.col("vec_id").alias("cand"),
        F.col("label").alias("cand_label"),
        F.col("embedding").alias("cemb"),
    )
    pos_pairs = anchors.join(
        cands,
        (F.col("cand_label") == F.col("anchor_label"))
        & (F.col("cand") != F.col("anchor_id")),
    ).withColumn(
        "dist",
        F.round(
            cosine_distance(F.col("cemb"), F.col("aemb")), ROUND_DIST
        ),
    )
    pos = pos_pairs.groupBy("anchor_id").agg(
        F.min_by(
            F.col("cand"),
            F.struct(F.col("dist"), F.col("cand").cast("double")),
        ).alias("pos_id"),
        F.min("dist").alias("pos_dist"),
    )

    # negatives: broadcast anchors, one corpus pass, hash-argmin
    neg_pairs = (
        F.broadcast(
            anchors.select("anchor_id", "anchor_label")
        )
        .join(
            cands.select("cand", "cand_label"),
            F.col("cand_label") != F.col("anchor_label"),
        )
        .withColumn(
            "hkey",
            (
                F.col("anchor_id") * _CP_HA + F.col("cand") * _CP_HB
            )
            % _CP_HP,
        )
    )
    neg = neg_pairs.groupBy("anchor_id").agg(
        F.min_by(
            F.col("cand"), F.struct(F.col("hkey"), F.col("cand"))
        ).alias("neg_id"),
        F.min_by(
            F.col("cand_label"),
            F.struct(F.col("hkey"), F.col("cand")),
        )
        .cast("int")
        .alias("neg_label"),
    )

    return (
        anchors.select(
            "anchor_id", F.col("anchor_label").cast("int").alias("anchor_label")
        )
        .join(pos, "anchor_id")
        .join(neg, "anchor_id")
        .select(
            "anchor_id",
            "anchor_label",
            "pos_id",
            "pos_dist",
            "neg_id",
            "neg_label",
        )
    )
