"""Statistical-analytics tier: market-basket affinity, distribution
ranks, per-series regression fits, robust outlier gates, scale-safe
per-group sampling, and character-entropy quality scoring.

The reference's engine (Postgres behind `/root/reference/src/main.rs:85-96`)
exposes this whole family through SQL aggregates/windows; an analytics
engine that replaces it needs the same verbs natively. Every query here
is oracle-backed — exact SQL semantics on both engines.

Scale discipline per query:
- ``basket_pairs`` — the self-join is keyed on the ORDER key, so the
  pair space is Σ C(basket,2) (basket sizes are bounded by business
  reality), never corpus²; item frequencies broadcast back.
- ``win_percentiles`` — windows partition by CUSTOMER (plentiful,
  small partitions), not by a 3-value status column.
- ``trend_fit`` — SQL-standard ``regr_*`` aggregates: algebraic
  co-moment accumulators with map-side partials, one hash-agg on
  user_id; x is re-based to the corpus epoch so the intercept is
  well-conditioned (days-since-2024, not days-since-1970).
- ``outliers_mad`` — two rounds of the distributed width-bucket
  selection (operators/selection.py) for median and MAD; never a
  holistic percentile buffer.
- ``sample_per_group`` — exact deterministic top-n-by-hash per group
  via the TWO-STAGE top-k pattern (salted local cut → tiny global
  re-rank) so a 5-value group column never creates 5 whale partitions.
- ``text_entropy`` — explode to (doc, char) then ONE hash-agg; the
  shuffle carries character counts, never documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import fan_out, load_table

# --- basket_pairs -----------------------------------------------------------


@query(
    "basket_pairs",
    oracle="""
    WITH b AS (
        SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT count(DISTINCT ok) AS n_orders FROM b),
    ic AS (SELECT pk, count(*) AS cnt FROM b GROUP BY pk),
    pairs AS (
        SELECT a.pk AS part_a, c.pk AS part_b, count(*) AS support
        FROM b a JOIN b c ON a.ok = c.ok AND a.pk < c.pk
        GROUP BY a.pk, c.pk
    )
    SELECT part_a, part_b,
           CAST(support AS BIGINT) AS support,
           ROUND(CAST(support AS DOUBLE) * n.n_orders
                 / (ia.cnt * ib.cnt), 6) AS lift
    FROM pairs
    CROSS JOIN n
    JOIN ic ia ON ia.pk = part_a
    JOIN ic ib ON ib.pk = part_b
    ORDER BY support DESC, part_a, part_b
    LIMIT 20
    """,
)
def basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity mining (association rules, the retail
    `frequently bought together` verb): top part pairs co-occurring in
    the same order, with lift = P(a,b) / (P(a)·P(b)) so popular-with-
    everything items don't drown genuine affinities.

    Shape at 100 TB: the candidate pair space comes from a self-join
    keyed on the ORDER key — both sides shuffle once on l_orderkey and
    the blow-up is Σ C(|basket|,2), bounded by real basket sizes, never
    n². Item frequencies are a part-domain-sized aggregate broadcast
    onto the pair relation; the order count is a 1-row literal. The
    final top-20 is TakeOrderedAndProject — the driver sees 20 rows.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n_orders = li.agg(F.countDistinct("ok").alias("n_orders"))
    item_cnt = li.groupBy("pk").agg(F.count(F.lit(1)).alias("cnt"))
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .groupBy(
            F.col("a.pk").alias("part_a"), F.col("b.pk").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        pairs.join(F.broadcast(n_orders))
        .join(
            F.broadcast(item_cnt.select(F.col("pk"), F.col("cnt").alias("cnt_a"))),
            F.col("part_a") == F.col("pk"),
        )
        .drop("pk")
        .join(
            F.broadcast(item_cnt.select(F.col("pk"), F.col("cnt").alias("cnt_b"))),
            F.col("part_b") == F.col("pk"),
        )
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("long").alias("support"),
            F.round(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("cnt_a") * F.col("cnt_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), "part_a", "part_b")
        .limit(20)
    )


# --- win_percentiles --------------------------------------------------------


@query(
    "win_percentiles",
    oracle="""
    SELECT o_orderkey, o_custkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def win_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative standing of every order within its customer's history:
    ``percent_rank`` (rank-based, 0 for the cheapest) and ``cume_dist``
    (fraction of the customer's orders at or below this price) —
    completing the distribution-rank window family next to ``win_ntile``.

    The window partitions by CUSTOMER — plentiful, bounded partitions
    that spread across any cluster — never by a 3-value column like
    order status, whose three whale partitions would serialize at
    100 TB. The tiebreak key (o_orderkey) makes the row order, and
    therefore both ranks, deterministic and hash-stable.
    """
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
        )
    )


# --- trend_fit --------------------------------------------------------------

# Fixture events start 2024-01-01 (FIXTURES.md); re-basing x to that
# epoch keeps the intercept O(value-range) instead of O(slope · 19723
# days), so 6-dp rounding is stable on both engines.
_EPOCH_2024_US = 1_704_067_200_000_000


@query(
    "trend_fit",
    oracle=f"""
    SELECT user_id,
           CAST(regr_count(value, x) AS BIGINT) AS n,
           ROUND(regr_slope(value, x), 6) AS slope,
           ROUND(regr_intercept(value, x), 6) AS intercept,
           ROUND(regr_r2(value, x), 6) AS r2
    FROM (
        SELECT user_id, value,
               (epoch_us(ts) - {_EPOCH_2024_US}) / 86400000000.0 AS x
        FROM events
    )
    GROUP BY user_id
    HAVING regr_count(value, x) >= 3
    """,
)
def trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of event value over time — the SQL-standard
    ``regr_slope/intercept/r2`` bivariate family (TimescaleDB exposes the
    same via ``stats_agg``): is this user's activity value drifting up or
    down, and how well does a line explain it?

    Shape at 100 TB: the regr_* aggregates are ALGEBRAIC — five co-moment
    accumulators (n, Σx, Σy, Σxy, Σx²…) with map-side partial merge — so
    the plan is one hash-agg on user_id with partial aggregation before
    the exchange; no window, no sort, no per-user buffering. x is days
    since the corpus epoch (integer µs arithmetic re-based before the
    double divide) for numeric conditioning.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        (
            (F.col("ts_us") - F.lit(_EPOCH_2024_US)) / F.lit(86400000000.0)
        ).alias("x"),
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.regr_count("value", "x").cast("long").alias("n"),
            F.round(F.regr_slope("value", "x"), 6).alias("slope"),
            F.round(F.regr_intercept("value", "x"), 6).alias("intercept"),
            F.round(F.regr_r2("value", "x"), 6).alias("r2"),
        )
        .where(F.col("n") >= 3)
    )


# --- outliers_mad -----------------------------------------------------------

# 1.4826 ≈ 1/Φ⁻¹(3/4): scales MAD to the σ of a normal distribution, so
# the 3-MAD gate matches the familiar 3-σ intuition but survives the
# outliers themselves (unlike anomaly_zscore's moment-based gate, whose
# mean and σ the outliers drag).
_MAD_K = 1.4826


@query(
    "outliers_mad",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               quantile_cont(abs(e.value - m.med), 0.5) AS mad
        FROM events e JOIN med m ON e.event_type = m.event_type
        GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(m.med, 6) AS median,
           ROUND(d.mad, 6) AS mad,
           CAST(count(*) FILTER (
               WHERE abs(e.value - m.med) > 3 * {_MAD_K} * d.mad
           ) AS BIGINT) AS n_outliers
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type, m.med, d.mad
    """,
)
def outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier audit per event type: median / MAD (median absolute
    deviation) and the count of values outside the 3-scaled-MAD fence.
    The robust sibling of ``anomaly_zscore`` — a handful of extreme
    values inflate a z-score's own mean and σ until the gate goes blind;
    the median/MAD fence does not move.

    Shape at 100 TB: both medians come from the distributed width-bucket
    selection (``operators/selection.exact_quantiles``) — three linear
    passes each, never Spark's holistic ``percentile`` buffer that
    collects a whole group into one task. The per-type medians are
    metadata (5 rows) folded back as literals; the final count is one
    conditional hash-agg over a single scan.
    """
    from vector_search_playground_spark.operators.selection import (
        exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = {k: v[0.5] for k, v in exact_quantiles(ev, "event_type", "value", [0.5]).items()}
    med_col = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in sorted(med.items())
        ]
    )
    dev = ev.select("event_type", F.abs(F.col("value") - med_col).alias("adev"))
    mad = {k: v[0.5] for k, v in exact_quantiles(dev, "event_type", "adev", [0.5]).items()}
    mad_col = F.coalesce(
        *[
            F.when(F.col("event_type") == k, F.lit(v))
            for k, v in sorted(mad.items())
        ]
    )
    return (
        ev.withColumn("med", med_col)
        .withColumn("mad", mad_col)
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(
                    F.abs(F.col("value") - F.col("med"))
                    > 3 * _MAD_K * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            "n",
            F.round("med", 6).alias("median"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
    )


# --- sample_per_group -------------------------------------------------------

_SAMPLE_N = 5
_SAMPLE_SALTS = 32


@query(
    "sample_per_group",
    oracle=f"""
    SELECT lang, doc_id, rk
    FROM (
        SELECT lang, doc_id,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(COALESCE(text, '') || ':' || doc_id), doc_id
               ) AS BIGINT) AS rk
        FROM documents
    )
    WHERE rk <= {_SAMPLE_N}
    """,
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size uniform sample per group (here: {n} docs
    per language) — the `show me a few examples from every slice` verb,
    and the reproducible alternative to ``TABLESAMPLE`` whose output
    changes under repartitioning. Sampling key = md5(text:doc_id), so
    reruns and engine changes cannot reshuffle the sample.

    Shape at 100 TB: a naive ``row_number() OVER (PARTITION BY lang)``
    creates one whale partition per language — 5 partitions for the
    whole corpus. This is the TWO-STAGE exact top-k instead: a salted
    local cut (partition by (lang, hash-salt): plentiful bounded
    partitions, keep n per salt) feeds a global re-rank over ≤ salts·n
    survivors per language — metadata-sized. Same rows as the naive
    window, proven by the shared oracle.
    """.format(n=_SAMPLE_N)
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        # coalesce on BOTH engines: Spark concat_ws skips NULL args while
        # DuckDB || propagates NULL — a null-text doc would otherwise get
        # a different sampling key per engine (round-5 advice)
        F.md5(
            F.concat_ws(
                ":", F.coalesce(F.col("text"), F.lit("")), F.col("doc_id")
            )
        ).alias("skey"),
    )
    salted = docs.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(_SAMPLE_SALTS))
    )
    w_local = Window.partitionBy("lang", "salt").orderBy("skey", "doc_id")
    survivors = (
        salted.withColumn("lrk", F.row_number().over(w_local))
        .where(F.col("lrk") <= _SAMPLE_N)
        .drop("lrk", "salt")
    )
    w_global = Window.partitionBy("lang").orderBy("skey", "doc_id")
    return (
        survivors.withColumn(
            "rk", F.row_number().over(w_global).cast("long")
        )
        .where(F.col("rk") <= _SAMPLE_N)
        .select("lang", "doc_id", "rk")
    )


# --- text_entropy -----------------------------------------------------------


@query(
    "text_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch
        FROM documents
    ),
    counts AS (
        SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch
    ),
    tot AS (
        SELECT doc_id, sum(c) AS n, max(c) AS max_c FROM counts GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(t.n AS BIGINT) AS n_chars,
           ROUND(-sum((c.c / t.n) * log2(c.c / t.n)), 6) AS entropy,
           ROUND(CAST(t.max_c AS DOUBLE) / t.n, 6) AS top_char_ratio
    FROM counts c JOIN tot t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id, t.n, t.max_c
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy + top-character mass per document
    — the classic gibberish/boilerplate gate in corpus quality filtering
    (low entropy ⇒ repeated filler like 'aaaa…'; it rides next to the
    token-level gates in ``text_quality`` / ``quality_gopher``).

    Shape at 100 TB: explode to (doc_id, char) — row-local, no shuffle —
    then ONE hash-agg on (doc_id, char) whose output is bounded by
    |docs|·|alphabet|, a second metadata-sized agg for per-doc totals,
    and the entropy fold over the counts relation. The corpus text
    itself is never shuffled; only character counts move.
    """
    # fan_out: the fixture scan yields ~3 splits; the char explode is the
    # per-row-heavy stage, so spread it across the full core count
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    chars = docs.select(
        "doc_id",
        F.explode_outer(F.expr("regexp_extract_all(text, '.', 0)")).alias("ch"),
    ).where(F.col("ch").isNotNull())
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.max("c").alias("max_c")
    )
    p = F.col("c") / F.col("n")
    return (
        counts.join(tot, "doc_id")
        .groupBy("doc_id", "n", "max_c")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_chars"),
            "entropy",
            F.round(F.col("max_c").cast("double") / F.col("n"), 6).alias(
                "top_char_ratio"
            ),
        )
    )


# --- heavy_hitters_cms ------------------------------------------------------

_CMS_D = 4  # independent hash rows
_CMS_W = 512  # buckets per row
_CMS_TOPN = 10
_CMS_W_MASK = _CMS_W - 1  # W is a power of two: slice buckets with & not %


@query(
    "heavy_hitters_cms",
    oracle=f"""
    WITH n AS (SELECT count(*) AS n_rows FROM lineitem),
    cms AS (
        SELECT seed,
               (CAST('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15)
                     AS BIGINT) >> (15 * seed)) & {_CMS_W_MASK} AS bucket,
               count(*) AS c
        FROM lineitem CROSS JOIN (
            SELECT unnest(range({_CMS_D})) AS seed
        )
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT l_partkey AS part_key, count(*) AS exact_count
        FROM lineitem GROUP BY 1
        ORDER BY exact_count DESC, part_key LIMIT {_CMS_TOPN}
    ),
    probe AS (
        SELECT e.part_key, e.exact_count, s.seed,
               (CAST('0x' || substr(md5(CAST(e.part_key AS VARCHAR)), 1, 15)
                     AS BIGINT) >> (15 * s.seed)) & {_CMS_W_MASK} AS bucket
        FROM exact e CROSS JOIN (
            SELECT unnest(range({_CMS_D})) AS seed
        ) s
    )
    SELECT p.part_key,
           CAST(p.exact_count AS BIGINT) AS exact_count,
           CAST(min(cms.c) AS BIGINT) AS est_count,
           CAST(min(cms.c) - p.exact_count AS BIGINT) AS err,
           ROUND(2.0 * n.n_rows / {_CMS_W}, 6) AS err_bound,
           (min(cms.c) - p.exact_count) <= 2.0 * n.n_rows / {_CMS_W}
               AS within_bound
    FROM probe p
    JOIN cms ON cms.seed = p.seed AND cms.bucket = p.bucket
    CROSS JOIN n
    GROUP BY p.part_key, p.exact_count, n.n_rows
    ORDER BY exact_count DESC, part_key
    """,
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimation, hash-certified end-to-end:
    build a D×W CMS over the lineitem part stream, then probe the true
    top-{n} parts and emit (exact, estimate, error, ε-bound, flag) per
    probe. Because the hash rows are md5-derived (bit-identical on both
    engines) the sketch is DETERMINISTIC — unlike HLL/GK this sketch
    query gets a full value-hash oracle, not a rows-only check.

    Shape at 100 TB: the sketch build is the textbook MERGEABLE pattern —
    explode each row to its D (seed, bucket) cells, then ONE hash-agg:
    map-side partial aggregation builds a per-task partial CMS (≤ D·W
    cells) and the exchange carries only those partials; the shuffle
    never scales with the fact table. The probe side is {n}·D metadata
    rows broadcast against the D·W-cell sketch. CMS never underestimates
    (est ≥ exact, test-pinned); the ε = 2/W Markov bound is emitted
    in-row so the estimate's quality is part of the certified result.
    """.format(n=_CMS_TOPN)
    # fan_out: the fixture scan yields ~3 splits — the md5 map stage
    # must spread across the session's full parallelism (no-op at 100 TB
    # where the scan has thousands of natural splits)
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").select(
            F.col("l_partkey").alias("part_key")
        )
    )
    n_rows = li.agg(F.count(F.lit(1)).alias("n_rows"))
    # ONE md5 per row, ONE hex->int conversion: 15 hex chars = 60 bits
    # carve into D=4 independent 9-bit hash rows by shift-and-mask (W is
    # a power of two). The exploded cell is a single int seed*W+bucket —
    # no struct, no per-seed conv — measured 4.2 s -> ~1.2 s at sf0.1.
    def h60(key_col):
        return F.conv(
            F.substring(F.md5(key_col.cast("string")), 1, 15), 16, 10
        ).cast("long")

    def cell_ids(key_col):
        h = h60(key_col)
        return F.array(
            *[
                (
                    F.lit(seed * _CMS_W)
                    + F.shiftright(h, 15 * seed).bitwiseAND(_CMS_W_MASK)
                )
                for seed in range(_CMS_D)
            ]
        )

    cells = li.select(F.explode(cell_ids(F.col("part_key"))).alias("cell"))
    cms = (
        cells.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            (F.col("cell") / _CMS_W).cast("int").alias("seed"),
            F.pmod("cell", F.lit(_CMS_W)).alias("bucket"),
            "c",
        )
    )
    exact = (
        li.groupBy("part_key")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), "part_key")
        .limit(_CMS_TOPN)
    )
    probe = exact.select(
        "part_key",
        "exact_count",
        F.explode(cell_ids(F.col("part_key"))).alias("cell"),
    ).select(
        "part_key",
        "exact_count",
        (F.col("cell") / _CMS_W).cast("int").alias("seed"),
        F.pmod("cell", F.lit(_CMS_W)).alias("bucket"),
    )
    est = (
        cms.join(F.broadcast(probe), ["seed", "bucket"])
        .groupBy("part_key", "exact_count")
        .agg(F.min("c").alias("est"))
    )
    bound = 2.0 * F.col("n_rows") / F.lit(_CMS_W)
    return (
        est.crossJoin(F.broadcast(n_rows))
        .select(
            "part_key",
            F.col("exact_count").cast("long").alias("exact_count"),
            F.col("est").cast("long").alias("est_count"),
            (F.col("est") - F.col("exact_count")).cast("long").alias("err"),
            F.round(bound, 6).alias("err_bound"),
            ((F.col("est") - F.col("exact_count")) <= bound).alias(
                "within_bound"
            ),
        )
        .orderBy(F.desc("exact_count"), "part_key")
    )


# --- segment_ci -------------------------------------------------------------


@query(
    "segment_ci",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(avg(value), 6) AS mean,
           ROUND(avg(value) - 1.96 * stddev_samp(value) / sqrt(count(*)), 6)
               AS ci_lo,
           ROUND(avg(value) + 1.96 * stddev_samp(value) / sqrt(count(*)), 6)
               AS ci_hi
    FROM events GROUP BY event_type
    """,
)
def segment_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment mean with a 95% normal-approximation confidence
    interval — the difference between reporting a number and reporting
    how sure you are of it (the A/B-readout verb). ci = mean ±
    1.96·s/√n.

    Shape at 100 TB: avg and stddev_samp are algebraic co-moment
    aggregates (map-side partials, one hash-agg on the segment key);
    the CI arithmetic is row-local on the |segments| result. Nothing
    here is a window or a second pass.
    """
    ev = load_table(spark, sf_dir, "events")
    half = F.lit(1.96) * F.stddev_samp("value") / F.sqrt(F.count(F.lit(1)))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("value"), 6).alias("mean"),
        F.round(F.avg("value") - half, 6).alias("ci_lo"),
        F.round(F.avg("value") + half, 6).alias("ci_hi"),
    )


# --- scan_partition_pruned --------------------------------------------------


@query(
    "scan_partition_pruned",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
           ROUND(sum(value), 2) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) = DATE '2024-01-05'
    GROUP BY event_type
    """,
)
def scan_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-partitioned table layout + listing-time pruning — the
    hypertable chunk-exclusion behavior that makes "yesterday's numbers"
    cost one partition, not one corpus scan. The events table is
    materialized ONCE per fixture fingerprint as parquet partitioned by
    day; the day predicate then prunes at FILE-LISTING time
    (PartitionFilters in the scan, plan-asserted in tests) — directories
    for the other 29 days are never even opened. The oracle replays the
    aggregate with a date filter on the raw table: layout must never
    change answers.

    At 100 TB this is the difference between a dashboard query touching
    ~1/30th of the data and touching all of it; the same layout is what
    ``rollup_hypertable`` assumes for its raw tail.
    """
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    ev = load_table(spark, sf_dir, "events")
    fp = _fixture_fingerprint(sf_dir, "events")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"events_byday_{tag}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev.withColumn("day", F.to_date("ts")).write.mode(
            "overwrite"
        ).partitionBy("day").parquet(path)
    part = spark.read.parquet(path).where(
        F.col("day") == F.lit("2024-01-05").cast("date")
    )
    return part.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# --- revenue_concentration --------------------------------------------------


@query(
    "revenue_concentration",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(floor(sum(o_totalprice) * 100 + 0.5) AS BIGINT) AS cents
        FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT sum(cents) AS total, count(*) AS n FROM cust),
    c AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents DESC, o_custkey) AS rk,
               sum(cents) OVER (ORDER BY cents DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM cust
    )
    SELECT CAST(t.n AS BIGINT) AS n_customers,
           CAST(t.total AS BIGINT) AS total_cents,
           CAST(count(*) FILTER (WHERE 5 * (c.cum - c.cents) < 4 * t.total)
                AS BIGINT) AS n80,
           ROUND(CAST(max(CASE WHEN c.rk = CAST(ceil(t.n / 10.0) AS BIGINT)
                               THEN c.cum END) AS DOUBLE) / t.total, 6)
               AS top_decile_share
    FROM c CROSS JOIN t
    GROUP BY t.n, t.total
    """,
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit (the Pareto 80/20 verb): how many
    customers produce 80% of revenue, and what share the top decile
    holds. Everything runs in INTEGER CENTS — per-customer revenue via
    floor(x·100 + 0.5) (the true sum is integer cents, so the half-cent
    floor is exact on both engines) — making the 80% crossing test
    5·cum ≥ 4·total pure int64 arithmetic with no float knife edge.

    Shape at 100 TB: the oracle's global cumsum window is a
    single-partition whale over the customer relation; the plan here is
    the BUCKETED TWO-PASS prefix sum (the pack_sequences /
    curriculum_shards discipline): approxQuantile boundaries bucket the
    per-customer relation, per-bucket (count, sum) partials prefix on
    the driver (≤ buckets rows), and the within-bucket window runs over
    1/64th slices — no unpartitioned sort anywhere. Driver sees 1 row.
    """
    import math

    from vector_search_playground_spark.operators.prefix import (
        bucketed_cumsum,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
        .cache()
    )
    try:
        ranked, n_total, total = bucketed_cumsum(
            cust,
            "cents",
            "cents",
            tiebreak_col="o_custkey",
            descending=True,
        )
        k10 = math.ceil(n_total / 10.0)
        row = ranked.agg(
            F.sum(
                (5 * (F.col("cum") - F.col("cents")) < 4 * F.lit(total))
                .cast("long")
            ).alias("n80"),
            F.max(F.when(F.col("rk") == k10, F.col("cum"))).alias("top_cum"),
        ).first()
        return spark.createDataFrame(
            [
                (
                    n_total,
                    total,
                    row["n80"],
                    # half-up like DuckDB ROUND, not Python banker's round
                    math.floor(row["top_cum"] / total * 1e6 + 0.5) / 1e6,
                )
            ],
            "n_customers long, total_cents long, n80 long,"
            " top_decile_share double",
        )
    finally:
        cust.unpersist()


# --- corr_categorical -------------------------------------------------------


@query(
    "corr_categorical",
    oracle="""
    WITH joined AS (
        SELECT e.event_type AS a, c.c_mktsegment AS b
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    ),
    cell AS (SELECT a, b, count(*) AS o FROM joined GROUP BY a, b),
    mar AS (
        SELECT a, b, o,
               sum(o) OVER (PARTITION BY a) AS ra,
               sum(o) OVER (PARTITION BY b) AS cb,
               sum(o) OVER () AS n
        FROM cell
    ),
    chi AS (
        SELECT max(n) AS n,
               count(DISTINCT a) AS nr, count(DISTINCT b) AS nc,
               sum(power(o - ra * cb / CAST(n AS DOUBLE), 2)
                   / (ra * cb / CAST(n AS DOUBLE))) AS chi2
        FROM mar
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(nr AS BIGINT) AS n_rows_cat,
           CAST(nc AS BIGINT) AS n_cols_cat,
           ROUND(chi2, 6) AS chi2,
           ROUND(sqrt(chi2 / (n * (least(nr, nc) - 1))), 6) AS cramers_v
    FROM chi
    """,
)
def corr_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association between two CATEGORICAL columns — Cramér's V over the
    (event type × market segment) contingency table, the categorical
    sibling of ``corr_matrix``'s Pearson pass (correlating a behavior
    column with a demographic one is the first question of any
    segmentation analysis; Pearson is meaningless there).

    Shape at 100 TB: the fact stream collapses to the |types|·|segments|
    contingency table in ONE hash-agg behind a broadcast dimension join;
    marginals, χ², and V are window/aggregate arithmetic on that
    25-cell relation — metadata forever. Counts are exact integers;
    only the final χ² crosses into floats, rounded at 6 dp.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("b"),
    )
    cell = (
        ev.join(F.broadcast(cust), "user_id")
        .select(F.col("event_type").alias("a"), "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    wa, wb, wn = Window.partitionBy("a"), Window.partitionBy("b"), Window.partitionBy()
    mar = cell.select(
        "a",
        "b",
        "o",
        F.sum("o").over(wa).alias("ra"),
        F.sum("o").over(wb).alias("cb"),
        F.sum("o").over(wn).alias("n"),
    )
    e = F.col("ra") * F.col("cb") / F.col("n").cast("double")
    chi = mar.agg(
        F.max("n").alias("n"),
        F.countDistinct("a").alias("nr"),
        F.countDistinct("b").alias("nc"),
        F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"),
    )
    return chi.select(
        F.col("n").cast("long").alias("n"),
        F.col("nr").cast("long").alias("n_rows_cat"),
        F.col("nc").cast("long").alias("n_cols_cat"),
        F.round("chi2", 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least("nr", "nc") - F.lit(1)))
            ),
            6,
        ).alias("cramers_v"),
    )


# --- weighted_median --------------------------------------------------------


@query(
    "weighted_median",
    oracle="""
    WITH t AS (
        SELECT l_extendedprice AS price,
               CAST(l_quantity AS BIGINT) AS w,
               l_orderkey * 10 + l_linenumber AS tb
        FROM lineitem
    ),
    tot AS (SELECT sum(w) AS total FROM t),
    c AS (
        SELECT price, w,
               sum(w) OVER (ORDER BY price, tb
                            ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT ROUND(min(CASE WHEN 2 * c.cum >= tot.total
                          THEN c.price END), 2) AS w_median,
           CAST(max(tot.total) AS BIGINT) AS total_weight
    FROM c CROSS JOIN tot
    """,
)
def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median (lower): the price at which half the shipped
    QUANTITY — not half the rows — lies at-or-below (the
    units-actually-sold median every pricing analysis wants; plain
    ``median(price)`` overweights small orders). No engine has a native
    weighted quantile; the oracle states it as the global cumsum window.

    Shape at 100 TB: ``operators/prefix.bucketed_cumsum`` — the
    quantile-bucketed two-pass prefix sum shared with
    ``revenue_concentration`` — so the running weight never needs the
    oracle's single-partition window. Weights are integral units, the
    crossing test 2·cum ≥ total is exact int64, and the emitted median
    is a real data value: no float knife edge anywhere.
    """
    from vector_search_playground_spark.operators.prefix import (
        bucketed_cumsum,
    )

    # (r14, measured and rejected: fanning the projection across full
    # parallelism before caching — the fixture scan is 3 splits — cost
    # more in exchange + cache-write than the extra parallelism saved:
    # honest isolated A/B 2.60 s → 2.99 s. At production scale the scan
    # has natural splits anyway.)
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_extendedprice").alias("price"),
            F.col("l_quantity").cast("long").alias("w"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
        )
        .cache()
    )
    try:
        ranked, _n, total = bucketed_cumsum(
            li, "price", "w", tiebreak_col="tb", descending=False
        )
        row = ranked.agg(
            F.min(
                F.when(2 * F.col("cum") >= total, F.col("price"))
            ).alias("wm")
        ).first()
        # half-up like DuckDB ROUND (a no-op on 2-dp price data, but keep
        # the shared rounding discipline rather than Python banker's round)
        import math

        return spark.createDataFrame(
            [(math.floor(row["wm"] * 100 + 0.5) / 100, total)],
            "w_median double, total_weight long",
        )
    finally:
        li.unpersist()


# --- dedup_numeric ----------------------------------------------------------

_DUP_PCT = 0.01
_DUP_DAYS_US = 7 * 86_400_000_000


@query(
    "dedup_numeric",
    oracle=f"""
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b, a.o_custkey,
           ROUND(a.o_totalprice, 2) AS price_a,
           ROUND(b.o_totalprice, 2) AS price_b,
           CAST(abs(epoch_us(b.o_orderdate) - epoch_us(a.o_orderdate))
                / 86400000000 AS BIGINT) AS days_apart
    FROM orders a
    JOIN orders b ON a.o_custkey = b.o_custkey
                 AND a.o_orderkey < b.o_orderkey
                 AND abs(a.o_totalprice - b.o_totalprice)
                     <= {_DUP_PCT} * least(a.o_totalprice, b.o_totalprice)
                 AND abs(epoch_us(b.o_orderdate) - epoch_us(a.o_orderdate))
                     <= {_DUP_DAYS_US}
    """,
)
def dedup_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NUMERIC near-duplicate audit (the double-charge / double-entry
    detector): order pairs by the same customer within 1% of each
    other's price and 7 days of each other — the numeric sibling of the
    text dedup family (where those band on shingles, this bands on the
    natural entity key plus value/time tolerances).

    Shape at 100 TB: the candidate space is the per-CUSTOMER self-join —
    one shuffle on o_custkey, pair blow-up bounded by per-customer order
    counts (business-bounded), never orders². The tolerance predicates
    run inside those bounded groups. Day distance is integer µs
    arithmetic; prices compare unrounded on both engines and are only
    rounded for display.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderdate").cast("timestamp_ntz").alias("d"),
    )
    a = o.alias("a")
    b = o.alias("b")
    dt = F.abs(
        F.unix_micros(F.col("b.d").cast("timestamp"))
        - F.unix_micros(F.col("a.d").cast("timestamp"))
    )
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey")),
        )
        .where(
            (
                F.abs(F.col("a.o_totalprice") - F.col("b.o_totalprice"))
                <= _DUP_PCT
                * F.least("a.o_totalprice", "b.o_totalprice")
            )
            & (dt <= _DUP_DAYS_US)
        )
        .select(
            F.col("a.o_orderkey").alias("key_a"),
            F.col("b.o_orderkey").alias("key_b"),
            F.col("a.o_custkey").alias("o_custkey"),
            F.round("a.o_totalprice", 2).alias("price_a"),
            F.round("b.o_totalprice", 2).alias("price_b"),
            F.floor(dt / F.lit(86_400_000_000)).cast("long").alias(
                "days_apart"
            ),
        )
    )


# --- gini_index -------------------------------------------------------------


@query(
    "gini_index",
    oracle="""
    WITH cust AS (
        SELECT c.c_mktsegment AS segment, o.o_custkey,
               CAST(floor(sum(o.o_totalprice) * 100 + 0.5) AS BIGINT)
                   AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT segment, cents,
               row_number() OVER (
                   PARTITION BY segment ORDER BY cents, o_custkey
               ) AS rk
        FROM cust
    ),
    agg AS (
        SELECT segment,
               count(*) AS n,
               sum(cents) AS s,
               sum(rk * cents) AS s1
        FROM ranked GROUP BY segment
    )
    SELECT segment,
           CAST(n AS BIGINT) AS n_customers,
           CAST(s AS BIGINT) AS total_cents,
           floor((2.0 * s1 - (n + 1.0) * s) / (CAST(n AS DOUBLE) * s)
                 * 1e6 + 0.5) / 1e6 AS gini
    FROM agg
    """,
)
def gini_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue per market segment — the
    inequality member of the concentration family (the distributional
    summary next to ``revenue_concentration``'s 80/20 crossing):
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx)/(n·Σx) over per-customer revenue sorted
    ascending. Both moments are EXACT int64 (revenue in half-up floored
    cents, ranks dense integers), so the only float work is one fixed
    expression over three exact integers — identical on both engines,
    half-up floored at 6 dp.

    Shape at 100 TB: one fact hash-agg to per-customer cents (broadcast
    dim join), then EXACT per-segment ranks from
    ``operators/prefix.grouped_bucketed_rank`` — with only |segments|
    partitions, a plain ``row_number() OVER (PARTITION BY segment)``
    sorts a fifth of all customers on one task; the grouped bucketed
    rank runs quantile-bucket × segment slices in parallel and the
    rank-weighted moment folds in the same hash-agg. Driver sees
    |segments| rows.
    """
    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    orders = load_table(spark, sf_dir, "orders")
    cust_dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    cust = (
        orders.join(F.broadcast(cust_dim), orders.o_custkey == cust_dim.c_custkey)
        .groupBy("segment", "o_custkey")
        .agg(
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
        .cache()
    )
    # Materialize the |segments|-row moment table WHILE the cache is
    # alive (the mannwhitney_u discipline): the rank window is the
    # third pass over `cust`, and unpersisting before it runs would
    # recompute the whole fact join + hash-agg instead of reading the
    # cache. try/finally so a failing action can't leak the cache.
    try:
        ranked = grouped_bucketed_rank(
            cust, ["segment"], "cents", tiebreak_col="o_custkey"
        )
        agg = ranked.groupBy("segment").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("rk") * F.col("cents")).alias("s1"),
        )
        rows = agg.collect()
    finally:
        cust.unpersist()
    return spark.createDataFrame(rows, agg.schema).select(
        "segment",
        F.col("n").cast("long").alias("n_customers"),
        F.col("s").cast("long").alias("total_cents"),
        (
            F.floor(
                (2.0 * F.col("s1") - (F.col("n") + 1.0) * F.col("s"))
                / (F.col("n").cast("double") * F.col("s"))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("gini"),
    )


# --- bootstrap_ci -----------------------------------------------------------

_BOOT_B = 200  # resamples
_BOOT_A = 1103515245  # LCG multiplier (glibc)
_BOOT_C = 12345
_BOOT_M = 2147483648  # 2^31


@query(
    "bootstrap_ci",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(sum(l_extendedprice) * 100 + 0.5) AS BIGINT)
                   AS cents,
               row_number() OVER (ORDER BY l_shipdate) - 1 AS day_idx
        FROM lineitem GROUP BY l_shipdate
    ),
    nd AS (SELECT count(*) AS d FROM daily),
    draws AS (
        SELECT b.b, i.i,
               ({_BOOT_A} * (b.b * 1000 + i.i) + {_BOOT_C})
                   % {_BOOT_M} % (SELECT d FROM nd) AS idx
        FROM (SELECT unnest(range({_BOOT_B})) AS b) b
        CROSS JOIN (
            SELECT unnest(range((SELECT d FROM nd))) AS i
        ) i
    ),
    sums AS (
        SELECT d.b, sum(daily.cents) AS boot_cents
        FROM draws d JOIN daily ON daily.day_idx = d.idx
        GROUP BY d.b
    ),
    ordered AS (
        SELECT boot_cents,
               row_number() OVER (ORDER BY boot_cents, b) AS rk
        FROM sums
    )
    SELECT CAST((SELECT d FROM nd) AS BIGINT) AS n_days,
           CAST((SELECT sum(cents) FROM daily) AS BIGINT) AS total_cents,
           CAST(max(CASE WHEN rk = {int(0.025 * _BOOT_B)} THEN boot_cents
                    END) AS BIGINT) AS ci_lo_cents,
           CAST(max(CASE WHEN rk = {int(0.975 * _BOOT_B)} THEN boot_cents
                    END) AS BIGINT) AS ci_hi_cents
    FROM ordered
    """,
)
def bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for total daily revenue — the
    'error bars without distributional assumptions' verb every
    experiment readout wants: {b} deterministic resamples of the daily
    revenue series (with replacement), 95% CI from the order statistics
    of the resampled sums. The resampling indices come from an explicit
    LCG (glibc constants) evaluated identically in both engines, and
    every statistic is EXACT int64 cents — the entire bootstrap is
    hash-certifiable, no RNG seeds or float accumulation anywhere.

    Shape at 100 TB: the corpus collapses to the |days|-row daily
    relation in ONE hash-agg; the B×|days| draw grid is generated
    metadata (never touches the fact table) and joins the daily
    relation broadcast. The order-statistic window runs over B rows.
    """.format(b=_BOOT_B)
    li = load_table(spark, sf_dir, "lineitem")
    daily = (
        li.groupBy("l_shipdate")
        .agg(
            F.floor(F.sum("l_extendedprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
        .withColumn(
            "day_idx",
            F.row_number().over(Window.orderBy("l_shipdate")) - 1,
        )
        .cache()
    )
    try:
        d = daily.count()
        total = daily.agg(F.sum("cents")).first()[0]
        draws = (
            spark.range(_BOOT_B)
            .select(F.col("id").alias("b"))
            .crossJoin(spark.range(d).select(F.col("id").alias("i")))
            .select(
                "b",
                (
                    (_BOOT_A * (F.col("b") * 1000 + F.col("i")) + _BOOT_C)
                    % _BOOT_M
                    % d
                ).alias("idx"),
            )
        )
        sums = (
            draws.join(
                F.broadcast(daily.select("day_idx", "cents")),
                draws.idx == F.col("day_idx"),
            )
            .groupBy("b")
            .agg(F.sum("cents").alias("boot_cents"))
        )
        ordered = sums.withColumn(
            "rk", F.row_number().over(Window.orderBy("boot_cents", "b"))
        )
        lo_rk, hi_rk = int(0.025 * _BOOT_B), int(0.975 * _BOOT_B)
        return ordered.agg(
            F.lit(d).cast("long").alias("n_days"),
            F.lit(total).cast("long").alias("total_cents"),
            F.max(
                F.when(F.col("rk") == lo_rk, F.col("boot_cents"))
            ).alias("ci_lo_cents"),
            F.max(
                F.when(F.col("rk") == hi_rk, F.col("boot_cents"))
            ).alias("ci_hi_cents"),
        )
    finally:
        daily.unpersist()


# --- cross_correlation ------------------------------------------------------

_XCORR_A, _XCORR_B = "click", "purchase"
_XCORR_MAX_LAG = 7


@query(
    "cross_correlation",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               count(*) FILTER (WHERE event_type = '{_XCORR_A}') AS xa,
               count(*) FILTER (WHERE event_type = '{_XCORR_B}') AS xb
        FROM events GROUP BY 1
    ),
    lags AS (
        SELECT unnest(range(-{_XCORR_MAX_LAG}, {_XCORR_MAX_LAG + 1}))
            AS lag
    ),
    pairs AS (
        SELECT l.lag, a.xa, b.xb
        FROM lags l
        JOIN daily a ON true
        JOIN daily b ON b.day = a.day + to_days(CAST(l.lag AS INT))
    ),
    m AS (
        SELECT lag, count(*) AS n,
               sum(xa) AS sa, sum(xb) AS sb,
               sum(xa * xb) AS sab,
               sum(xa * xa) AS saa, sum(xb * xb) AS sbb
        FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
           floor((n * sab - sa * sb)
                 / sqrt((n * saa - sa * sa) * 1.0 * (n * sbb - sb * sb))
                 * 1e6 + 0.5) / 1e6 AS r
    FROM m
    ORDER BY lag
    """,
)
def cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged cross-correlation between the daily '{a}' and '{b}' event
    series (lags −{k}..+{k} days): does activity in one series lead the
    other — the attribution/leading-indicator diagnostic next to
    ``autocorrelation``. Every accumulator (n, Σx, Σy, Σxy, Σx², Σy²)
    is an EXACT int64 over integer daily counts; r is one fixed float
    expression over them, half-up floored at 6 dp on both engines.

    Shape at 100 TB: the event stream collapses to |days| rows in ONE
    conditional hash-agg; the lag alignment is a |lags|×|days| join of
    that metadata relation with itself (broadcast), and the moment agg
    yields |lags| rows. Nothing past the first agg scales with events.
    """.format(a=_XCORR_A, b=_XCORR_B, k=_XCORR_MAX_LAG)
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.sum(
                (F.col("event_type") == _XCORR_A).cast("long")
            ).alias("xa"),
            F.sum(
                (F.col("event_type") == _XCORR_B).cast("long")
            ).alias("xb"),
        )
        .cache()
    )
    try:
        lags = spark.range(-_XCORR_MAX_LAG, _XCORR_MAX_LAG + 1).select(
            F.col("id").cast("int").alias("lag")
        )
        a = daily.select(F.col("day").alias("day_a"), "xa")
        b = daily.select(F.col("day").alias("day_b"), "xb")
        pairs = (
            lags.crossJoin(F.broadcast(a))
            .join(
                F.broadcast(b),
                F.col("day_b") == F.date_add(F.col("day_a"), F.col("lag")),
            )
        )
        m = pairs.groupBy("lag").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("xa").alias("sa"),
            F.sum("xb").alias("sb"),
            F.sum(F.col("xa") * F.col("xb")).alias("sab"),
            F.sum(F.col("xa") * F.col("xa")).alias("saa"),
            F.sum(F.col("xb") * F.col("xb")).alias("sbb"),
        )
        out = m.select(
            F.col("lag").cast("long").alias("lag"),
            F.col("n").cast("long").alias("n_days"),
            (
                F.floor(
                    (F.col("n") * F.col("sab") - F.col("sa") * F.col("sb"))
                    / F.sqrt(
                        (F.col("n") * F.col("saa") - F.col("sa") * F.col("sa"))
                        * 1.0
                        * (F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb"))
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("r"),
        ).orderBy("lag")
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        daily.unpersist()
