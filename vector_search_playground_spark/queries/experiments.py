"""Experiment & monitoring statistics tier — the verbs an ML platform
runs NEXT TO the training-data pipeline: A/B significance (Welch),
distribution equality (two-sample KS), drift (PSI), robust summary
(winsorized means), dependence (mutual information), cohort economics
(LTV curves), privacy audit (l-diversity), and graph structure
(triangle counting).

Reference parity: the reference (a pgvector CLI, `src/main.rs:5,85-96`)
exposes none of these — this tier extends the engine the way SURVEY §2's
addenda contract allows: operations a large-scale data platform needs,
each hash-certified against a DuckDB oracle.

Numeric discipline (registry docstring + FIXTURES.md): money flows as
per-row integer cents via floor(x·100 + 0.5) so sums are exact int64;
every reported double is rounded with the SHARED half-up
floor(x·10^k + 0.5)/10^k expression evaluated inside BOTH engines
(never Python round(), never engine-native ROUND, which disagree on
knife edges); log/sqrt noise is ulp-level and 4–6 dp rounding absorbs
it; any ORDER BY on a float orders the ROUNDED value with a string
tiebreak so top-k selection is cross-engine deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table

# --- ab_test_welch ----------------------------------------------------------

_AB_A = "BUILDING"
_AB_B = "MACHINERY"


@query(
    "ab_test_welch",
    oracle=f"""
    WITH j AS (
        SELECT c_mktsegment AS seg, o_totalprice AS x,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('{_AB_A}', '{_AB_B}')
    ),
    s AS (
        SELECT count(*) FILTER (WHERE seg = '{_AB_A}') AS na,
               count(*) FILTER (WHERE seg = '{_AB_B}') AS nb,
               sum(cents) FILTER (WHERE seg = '{_AB_A}') AS sa,
               sum(cents) FILTER (WHERE seg = '{_AB_B}') AS sb,
               var_samp(x) FILTER (WHERE seg = '{_AB_A}') AS va,
               var_samp(x) FILTER (WHERE seg = '{_AB_B}') AS vb
        FROM j
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(floor(CAST(sa AS DOUBLE) / na + 0.5) AS BIGINT)
               AS mean_cents_a,
           CAST(floor(CAST(sb AS DOUBLE) / nb + 0.5) AS BIGINT)
               AS mean_cents_b,
           floor((CAST(sa AS DOUBLE) / na - CAST(sb AS DOUBLE) / nb) / 100.0
                 / sqrt(va / na + vb / nb) * 1e4 + 0.5) / 1e4 AS t_stat,
           floor(pow(va / na + vb / nb, 2)
                 / (pow(va / na, 2) / (na - 1) + pow(vb / nb, 2) / (nb - 1))
                 * 100 + 0.5) / 100 AS welch_df
    FROM s
    """,
)
def ab_test_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    order values — the A/B-experiment readout (difference of means,
    t statistic, Welch–Satterthwaite degrees of freedom). Welch, not
    Student: segment sizes and variances differ, and pooled-variance t
    is the classic experiment-analysis bug.

    Shape at 100 TB: ONE conditional hash-agg over the fact stream
    behind a broadcast dimension join — count/sum/var partials combine
    map-side, the driver sees six numbers. Means ride exact integer
    cents; only t/df touch float variance, rounded 4/2 dp with the
    shared half-up floor (engine var_samp noise is ~1e-12 relative).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_AB_A, _AB_B)
    )
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("x"),
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents"),
    )
    a, b = F.col("seg") == _AB_A, F.col("seg") == _AB_B
    s = j.agg(
        F.count(F.when(a, 1)).alias("na"),
        F.count(F.when(b, 1)).alias("nb"),
        F.sum(F.when(a, F.col("cents"))).alias("sa"),
        F.sum(F.when(b, F.col("cents"))).alias("sb"),
        F.var_samp(F.when(a, F.col("x"))).alias("va"),
        F.var_samp(F.when(b, F.col("x"))).alias("vb"),
    )
    ma = F.col("sa").cast("double") / F.col("na")
    mb = F.col("sb").cast("double") / F.col("nb")
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.floor(ma + 0.5).cast("long").alias("mean_cents_a"),
        F.floor(mb + 0.5).cast("long").alias("mean_cents_b"),
        (F.floor((ma - mb) / 100.0 / F.sqrt(se2) * 1e4 + 0.5) / 1e4).alias(
            "t_stat"
        ),
        (
            F.floor(
                F.pow(se2, 2)
                / (
                    F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                    + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
                )
                * 100
                + 0.5
            )
            / 100
        ).alias("welch_df"),
    )


# --- ks_2sample -------------------------------------------------------------

_KS_A = "AUTOMOBILE"
_KS_B = "HOUSEHOLD"


@query(
    "ks_2sample",
    oracle=f"""
    WITH s AS (
        SELECT c_acctbal AS v,
               count(*) FILTER (WHERE c_mktsegment = '{_KS_A}') AS ca,
               count(*) FILTER (WHERE c_mktsegment = '{_KS_B}') AS cb
        FROM customer
        WHERE c_mktsegment IN ('{_KS_A}', '{_KS_B}')
        GROUP BY c_acctbal
    ),
    t AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM s),
    c AS (
        SELECT abs(sum(s.ca * t.nb - s.cb * t.na)
                   OVER (ORDER BY s.v ROWS UNBOUNDED PRECEDING)) AS adev
        FROM s CROSS JOIN t
    )
    SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
           CAST(max(c.adev) AS BIGINT) AS d_num,
           floor(CAST(max(c.adev) AS DOUBLE) / (t.na * t.nb) * 1e6 + 0.5)
               / 1e6 AS ks_d
    FROM c CROSS JOIN t
    GROUP BY t.na, t.nb
    """,
)
def ks_2sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between two segments'
    account-balance distributions — the nonparametric 'did the
    distribution shift?' test that pairs with ``psi_drift`` (bucketed)
    and ``embedding_drift`` (vectors). D is computed EXACTLY in
    integers: at each distinct value, |F_a − F_b| has common
    denominator na·nb, so the running deviation na_le·nb − nb_le·na is
    a signed-int64 cumulative sum — no float CDF anywhere; only the
    final ratio is floated, floor-rounded at 6 dp.

    Shape at 100 TB: one hash-agg collapses the sample to its distinct
    values; the running deviation is the BUCKETED two-pass prefix sum
    (``operators/prefix``) — the oracle's global ORDER BY window is a
    single-partition whale stated only for certification. Driver sees
    one row.
    """
    from vector_search_playground_spark.operators.prefix import (
        bucketed_cumsum,
    )

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_KS_A, _KS_B)
    )
    s = (
        cust.groupBy(F.col("c_acctbal").alias("v"))
        .agg(
            F.count(F.when(F.col("c_mktsegment") == _KS_A, 1)).alias("ca"),
            F.count(F.when(F.col("c_mktsegment") == _KS_B, 1)).alias("cb"),
        )
        .cache()
    )
    try:
        tot = s.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb")).first()
        na, nb = tot["na"], tot["nb"]
        dev = s.withColumn(
            "w", F.col("ca") * F.lit(nb) - F.col("cb") * F.lit(na)
        )
        ranked, _n, _total = bucketed_cumsum(
            dev, "v", "w", tiebreak_col="v"
        )
        d_num = ranked.agg(F.max(F.abs(F.col("cum"))).alias("d")).first()["d"]
    finally:
        s.unpersist()
    return spark.createDataFrame(
        [(na, nb, d_num)], "n_a long, n_b long, d_num long"
    ).select(
        "n_a",
        "n_b",
        "d_num",
        (
            F.floor(
                F.col("d_num").cast("double") / (na * nb) * 1e6 + 0.5
            )
            / 1e6
        ).alias("ks_d"),
    )


# --- psi_drift --------------------------------------------------------------

_PSI_SPLIT = "1998-07-01"
_PSI_WIDTH = 50_000
_PSI_BUCKETS = 10


@query(
    "psi_drift",
    oracle=f"""
    WITH o AS (
        SELECT least(CAST(floor(o_totalprice / {_PSI_WIDTH}) AS BIGINT),
                     {_PSI_BUCKETS - 1}) AS bucket,
               CASE WHEN o_orderdate < TIMESTAMP '{_PSI_SPLIT}'
                    THEN 1 ELSE 0 END AS is_ref
        FROM orders
    ),
    c AS (
        SELECT bucket,
               sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
        FROM o GROUP BY bucket
    ),
    t AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM c),
    spine AS (SELECT unnest(range({_PSI_BUCKETS})) AS bucket),
    p AS (
        SELECT spine.bucket,
               COALESCE(c.n_ref, 0) AS n_ref, COALESCE(c.n_cur, 0) AS n_cur,
               (COALESCE(c.n_ref, 0) + 1.0) / (t.tr + {_PSI_BUCKETS})
                   AS pr,
               (COALESCE(c.n_cur, 0) + 1.0) / (t.tc + {_PSI_BUCKETS})
                   AS pc
        FROM spine LEFT JOIN c ON spine.bucket = c.bucket CROSS JOIN t
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
           floor((pr - pc) * ln(pr / pc) * 1e6 + 0.5) / 1e6 AS psi_term
    FROM p
    """,
)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between the first and second half of
    the order history — the standard production-ML drift monitor: order
    values bucketed into {b} fixed-width bins, PSI term
    (p_ref − p_cur)·ln(p_ref/p_cur) per bin with add-one (Laplace)
    smoothing so empty bins stay finite. Σ psi_term > 0.2 is the
    conventional 'retrain' alarm.

    Shape at 100 TB: bucket assignment is a pure row-local map pushed
    onto the scan; ONE conditional hash-agg yields {b} (ref, cur) count
    pairs — metadata — and the smoothing/log arithmetic runs on that.
    The bucket spine is generated (never collected), so absent buckets
    appear deterministically on both engines. Counts are exact ints;
    the single float expression is floor-rounded at 6 dp.
    """.format(b=_PSI_BUCKETS)
    orders = load_table(spark, sf_dir, "orders")
    c = (
        orders.select(
            F.least(
                F.floor(F.col("o_totalprice") / _PSI_WIDTH).cast("long"),
                F.lit(_PSI_BUCKETS - 1),
            ).alias("bucket"),
            F.when(
                F.col("o_orderdate") < F.lit(_PSI_SPLIT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("is_ref"),
        )
        .groupBy("bucket")
        .agg(
            F.sum("is_ref").alias("n_ref"),
            F.sum(1 - F.col("is_ref")).alias("n_cur"),
        )
    )
    spine = spark.range(_PSI_BUCKETS).withColumnRenamed("id", "bucket")
    t = c.agg(F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc"))
    p = (
        spine.join(c, "bucket", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
            (
                (F.coalesce("n_ref", F.lit(0)) + 1.0)
                / (F.col("tr") + _PSI_BUCKETS)
            ).alias("pr"),
            (
                (F.coalesce("n_cur", F.lit(0)) + 1.0)
                / (F.col("tc") + _PSI_BUCKETS)
            ).alias("pc"),
        )
    )
    return p.select(
        F.col("bucket").cast("long").alias("bucket"),
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        (
            F.floor(
                (F.col("pr") - F.col("pc"))
                * F.log(F.col("pr") / F.col("pc"))
                * 1e6
                + 0.5
            )
            / 1e6
        ).alias("psi_term"),
    )


# --- winsorize_stats --------------------------------------------------------

_WINS_LO = 0.05
_WINS_HI = 0.95


@query(
    "winsorize_stats",
    oracle=f"""
    WITH q AS (
        SELECT l_returnflag AS k,
               quantile_cont(l_extendedprice, {_WINS_LO}) AS lo,
               quantile_cont(l_extendedprice, {_WINS_HI}) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag AS rflag,
           CAST(count(*) AS BIGINT) AS n,
           floor(max(q.lo) * 1e6 + 0.5) / 1e6 AS lo,
           floor(max(q.hi) * 1e6 + 0.5) / 1e6 AS hi,
           floor(avg(CASE WHEN l.l_extendedprice < q.lo THEN q.lo
                          WHEN l.l_extendedprice > q.hi THEN q.hi
                          ELSE l.l_extendedprice END) * 1e4 + 0.5) / 1e4
               AS win_mean,
           floor(avg(l.l_extendedprice) * 1e4 + 0.5) / 1e4 AS raw_mean
    FROM lineitem l JOIN q ON l.l_returnflag = q.k
    GROUP BY l.l_returnflag
    """,
)
def winsorize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per group — clamp each group's prices to its own
    [p5, p95] before averaging: the robust location estimate reporting
    pipelines use when raw means are hostage to outliers (and the
    aggregate sibling of ``outliers_mad``'s row-level flagging).

    Shape at 100 TB: the per-group p5/p95 come from the distributed
    3-pass width-bucket selection (``operators/selection``), NOT a
    holistic percentile buffer; the clamp+mean is then one conditional
    hash-agg with the ≤|groups| bounds broadcast as literals. The
    oracle's quantile_cont is bit-identical to the selection operator's
    interpolation (the funnel_latency/quantile_groups precedent), so
    the clamp thresholds agree exactly.
    """
    from vector_search_playground_spark.operators.selection import (
        exact_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rflag"),
        F.col("l_extendedprice").alias("price"),
    )
    li = li.cache()
    try:
        per = exact_quantiles(li, "rflag", "price", [_WINS_LO, _WINS_HI])
        lo_map = F.create_map(
            *[F.lit(x) for k, q in per.items() for x in (k, q[_WINS_LO])]
        )
        hi_map = F.create_map(
            *[F.lit(x) for k, q in per.items() for x in (k, q[_WINS_HI])]
        )
        lo, hi = lo_map[F.col("rflag")], hi_map[F.col("rflag")]
        clipped = (
            F.when(F.col("price") < lo, lo)
            .when(F.col("price") > hi, hi)
            .otherwise(F.col("price"))
        )
        return (
            li.groupBy("rflag")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.first(F.floor(lo * 1e6 + 0.5) / 1e6).alias("lo"),
                F.first(F.floor(hi * 1e6 + 0.5) / 1e6).alias("hi"),
                (F.floor(F.avg(clipped) * 1e4 + 0.5) / 1e4).alias(
                    "win_mean"
                ),
                (F.floor(F.avg("price") * 1e4 + 0.5) / 1e4).alias(
                    "raw_mean"
                ),
            )
        )
    finally:
        li.unpersist()


# --- mutual_info ------------------------------------------------------------


@query(
    "mutual_info",
    oracle="""
    WITH cell AS (
        SELECT e.event_type AS a, c.c_mktsegment AS b, count(*) AS o
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY a, b
    ),
    t AS (SELECT sum(o) AS n FROM cell),
    mar AS (
        SELECT a, b, o,
               sum(o) OVER (PARTITION BY a) AS ra,
               sum(o) OVER (PARTITION BY b) AS cb
        FROM cell
    ),
    mi AS (
        SELECT sum((CAST(o AS DOUBLE) / t.n)
                   * ln(CAST(o AS DOUBLE) * t.n
                        / (CAST(ra AS DOUBLE) * cb))) AS mi
        FROM mar CROSS JOIN t
    ),
    ha AS (
        SELECT -sum((CAST(ra AS DOUBLE) / t.n)
                    * ln(CAST(ra AS DOUBLE) / t.n)) AS h
        FROM (SELECT a, sum(o) AS ra FROM cell GROUP BY a)
        CROSS JOIN t
    ),
    hb AS (
        SELECT -sum((CAST(cb AS DOUBLE) / t.n)
                    * ln(CAST(cb AS DOUBLE) / t.n)) AS h
        FROM (SELECT b, sum(o) AS cb FROM cell GROUP BY b)
        CROSS JOIN t
    )
    SELECT CAST(t.n AS BIGINT) AS n,
           floor(mi.mi * 1e6 + 0.5) / 1e6 AS mi_nats,
           floor(ha.h * 1e6 + 0.5) / 1e6 AS h_a,
           floor(hb.h * 1e6 + 0.5) / 1e6 AS h_b,
           floor(mi.mi / sqrt(ha.h * hb.h) * 1e6 + 0.5) / 1e6 AS nmi
    FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN t
    """,
)
def mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (and normalized MI) between event type and
    customer segment — the information-theoretic sibling of
    ``corr_categorical``'s Cramér's V over the same contingency table:
    MI captures ANY dependence, not just linear-in-χ² association, and
    normalized MI = MI/√(H(A)H(B)) makes it comparable across tables.

    Shape at 100 TB: identical to corr_categorical — the fact stream
    collapses to a |types|·|segments| contingency table in one hash-agg
    behind a broadcast dim join; marginals, entropies and MI are
    arithmetic on that 25-cell relation. Counts exact ints; ln noise is
    ulp-level under the 6 dp floor rounding.
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
        .cache()
    )
    try:
        n = cell.agg(F.sum("o")).first()[0]
        wa, wb = Window.partitionBy("a"), Window.partitionBy("b")
        mar = cell.select(
            "o",
            F.sum("o").over(wa).alias("ra"),
            F.sum("o").over(wb).alias("cb"),
        )
        mi = mar.agg(
            F.sum(
                (F.col("o").cast("double") / F.lit(n))
                * F.log(
                    F.col("o").cast("double")
                    * F.lit(n)
                    / (F.col("ra").cast("double") * F.col("cb"))
                )
            ).alias("mi")
        ).first()["mi"]
        ha = (
            cell.groupBy("a")
            .agg(F.sum("o").alias("ra"))
            .agg(
                (
                    -F.sum(
                        (F.col("ra").cast("double") / F.lit(n))
                        * F.log(F.col("ra").cast("double") / F.lit(n))
                    )
                ).alias("h")
            )
            .first()["h"]
        )
        hb = (
            cell.groupBy("b")
            .agg(F.sum("o").alias("cb"))
            .agg(
                (
                    -F.sum(
                        (F.col("cb").cast("double") / F.lit(n))
                        * F.log(F.col("cb").cast("double") / F.lit(n))
                    )
                ).alias("h")
            )
            .first()["h"]
        )
    finally:
        cell.unpersist()
    return spark.createDataFrame(
        [(n, mi, ha, hb)], "n long, mi double, ha double, hb double"
    ).select(
        "n",
        (F.floor(F.col("mi") * 1e6 + 0.5) / 1e6).alias("mi_nats"),
        (F.floor(F.col("ha") * 1e6 + 0.5) / 1e6).alias("h_a"),
        (F.floor(F.col("hb") * 1e6 + 0.5) / 1e6).alias("h_b"),
        (
            F.floor(
                F.col("mi") / F.sqrt(F.col("ha") * F.col("hb")) * 1e6 + 0.5
            )
            / 1e6
        ).alias("nmi"),
    )


# --- cohort_ltv -------------------------------------------------------------


@query(
    "cohort_ltv",
    oracle="""
    WITH f AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS d0
        FROM events GROUP BY user_id
    ),
    p AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    g AS (
        SELECT strftime(f.d0, '%Y-%m-%d') AS cohort,
               p.d - f.d0 AS age_days,
               count(DISTINCT p.user_id) AS n_buyers,
               sum(p.cents) AS rev
        FROM p JOIN f USING (user_id)
        GROUP BY cohort, age_days
    )
    SELECT cohort, CAST(age_days AS BIGINT) AS age_days,
           CAST(n_buyers AS BIGINT) AS n_buyers,
           CAST(rev AS BIGINT) AS rev_cents,
           CAST(sum(rev) OVER (PARTITION BY cohort ORDER BY age_days
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_rev_cents
    FROM g
    """,
)
def cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users grouped by first-seen day,
    purchase revenue accumulated by days-since-acquisition — the
    economics companion to ``retention_cohorts`` (which counts activity,
    not money). Revenue flows as per-event integer cents so every sum
    and running total is exact int64.

    Shape at 100 TB: first-seen is one user_id hash-agg; purchases join
    it on the SAME key (one exchange, reused); the (cohort, age) grid is
    |days|² — metadata — so the cumulative window over it is free. The
    event stream is never globally sorted.
    """
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("d0")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    g = (
        p.join(f, "user_id")
        .groupBy(
            F.date_format("d0", "yyyy-MM-dd").alias("cohort"),
            F.datediff("d", "d0").cast("long").alias("age_days"),
        )
        .agg(
            F.countDistinct("user_id").cast("long").alias("n_buyers"),
            F.sum("cents").alias("rev"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("age_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return g.select(
        "cohort",
        "age_days",
        "n_buyers",
        F.col("rev").cast("long").alias("rev_cents"),
        F.sum("rev").over(w).cast("long").alias("cum_rev_cents"),
    )


# --- l_diversity ------------------------------------------------------------

_LDIV_L = 3


@query(
    "l_diversity",
    oracle=f"""
    SELECT CAST(c.c_nationkey AS INTEGER) AS nation,
           c.c_mktsegment AS segment,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l_distinct,
           count(DISTINCT o.o_orderpriority) < {_LDIV_L} AS is_risky
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey, c.c_mktsegment
    """,
)
def l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the privacy check one step past
    ``k_anonymity``: a quasi-identifier class (nation × segment) can be
    large (k-anonymous) yet still leak if everyone in it shares the same
    sensitive value; l-diversity requires ≥ l DISTINCT sensitive values
    (order priority) per class. Emits every class with its l so the
    result is non-vacuous at every SF (the k_anonymity empty-result
    lesson), flagging classes below l = {l}.

    Shape at 100 TB: one hash-agg with a distinct-count on a 5-value
    domain behind a broadcast dimension join — the distinct partials are
    bounded by the sensitive-attribute cardinality, so map-side combine
    keeps the shuffle at |classes|·|domain|. Exact integers throughout.
    """.format(l=_LDIV_L)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
        .groupBy(
            F.col("c_nationkey").cast("int").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.countDistinct("o_orderpriority").cast("long").alias(
                "l_distinct"
            ),
        )
        .withColumn("is_risky", F.col("l_distinct") < _LDIV_L)
    )


# --- graph_triangles --------------------------------------------------------

_TRI_MIN_QTY = 45


@query(
    "graph_triangles",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey, l_partkey FROM lineitem
        WHERE l_quantity >= {_TRI_MIN_QTY}
    ),
    e AS (
        SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
        FROM big l1 JOIN big l2
          ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
    )
    , tri AS (
        SELECT count(*) AS n_triangles
        FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT n_triangles FROM tri) AS BIGINT) AS n_triangles
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-purchase graph (parts appearing
    in the same high-quantity order are adjacent) — the clustering
    primitive behind community detection and recommend-together
    features, and the classic 'joins as graph algorithm' stress test.

    Shape at 100 TB: edges are oriented a < b by id, so each triangle
    is counted ONCE as the ordered path a<b<c closed by edge (a,c) —
    two hash joins on the edge relation, never a cartesian wedge
    enumeration. The production refinement is degree-ordering (orient
    from low- to high-degree) which bounds wedge counts by arboricity;
    id-ordering keeps the oracle SQL identical while preserving the
    join shape. Edge derivation collapses per-order part sets before
    pairing, so the pair blow-up is per-order C(k,2), never corpus².
    """
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= _TRI_MIN_QTY
    )
    l1 = li.select("l_orderkey", F.col("l_partkey").alias("a"))
    l2 = li.select("l_orderkey", F.col("l_partkey").alias("b"))
    e = (
        l1.join(l2, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .cache()
    )
    try:
        n_edges = e.count()
        e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
        tri = (
            e1.join(e2, "y")
            .join(e3, ["x", "z"])
            .count()
        )
    finally:
        e.unpersist()
    return spark.createDataFrame(
        [(n_edges, tri)], "n_edges long, n_triangles long"
    )


# --- benford_test -----------------------------------------------------------


@query(
    "benford_test",
    oracle="""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS digit
        FROM orders
    ),
    o AS (SELECT digit, count(*) AS n_obs FROM c GROUP BY digit),
    t AS (SELECT sum(n_obs) AS n FROM o),
    spine AS (SELECT unnest(range(1, 10)) AS digit)
    SELECT CAST(spine.digit AS BIGINT) AS digit,
           CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
           floor(COALESCE(o.n_obs, 0) * 1.0 / t.n * 1e6 + 0.5) / 1e6
               AS obs_p,
           floor(log10(1.0 + 1.0 / spine.digit) * 1e6 + 0.5) / 1e6
               AS exp_p,
           floor(pow(COALESCE(o.n_obs, 0)
                     - t.n * log10(1.0 + 1.0 / spine.digit), 2)
                 / (t.n * log10(1.0 + 1.0 / spine.digit)) * 1e4 + 0.5) / 1e4
               AS chi2_term
    FROM spine LEFT JOIN o ON spine.digit = o.digit CROSS JOIN t
    """,
)
def benford_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order values — the classic
    forensic-accounting / synthetic-data smell test: natural multi-scale
    amounts follow P(d) = log10(1 + 1/d); fabricated or truncated data
    doesn't. Per-digit observed vs expected shares with χ² terms
    (Σ chi2_term vs the χ²₈ critical value is the verdict).

    The leading digit is extracted from the EXACT integer-cents string
    (floor(x·100 + 0.5) then int→text, identical on both engines) —
    never floor(log10(x)), whose off-by-one at exact powers of ten
    differs per libm. Shape at 100 TB: a row-local map then ONE 9-row
    hash-agg; expectations and χ² are arithmetic on the generated digit
    spine. Counts exact; floats floor-rounded 6/4 dp.
    """
    orders = load_table(spark, sf_dir, "orders")
    o = (
        orders.select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = spark.range(1, 10).withColumnRenamed("id", "digit")
    t = o.agg(F.sum("n_obs").alias("n"))
    exp_p = F.log10(1.0 + 1.0 / F.col("digit"))
    n_obs = F.coalesce("n_obs", F.lit(0))
    return (
        spine.join(o, "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            F.col("digit").cast("long").alias("digit"),
            n_obs.cast("long").alias("n_obs"),
            (F.floor(n_obs * 1.0 / F.col("n") * 1e6 + 0.5) / 1e6).alias(
                "obs_p"
            ),
            (F.floor(exp_p * 1e6 + 0.5) / 1e6).alias("exp_p"),
            (
                F.floor(
                    F.pow(n_obs - F.col("n") * exp_p, 2)
                    / (F.col("n") * exp_p)
                    * 1e4
                    + 0.5
                )
                / 1e4
            ).alias("chi2_term"),
        )
    )


# --- als_recommend ----------------------------------------------------------

_ALS_RANK = 8
_ALS_ITER = 5
_ALS_K = 3
_ALS_USER_MOD = 50


@query("als_recommend")  # rows-only: factorization is iterative/seeded —
# structure (k recs per sampled user, catalog membership, rank ordering)
# is pinned by tests/test_round6_ops.py
def als_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Implicit-feedback collaborative filtering (Hu/Koren/Volinsky 2008)
    via MLlib ALS over the customer×part purchase matrix — the
    recommender verb next to the content-based KNN family: co-purchase
    structure, not embedding geometry. Top-{k} part recommendations per
    sampled user (every {m}-th customer), already-purchased parts NOT
    excluded (the self-retrieval sanity signal).

    Shape at 100 TB: the ratings matrix is ONE hash-agg off the fact
    join; ALS itself is the canonical distributed factorization —
    block-to-block alternating least squares where each iteration
    shuffles only factor blocks (rank-{r} vectors), never the ratings
    re-materialized. Model artifacts are |users|·{r} + |items|·{r}
    floats — the same 'model is metadata relative to the corpus'
    posture as the IVF centroids. Scores are float and seed-dependent,
    so the certified surface is structural (rows-only), like the other
    approximate/iterative operators — but QUALITY rides in-row: for
    each sampled user with ≥2 purchased parts, their single
    strongest-signal item (highest count, ties → lowest part id) is
    HELD OUT of training, and the row carries whether the model
    re-surfaced it in the top-{k} (``holdout_hit``) plus the global
    ``hit_rate_at_k`` — the standard leave-one-out evaluation from the
    implicit-ALS literature, so the driver's rows-only check pins
    recommendation quality, not just shape (the ``eval_retrieval``
    discipline applied to the recommender).
    """.format(k=_ALS_K, m=_ALS_USER_MOD, r=_ALS_RANK)
    from pyspark.ml.recommendation import ALS

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").cast("int").alias("user"),
            F.col("l_partkey").cast("int").alias("item"),
        )
        .agg(F.count(F.lit(1)).cast("float").alias("rating"))
        # (r14, measured and rejected: persisting this relation — it
        # feeds seven subtrees — lost ~9% in an interleaved in-session
        # A/B at sf0.1 AND doubled the full-bench number under memory
        # pressure; the recomputed hash-aggs run concurrently on idle
        # cores while the cache write/read serializes. See
        # OPTIMIZATION_r14.md section 9.)
    )
    # leave-one-out holdout: sampled users' top item, only where the user
    # keeps ≥1 training item (so cold-start drop cannot erase them)
    w = Window.partitionBy("user").orderBy(
        F.desc("rating"), F.asc("item")
    )
    sampled = ratings.where(F.col("user") % _ALS_USER_MOD == 0)
    held = (
        sampled.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_items", F.count(F.lit(1)).over(Window.partitionBy("user"))
        )
        .where((F.col("rn") == 1) & (F.col("n_items") >= 2))
        .select("user", F.col("item").alias("held_item"))
        # (same r14 rejected-persist note as `ratings` above)
    )
    train = ratings.join(
        held,
        (ratings.user == held.user) & (ratings.item == held.held_item),
        "left_anti",
    )
    # Scale-adaptive ALS blocking (r15; guide §2.2 — fewer, larger
    # blocks): MLlib defaults numUser/ItemBlocks to defaultParallelism,
    # which at local[32] splits the sf0.1 ratings (~150k user-item
    # pairs) into 32×32 in/out-block pairs of a few dozen rows each —
    # the five training iterations then pay per-task scheduling for
    # near-empty work (profiled via the jobs API: per-iteration task
    # counts 25→131, 10 aggregate jobs). Size blocks to the data: the
    # ratings relation is bounded above by the lineitem row count (one
    # pair per line item before the hash-agg collapses repeats), read
    # DRIVER-SIDE from the parquet footer (metadata, no Spark action),
    # targeting ~100k ratings per block and clamped to
    # [2, defaultParallelism] so a real cluster still fans out with the
    # data. Block layout feeds MLlib's seeded per-block init, so scores
    # move within quality bands (rows-only query; the scorecard tests
    # pin slate completeness + train-fit AUC, and the spill certificate
    # compares equal-layout arms).
    import os

    import pyarrow.parquet as pq

    n_li = pq.read_metadata(
        os.path.join(sf_dir, "lineitem.parquet")
    ).num_rows
    blocks = max(
        2, min(spark.sparkContext.defaultParallelism, n_li // 100_000)
    )
    als = ALS(
        rank=_ALS_RANK,
        maxIter=_ALS_ITER,
        implicitPrefs=True,
        seed=42,
        userCol="user",
        itemCol="item",
        ratingCol="rating",
        coldStartStrategy="drop",
        numUserBlocks=blocks,
        numItemBlocks=blocks,
    )
    model = als.fit(train)
    users = ratings.select("user").distinct().where(
        F.col("user") % _ALS_USER_MOD == 0
    )
    recs = model.recommendForUserSubset(users, _ALS_K)
    flat = recs.select(
        F.col("user").cast("long").alias("user_id"),
        F.posexplode("recommendations").alias("rk", "rec"),
    ).select(
        "user_id",
        (F.col("rk") + 1).cast("long").alias("rank"),
        F.col("rec.item").cast("long").alias("part_id"),
    )
    flat = flat.join(
        F.broadcast(
            held.select(
                F.col("user").cast("long").alias("user_id"),
                F.col("held_item").cast("long").alias("holdout_part_id"),
            )
        ),
        "user_id",
        "left",
    ).withColumn(
        "holdout_hit",
        F.when(F.col("holdout_part_id").isNull(), F.lit(None)).otherwise(
            F.max(
                (F.col("part_id") == F.col("holdout_part_id")).cast("int")
            ).over(Window.partitionBy("user_id"))
        ).cast("int"),
    )
    rate = flat.where(F.col("rank") == 1).agg(
        F.round(F.avg("holdout_hit"), 6).alias("hit_rate_at_k")
    )
    # leave-one-out AUC (Rendle's BPR eval): the held item's predicted
    # score vs 50 deterministically-sampled shared negatives the user
    # never bought — hit@3 over a 25k-part catalog is near-zero even for
    # a good model, AUC separates working (≫0.5) from broken (≈0.5)
    neg_items = (
        ratings.select("item")
        .distinct()
        .orderBy(F.xxhash64("item"))
        .limit(50)
    )
    pairs = (
        held.crossJoin(F.broadcast(neg_items))
        .join(
            ratings.select("user", "item"), ["user", "item"], "left_anti"
        )
        .select("user", "item")
        .unionByName(
            held.select("user", F.col("held_item").alias("item"))
        )
    )
    scored = (
        model.transform(pairs)
        .where(~F.isnan("prediction"))
        .join(F.broadcast(held), "user")
        .select(
            "user",
            F.col("prediction"),
            (F.col("item") == F.col("held_item")).alias("is_pos"),
        )
    )
    pos = scored.where("is_pos").select(
        "user", F.col("prediction").alias("pos_score")
    )
    negs = scored.where(~F.col("is_pos")).select(
        "user", F.col("prediction").alias("neg_score")
    )

    # train-fit AUC: the user's KEPT items vs the same negatives — the
    # machinery check. The fixture's purchases are uniform-random, so
    # holdout_auc ≈ 0.5 is the TRUE generalization ceiling here; a
    # working factorization must still fit the observed matrix, so
    # train_auc ≫ 0.5 separates 'no structure to learn' from 'broken'
    pos_train = (
        model.transform(
            sampled.join(
                held,
                (sampled.user == held.user)
                & (sampled.item == held.held_item),
                "left_anti",
            )
            .join(held.select("user"), "user", "semi")
            .select("user", "item")
        )
        .where(~F.isnan("prediction"))
        .select("user", F.col("prediction").alias("pos_score"))
    )
    # ONE fused AUC pass (r15, guide §2.4 — shared subtree): the old
    # per-scalar _auc chains each re-evaluated the `negs` transform
    # subtree and ran their own broadcast join + two-level aggregation
    # (two more AQE stage-job chains per bench rep). Tagging the
    # holdout and train positives and joining the negatives ONCE
    # computes both scalars from exactly the same per-(tag, user) pair
    # sets — per-user averaging then per-tag averaging over the same
    # user sets, so the values are unchanged.
    pos_all = pos.withColumn("tag", F.lit("h")).unionByName(
        pos_train.withColumn("tag", F.lit("t"))
    )
    aucs = (
        negs.join(F.broadcast(pos_all), "user")
        .groupBy("tag", "user")
        .agg(
            F.avg(
                F.when(F.col("neg_score") < F.col("pos_score"), 1.0)
                .when(F.col("neg_score") == F.col("pos_score"), 0.5)
                .otherwise(0.0)
            ).alias("user_auc")
        )
        .groupBy()
        .agg(
            F.round(
                F.avg(F.when(F.col("tag") == "h", F.col("user_auc"))), 6
            ).alias("holdout_auc"),
            F.round(
                F.avg(F.when(F.col("tag") == "t", F.col("user_auc"))), 6
            ).alias("train_auc"),
        )
    )
    # one broadcast of the combined 1-row scorecard instead of three
    # separate BroadcastExchange builds (same values, same columns —
    # the aggregates just materialize inside a single build job)
    scorecard = rate.crossJoin(aucs)
    return (
        flat.crossJoin(F.broadcast(scorecard))
        .select(
            "user_id",
            "rank",
            "part_id",
            "holdout_part_id",
            "holdout_hit",
            "hit_rate_at_k",
            "holdout_auc",
            "train_auc",
        )
    )


# --- seasonality_profile ----------------------------------------------------


@query(
    "seasonality_profile",
    oracle="""
    WITH e AS (SELECT event_type, isodow(ts) AS dow FROM events),
    td AS (SELECT event_type, dow, count(*) AS n FROM e GROUP BY 1, 2),
    t AS (SELECT event_type, sum(n) AS nt FROM td GROUP BY 1),
    d AS (SELECT dow, sum(n) AS nd FROM td GROUP BY 1),
    g AS (SELECT sum(n) AS total FROM td)
    SELECT td.event_type, CAST(td.dow AS BIGINT) AS dow,
           CAST(td.n AS BIGINT) AS n,
           floor((CAST(td.n AS DOUBLE) / t.nt)
                 / (CAST(d.nd AS DOUBLE) / g.total) * 1e6 + 0.5) / 1e6
               AS seasonality_index
    FROM td
    JOIN t USING (event_type)
    JOIN d USING (dow)
    CROSS JOIN g
    """,
)
def seasonality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type — the calendar-
    heatmap verb behind staffing and anomaly-baseline decisions: the
    index is each type's ISO-weekday share divided by the corpus-wide
    weekday share, so 1.0 = no type-specific seasonality and the matrix
    is comparable across types of different volume.

    Shape at 100 TB: ONE hash-agg collapses the stream to the
    |types|·7 matrix; marginals and the index are joins over that
    metadata relation. The ISO weekday (1=Mon) is computed identically
    on both engines (Spark's dayofweek is Sunday-based — remapped).
    Counts exact; the single ratio is floor-rounded at 6 dp.
    """
    ev = load_table(spark, sf_dir, "events")
    td = (
        ev.select(
            "event_type",
            ((F.dayofweek("ts") + 5) % 7 + 1).cast("long").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = td.groupBy("event_type").agg(F.sum("n").alias("nt"))
    d = td.groupBy("dow").agg(F.sum("n").alias("nd"))
    g = td.agg(F.sum("n").alias("total"))
    return (
        td.join(t, "event_type")
        .join(d, "dow")
        .crossJoin(F.broadcast(g))
        .select(
            "event_type",
            F.col("dow").cast("long").alias("dow"),
            F.col("n").cast("long").alias("n"),
            (
                F.floor(
                    (F.col("n").cast("double") / F.col("nt"))
                    / (F.col("nd").cast("double") / F.col("total"))
                    * 1e6
                    + 0.5
                )
                / 1e6
            ).alias("seasonality_index"),
        )
    )


# --- changepoint_cusum ------------------------------------------------------


@query(
    "changepoint_cusum",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day, count(*) AS n
        FROM events GROUP BY 1
    ),
    t AS (SELECT sum(n) AS total, count(*) AS nd FROM daily),
    c AS (
        SELECT day, n,
               sum(n) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
               row_number() OVER (ORDER BY day) AS rk
        FROM daily
    ),
    s AS (
        SELECT strftime(c.day, '%Y-%m-%d') AS day, c.n,
               c.cum - c.rk * (CAST(t.total AS DOUBLE) / t.nd) AS cusum
        FROM c CROSS JOIN t
    ),
    m AS (SELECT max(abs(cusum)) AS peak FROM s)
    SELECT s.day, CAST(s.n AS BIGINT) AS n,
           floor(s.cusum * 1e4 + 0.5) / 1e4 AS cusum,
           abs(s.cusum) = m.peak AS is_peak
    FROM s CROSS JOIN m
    """,
)
def changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the daily event-volume series —
    the classic 'did the level shift, and when' monitor (Page 1954):
    the cumulative sum of deviations from the global daily mean peaks
    at the most likely changepoint. Emits the full CUSUM curve plus the
    peak flag (the argmax day).

    Shape at 100 TB: the stream collapses to |days| rows in one
    hash-agg; the cumulative window, mean, and argmax are arithmetic on
    that calendar-sized relation — the oracle's global window is
    metadata here, not a whale. CUSUM stays exact-int cum minus
    rank·mean (one deterministic double product), floor-rounded 4 dp;
    the peak test compares the UNROUNDED doubles identically on both
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = daily.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("nd")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = daily.select(
        "day",
        "n",
        F.sum("n").over(w).alias("cum"),
        F.row_number().over(Window.orderBy("day")).alias("rk"),
    )
    s = c.crossJoin(F.broadcast(t)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n").cast("long").alias("n"),
        (
            F.col("cum")
            - F.col("rk") * (F.col("total").cast("double") / F.col("nd"))
        ).alias("cusum_raw"),
    )
    m = s.agg(F.max(F.abs("cusum_raw")).alias("peak"))
    return s.crossJoin(F.broadcast(m)).select(
        "day",
        "n",
        (F.floor(F.col("cusum_raw") * 1e4 + 0.5) / 1e4).alias("cusum"),
        (F.abs("cusum_raw") == F.col("peak")).alias("is_peak"),
    )


# --- user_entropy -----------------------------------------------------------


@query(
    "user_entropy",
    oracle="""
    WITH ut AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY 1, 2
    ),
    u AS (SELECT user_id, sum(c) AS n FROM ut GROUP BY 1)
    SELECT ut.user_id,
           CAST(u.n AS BIGINT) AS n_events,
           CAST(count(*) AS BIGINT) AS n_types,
           floor(-sum((CAST(ut.c AS DOUBLE) / u.n)
                      * ln(CAST(ut.c AS DOUBLE) / u.n)) * 1e6 + 0.5) / 1e6
               AS entropy
    FROM ut JOIN u USING (user_id)
    GROUP BY ut.user_id, u.n
    """,
)
def user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral diversity per user: Shannon entropy of each user's
    event-type mix — the engagement-breadth feature (0 = single-verb
    users, ln(5) ≈ 1.609 = uniform across all five types) that feeds
    churn and segmentation models next to ``rfm_segments``; the
    per-entity sibling of ``text_entropy``'s per-document pass.

    Shape at 100 TB: one (user, type) hash-agg bounded by
    |users|·|types|, then a user-keyed agg riding the SAME key — the
    entropy fold never touches the raw stream twice. Counts exact; the
    entropy is floor-rounded at 6 dp (ln noise is ulp-level).
    """
    ev = load_table(spark, sf_dir, "events")
    ut = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    wu = Window.partitionBy("user_id")
    p = F.col("c").cast("double") / F.col("n")
    return (
        ut.withColumn("n", F.sum("c").over(wu))
        .groupBy("user_id", "n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            (F.floor(-F.sum(p * F.log(p)) * 1e6 + 0.5) / 1e6).alias(
                "entropy"
            ),
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_events"),
            "n_types",
            "entropy",
        )
    )


# --- survival_km ------------------------------------------------------------

_US_PER_DAY = 86_400_000_000


@query(
    "survival_km",
    oracle=f"""
    WITH first_seen AS (
        SELECT user_id, min(epoch_us(ts)) AS t0 FROM events GROUP BY 1
    ),
    conv AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS tc
        FROM events e JOIN first_seen f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > f.t0
        GROUP BY e.user_id
    ),
    last_seen AS (
        SELECT user_id, max(epoch_us(ts)) AS tl FROM events GROUP BY 1
    ),
    subj AS (
        SELECT f.user_id,
               CAST(floor(CAST(COALESCE(c.tc, l.tl) - f.t0 AS DOUBLE)
                          / {_US_PER_DAY}) AS BIGINT) AS dur,
               CASE WHEN c.tc IS NULL THEN 0 ELSE 1 END AS ev
        FROM first_seen f
        LEFT JOIN conv c USING (user_id)
        JOIN last_seen l USING (user_id)
    ),
    t AS (SELECT count(*) AS n_total FROM subj),
    step AS (
        SELECT dur, count(*) AS at_dur, sum(ev) AS d
        FROM subj GROUP BY dur
    ),
    risk AS (
        SELECT dur, at_dur, d,
               t.n_total
               - COALESCE(sum(at_dur) OVER (
                     ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0) AS n_risk
        FROM step CROSS JOIN t
    ),
    curve AS (
        SELECT dur, n_risk, d, at_dur - d AS censored,
               max(CASE WHEN d = n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY dur ROWS UNBOUNDED PRECEDING) AS dead,
               sum(CASE WHEN d > 0 AND d < n_risk
                        THEN ln(1.0 - CAST(d AS DOUBLE) / n_risk)
                        ELSE 0.0 END) OVER (
                   ORDER BY dur ROWS UNBOUNDED PRECEDING) AS lns
        FROM risk
    )
    SELECT CAST(dur AS BIGINT) AS dur_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(censored AS BIGINT) AS n_censored,
           CASE WHEN dead = 1 THEN 0.0
                ELSE floor(exp(lns) * 1e6 + 0.5) / 1e6 END AS survival
    FROM curve
    """,
)
def survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase with
    right-censoring — THE estimator for 'how long until users convert'
    when many never do: users without a purchase are censored at their
    last activity instead of being dropped (dropping them is the
    classic conversion-analysis bias). Per distinct day: risk set,
    events, censored, and the product-limit survival estimate.

    Shape at 100 TB: three user_id hash-aggs (first-seen, first
    conversion, last-seen) riding ONE exchange key collapse the stream
    to |users| subjects; the KM table is |distinct durations| rows —
    calendar-bounded metadata — where the risk-set window and the
    product (as exp of a running ln-sum, identical expression on both
    engines; the d = n_risk absorbing state handled explicitly since
    ln(0) differs per engine) are free. Counts exact; survival
    floor-rounded 6 dp.
    """
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(F.min("ts_us").alias("t0"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .where(F.col("ts_us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("tc"))
    )
    last_seen = ev.groupBy("user_id").agg(F.max("ts_us").alias("tl"))
    subj = (
        first_seen.join(conv, "user_id", "left")
        .join(last_seen, "user_id")
        .select(
            F.floor(
                (F.coalesce("tc", "tl") - F.col("t0")).cast("double")
                / _US_PER_DAY
            )
            .cast("long")
            .alias("dur"),
            F.when(F.col("tc").isNull(), 0).otherwise(1).alias("ev"),
        )
    )
    step = subj.groupBy("dur").agg(
        F.count(F.lit(1)).alias("at_dur"), F.sum("ev").alias("d")
    )
    n_total = subj.count()
    w_prev = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("dur").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = step.withColumn(
        "n_risk",
        F.lit(n_total) - F.coalesce(F.sum("at_dur").over(w_prev), F.lit(0)),
    )
    guarded_ln = F.when(
        (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
        F.log(1.0 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    curve = risk.withColumn(
        "dead",
        F.max(
            F.when(F.col("d") == F.col("n_risk"), 1).otherwise(0)
        ).over(w_cum),
    ).withColumn("lns", F.sum(guarded_ln).over(w_cum))
    return curve.select(
        F.col("dur").cast("long").alias("dur_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        (F.col("at_dur") - F.col("d")).cast("long").alias("n_censored"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(F.floor(F.exp("lns") * 1e6 + 0.5) / 1e6)
        .alias("survival"),
    )


# --- mannwhitney_u ----------------------------------------------------------


@query(
    "mannwhitney_u",
    oracle=f"""
    WITH s AS (
        SELECT c_acctbal AS v,
               count(*) FILTER (WHERE c_mktsegment = '{_KS_A}') AS ca,
               count(*) FILTER (WHERE c_mktsegment = '{_KS_B}') AS cb
        FROM customer
        WHERE c_mktsegment IN ('{_KS_A}', '{_KS_B}')
        GROUP BY c_acctbal
    ),
    r AS (
        SELECT ca, cb, ca + cb AS cnt,
               COALESCE(sum(ca + cb) OVER (
                   ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING), 0) AS cumb
        FROM s
    ),
    agg AS (
        SELECT sum(ca) AS na, sum(cb) AS nb,
               sum(ca * (2 * cumb + cnt + 1)) AS r2a,
               sum(cnt * cnt * cnt - cnt) AS ties
        FROM r
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           CAST(r2a - na * (na + 1) AS BIGINT) AS u2_a,
           CAST(ties AS BIGINT) AS tie_correction,
           floor((CAST(r2a - na * (na + 1) AS DOUBLE) / 2
                  - CAST(na AS DOUBLE) * nb / 2)
                 / sqrt(CAST(na AS DOUBLE) * nb / 12.0
                        * ((na + nb + 1)
                           - CAST(ties AS DOUBLE)
                             / ((na + nb) * (na + nb - 1.0))))
                 * 1e4 + 0.5) / 1e4 AS z
    FROM agg
    """,
)
def mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between two segments' balance
    distributions — the rank-based location test that needs no
    normality assumption, completing the two-sample family beside
    ``ab_test_welch`` (parametric means) and ``ks_2sample`` (whole
    distribution). The U statistic is computed EXACTLY in integers via
    DOUBLED ranks: a tie group's average rank is (2·cum_before + size
    + 1)/2, so doubling makes every rank sum an int64 — no float rank
    arithmetic anywhere; only the final normal-approximation z (with
    the exact-integer tie correction Σ(t³−t)) is floated, floor-rounded
    4 dp.

    Shape at 100 TB: one hash-agg to the distinct-value relation (the
    same collapse ks_2sample uses), then the running tie-group weight
    from ``operators/prefix.bucketed_cumsum`` — the quantile-bucketed
    two-pass prefix sum shared with ``weighted_median`` — NOT a global
    ``sum() OVER (ORDER BY v)`` window: the distinct-value relation is
    |distinct balances|, which at corpus scale approaches |customers|,
    and an unpartitioned window would sort it on one task. The oracle
    keeps the declarative window (DuckDB evaluates it efficiently);
    both sides reduce to the same exact-int64 rank sums. Driver sees
    one row.
    """
    from vector_search_playground_spark.operators.prefix import (
        bucketed_cumsum,
    )

    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_KS_A, _KS_B)
    )
    s = (
        cust.groupBy(F.col("c_acctbal").alias("v"))
        .agg(
            F.count(F.when(F.col("c_mktsegment") == _KS_A, 1)).alias("ca"),
            F.count(F.when(F.col("c_mktsegment") == _KS_B, 1)).alias("cb"),
        )
        .withColumn("cnt", F.col("ca") + F.col("cb"))
        .cache()
    )
    # cum is the INCLUSIVE running cnt in v order (v is unique after the
    # group-by, so it is its own tiebreak); the average-rank formula
    # wants the EXCLUSIVE prefix.
    ranked, _n, _total = bucketed_cumsum(
        s, "v", "cnt", tiebreak_col="v", descending=False
    )
    r = ranked.withColumn("cumb", F.col("cum") - F.col("cnt"))
    agg = r.agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(
            F.col("ca") * (2 * F.col("cumb") + F.col("cnt") + 1)
        ).alias("r2a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("ties"),
    )
    na, nb = F.col("na"), F.col("nb")
    u2a = F.col("r2a") - na * (na + 1)
    mu = na.cast("double") * nb / 2
    sigma = F.sqrt(
        na.cast("double")
        * nb
        / 12.0
        * (
            (na + nb + 1)
            - F.col("ties").cast("double") / ((na + nb) * (na + nb - 1.0))
        )
    )
    out = agg.select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        u2a.cast("long").alias("u2_a"),
        F.col("ties").cast("long").alias("tie_correction"),
        (
            F.floor((u2a.cast("double") / 2 - mu) / sigma * 1e4 + 0.5)
            / 1e4
        ).alias("z"),
    )
    # both bucketed_cumsum passes consumed the cache; materialize the
    # single result row so the cache can be released before returning
    # (the weighted_median discipline). try/finally so a failing action
    # can't leak the cached distinct-value relation for the session.
    try:
        row = out.first()
    finally:
        s.unpersist()
    return spark.createDataFrame([row], out.schema)


# --- sla_compliance ---------------------------------------------------------

_SLA_DAYS = (30, 60, 90)


@query(
    "sla_compliance",
    oracle=f"""
    WITH lag AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS lag_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT priority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE lag_days <= {_SLA_DAYS[0]})
                AS BIGINT) AS within_30,
           CAST(count(*) FILTER (WHERE lag_days <= {_SLA_DAYS[1]})
                AS BIGINT) AS within_60,
           CAST(count(*) FILTER (WHERE lag_days <= {_SLA_DAYS[2]})
                AS BIGINT) AS within_90,
           floor(count(*) FILTER (WHERE lag_days <= {_SLA_DAYS[0]})
                 * 1.0 / count(*) * 1e6 + 0.5) / 1e6 AS pct_30
    FROM lag GROUP BY priority
    """,
)
def sla_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-SLA compliance per order priority: the share of line
    items shipped within 30/60/90 days of order placement — the
    operations scorecard that closes the order-to-ship loop the TPC-H
    schema models (and the business sibling of ``funnel_latency``'s
    user-facing latency percentiles).

    Shape at 100 TB: the ship lag is a row-local date diff behind the
    fact-fact join on the ORDER key (both sides huge → a shuffle join
    on o_orderkey, the one join key that co-partitions them; with
    bucketed tables this is the zero-exchange join_bucketed layout);
    the scorecard is ONE conditional hash-agg to |priorities| rows.
    Day lags are exact integers on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lag = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("lag_days"),
    )
    within = {
        d: F.sum((F.col("lag_days") <= d).cast("long")) for d in _SLA_DAYS
    }
    return lag.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        within[30].cast("long").alias("within_30"),
        within[60].cast("long").alias("within_60"),
        within[90].cast("long").alias("within_90"),
        (
            F.floor(
                within[30] * 1.0 / F.count(F.lit(1)) * 1e6 + 0.5
            )
            / 1e6
        ).alias("pct_30"),
    )


# --- volume_bands -----------------------------------------------------------

_BAND_QS = (0.1, 0.5, 0.9)


@query(
    "volume_bands",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(count(*) AS DOUBLE) AS x
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           floor(quantile_cont(x, {_BAND_QS[0]}) * 1e4 + 0.5) / 1e4
               AS p10,
           floor(quantile_cont(x, {_BAND_QS[1]}) * 1e4 + 0.5) / 1e4
               AS p50,
           floor(quantile_cont(x, {_BAND_QS[2]}) * 1e4 + 0.5) / 1e4
               AS p90
    FROM daily GROUP BY event_type
    """,
)
def volume_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected-volume control bands per event type: P10/P50/P90 of the
    DAILY count distribution — the alerting baseline that turns
    'traffic looks low' into 'today is below the P10 band'; pairs with
    ``changepoint_cusum`` (level shifts) and ``autocorrelation``
    (period detection) as the monitoring trio over the same daily
    relation.

    Shape at 100 TB: one hash-agg to the |types|·|days| relation, then
    the shared 3-pass width-bucket selection for the per-type exact
    quantiles (bit-identical to quantile_cont — the funnel_latency
    precedent); the band table is |types| rows. Floor-rounded 4 dp.
    """
    from vector_search_playground_spark.operators.selection import (
        exact_quantiles,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("double").alias("x"))
        .cache()
    )
    try:
        per = exact_quantiles(daily, "event_type", "x", list(_BAND_QS))
        counts = {
            r["event_type"]: r["n"]
            for r in daily.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    finally:
        daily.unpersist()
    import math

    rows = [
        (
            t,
            counts[t],
            *[
                math.floor(per[t][q] * 1e4 + 0.5) / 1e4
                for q in _BAND_QS
            ],
        )
        for t in sorted(per)
    ]
    return spark.createDataFrame(
        rows, "event_type string, n_days long, p10 double, p50 double,"
        " p90 double"
    )


# --- lift_deciles -----------------------------------------------------------

_LIFT_KEYSPAN = 10_000_000  # user_id < 1e7 in every fixture SF


@query(
    "lift_deciles",
    oracle=f"""
    WITH u AS (
        SELECT user_id, count(*) AS score,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS buyer
        FROM events GROUP BY user_id
    ),
    t AS (SELECT count(*) AS n, sum(buyer) AS nb FROM u),
    ranked AS (
        SELECT u.buyer, t.n, t.nb,
               CAST(floor((row_number() OVER (
                               ORDER BY u.score DESC, u.user_id)
                           - 1) * 10.0 / t.n) AS BIGINT) AS decile
        FROM u CROSS JOIN t
    )
    SELECT decile,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(buyer) AS BIGINT) AS n_buyers,
           floor(CAST(sum(buyer) AS DOUBLE) / count(*) * 1e6 + 0.5) / 1e6
               AS buy_rate,
           floor((CAST(sum(buyer) AS DOUBLE) / count(*))
                 / (CAST(max(nb) AS DOUBLE) / max(n)) * 1e4 + 0.5) / 1e4
               AS lift
    FROM ranked GROUP BY decile
    """,
)
def lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-lift table — the ML-evaluation verb behind every targeting
    decision: users ranked by a score (here activity volume as the
    proxy model), cut into population deciles, each decile's purchase
    rate compared to the base rate. Decile 0 holding lift ≫ 1 is what
    'the model works' looks like to a marketer.

    Shape at 100 TB: the ranking is the bucketed two-pass dense rank
    (``operators/ids.dense_ids`` over a composite (score desc, user)
    integer key) — never a global ROW_NUMBER whale over the population;
    the lift table is one 10-row hash-agg on the ranked relation.
    Counts exact; rates/lift are identical-expression doubles floored
    at 6/4 dp.
    """
    from vector_search_playground_spark.operators.ids import dense_ids

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("buyer"),
    )
    # composite integer key: ascending key order == (score desc, user asc)
    u = u.withColumn(
        "rank_key",
        (F.lit(_LIFT_KEYSPAN) - F.col("score")) * _LIFT_KEYSPAN
        + F.col("user_id"),
    ).cache()
    try:
        tot = u.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("buyer").alias("nb"),
            F.max("score").alias("max_score"),
            F.max("user_id").alias("max_uid"),
        ).first()
        n, nb = tot["n"], tot["nb"]
        # the composite key is only order-faithful while BOTH components
        # stay inside the keyspan: a score reaching _LIFT_KEYSPAN would
        # wrap into the user_id digits and silently mis-order
        if tot["max_score"] >= _LIFT_KEYSPAN or tot["max_uid"] >= _LIFT_KEYSPAN:
            raise ValueError(
                "lift_deciles: rank_key span exceeded "
                f"(max score={tot['max_score']}, max user_id={tot['max_uid']},"
                f" keyspan={_LIFT_KEYSPAN}); raise _LIFT_KEYSPAN"
            )
        ranked = dense_ids(u, "rank_key")
        out = (
            ranked.withColumn(
                "decile", (F.col("rid") * 10 / F.lit(n)).cast("long")
            )
            .groupBy("decile")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum("buyer").cast("long").alias("n_buyers"),
            )
            .select(
                "decile",
                "n_users",
                "n_buyers",
                (
                    F.floor(
                        F.col("n_buyers").cast("double")
                        / F.col("n_users")
                        * 1e6
                        + 0.5
                    )
                    / 1e6
                ).alias("buy_rate"),
                (
                    F.floor(
                        (F.col("n_buyers").cast("double") / F.col("n_users"))
                        / (F.lit(nb).cast("double") / F.lit(n))
                        * 1e4
                        + 0.5
                    )
                    / 1e4
                ).alias("lift"),
            )
        )
        return out.localCheckpoint(eager=True)
    finally:
        u.unpersist()


# --- ab_power_mde -----------------------------------------------------------

_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621  # 80% power


@query(
    "ab_power_mde",
    oracle=f"""
    WITH j AS (
        SELECT c_mktsegment AS seg, o_totalprice AS x
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('{_AB_A}', '{_AB_B}')
    ),
    s AS (
        SELECT count(*) FILTER (WHERE seg = '{_AB_A}') AS na,
               count(*) FILTER (WHERE seg = '{_AB_B}') AS nb,
               var_samp(x) FILTER (WHERE seg = '{_AB_A}') AS va,
               var_samp(x) FILTER (WHERE seg = '{_AB_B}') AS vb
        FROM s_base
    ),
    s_base AS (SELECT * FROM j)
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           floor(sqrt(va / na + vb / nb) * 1e2 + 0.5) / 1e2 AS se,
           floor(({_Z_ALPHA} + {_Z_BETA}) * sqrt(va / na + vb / nb)
                 * 1e2 + 0.5) / 1e2 AS mde
    FROM s
    """,
)
def ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis for the A/B setup of ``ab_test_welch``: the
    minimum detectable effect at 80% power / 5% two-sided α given the
    CURRENT sample sizes and variances — the 'is this experiment even
    big enough' pre-check that should run before any t-test gets read.
    MDE = (z_α + z_β)·SE with the unpooled standard error.

    Shape at 100 TB: one conditional hash-agg behind the broadcast
    dimension join (identical to ab_test_welch — the two queries share
    a cached relation in a real session); driver sees one row. The z
    constants are shared literals; SE/MDE floor-rounded at 2 dp
    (dollars).
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment").isin(_AB_A, _AB_B)
    )
    j = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select(F.col("c_mktsegment").alias("seg"), F.col("o_totalprice").alias("x"))
    a, b = F.col("seg") == _AB_A, F.col("seg") == _AB_B
    s = j.agg(
        F.count(F.when(a, 1)).alias("na"),
        F.count(F.when(b, 1)).alias("nb"),
        F.var_samp(F.when(a, F.col("x"))).alias("va"),
        F.var_samp(F.when(b, F.col("x"))).alias("vb"),
    )
    se = F.sqrt(F.col("va") / F.col("na") + F.col("vb") / F.col("nb"))
    return s.select(
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        (F.floor(se * 1e2 + 0.5) / 1e2).alias("se"),
        (F.floor((_Z_ALPHA + _Z_BETA) * se * 1e2 + 0.5) / 1e2).alias(
            "mde"
        ),
    )


# --- corpus_summary ---------------------------------------------------------


@query(
    "corpus_summary",
    oracle="""
    WITH tok AS (
        SELECT doc_id, t.tok FROM documents,
        LATERAL (SELECT unnest(string_split(text, ' ')) AS tok) t
        WHERE t.tok IS NOT NULL
    ),
    d AS (
        SELECT count(*) AS n_docs,
               count(DISTINCT lang) AS n_langs,
               count(DISTINCT source) AS n_sources,
               sum(n_chars) AS total_chars
        FROM documents
    ),
    t AS (
        SELECT count(*) AS n_tokens, count(DISTINCT tok) AS vocab
        FROM tok
    )
    SELECT CAST(d.n_docs AS BIGINT) AS n_docs,
           CAST(d.n_langs AS BIGINT) AS n_langs,
           CAST(d.n_sources AS BIGINT) AS n_sources,
           CAST(d.total_chars AS BIGINT) AS total_chars,
           CAST(t.n_tokens AS BIGINT) AS n_tokens,
           CAST(t.vocab AS BIGINT) AS vocab_size
    FROM d CROSS JOIN t
    """,
)
def corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset-card header row: corpus size in documents, tokens,
    characters, languages, sources, and vocabulary — the six numbers
    every dataset README leads with, produced as ONE hash-certified
    relation so the card is reproducible rather than hand-collected.

    Shape at 100 TB: one metadata agg over the documents table plus one
    token pass (posexplode → count + distinct, where the distinct's
    partial sets are vocabulary-bounded); the two single-row relations
    cross-join for free. Exact integers only.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        F.posexplode_outer(F.split("text", " ")).alias("pos", "tok")
    ).where(F.col("tok").isNotNull())
    d = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
    t = tok.agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.countDistinct("tok").cast("long").alias("vocab_size"),
    )
    return d.crossJoin(t)
