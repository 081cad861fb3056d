"""Tier C relational core (SURVEY.md §2) — scans, joins, aggregates,
windows, set ops, subqueries, scalar functions.

The reference delegates all of this to Postgres's executor via the sea-orm
query builder (`/root/reference/src/main.rs:7-12` imports QueryFilter /
QueryOrder / QuerySelect; `src/main.rs:66-69` connects and everything runs
server-side). Here each capability is a first-class Catalyst plan.

Scale discipline (100 TB posture), per query:
- dimension joins carry an explicit ``broadcast()`` hint;
- fact-fact joins shuffle on their equi-keys (SortMergeJoin + AQE);
- every window partitions by a high-cardinality key — no global windows
  except where a global order is the semantics (sort_multi/limit_n, which
  Catalyst plans as TakeOrderedAndProject: per-partition heaps, no global
  shuffle-sort);
- non-equi joins keep one side broadcast-small (band table, nation dim);
- the as-of join is implemented join-free: union the two event streams and
  carry the last left-side timestamp forward per user with one window —
  one shuffle by user_id, no range-join blowup.

Oracle discipline: every computed float is ROUND()ed identically on both
sides; timestamps are emitted as formatted strings or epoch-µs integers
(Spark µs ≡ DuckDB's ns→µs truncation, verified); every LIMIT carries a
deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import (
    ROUND_AVG,
    ROUND_MONEY,
    query,
)
from vector_search_playground_spark.sources import load_table, register_views

# ---------------------------------------------------------------------------
# scan / project / filter
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle="""
    SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
           l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
           strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate_s
    FROM lineitem
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full declared-schema parquet scan of the largest fixture table.
    Explicit StructType → no footer-sampling inference job at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate_s"),
    )


@query(
    "project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS revenue,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
             AS revenue_taxed
    FROM lineitem
    """,
)
def project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic projection (TPC-H revenue expression).

    Rounding precision equals the products' exact decimal width (2dp×2dp→4,
    ×2dp more→6): rounding AT the exact precision can never land on a
    decimal tie, where Spark (BigDecimal HALF_UP) and DuckDB (scaled
    std::round) disagree on the same double."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(rev, 4).alias("revenue"),
        F.round(rev * (1 + F.col("l_tax")), 6).alias("revenue_taxed"),
    )


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20
      AND l_returnflag IN ('A', 'R')
      AND l_linestatus = 'F'
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_extendedprice IS NOT NULL
    """,
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicate: BETWEEN + IN + equality + timestamp range +
    IS NOT NULL. All plain-column predicates → pushed to the parquet scan
    (PushedFilters in .explain)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_linestatus") == "F")
        & (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & F.col("l_extendedprice").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_eq",
    oracle="""
    SELECT o_orderkey, c_custkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim equi join. At sf0.01 AQE broadcasts customer; at 100 TB
    (customer too big) the same plan degrades gracefully to SortMergeJoin
    on the shuffled key — no query change needed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT n_nationkey, n_name, r_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint on the 5-row region dim — BroadcastHashJoin
    (plan-asserted in tests/test_relational_plans.py): zero shuffle of the
    probe side at any scale."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders
      ON o_custkey = c_custkey AND o_totalprice > 450000
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a join-side predicate (kept in the ON clause so
    non-matching customers survive with NULL orderkeys)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 450000)
    return c.join(o, cond, "left").select("c_custkey", "o_orderkey")


@query(
    "join_right",
    oracle="""
    SELECT o_orderkey, c_custkey
    FROM orders RIGHT JOIN customer
      ON o_custkey = c_custkey AND o_totalprice > 450000
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cond = (o.o_custkey == c.c_custkey) & (o.o_totalprice > 450000)
    return o.join(c, cond, "right").select("o_orderkey", "c_custkey")


@query(
    "join_full",
    oracle="""
    SELECT b.c_custkey AS bkey, h.c_custkey AS hkey
    FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') b
    FULL JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000) h
      ON b.c_custkey = h.c_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two overlapping key sets — NULLs on both sides."""
    c = load_table(spark, sf_dir, "customer")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("bkey")
    )
    h = c.where(F.col("c_acctbal") > 9000).select(F.col("c_custkey").alias("hkey"))
    return b.join(h, b.bkey == h.hkey, "full").select("bkey", "hkey")


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers with at least one big order. Semi joins never
    duplicate the probe side, so the output stays ≤ |customer|."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers that never placed a big order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_theta",
    oracle="""
    SELECT p_partkey, band_id
    FROM part
    JOIN (VALUES (0, 900.0, 925.0), (1, 925.0, 950.0),
                 (2, 950.0, 975.0), (3, 975.0, 1000.0)) b(band_id, lo, hi)
      ON p_retailprice >= lo AND p_retailprice < hi
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) join against a broadcast band table. The small side
    is O(bands) rows, so the plan is BroadcastNestedLoopJoin with a
    constant-size inner — linear in |part| at any scale, never O(n²)."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [(0, 900.0, 925.0), (1, 925.0, 950.0), (2, 950.0, 975.0), (3, 975.0, 1000.0)],
        "band_id: int, lo: double, hi: double",
    )
    cond = (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi)
    return p.join(F.broadcast(bands), cond).select("p_partkey", "band_id")


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the latest click at-or-before it by
    the same user. Implemented join-free (SURVEY §2 join_asof): union the
    two streams, sort within user, carry the last click timestamp forward
    with one window — a single shuffle by user_id, no range-join blowup.
    DuckDB oracle uses its native ASOF JOIN. µs-epoch integers on both
    sides (Spark µs ≡ DuckDB's ns→µs truncation)."""
    ev = load_table(spark, sf_dir, "events")
    # integer div — float division would lose precision beyond 2^53 ns
    us = F.col("ts_us")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        us.alias("ts_us"),
        F.lit(0).alias("tag"),
        us.alias("click_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("asof_click_us", F.last("click_us", ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_us"),
            F.col("asof_click_us").alias("click_us"),
        )
    )


@query(
    "join_asof_fwd",
    oracle="""
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts <= c.ts
    """,
)
def join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every purchase, the EARLIEST click at-or-
    after it by the same user (the "what did they do next" direction;
    `join_asof` is the backward twin). Same join-free construction —
    union the streams, scan each user's timeline once — but ordered
    DESCENDING so "last click seen" means "earliest click ≥ here"; at
    equal timestamps the click sorts before the purchase in scan order,
    matching the oracle's inclusive `p.ts <= c.ts`. Still a single
    user_id shuffle, no range-join blowup."""
    ev = load_table(spark, sf_dir, "events")
    us = F.col("ts_us")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        us.alias("ts_us"),
        F.lit(0).alias("tag"),
        us.alias("click_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.asc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("asof_click_us", F.last("click_us", ignorenulls=True).over(w))
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts_us").alias("purchase_us"),
            F.col("asof_click_us").alias("click_us"),
        )
    )


@query(
    "join_nearest",
    oracle="""
    SELECT event_id, user_id, purchase_us, click_us
    FROM (
        SELECT p.event_id, p.user_id,
               epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)),
                            epoch_us(c.ts)
               ) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id
    )
    WHERE rn = 1
    """,
)
def join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event join: for every purchase, the same-user click closest
    in time in EITHER direction (ties go to the earlier click) — the third
    member of the as-of family (QuestDB/kdb `aj` nearest flavor;
    `join_asof` looks only backward, `join_asof_fwd` only forward).

    Implemented with the same join-free union-scan construction: the two
    candidate timestamps come from a backward carry (last click ≤ t) and a
    forward carry (first click ≥ t) — two window passes over ONE user_id
    exchange (same partitioning, opposite sort orders), then a row-local
    pick of the smaller |Δ|. The oracle is the brute-force θ-join argmin;
    this plan never materializes the per-user pair product, which is
    quadratic in hot users at fact scale."""
    ev = load_table(spark, sf_dir, "events")
    us = F.col("ts_us")
    clicks = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        us.alias("ts_us"),
        F.lit(0).alias("tag"),
        us.alias("click_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        us.alias("ts_us"),
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("click_us"),
    )
    # Backward pass: at equal timestamps the click (tag 0) precedes the
    # purchase in scan order, so an exactly-simultaneous click is visible
    # in BOTH directions — matching the oracle's inclusive |Δ| = 0.
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts_us"), F.asc("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    both = (
        clicks.unionByName(purchases)
        .withColumn("back_us", F.last("click_us", ignorenulls=True).over(w_back))
        .withColumn("fwd_us", F.last("click_us", ignorenulls=True).over(w_fwd))
        .where(F.col("tag") == 1)
    )
    d_back = F.col("ts_us") - F.col("back_us")
    d_fwd = F.col("fwd_us") - F.col("ts_us")
    nearest = (
        F.when(F.col("back_us").isNull(), F.col("fwd_us"))
        .when(F.col("fwd_us").isNull(), F.col("back_us"))
        # tie → the earlier (backward) click, like the oracle's
        # (|Δ|, click_us) ordering
        .when(d_back <= d_fwd, F.col("back_us"))
        .otherwise(F.col("fwd_us"))
    )
    return both.select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("purchase_us"),
        nearest.alias("click_us"),
    )


@query(
    "join_range",
    oracle="""
    SELECT a.event_id AS err_id, b.event_id AS evt_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'error') a
    JOIN events b
      ON b.ts >= a.ts AND b.ts < a.ts + INTERVAL 15 MINUTE
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every event within 15 minutes at-or-after each error
    (the "what happened around this incident" query). The oracle states it
    as the θ-join; the Spark plan is the bucketed equi-join from
    operators/rangejoin.py — intervals exploded to ≤ 2 time buckets,
    points hashed to exactly one, shuffle on the bucket id, exact range
    refinement after the match. Linear in input + output at any scale,
    where the literal θ-join is a nested-loop product."""
    from vector_search_playground_spark.operators.rangejoin import (
        interval_join,
    )

    window_us = 15 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    us = F.col("ts_us")
    errors = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        us.alias("start_us"),
        (us + F.lit(window_us)).alias("end_us"),
    )
    points = ev.select(F.col("event_id").alias("evt_id"), us.alias("ts_us"))
    return interval_join(
        errors,
        points,
        start_col="start_us",
        end_col="end_us",
        ts_col="ts_us",
        bucket_width=window_us,
    ).select(
        "err_id",
        "evt_id",
        (F.col("ts_us") - F.col("start_us")).alias("lag_us"),
    )


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


@query(
    "agg_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           ROUND(sum(l_quantity), {ROUND_MONEY}) AS sum_qty,
           ROUND(sum(l_extendedprice), {ROUND_MONEY}) AS sum_base,
           ROUND(sum(l_extendedprice * (1 - l_discount)), {ROUND_MONEY})
             AS sum_disc,
           ROUND(avg(l_quantity), {ROUND_AVG}) AS avg_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate. Catalyst plans partial (map-side)
    + final aggregation automatically — the shuffle carries 6 groups, not
    600k rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), ROUND_MONEY).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), ROUND_MONEY).alias("sum_base"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), ROUND_MONEY
        ).alias("sum_disc"),
        F.round(F.avg("l_quantity"), ROUND_AVG).alias("avg_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_cust, count(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-stage aggregate."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count(F.lit(1)).alias("n"),
    )


@query("agg_approx")  # rows-only: HLL sketch is approximate by design
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) over events.user_id — the
    100 TB path for distinct counting: fixed-size sketch, single pass, no
    distinct shuffle.

    Self-checking (round-4 verdict item 7): the result row carries the
    approximate count, the exact count, and their relative error, with
    the 5% rsd bound ENFORCED in-query — ``within_bound`` false would
    flip the driver's rows-only check from shape-green to visibly wrong.
    Both aggregates come from one pass (Catalyst plans the HLL sketch
    and the exact distinct side by side); the exact side exists to make
    the accuracy claim inspectable at fixture scale — at 100 TB you ship
    only the sketch."""
    ev = load_table(spark, sf_dir, "events")
    # rsd is a STANDARD DEVIATION, not a bound: a 0.05-rsd sketch lands
    # outside 5% roughly a third of the time (measured 6.7% at sf0.1).
    # A 0.01-rsd sketch (~1.6 k registers more) gives the 5% assertion
    # ~5σ of headroom while staying a fixed-size single-pass sketch.
    approx = F.approx_count_distinct("user_id", rsd=0.01)
    exact = F.countDistinct("user_id")
    rel_err = F.abs(approx.cast("double") - exact.cast("double")) / exact
    return ev.agg(
        approx.alias("approx_users"),
        exact.alias("exact_users"),
        F.round(rel_err, 6).alias("rel_err"),
        (rel_err < F.lit(0.05)).alias("within_bound"),
    )


@query(
    "grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, ROUND(sum(o_totalprice), {ROUND_MONEY}) AS sum_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (status, priority) → (status) → () in one pass."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), ROUND_MONEY).alias("sum_price"),
    )


@query(
    "having",
    oracle=f"""
    SELECT o_custkey, count(*) AS n,
           ROUND(sum(o_totalprice), {ROUND_MONEY}) AS total
    FROM orders GROUP BY o_custkey HAVING count(*) >= 15
    """,
)
def having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), ROUND_MONEY).alias("total"),
        )
        .where(F.col("n") >= 15)
    )


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


@query(
    "win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           rank()       OVER w1 AS rnk,
           dense_rank() OVER w1 AS drnk,
           row_number() OVER w2 AS rn
    FROM orders
    WINDOW w1 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC),
           w2 AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
                                                  o_orderkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / row_number per customer. rank functions are
    deterministic under ties; row_number carries the key tiebreak."""
    o = load_table(spark, sf_dir, "orders")
    w1 = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w2 = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w1).alias("rnk"),
        F.dense_rank().over(w1).alias("drnk"),
        F.row_number().over(w2).alias("rn"),
    )


@query(
    "win_analytic",
    oracle="""
    SELECT event_id, user_id,
           lag(value)  OVER w AS prev_value,
           lead(value) OVER w AS next_value,
           first_value(value) OVER
             (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    """,
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value over per-user event time."""
    ev = load_table(spark, sf_dir, "events")
    us = F.col("ts_us")
    w = Window.partitionBy("user_id").orderBy(us, "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.first("value").over(wf).alias("first_value"),
    )


@query(
    "win_frame",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           ROUND(sum(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             {ROUND_MONEY}) AS running_total,
           ROUND(avg(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             {ROUND_AVG}) AS moving_avg3
    FROM orders
    """,
)
def win_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit window frames: running total + 3-row moving average."""
    o = load_table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = base.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(run), ROUND_MONEY).alias("running_total"),
        F.round(F.avg("o_totalprice").over(mov), ROUND_AVG).alias("moving_avg3"),
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the windowed top-k pattern. The shuffle
    partitions by customer (high cardinality → balanced); each group ranks
    locally, no global sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# ---------------------------------------------------------------------------
# sort / limit
# ---------------------------------------------------------------------------


@query(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal FROM customer
    ORDER BY c_nationkey ASC, c_acctbal DESC, c_custkey ASC LIMIT 100
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction sort; with the LIMIT Catalyst plans
    TakeOrderedAndProject (per-partition heaps, no global shuffle-sort)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.orderBy(F.asc("c_nationkey"), F.desc("c_acctbal"), F.asc("c_custkey"))
        .limit(100)
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def limit_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------------------
# set operations / distinct
# ---------------------------------------------------------------------------

_BUILDING = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_RICH = "SELECT c_custkey FROM customer WHERE c_acctbal > 9000"


@query("set_union", oracle=f"{_BUILDING} UNION {_RICH}")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = load_table(spark, sf_dir, "customer")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    h = c.where(F.col("c_acctbal") > 9000).select("c_custkey")
    return b.union(h).distinct()


@query("set_intersect", oracle=f"{_BUILDING} INTERSECT {_RICH}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    h = c.where(F.col("c_acctbal") > 9000).select("c_custkey")
    return b.intersect(h)


@query(
    "set_except",
    oracle=f"SELECT o_custkey AS c_custkey FROM orders EXCEPT ALL {_BUILDING}",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (keeps surplus duplicates)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    c = load_table(spark, sf_dir, "customer")
    b = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return o.exceptAll(b)


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").dropDuplicates()


# ---------------------------------------------------------------------------
# subqueries — same ANSI text runs on both engines (views mirror DuckDB's)
# ---------------------------------------------------------------------------

_SUBQ_SCALAR = f"""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, {ROUND_MONEY}) AS totalprice
    FROM orders o
    WHERE o_totalprice > 1.6 * (SELECT avg(o2.o_totalprice) FROM orders o2
                                WHERE o2.o_custkey = o.o_custkey)
"""

_SUBQ_IN = """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_totalprice > 400000)
"""


@query("subquery_scalar", oracle=_SUBQ_SCALAR)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates it into an
    aggregate + join (RewriteCorrelatedScalarSubquery); identical SQL text
    runs on the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_SCALAR)


@query("subquery_in", oracle=_SUBQ_IN)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery — planned as a left-semi join."""
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_IN)


# ---------------------------------------------------------------------------
# scalar function families
# ---------------------------------------------------------------------------


@query(
    "fn_string",
    oracle="""
    SELECT doc_id,
           lower(substring(text, 1, 20)) AS head_lower,
           upper(lang) AS lang_upper,
           length(text) AS text_len,
           trim(concat(' ', lang, ' ')) AS lang_trim,
           string_split(text, ' ')[1] AS first_token,
           regexp_extract(text, '([a-z]+)', 1) AS first_word
    FROM documents
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over documents.text."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head_lower"),
        F.upper("lang").alias("lang_upper"),
        F.length("text").alias("text_len"),
        F.trim(F.concat(F.lit(" "), F.col("lang"), F.lit(" "))).alias("lang_trim"),
        F.split("text", " ").getItem(0).alias("first_token"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS yr,
           CAST(month(o_orderdate) AS INT) AS mo,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')
             AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01')
                AS INT) AS days_to_98,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over o_orderdate."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), d.cast("date")).alias(
            "days_to_98"
        ),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus_30d"),
    )


@query(
    "fn_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(-l_extendedprice), {ROUND_MONEY}) AS abs_price,
           CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
           ROUND(pow(1 + l_discount, 2), {ROUND_AVG}) AS disc_sq,
           ROUND(ln(l_extendedprice), {ROUND_AVG}) AS ln_price,
           ROUND(sqrt(l_quantity), {ROUND_AVG}) AS qty_sqrt
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family over lineitem."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(-F.col("l_extendedprice")), ROUND_MONEY).alias("abs_price"),
        F.ceil("l_quantity").cast("long").alias("qty_ceil"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.round(F.pow(1 + F.col("l_discount"), 2), ROUND_AVG).alias("disc_sq"),
        F.round(F.log(F.col("l_extendedprice")), ROUND_AVG).alias("ln_price"),
        F.round(F.sqrt("l_quantity"), ROUND_AVG).alias("qty_sqrt"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(CAST(embedding AS DOUBLE[])[1], 6) AS e1,
           list_aggregate(
             list_transform(CAST(embedding AS DOUBLE[])[1:3],
                            x -> CAST(CAST(ROUND(x, 6) AS DECIMAL(18,6))
                                      AS VARCHAR)),
             'string_agg', ',') AS head3,
           ROUND(list_max(CAST(embedding AS DOUBLE[])), 6) AS emax,
           ROUND(list_min(CAST(embedding AS DOUBLE[])), 6) AS emin
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over the embedding column (cast to double on
    both sides so rounding compares doubles with doubles). ``head3`` is
    emitted as a comma-joined STRING on both engines: the driver's pandas
    canonicalizer sorts/hashes cell values, and raw list cells are
    unhashable there (round-3 driver error) — flattening to a scalar keeps
    the array-function coverage while staying inside the hash contract.
    The per-element render goes through DECIMAL(18,6), not a double→string
    cast: Spark prints |x|<1e-3 doubles in scientific notation ("4.61E-4")
    where DuckDB prints fixed-point — decimal pins both to 6dp fixed."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at(emb, 1), 6).alias("e1"),
        F.array_join(
            F.transform(
                F.slice(emb, 1, 3),
                lambda x: F.round(x, 6).cast("decimal(18,6)").cast("string"),
            ),
            ",",
        ).alias("head3"),
        F.round(F.array_max(emb), 6).alias("emax"),
        F.round(F.array_min(emb), 6).alias("emin"),
    )


@query(
    "fn_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_schema
    FROM events
    """,
)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction two ways: path-based get_json_object and
    schema-based from_json (→ struct field access)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_path"),
        F.from_json("props", "k INT").getField("k").alias("k_schema"),
    )


@query(
    "fn_cond",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor
    FROM customer
    """,
)
def fn_cond(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, coalesce, nullif, cast. (Double→int
    CAST is deliberately via floor(): Spark truncates, DuckDB rounds.)"""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "neg")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg"
        ),
        F.floor("c_acctbal").cast("long").alias("bal_floor"),
    )


@query(
    "join_agg_topk",
    oracle=f"""
    SELECT l.l_orderkey,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), {ROUND_MONEY})
             AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate_s,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1995-03-15'
      AND l.l_shipdate > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def join_agg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite showcase (TPC-H Q3 shape): 3-table join → filtered
    revenue aggregate → global top-10. One query exercising the whole
    relational pipeline the individual Tier C ids cover piecewise.

    Plan economics at scale: the customer filter prunes the dim BEFORE the
    join (Catalyst pushes it below), customer⋈orders broadcasts the
    filtered dim under AQE, orders⋈lineitem shuffles on the order key
    (both sides fact-sized), the aggregate runs partial+final on the join
    key already in hand, and the top-10 is TakeOrderedAndProject — no
    global sort ever materializes."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < "1995-03-15"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > "1995-03-15"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                ROUND_MONEY,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate_s"),
            "o_orderpriority",
        )
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshape: per-user event counts pivoted to one column per
    event type. The value list is passed explicitly — with it, pivot is
    a single hash aggregate (one shuffle on user_id); without it Spark
    first runs a distinct scan to discover the columns, an extra pass
    you never want at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", kinds)
        .agg(F.count(F.lit(1)))
        .na.fill(0, kinds)
    )


@query(
    "join_star_agg",
    oracle=f"""
    SELECT n.n_name,
           ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), {ROUND_MONEY})
             AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1994-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def join_star_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite showcase (TPC-H Q5 shape): 5-table star join → revenue
    per supplier nation in one region — the canonical join-reorder /
    dim-broadcast stressor.

    Plan economics: region filters to 1 row and prunes nation BEFORE the
    fact tables are touched (broadcast chain region→nation→supplier);
    the only fact-fact edge (lineitem⋈orders) shuffles on the order key;
    everything else is a broadcast hash join against a filtered dim. The
    final per-nation aggregate is 25 groups — partial map-side, trivial
    exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1994-01-01"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                ROUND_MONEY,
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "having_semijoin",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, big.sum_qty
    FROM orders o
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS sum_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 300
    ) big ON o.o_orderkey = big.l_orderkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 20
    """,
)
def having_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite showcase (TPC-H Q18 shape): find large orders — aggregate
    lineitem per order, HAVING-filter the aggregate, join the survivors
    back to orders, top-20 by price.

    The aggregate runs BEFORE the join, so the join's build side is only
    the HAVING survivors (a few hundred keys) — broadcastable at any
    corpus scale where the predicate is selective; the orders scan never
    shuffles. sum_qty stays unrounded: quantities are integral doubles,
    so the sum is exact in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@query(
    "profile_numeric",
    oracle="""
    WITH u AS (
        SELECT 'l_quantity' AS col, l_quantity AS v FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT 'l_discount', l_discount FROM lineitem
    )
    SELECT col, count(*) AS n, count(DISTINCT v) AS n_distinct,
           ROUND(min(v), 6) AS min_v, ROUND(max(v), 6) AS max_v,
           ROUND(avg(v), 4) AS mean_v,
           ROUND(quantile_cont(v, 0.5), 6) AS p50
    FROM u GROUP BY col
    """,
)
def profile_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (data-quality op): per-numeric-column count,
    exact distinct cardinality, range, mean, and exact interpolated
    median, over an UNPIVOTED (column, value) stream — one shuffle for
    the algebraic metrics, however many columns are profiled.

    The median deliberately does NOT use Spark's holistic ``percentile``
    aggregate (one task buffering an entire column per group — the first
    casualty at 100 TB). It runs the distributed-selection operator
    (operators/selection.py): sketch-bucketed counting + ranking only the
    straddling buckets, exact ``percentile_cont`` semantics, matching
    DuckDB's ``quantile_cont`` bit-for-bit after rounding. Mean rounds at
    4 dp (f64 summation-order noise); medians of values exact at ≤3 dp
    round at 6 dp tie-free."""
    from vector_search_playground_spark.operators.selection import (
        exact_quantile,
    )

    li = load_table(spark, sf_dir, "lineitem")
    from vector_search_playground_spark.sources import fan_out

    # fan_out BEFORE persist: the cache inherits the scan's split count
    # (a single-file fixture = 2-3 splits), and every downstream pass —
    # the metric agg and each selection scan — would run its map side at
    # that width. Caching at full parallelism makes all consumers wide.
    u = fan_out(
        li.select(
            F.explode(
                F.create_map(
                    F.lit("l_quantity"), F.col("l_quantity"),
                    F.lit("l_extendedprice"), F.col("l_extendedprice"),
                    F.lit("l_discount"), F.col("l_discount"),
                )
            ).alias("col", "v")
        )
    ).persist()  # feeds the metric agg + the selection passes
    p50 = exact_quantile(u, "col", "v", 0.5)
    p50_map = F.create_map(
        *[F.lit(x) for k, v in sorted(p50.items()) for x in (k, v)]
    )
    return u.groupBy("col").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("v").alias("n_distinct"),
        F.round(F.min("v"), 6).alias("min_v"),
        F.round(F.max("v"), 6).alias("max_v"),
        F.round(F.avg("v"), 4).alias("mean_v"),
    ).withColumn("p50", F.round(p50_map[F.col("col")], 6))


@query(
    "scan_csv",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang
    """,
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV as a first-class source (sources/formats.py): the documents
    table is materialized as header'd CSV once per fixture content
    fingerprint, then scanned with a PINNED schema — no inferSchema
    sampling pass — and aggregated. The oracle runs the same aggregate on
    the parquet view: a format change must never change answers. CSV has
    no pushdown (text is read wholesale), which is exactly why this query
    demonstrates the schema-pinned pattern rather than pretending CSV is
    a storage format; see formats.py for the split/compression posture.
    """
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.sources.formats import (
        read_table,
        write_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"documents_csv_{tag}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_table(docs, path, fmt="csv")
    got = read_table(spark, path, docs.schema, fmt="csv")
    return got.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@query(
    "rollup_hypertable",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n_events,
           ROUND(sum(value), 2) AS sum_value
    FROM events GROUP BY hour, event_type
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable rollup (the TimescaleDB continuous-aggregate pattern):
    hourly per-type aggregates are served from a pre-materialized rollup
    table for closed history and computed from raw events only for the
    recent tail, then unioned — the query never re-scans history.

    The rollup parquet is built once per fixture content fingerprint with
    the SAME aggregate expression the tail uses (one definition, two
    execution points). The split sits on an hour boundary, so rollup rows
    are final and the two halves never share a group — no re-aggregation
    after the union. The tail predicate (``ts >= split``) reaches the raw
    scan as a pushed filter; at 100 TB with time-partitioned raw data it
    prunes to the last few partitions, which is the entire point of the
    pattern. The oracle computes the same hours from raw in one pass —
    materialization must never change answers."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    # split instant, expressed on the STORED column (ts_us, int64 epoch
    # microseconds): a predicate on the derived `ts` timestamp projection
    # cannot reach the parquet scan, one on ts_us shows up in PushedFilters
    # (plan-asserted in tests/test_rangejoin_packing.py)
    SPLIT_US = 1706140800 * 1_000_000  # 2024-01-25T00:00:00Z

    def hourly(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_raw"),
        )

    ev = load_table(spark, sf_dir, "events")
    fp = _fixture_fingerprint(sf_dir, "events")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"rollup_hourly_{tag}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from vector_search_playground_spark.sources import atomic_build

        atomic_build(
            lambda p: hourly(
                ev.where(F.col("ts_us") < F.lit(SPLIT_US))
            ).write.mode("overwrite").parquet(p),
            path,
        )
    history = spark.read.parquet(path)
    tail = hourly(ev.where(F.col("ts_us") >= F.lit(SPLIT_US)))
    return history.unionByName(tail).select(
        "hour",
        "event_type",
        "n_events",
        F.round("sum_raw", 2).alias("sum_value"),
    )


@query("agg_hll_merge")  # rows-only: sketch estimates are approximate
def agg_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting — THE 100 TB aggregation
    pattern: per-group HLL sketches (Apache DataSketches via
    ``hll_sketch_agg``) roll up to a global estimate with
    ``hll_union_agg`` WITHOUT re-scanning the data, the property that
    lets a cluster maintain per-partition/per-day sketches and answer
    any coarser rollup from sketch bytes alone.

    Self-checking like ``agg_approx``: every row carries the estimate,
    the exact count, rel_err, and an in-query bound, so the rows-only
    driver check pins accuracy. Output = one row per event_type plus a
    ``__merged__`` row whose estimate comes ONLY from unioning the
    per-group sketch bytes (never from the raw data)."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    per.persist()
    groups = per.select(
        "event_type",
        F.hll_sketch_estimate("sk").alias("approx_users"),
        "exact_users",
    )
    # the merged row: union the per-group sketches — no second scan of
    # events; exact global count comes from the base table for the check
    g_exact = ev.agg(F.countDistinct("user_id").alias("exact_users"))
    merged = (
        per.agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("approx_users"))
        .crossJoin(F.broadcast(g_exact))
        .select(
            F.lit("__merged__").alias("event_type"),
            "approx_users",
            "exact_users",
        )
    )
    rel_err = (
        F.abs(F.col("approx_users").cast("double") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return (
        groups.unionByName(merged)
        .withColumn("rel_err", F.round(rel_err, 6))
        # default lgConfigK=12 → rsd ≈ 0.81%/√2^12 ≈ 1.6%; 5% ≈ 3σ
        .withColumn("within_bound", rel_err < F.lit(0.05))
        .select(
            "event_type", "approx_users", "exact_users",
            "rel_err", "within_bound",
        )
    )


QUANTILE_PROBES = (0.5, 0.9, 0.99)


@query("quantile_sketch")  # rows-only: sketch quantiles are approximate
def quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles via the Greenwald-Khanna sketch
    (``percentile_approx``) against the exact ``percentile`` — the
    single-pass bounded-memory path for percentile monitoring at 100 TB,
    where the exact holistic aggregate needs a full sort or the 3-pass
    selection ``profile_numeric`` uses.

    Self-checking: one output row per probed quantile with the sketch
    value, the exact value, and the RANK error — the sketch's actual
    contract is ±accuracy^-1 in rank, not value, so the in-query bound
    asserts the rank displacement, measured exactly with a count below
    the sketch's answer."""
    from vector_search_playground_spark.operators.selection import (
        exact_quantiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    acc = 1000  # rank error ≤ n/acc
    probes = list(QUANTILE_PROBES)
    # Job layout: (sketch + n) in one agg; exact values via the repo's
    # 3-pass width-bucket selection (the scale-safe exact path —
    # quantile_groups' kernel), NOT Spark's holistic `percentile`: the
    # holistic buffer is the thing the sketch exists to avoid, and
    # combining two TypedImperative aggs in one agg triggered a
    # sort-based fallback (measured 6.3 s vs 2.9 s split at sf0.1).
    # Rank measurement for all probes fuses into one final agg.
    row = li.agg(
        F.percentile_approx(
            "l_extendedprice", F.array(*[F.lit(p) for p in probes]), acc
        ).alias("approx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = row["n"]
    exact = exact_quantiles(
        li.select(F.lit("all").alias("k"), "l_extendedprice"),
        "k",
        "l_extendedprice",
        probes,
    )["all"]
    below = li.agg(
        *[
            F.sum(
                (F.col("l_extendedprice") <= F.lit(float(a))).cast("long")
            ).alias(f"b{i}")
            for i, a in enumerate(row["approx"])
        ]
    ).first()
    out = []
    for i, (p, a) in enumerate(zip(probes, row["approx"])):
        rank_err = abs(below[f"b{i}"] - p * n) / n
        out.append(
            (
                p,
                float(a),
                float(exact[p]),
                round(rank_err, 6),
                rank_err <= 1.0 / acc,
            )
        )
    return spark.createDataFrame(
        out,
        "quantile double, approx double, exact double, "
        "rank_err double, within_bound boolean",
    )


@query(
    "scan_jsonl",
    oracle="""
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source
    """,
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines as a first-class source — the interchange format every
    web-scale corpus actually arrives in (Common Crawl WET/CC-NET dumps
    are JSONL). Same posture as ``scan_csv``: the documents table is
    materialized as JSONL once per fixture content fingerprint, then
    scanned with a PINNED schema — no schema-inference sampling pass,
    which on a 100 TB JSONL drop would be a full extra read — and the
    oracle runs the identical aggregate on the parquet view: format
    must never change answers. JSONL splits by line, so parallelism
    survives; column pruning does not (whole objects are parsed), which
    is why the engine's ingest path is 'read JSONL once, land parquet'
    rather than treating JSONL as storage."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.sources.formats import (
        read_table,
        write_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"documents_jsonl_{tag}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_table(docs, path, fmt="json")
    got = read_table(spark, path, docs.schema, fmt="json")
    return got.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@query(
    "scan_merge_schema",
    oracle="""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM (
        SELECT CASE WHEN doc_id % 2 = 0 THEN NULL ELSE lang END AS lang,
               n_chars
        FROM documents
    ) GROUP BY lang
    """,
)
def scan_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read: a corpus landed in two snapshot generations
    — v1 files WITHOUT the ``lang`` column (even doc_ids), v2 files with
    it — scanned as one relation. Every long-lived 100 TB corpus drifts
    like this; the engine must read old and new files together without a
    rewrite.

    The scale-safe mechanism is the PINNED SUPERSET schema: reading both
    directories under one explicit ``.schema(v2)`` makes the parquet
    reader null-fill columns absent from older footers — no
    ``mergeSchema`` footer-sampling job (which on a 100 TB lake is a
    full extra metadata pass; that option is for interactive discovery,
    not production scans). The oracle replays the null-fill semantics on
    the parquet view via the known generation split: answers must not
    depend on which snapshot a row came from."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(SCRATCH, f"documents_evolved_{tag}_{fp}")
    v1, v2 = os.path.join(base, "v1"), os.path.join(base, "v2")
    if not (
        os.path.exists(os.path.join(v1, "_SUCCESS"))
        and os.path.exists(os.path.join(v2, "_SUCCESS"))
    ):
        docs.where(F.col("doc_id") % 2 == 0).drop("lang").write.mode(
            "overwrite"
        ).parquet(v1)
        docs.where(F.col("doc_id") % 2 == 1).write.mode("overwrite").parquet(
            v2
        )
    merged = spark.read.schema(docs.schema).parquet(v1, v2)
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )


@query(
    "join_bloom_filtered",
    oracle="""
    SELECT o.o_custkey, count(*) AS n_orders,
           ROUND(sum(o.o_totalprice), 2) AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal > 9000
    GROUP BY o.o_custkey
    """,
)
def join_bloom_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim join with an EXPLICIT Bloom runtime filter
    (operators/bloom.py): the high-balance customer key set builds a
    131072-bit filter in one pass; the orders scan then drops
    non-matching rows with a constant-folded integer predicate BEFORE any
    exchange, and the exact join that follows removes the Bloom's false
    positives — so the answer is bit-identical to the plain join the
    oracle runs, only the shuffled volume changes. This is
    InjectRuntimeFilter made explicit and inspectable: at 100 TB with a
    non-broadcastable dim, the prefilter is the difference between
    shuffling the fact table and shuffling its matching slice (~10%
    here)."""
    from vector_search_playground_spark.operators.bloom import (
        build_bloom_words,
        might_contain,
    )

    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select("c_custkey")
    )
    words = build_bloom_words(cust, "c_custkey")
    orders = load_table(spark, sf_dir, "orders").where(
        might_contain(words, F.col("o_custkey"))
    )
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "scan_orc",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           ROUND(avg(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC as a first-class source — the third columnar format next to
    parquet (primary) and the text formats (csv/jsonl ingest). Unlike
    those, ORC keeps the columnar contract: predicate pushdown, column
    pruning, and stripe-level statistics all survive, so a table landed
    by a Hive-era pipeline scans with the same plan shape as parquet.
    Materialized once per fixture content fingerprint, read back with
    the pinned schema, and certified against the parquet view — format
    must never change answers."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.sources.formats import (
        read_table,
        write_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"documents_orc_{tag}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_table(docs, path, fmt="orc")
    got = read_table(spark, path, docs.schema, fmt="orc")
    return got.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "agg_mode",
    oracle="""
    SELECT event_type, bucket, n FROM (
        SELECT event_type, bucket, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, bucket ASC) AS rn
        FROM (
            SELECT event_type, CAST(user_id % 10 AS BIGINT) AS bucket,
                   count(*) AS n
            FROM events GROUP BY event_type, bucket
        )
    ) WHERE rn = 1 ORDER BY event_type
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE per group (most frequent user bucket per event
    type, min-value tiebreak) — the holistic aggregate SQL's MODE()
    leaves tie-ordering undefined for, made hash-certifiable by building
    it from count + row_number explicitly. Two hash-aggs: the first
    shuffles (group, value) partial counts (map-side combine bounds the
    exchange by the value domain), the second is a per-group top-1 window
    over the already-aggregated relation — at 100 TB the window input is
    |groups|·|value domain| rows, not the corpus."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            "event_type", (F.col("user_id") % 10).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("n"), F.asc("bucket")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", "bucket", "n")
        .orderBy("event_type")
    )


@query(
    "rollup_merge_partials",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type, count(*) AS n_events,
           ROUND(sum(value), 2) AS sum_value,
           ROUND(min(value), 2) AS min_value,
           ROUND(max(value), 2) AS max_value,
           ROUND(ROUND(sum(value), 2) / count(*), 6) AS avg_value
    FROM events GROUP BY hour, event_type
    """,
)
def rollup_merge_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Algebraic partial-aggregate MERGE — the incremental-materialized-
    view step ``rollup_hypertable`` deliberately avoids by splitting on a
    group boundary. Here the split is an arbitrary instant, so the two
    halves SHARE (hour, type) groups and the stored partials must be
    re-aggregated: count = Σcounts, sum = Σsums, min/max of min/max, and
    avg derived from (Σn, Σsum) at the end — the decomposition that is
    correct where 'avg of avgs' silently is not.

    The derived average divides the ROUNDED 2-dp sum (both engines then
    divide the identical double; dividing each engine's own unrounded
    partial-sum produced .5 rounding ties at any digit — caught by the
    sf0.1 sweep). The stored relation is (keys → n, sum, min, max)
    partials — the
    mergeable state of every algebraic aggregate — so refreshing the view
    after a new batch costs one aggregation OF THE BATCH plus a
    groups-sized merge, never a history rescan. At 100 TB that is the
    difference between a continuous aggregate and a nightly full rebuild.
    The oracle computes the same result from raw in one pass:
    incremental maintenance must never change answers."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    # Mid-hour split: both sides contribute partials to the same groups.
    SPLIT_US = (1706140800 + 1800) * 1_000_000

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format(
                F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss"
            ).alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    ev = load_table(spark, sf_dir, "events")
    fp = _fixture_fingerprint(sf_dir, "events")
    tag = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(SCRATCH, f"rollup_partials_{tag}_{fp}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        from vector_search_playground_spark.sources import atomic_build

        atomic_build(
            lambda p: partials(
                ev.where(F.col("ts_us") < F.lit(SPLIT_US))
            ).write.mode("overwrite").parquet(p),
            path,
        )
    hist = spark.read.parquet(path)
    fresh = partials(ev.where(F.col("ts_us") >= F.lit(SPLIT_US)))
    merged = (
        hist.unionByName(fresh)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("s").alias("s"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.select(
        "hour",
        "event_type",
        "n_events",
        F.round("s", 2).alias("sum_value"),
        F.round("mn", 2).alias("min_value"),
        F.round("mx", 2).alias("max_value"),
        F.round(F.round(F.col("s"), 2) / F.col("n_events"), 6).alias("avg_value"),
    )


# --- sql_tpch_q1 ------------------------------------------------------------

# ONE SQL text, executed verbatim by BOTH engines: the Spark side runs it
# through spark.sql() over the registered views, the oracle hands the
# identical string to DuckDB. TPC-H Q1's money aggregates ride the
# module-wide exact-cents discipline (per-row floor(x*100+0.5) BEFORE the
# sum, so every accumulator is int64 on both engines); averages divide two
# exact integers inside the shared half-up floor.
_TPCH_Q1_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS BIGINT) AS sum_disc_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                           * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_charge_c,
       floor(CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4 AS avg_qty_c,
       floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS DOUBLE) / count(*) * 1e4 + 0.5) / 1e4 AS avg_price_c,
       floor(CAST(sum(CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT))
                  AS DOUBLE) / count(*) + 0.5) / 1e6 AS avg_disc,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("sql_tpch_q1", oracle=_TPCH_Q1_SQL)
def sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) as ONE SQL string executed
    verbatim by both engines — the SQL-TEXT parity certificate: a user
    can hand this engine the same ANSI SQL they run elsewhere and get
    hash-identical results (the fn_* family certifies functions
    individually; this certifies a whole multi-aggregate statement
    including date literals, expression aggregates, and multi-key
    ORDER BY). The reference's stack exposes raw SQL through sea-orm's
    Statement escape hatch (src/main.rs:5); this is that surface,
    certified.

    Shape at 100 TB: the canonical map-side-combine aggregate — the
    shipdate filter is pushed to the parquet scan, ONE hash-agg over 6
    groups, partial aggregation upstream of the single exchange; the
    plan is what every SQL engine turns Q1 into, here arrived at by
    Catalyst from the raw string.
    """
    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q1_SQL)
