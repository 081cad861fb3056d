"""Pipeline-reliability tier: the operators that keep a 100 TB corpus
TRUSTWORTHY — data-quality expectation checks, interval coalescing,
cumulative-distinct growth curves, SCD Type-2 dimension builds, counter
rates, and per-bucket OHLC candlesticks.

The reference executes queries against whatever is in the table
(`/root/reference/src/main.rs:85-96`); a production deployment runs
these around every ingest. Every query here is oracle-backed — exact
SQL semantics on both engines.

Scale discipline per query:
- ``dq_expectations`` — one conditional hash-agg per table collapsed to
  single rows, plus broadcast anti-joins for referential checks; the
  scorecard is O(checks) rows regardless of corpus size.
- ``interval_merge`` — the classic gaps-and-islands interval coalesce:
  one shuffle on user_id; the running-max-end window, the island
  counter, and the final aggregate all reuse that exchange.
- ``running_distinct`` — first-seen per user via one hash-agg (never a
  distinct-over-window), then calendar-sized cumulative windows.
- ``scd2_build`` — change-compression lag() + validity lead() windows,
  both keyed on user_id: a single exchange.
- ``counter_agg`` — one lag window + one hash-agg on the same key.
- ``ohlc_bars`` — ordered-argmin/argmax accumulators (min_by/max_by)
  in ONE hash-agg; no per-bucket sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table

# --- dq_expectations --------------------------------------------------------


@query(
    "dq_expectations",
    oracle="""
    SELECT 'events_value_nonnull' AS check_id,
           CAST(count(*) AS BIGINT) AS n_scanned,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
               AS violations,
           ROUND(CAST(count(DISTINCT event_type) AS DOUBLE), 2) AS observed
    FROM events
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1)
                AS BIGINT),
           ROUND(max(l_discount), 2)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST((SELECT count(*) FROM lineitem) AS BIGINT),
           CAST(count(*) AS BIGINT),
           ROUND(CAST(count(*) AS DOUBLE), 2)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'orders_fk_customer',
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           CAST(count(*) AS BIGINT),
           ROUND(CAST(count(*) AS DOUBLE), 2)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'orders_pk_unique',
           CAST(count(*) AS BIGINT),
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           ROUND(CAST(count(DISTINCT o_orderkey) AS DOUBLE), 2)
    FROM orders
    UNION ALL
    SELECT 'orders_price_positive',
           CAST(count(*) AS BIGINT),
           CAST(count(*) FILTER (WHERE o_totalprice <= 0) AS BIGINT),
           ROUND(min(o_totalprice), 2)
    FROM orders
    ORDER BY check_id
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectation suite (the Great-Expectations /
    Deequ-style contract a corpus pipeline runs before publishing a
    snapshot): primary-key uniqueness, referential integrity, range
    and null constraints — one (check_id, n_scanned, violations,
    observed) row per expectation, so a scheduler can gate the
    downstream DAG on ``violations == 0`` and dashboards can trend
    ``observed``.

    Shape at 100 TB: each table contributes ONE conditional hash-agg
    (all of its row-local checks ride the same pass as FILTER-style
    conditional aggregates → map-side partials, single-row result);
    referential checks are broadcast LEFT-ANTI joins counting orphans
    (never shuffle the fact side: the dimension key set broadcasts).
    The scorecard itself is O(checks) rows — driver-safe forever.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")

    def row(check_id, n, viol, obs):
        return F.struct(
            F.lit(check_id).alias("check_id"),
            n.cast("long").alias("n_scanned"),
            viol.cast("long").alias("violations"),
            F.round(obs.cast("double"), 2).alias("observed"),
        )

    o_checks = orders.agg(
        row(
            "orders_pk_unique",
            F.count(F.lit(1)),
            F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
            F.countDistinct("o_orderkey"),
        ).alias("c1"),
        row(
            "orders_price_positive",
            F.count(F.lit(1)),
            F.count(F.when(F.col("o_totalprice") <= 0, 1)),
            F.min("o_totalprice"),
        ).alias("c2"),
    )
    l_checks = lineitem.agg(
        row(
            "lineitem_discount_range",
            F.count(F.lit(1)),
            F.count(
                F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
            ),
            F.max("l_discount"),
        ).alias("c3"),
    )
    e_checks = events.agg(
        row(
            "events_value_nonnull",
            F.count(F.lit(1)),
            F.count(F.when(F.col("value").isNull(), 1)),
            F.countDistinct("event_type"),
        ).alias("c4"),
    )
    n_orders = orders.agg(F.count(F.lit(1)).alias("n_o"))
    n_lineitem = lineitem.agg(F.count(F.lit(1)).alias("n_l"))
    o_orphans = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .crossJoin(n_orders)
        .select(row("orders_fk_customer", F.col("n_o"), F.col("k"), F.col("k")).alias("c5"))
    )
    l_orphans = (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey")),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("k"))
        .crossJoin(n_lineitem)
        .select(row("lineitem_fk_orders", F.col("n_l"), F.col("k"), F.col("k")).alias("c5"))
    )
    # 1-row branches crossJoin into one relation, then explode the struct
    # list to long form: a single action, O(checks) rows.
    wide = (
        o_checks.crossJoin(l_checks)
        .crossJoin(e_checks)
        .crossJoin(o_orphans.withColumnRenamed("c5", "c5a"))
        .crossJoin(l_orphans.withColumnRenamed("c5", "c5b"))
    )
    return (
        wide.select(
            F.explode(
                F.array("c1", "c2", "c3", "c4", "c5a", "c5b")
            ).alias("c")
        )
        .select("c.*")
        .orderBy("check_id")
    )


# --- interval_merge ---------------------------------------------------------

# Each event holds the user "active" for `value` minutes — genuinely
# variable-length intervals, so the running-max-end logic (a long interval
# swallowing several short ones) is materially exercised, unlike a
# fixed-pad variant which would degenerate to plain sessionization.
_US_PER_MIN = 60 * 1_000_000


@query(
    "interval_merge",
    oracle=f"""
    WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS s,
               epoch_us(ts) + CAST(floor(value * {_US_PER_MIN}) AS BIGINT)
                   AS e
        FROM events
    ),
    m AS (
        SELECT user_id, event_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) AS prev_max_e
        FROM iv
    ),
    g AS (
        SELECT user_id, s, e,
               CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                    THEN 1 ELSE 0 END AS brk,
               event_id
        FROM m
    ),
    isl AS (
        SELECT user_id, s, e,
               CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS island
        FROM g
    )
    SELECT user_id, island,
           CAST(count(*) AS BIGINT) AS n_intervals,
           min(s) AS start_us,
           max(e) AS end_us
    FROM isl
    GROUP BY user_id, island
    """,
)
def interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce overlapping per-user activity intervals into maximal
    covered spans (the interval-union / range-dedup verb: uptime
    stitching, on-call coverage, validity-window compaction). Each event
    opens an interval of ``value`` minutes; overlapping or touching
    intervals merge.

    Differs from sessionization in the break test: a new island starts
    only when the start exceeds the RUNNING MAX of all previous ends
    (``max(e) OVER (... 1 PRECEDING)``), not the previous row's end —
    with variable-length intervals a long span swallows later short
    ones, which lag()-based phrasing gets wrong. One shuffle on
    user_id; the running-max window, the cumulative island counter, and
    the final per-island aggregate all reuse that exchange."""
    from vector_search_playground_spark.operators.intervals import (
        merge_intervals,
    )

    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts_us").alias("s"),
        (
            F.col("ts_us")
            + (F.col("value") * _US_PER_MIN).cast("long")
        ).alias("e"),
    )
    return merge_intervals(iv)


# --- running_distinct -------------------------------------------------------


@query(
    "running_distinct",
    oracle="""
    WITH fs AS (
        SELECT user_id,
               min(strftime(date_trunc('day', ts), '%Y-%m-%d')) AS first_day
        FROM events GROUP BY user_id
    ),
    newu AS (
        SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
        FROM fs GROUP BY first_day
    ),
    act AS (
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS active_users
        FROM events GROUP BY day
    )
    SELECT act.day,
           act.active_users,
           COALESCE(newu.new_users, 0) AS new_users,
           CAST(sum(COALESCE(newu.new_users, 0))
                    OVER (ORDER BY act.day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_users
    FROM act LEFT JOIN newu ON act.day = newu.day
    ORDER BY act.day
    """,
)
def running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-distinct growth curve: per day, the active user count,
    the NEW user count, and the running total of distinct users ever
    seen — the DAU/new/cumulative triplet every growth dashboard plots.

    The scale trap this avoids: ``count(distinct) OVER (ORDER BY day)``
    is a holistic window that re-scans history per day. Instead each
    user's first-seen day comes from ONE hash-agg over the stream
    (mergeable, map-side partials), daily news from a second agg of
    that |users|-row relation, and the cumulative sum runs over the
    calendar-sized day spine — never the event stream."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    fs = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    newu = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("new_users")
    )
    act = ev.groupBy(day.alias("day")).agg(
        F.countDistinct("user_id").alias("active_users")
    )
    joined = act.join(F.broadcast(newu), "day", "left").select(
        "day",
        "active_users",
        F.coalesce("new_users", F.lit(0)).alias("new_users"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        joined.withColumn("cum_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


# --- scd2_build -------------------------------------------------------------


@query(
    "scd2_build",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
    ),
    c AS (
        SELECT user_id, event_type, t,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id) AS prev_type
        FROM o
    ),
    ch AS (
        SELECT user_id, event_type, t FROM c
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           t AS valid_from_us,
           lead(t) OVER (PARTITION BY user_id ORDER BY t) AS valid_to_us,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY t)
                AS BIGINT) AS version,
           CAST(CASE WHEN lead(t) OVER (PARTITION BY user_id ORDER BY t)
                          IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
    FROM ch
    """,
)
def scd2_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build from a change stream: each
    user's event_type sequence is change-compressed (consecutive equal
    states collapse into one row) and every surviving state gets a
    [valid_from, valid_to) validity interval, a version number, and an
    is_current flag — the MERGE-free way warehouses derive dimension
    history from CDC feeds.

    Both the change-compression lag() and the validity lead() partition
    by user_id: one exchange, two linear sweeps. The second window runs
    over the COMPRESSED relation (|state changes| rows, not |events|) —
    at 100 TB that's typically a 10-100× reduction before the heavier
    window. Timestamps are unique per fixture (verified), so (t) alone
    orders the compressed stream deterministically."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    c = ev.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("t"),
        F.lag("event_type").over(w).alias("prev_type"),
    )
    ch = c.where(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("t")
    return ch.select(
        "user_id",
        "event_type",
        F.col("t").alias("valid_from_us"),
        F.lead("t").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("long").alias("version"),
        F.when(F.lead("t").over(w2).isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_current"),
    )


# --- counter_agg ------------------------------------------------------------


@query(
    "counter_agg",
    oracle="""
    WITH d AS (
        SELECT user_id, value, epoch_us(ts) AS t,
               value - lag(value) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts), event_id)
                   AS delta
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(count(*) FILTER (WHERE delta < 0) AS BIGINT) AS n_resets,
           ROUND(sum(CASE WHEN delta IS NULL THEN 0
                          WHEN delta >= 0 THEN delta
                          ELSE value END), 2) AS total_increase,
           ROUND(ROUND(sum(CASE WHEN delta IS NULL THEN 0
                                WHEN delta >= 0 THEN delta
                                ELSE value END), 2)
                 / NULLIF((max(t) - min(t)) / 1e6, 0), 6) AS rate_per_sec
    FROM d GROUP BY user_id
    """,
)
def counter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter aggregation with reset detection (TimescaleDB
    ``counter_agg`` / PromQL ``increase``): deltas between consecutive
    samples accumulate; a DECREASE means the counter restarted, and the
    post-reset reading itself is the increase since the (unobserved)
    zero. Emits total increase, reset count, and the per-second rate —
    the semantics metrics pipelines need for restart-prone counters.
    The fixture value stream is adversarial (not monotone), so the
    reset branch is exercised heavily rather than vacuously.

    One lag() window and one hash-agg, both keyed on user_id → single
    exchange. The rate divides the ROUNDED 2-dp total by the exact
    integer-µs duration (both engines divide identical doubles — the
    rounding-tie discipline from rollup_merge_partials)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    d = ev.select(
        "user_id",
        "value",
        F.col("ts_us").alias("t"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )
    inc = (
        F.when(F.col("delta").isNull(), F.lit(0.0))
        .when(F.col("delta") >= 0, F.col("delta"))
        .otherwise(F.col("value"))
    )
    total = F.round(F.sum(inc), 2)
    dur_sec = (F.max("t") - F.min("t")) / F.lit(1e6)
    return d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.count(F.when(F.col("delta") < 0, 1)).alias("n_resets"),
        total.alias("total_increase"),
        F.round(
            total / F.nullif(dur_sec, F.lit(0.0)), 6
        ).alias("rate_per_sec"),
    )


# --- ohlc_bars --------------------------------------------------------------


@query(
    "ohlc_bars",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(arg_min(value, epoch_us(ts) * 100 + event_id % 100), 2)
               AS open,
           ROUND(max(value), 2) AS high,
           ROUND(min(value), 2) AS low,
           ROUND(arg_max(value, epoch_us(ts) * 100 + event_id % 100), 2)
               AS close
    FROM events GROUP BY day, event_type
    """,
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candlesticks per event_type (the TimescaleDB ``ohlc``
    / ``candlestick_agg`` verb): open/high/low/close of the value stream
    in each (day, series) bucket — the downsampling every financial or
    metrics chart runs before rendering.

    ONE hash-agg: open/close are ordered-argmin/argmax accumulators
    (min_by/max_by over the folded µs·100 + id%100 integer key — the
    agg_first_last tiebreak discipline), so each group carries a single
    candidate pair through map-side partials; no window, no per-bucket
    sort, and the shuffle moves |buckets| partial states, not the
    stream."""
    ev = load_table(spark, sf_dir, "events")
    okey = F.col("ts_us") * 100 + F.col("event_id") % 100
    return ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min_by("value", okey), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", okey), 2).alias("close"),
    )


# --- activity_gaps ----------------------------------------------------------


@query(
    "activity_gaps",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ),
    lagged AS (
        SELECT user_id, d,
               lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d
        FROM days
    )
    SELECT user_id,
           strftime(min(d), '%Y-%m-%d') AS first_day,
           strftime(max(d), '%Y-%m-%d') AS last_day,
           CAST(count(*) AS BIGINT) AS n_active_days,
           CAST(date_diff('day', min(d), max(d)) + 1 - count(*) AS BIGINT)
               AS n_missing_days,
           CAST(COALESCE(max(date_diff('day', prev_d, d)), 0) AS BIGINT)
               AS longest_gap_days
    FROM lagged
    GROUP BY user_id
    """,
)
def activity_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity-gap profile (the churn-feature verb): active-day
    count, missing days inside the [first, last] span, and the longest
    silence in days — computed on the DISTINCT-DAY relation (≤ span
    rows per user), never the event stream.

    One shuffle on user_id feeds the distinct-day aggregate, the lag
    window, and the final aggregate (same key throughout). The missing-
    day count is pure date arithmetic — no calendar spine join, no
    explode of the date range."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    lagged = days.withColumn("prev_d", F.lag("d").over(w))
    return lagged.groupBy("user_id").agg(
        F.date_format(F.min("d"), "yyyy-MM-dd").alias("first_day"),
        F.date_format(F.max("d"), "yyyy-MM-dd").alias("last_day"),
        F.count(F.lit(1)).alias("n_active_days"),
        (
            F.datediff(F.max("d"), F.min("d")) + 1 - F.count(F.lit(1))
        ).cast("long").alias("n_missing_days"),
        F.coalesce(F.max(F.datediff("d", "prev_d")), F.lit(0))
        .cast("long")
        .alias("longest_gap_days"),
    )


# --- join_point_in_time -----------------------------------------------------


@query(
    "join_point_in_time",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type, epoch_us(ts) AS t, event_id
        FROM events WHERE event_type <> 'purchase'
    ),
    c AS (
        SELECT user_id, event_type, t, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
               ) AS prev
        FROM o
    ),
    ch AS (
        SELECT user_id, event_type, t, event_id FROM c
        WHERE prev IS NULL OR prev <> event_type
    ),
    tiles AS (
        SELECT user_id, event_type AS state, t AS vf,
               lead(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                   AS vt,
               row_number() OVER (PARTITION BY user_id ORDER BY t, event_id)
                   AS version
        FROM ch
    ),
    f AS (
        SELECT event_id, user_id, epoch_us(ts) AS t
        FROM events WHERE event_type = 'purchase'
    )
    SELECT f.event_id, f.user_id, f.t AS purchase_us,
           tiles.state, CAST(tiles.version AS BIGINT) AS version
    FROM f
    LEFT JOIN tiles ON f.user_id = tiles.user_id
                   AND f.t >= tiles.vf
                   AND (tiles.vt IS NULL OR f.t < tiles.vt)
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-correct dimension lookup (the feature-store join):
    each purchase is joined to the SCD2 state tile that was valid AT the
    purchase instant — the user's state as it was known THEN, never the
    current row. Training-label assembly that uses today's dimension for
    yesterday's fact leaks the future into the features; this join is
    the leakage-safe alternative, and the temporal consumer of
    ``scd2_build``'s tiles.

    The oracle states the lookup as the BETWEEN θ-join against the
    tiles. The plan is join-free: the change-compressed state stream
    (|state changes| rows) and the purchase stream union and ride ONE
    user_id exchange; a forward-carry window assigns each purchase the
    last state/version at-or-before it — exactly the as-of construction,
    but carrying the dimension's attributes and version. At 100 TB the
    θ-join would range-explode on hot users; this scan is linear per
    user timeline.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    nonp = ev.where(F.col("event_type") != "purchase")
    ch = (
        nonp.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts_us").alias("t"),
            F.col("event_id").alias("tb"),
            F.lag("event_type").over(w).alias("prev"),
        )
        .where(F.col("prev").isNull() | (F.col("prev") != F.col("state")))
        .drop("prev")
    )
    # (t, tb) ordering everywhere: two state changes at the same
    # (user_id, ts_us) must version and forward-carry identically in
    # Spark and the oracle, so event_id is the shared tiebreak
    w2 = Window.partitionBy("user_id").orderBy("t", "tb")
    dim = ch.withColumn(
        "version", F.row_number().over(w2).cast("long")
    ).select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "t",
        F.lit(0).alias("tag"),
        "tb",
        "state",
        "version",
    )
    fact = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts_us").alias("t"),
        F.lit(1).alias("tag"),
        F.col("event_id").alias("tb"),
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("long").alias("version"),
    )
    # state change sorts before a simultaneous purchase (tag 0 < 1):
    # a purchase exactly at a transition sees the NEW tile, matching the
    # oracle's inclusive f.t >= vf; among simultaneous state changes the
    # highest event_id wins (oracle: the earlier tile's vt collapses to
    # an empty [t, t) interval, so only the last tile matches)
    wc = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        dim.unionByName(fact)
        .withColumn("cur_state", F.last("state", ignorenulls=True).over(wc))
        .withColumn(
            "cur_version", F.last("version", ignorenulls=True).over(wc)
        )
        .where(F.col("tag") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("t").alias("purchase_us"),
            F.col("cur_state").alias("state"),
            F.col("cur_version").alias("version"),
        )
    )


# --- join_interval_overlap --------------------------------------------------


def _islands_cte(alias: str, etype: str) -> str:
    """Gaps-and-islands SQL for one event type's merged activity
    intervals (same running-max-end construction as interval_merge)."""
    return f"""
    {alias} AS (
        SELECT user_id, island,
               min(s) AS s, max(e) AS e
        FROM (
            SELECT user_id, s, e,
                   CAST(sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY s, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS island
            FROM (
                SELECT user_id, event_id, s, e,
                       CASE WHEN max(e) OVER (PARTITION BY user_id
                                              ORDER BY s, event_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                                       AND 1 PRECEDING)
                                 IS NULL
                              OR s > max(e) OVER (PARTITION BY user_id
                                                  ORDER BY s, event_id
                                                  ROWS BETWEEN
                                                      UNBOUNDED PRECEDING
                                                      AND 1 PRECEDING)
                            THEN 1 ELSE 0 END AS brk
                FROM (
                    SELECT user_id, event_id, epoch_us(ts) AS s,
                           epoch_us(ts)
                               + CAST(floor(value * {_US_PER_MIN}) AS BIGINT)
                               AS e
                    FROM events WHERE event_type = '{etype}'
                )
            )
        )
        GROUP BY user_id, island
    )"""


@query(
    "join_interval_overlap",
    oracle=f"""
    WITH {_islands_cte("a", "click")},
    {_islands_cte("b", "view")}
    SELECT a.user_id, a.island AS island_click, b.island AS island_view,
           least(a.e, b.e) - greatest(a.s, b.s) AS overlap_us
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a.s <= b.e AND b.s <= a.e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-OVERLAP join between two interval SETS — the fourth join
    temporality (equi < as-of < point-in-interval(join_range) <
    interval×interval): per user, every pair of overlapping (click
    activity span, view activity span), with the overlap length. The
    concurrency/contention verb: when were two activities live at once?

    Shape at 100 TB: both sides first COALESCE to maximal spans via
    ``operators/intervals.merge_intervals`` (the per-user span count is
    orders of magnitude below the event count and bounded by the
    session structure), then join keyed on user_id — the overlap
    predicate filters inside bounded per-user pair groups, never a
    global θ-join. All three stages reuse the user_id partitioning.
    """
    from vector_search_playground_spark.operators.intervals import (
        merge_intervals,
    )

    ev = load_table(spark, sf_dir, "events")

    def spans(etype):
        iv = ev.where(F.col("event_type") == etype).select(
            "user_id",
            "event_id",
            F.col("ts_us").alias("s"),
            (
                F.col("ts_us") + (F.col("value") * _US_PER_MIN).cast("long")
            ).alias("e"),
        )
        return merge_intervals(iv).select(
            "user_id", "island", F.col("start_us").alias("s"),
            F.col("end_us").alias("e"),
        )

    a = spans("click").select(
        "user_id",
        F.col("island").alias("island_click"),
        F.col("s").alias("sa"),
        F.col("e").alias("ea"),
    )
    b = spans("view").select(
        "user_id",
        F.col("island").alias("island_view"),
        F.col("s").alias("sb"),
        F.col("e").alias("eb"),
    )
    return (
        a.join(b, "user_id")
        .where((F.col("sa") <= F.col("eb")) & (F.col("sb") <= F.col("ea")))
        .select(
            "user_id",
            "island_click",
            "island_view",
            (
                F.least("ea", "eb") - F.greatest("sa", "sb")
            ).alias("overlap_us"),
        )
    )
