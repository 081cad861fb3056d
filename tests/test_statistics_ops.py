"""Property and plan tests for the statistics tier
(queries/statistics.py) — each query's scale/semantics claim pinned
beyond the oracle hash."""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from vector_search_playground_spark.queries import statistics as S
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- basket_pairs -----------------------------------------------------------


def test_basket_pairs_shape_and_plan(spark, sf_smoke):
    df = S.basket_pairs(spark, sf_smoke)
    plan = _plan(df)
    # driver sees 20 rows via per-partition heaps, and the item-frequency
    # relation broadcasts (the pair relation is the only shuffled side)
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    rows = df.collect()
    assert 0 < len(rows) <= 20
    sups = [r["support"] for r in rows]
    assert sups == sorted(sups, reverse=True)
    for r in rows:
        assert r["part_a"] < r["part_b"]
        assert r["lift"] > 0


def test_basket_pairs_lift_identity(spark, sf_smoke):
    """For any emitted pair, lift == support·N / (cnt_a·cnt_b) recomputed
    from first principles on the basket relation."""
    li = (
        load_table(spark, sf_smoke, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    n = li.select("ok").distinct().count()
    cnts = {r["pk"]: r["c"] for r in li.groupBy("pk").agg(F.count("*").alias("c")).collect()}
    top = S.basket_pairs(spark, sf_smoke).collect()[0]
    expect = round(top["support"] * n / (cnts[top["part_a"]] * cnts[top["part_b"]]), 6)
    assert abs(top["lift"] - expect) < 1e-9


# --- win_percentiles --------------------------------------------------------


def test_win_percentiles_bounds_and_extremes(spark, sf_smoke):
    df = S.win_percentiles(spark, sf_smoke).cache()
    try:
        bad = df.where(
            (F.col("pct_rank") < 0)
            | (F.col("pct_rank") > 1)
            | (F.col("cume_dist") <= 0)
            | (F.col("cume_dist") > 1)
        ).count()
        assert bad == 0
        # every customer's distribution ends at cume_dist == 1 and starts
        # at pct_rank == 0 (the unique tiebreak makes both deterministic)
        per_cust = df.groupBy("o_custkey").agg(
            F.min("pct_rank").alias("lo"), F.max("cume_dist").alias("hi")
        )
        assert per_cust.where((F.col("lo") != 0.0) | (F.col("hi") != 1.0)).count() == 0
    finally:
        df.unpersist()


# --- trend_fit --------------------------------------------------------------


def test_trend_fit_r2_bounds_and_n(spark, sf_smoke):
    rows = S.trend_fit(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["n"] >= 3
        if r["r2"] is not None:
            assert -1e-9 <= r["r2"] <= 1 + 1e-9


def test_trend_fit_recovers_perfect_line(spark, sf_smoke, tmp_path):
    """A synthetic exact line y = 2x + 1 must come back with slope 2,
    intercept 1, r2 1 through the same query (written as an events-shaped
    parquet fixture)."""
    base = 1_704_067_200_000_000  # the query's 2024 epoch
    day = 86_400_000_000
    rows = [
        (i, base + i * day, 7, 2.0 * i + 1.0, "click", "{}")
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, value double, event_type string, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r["user_id"]: r for r in S.trend_fit(spark, str(tmp_path)).collect()}
    r = out[7]
    assert r["n"] == 5
    assert abs(r["slope"] - 2.0) < 1e-6
    assert abs(r["intercept"] - 1.0) < 1e-6
    assert abs(r["r2"] - 1.0) < 1e-6


def test_trend_fit_single_hash_agg_no_window(spark, sf_smoke):
    """Algebraic co-moment aggregation: one user_id exchange, no Window."""
    plan = _plan(S.trend_fit(spark, sf_smoke))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_regr" in plan or "partial" in plan.lower(), plan


# --- outliers_mad -----------------------------------------------------------


def test_outliers_mad_fence_is_robust(spark, sf_smoke):
    """The whole point vs anomaly_zscore: median and MAD computed on the
    fixture match the values recomputed after clipping the top 1% to an
    absurd magnitude — a moment-based gate would move, the robust one
    must not (median/MAD depend only on ranks around the middle)."""
    out = {r["event_type"]: r for r in S.outliers_mad(spark, sf_smoke).collect()}
    assert out
    ev = load_table(spark, sf_smoke, "events").select("event_type", "value")
    for etype, r in out.items():
        vals = sorted(
            x["value"] for x in ev.where(F.col("event_type") == etype).collect()
        )
        n = len(vals)
        assert r["n"] == n
        # exact interpolated median from first principles
        lo = vals[(n - 1) // 2]
        hi = vals[n // 2]
        assert abs(r["median"] - round((lo + hi) / 2, 6)) < 1e-6
        assert r["mad"] >= 0
        assert 0 <= r["n_outliers"] < n


# --- sample_per_group -------------------------------------------------------


def test_sample_per_group_equals_naive_window(spark, sf_smoke):
    """The salted two-stage cut must return EXACTLY the rows of the naive
    one-whale-partition-per-group window it replaces."""
    docs = load_table(spark, sf_smoke, "documents").select(
        "lang",
        "doc_id",
        F.md5(F.concat_ws(":", F.col("text"), F.col("doc_id"))).alias("skey"),
    )
    w = Window.partitionBy("lang").orderBy("skey", "doc_id")
    naive = (
        docs.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .select("lang", "doc_id", "rk")
    )
    two_stage = S.sample_per_group(spark, sf_smoke)
    assert sorted(map(tuple, two_stage.collect())) == sorted(
        map(tuple, naive.collect())
    )


def test_sample_per_group_counts(spark, sf_smoke):
    per = (
        S.sample_per_group(spark, sf_smoke)
        .groupBy("lang")
        .agg(F.count("*").alias("c"), F.max("rk").alias("mx"))
        .collect()
    )
    assert per
    for r in per:
        assert r["c"] <= 5 and r["mx"] <= 5


# --- text_entropy -----------------------------------------------------------


def test_text_entropy_bounds(spark, sf_smoke):
    df = S.text_entropy(spark, sf_smoke).cache()
    try:
        assert df.count() == load_table(spark, sf_smoke, "documents").count()
        rows = df.collect()
        for r in rows:
            # 0 ≤ H ≤ log2(alphabet); alphabet ≤ n_chars
            assert -1e-9 <= r["entropy"] <= math.log2(max(r["n_chars"], 2)) + 1e-9
            assert 0 < r["top_char_ratio"] <= 1
    finally:
        df.unpersist()


def test_text_entropy_degenerate_doc(spark, tmp_path):
    """A single repeated character has zero entropy and ratio 1."""
    df = spark.createDataFrame(
        [(0, "aaaa", "en", "src0", 4), (1, "ab", "en", "src0", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in S.text_entropy(None or df.sparkSession, str(tmp_path)).collect()}
    assert out[0]["entropy"] == 0.0 and out[0]["top_char_ratio"] == 1.0
    assert abs(out[1]["entropy"] - 1.0) < 1e-9 and out[1]["top_char_ratio"] == 0.5


# --- heavy_hitters_cms ------------------------------------------------------


def test_cms_never_underestimates_and_bounded(spark, sf_smoke):
    rows = S.heavy_hitters_cms(spark, sf_smoke).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["est_count"] >= r["exact_count"]  # CMS one-sided error
        assert r["err"] == r["est_count"] - r["exact_count"]
        assert r["within_bound"]


def test_cms_build_is_mergeable_partial_agg(spark, sf_smoke):
    """The sketch build must partial-aggregate before the exchange — the
    map-side partials ARE per-task partial sketches; their merge by key
    is the CMS merge."""
    plan = _plan(S.heavy_hitters_cms(spark, sf_smoke))
    assert "partial_count" in plan or "partial" in plan.lower(), plan


# --- ewma_smooth ------------------------------------------------------------


def test_ewma_first_row_is_raw_value(spark, sf_smoke):
    from vector_search_playground_spark.queries import analytics as A

    ev = load_table(spark, sf_smoke, "events")
    first = {
        r["user_id"]: r
        for r in ev.orderBy("ts_us", "event_id")
        .groupBy("user_id")
        .agg(
            F.min_by("value", F.struct("ts_us", "event_id")).alias("v0"),
            F.min_by("event_id", F.struct("ts_us", "event_id")).alias("e0"),
        )
        .collect()
    }
    out = {
        (r["user_id"], r["event_id"]): r["ewma_micro"]
        for r in A.ewma_smooth(spark, sf_smoke).collect()
    }
    import math

    for uid, r in first.items():
        got = out[(uid, r["e0"])]
        assert got == math.floor(r["v0"] * 1000000.0 + 0.5)


def test_ewma_stays_within_running_envelope(spark, sf_smoke):
    """EWMA is a convex combination of the prefix — it can never leave
    the [running min, running max] envelope of the values seen so far."""
    from pyspark.sql import Window

    from vector_search_playground_spark.queries import analytics as A

    ev = load_table(spark, sf_smoke, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    env = ev.select(
        "user_id",
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    joined = A.ewma_smooth(spark, sf_smoke).join(env, ["user_id", "event_id"])
    bad = joined.where(
        (F.col("ewma_micro") < F.floor(F.col("lo") * 1e6 + 0.5) - 1)
        | (F.col("ewma_micro") > F.floor(F.col("hi") * 1e6 + 0.5) + 1)
    ).count()
    assert bad == 0


def test_ewma_single_user_exchange(spark, sf_smoke):
    import re

    from vector_search_playground_spark.queries import analytics as A

    plan = _plan(A.ewma_smooth(spark, sf_smoke))
    hash_keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert hash_keys == {"user_id"}, (hash_keys, plan)


# --- segment_ci / scan_partition_pruned -------------------------------------


def test_segment_ci_contains_mean(spark, sf_smoke):
    for r in S.segment_ci(spark, sf_smoke).collect():
        assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
        assert r["n"] > 0


def test_scan_partition_pruned_listing_time(spark, sf_smoke):
    """The day predicate must appear as a PartitionFilter (file-listing
    pruning), NOT a post-scan filter; only one day directory is read."""
    df = S.scan_partition_pruned(spark, sf_smoke)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "PartitionFilters" in plan, plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "day" in seg, plan


# --- revenue_concentration --------------------------------------------------


def test_revenue_concentration_equals_naive_window(spark, sf_smoke):
    """The bucketed two-pass must reproduce the naive global-window
    answer exactly, and no unpartitioned window may appear in its plan."""
    import math

    df = S.revenue_concentration(spark, sf_smoke)
    row = df.first()
    cust = (
        load_table(spark, sf_smoke, "orders")
        .groupBy("o_custkey")
        .agg(
            F.floor(F.sum("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents")
        )
    )
    vals = sorted((r["cents"] for r in cust.collect()), reverse=True)
    total = sum(vals)
    cum, n80 = 0, 0
    for v in vals:
        if 5 * cum < 4 * total:
            n80 += 1
        cum += v
    k10 = math.ceil(len(vals) / 10.0)
    assert row["n_customers"] == len(vals)
    assert row["total_cents"] == total
    assert row["n80"] == n80
    assert abs(row["top_decile_share"] - round(sum(vals[:k10]) / total, 6)) < 1e-12
    assert 0 < row["n80"] <= row["n_customers"]
    assert 0.1 <= row["top_decile_share"] <= 1


def test_corr_categorical_bounds_and_independence(spark, sf_smoke, tmp_path):
    """V in [0,1] on the fixture; a perfectly independent synthetic
    contingency yields V == 0 and chi2 == 0."""
    row = S.corr_categorical(spark, sf_smoke).first()
    assert 0 <= row["cramers_v"] <= 1
    assert row["chi2"] >= 0
    # independent synthetic: every (user block, segment) equally likely
    ev = [
        (i, 1_704_067_200_000_000 + i, i % 4, 1.0,
         ["view", "click"][(i // 4) % 2], "{}")
        for i in range(400)
    ]
    spark.createDataFrame(
        ev,
        "event_id long, ts long, user_id long, value double,"
        " event_type string, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    cust = [(u, f"c{u}", 0, 0.0, ["A", "B"][u % 2]) for u in range(4)]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    r2 = S.corr_categorical(spark, str(tmp_path)).first()
    assert r2["chi2"] == 0.0 and r2["cramers_v"] == 0.0


# --- weighted_median / prefix operator --------------------------------------


def test_weighted_median_matches_naive(spark, sf_smoke):
    """Bucketed two-pass == naive driver-side weighted median; the
    weighted median differs from the unweighted one (weights matter)."""
    row = S.weighted_median(spark, sf_smoke).first()
    li = load_table(spark, sf_smoke, "lineitem").select(
        "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    )
    rows = sorted(
        (
            (r["l_extendedprice"], int(r["l_quantity"]),
             r["l_orderkey"] * 10 + r["l_linenumber"])
            for r in li.collect()
        ),
        key=lambda t: (t[0], t[2]),
    )
    total = sum(w for _, w, _ in rows)
    cum = 0
    for price, w, _ in rows:
        cum += w
        if 2 * cum >= total:
            naive = price
            break
    assert row["w_median"] == round(naive, 2)
    assert row["total_weight"] == total


def test_bucketed_cumsum_rank_is_dense_permutation(spark, sf_smoke):
    """rk must be exactly 1..n with cum strictly increasing by weight."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.prefix import (
        bucketed_cumsum,
    )

    li = load_table(spark, sf_smoke, "lineitem").select(
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("long").alias("w"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("tb"),
    )
    out, n, total = bucketed_cumsum(li, "v", "w", tiebreak_col="tb")
    stats = out.agg(
        F.count(F.lit(1)).alias("c"),
        F.min("rk").alias("lo"),
        F.max("rk").alias("hi"),
        F.countDistinct("rk").alias("d"),
        F.max("cum").alias("mx"),
    ).first()
    assert stats["c"] == n and stats["lo"] == 1 and stats["hi"] == n
    assert stats["d"] == n
    assert stats["mx"] == total


def test_grouped_bucketed_rank_equals_plain_window(spark):
    """Exact equivalence with row_number() OVER (PARTITION BY g ORDER BY
    v, tb) on an adversarial synthetic relation: skewed group sizes
    (one group holds ~90% of rows), heavy order-value ties (values
    drawn from 13 distinct levels so ties straddle would-be bucket
    boundaries if bucketing were value-inconsistent), plus grp_n = the
    group's row count. The plain window is the ORACLE here, run on the
    same tiny relation where one task is fine; production callers
    (win_ntile, gini_index, shuffle_global) use the grouped bucketed
    rank precisely because their groups are corpus-sized."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    # deterministic congruential stream; group 0 takes ~90% of rows
    df = (
        spark.range(4000)
        .select(
            F.col("id").alias("tb"),
            F.when((F.col("id") * 7919 % 10) < 9, 0)
            .otherwise(1 + F.col("id") % 3)
            .cast("int")
            .alias("g"),
            ((F.col("id") * 104729) % 13).cast("double").alias("v"),
        )
        .cache()
    )
    got = {
        (r["g"], r["tb"]): (r["rk"], r["grp_n"])
        for r in grouped_bucketed_rank(
            df, ["g"], "v", tiebreak_col="tb", sub_bits=3
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "tb")
    want_rows = df.select(
        "g",
        "tb",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("g")).alias("grp_n"),
    ).collect()
    df.unpersist()
    assert len(got) == len(want_rows) == 4000
    for r in want_rows:
        assert got[(r["g"], r["tb"])] == (r["rk"], r["grp_n"]), (
            r["g"],
            r["tb"],
        )


def test_grouped_bucketed_rank_all_ties_degenerate_case(spark):
    """A group whose order values are ALL equal collapses to one bucket
    (ties are indivisible under value bucketing — the docstring's stated
    parallelism bound); ranks must still be the exact tiebreak order."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    df = spark.range(500).select(
        F.col("id").alias("tb"),
        (F.col("id") % 2).cast("int").alias("g"),
        # group 0: one indivisible tie run; group 1: distinct values
        F.when(F.col("id") % 2 == 0, F.lit(7.0))
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    rows = grouped_bucketed_rank(
        df, ["g"], "v", tiebreak_col="tb", sub_bits=3
    ).collect()
    for g in (0, 1):
        grp = sorted(
            ((r["v"], r["tb"]) for r in rows if r["g"] == g)
        )
        by_tb = {
            r["tb"]: (r["rk"], r["grp_n"]) for r in rows if r["g"] == g
        }
        assert all(n == len(grp) for _, n in by_tb.values())
        for want_rk, (_, tb) in enumerate(grp, start=1):
            assert by_tb[tb][0] == want_rk, (g, tb)


def test_grouped_bucketed_rank_rejects_null_group_key(spark):
    """NULL group keys must RAISE, not silently drop rows: the offsets
    rejoin on group equality and NULL never equals NULL (the r10 ADVICE
    finding — a row_number() window would have ranked the null
    partition, so losing it quietly breaks the drop-in contract)."""
    import pytest
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    df = spark.range(100).select(
        F.col("id").alias("tb"),
        F.when(F.col("id") % 10 == 0, F.lit(None)).otherwise("a").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(ValueError, match="NULL group key"):
        grouped_bucketed_rank(df, ["g"], "v", tiebreak_col="tb")


def test_grouped_bucketed_rank_rejects_null_order_values(spark):
    """NULL order values must RAISE, not silently land in bucket 0 (the
    when/otherwise fallthrough happens to mimic asc-nulls-first, but
    that was never a stated contract — r11 ADVICE: the docstring said
    ENFORCED while nothing checked). The null count rides the same
    partials hash-agg, so enforcement costs no extra pass."""
    import pytest
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    df = spark.range(100).select(
        F.col("id").alias("tb"),
        F.lit("a").alias("g"),
        F.when(F.col("id") % 10 == 0, F.lit(None))
        .otherwise(F.col("id").cast("double"))
        .alias("v"),
    )
    with pytest.raises(ValueError, match="NULL order-column"):
        grouped_bucketed_rank(df, ["g"], "v", tiebreak_col="tb")


def test_grouped_bucketed_rank_rejects_high_cardinality_groups(spark):
    """A caller violating the low-cardinality-group contract must get a
    diagnostic, not a driver OOM: the (group, bucket) partials collect
    is bounded by max_partials and exceeding it raises."""
    import pytest
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.prefix import (
        grouped_bucketed_rank,
    )

    # 200 distinct groups x up to 4 buckets > max_partials=100
    df = spark.range(800).select(
        F.col("id").alias("tb"),
        (F.col("id") % 200).cast("int").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(ValueError, match="low-cardinality"):
        grouped_bucketed_rank(
            df, ["g"], "v", tiebreak_col="tb", sub_bits=2,
            max_partials=100,
        ).collect()
