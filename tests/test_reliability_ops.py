"""Property + plan tests for the reliability tier: DQ expectations,
interval coalescing, cumulative distinct, SCD2 builds, counter rates,
and OHLC bars — each checked against a pure-Python reference on the
smoke fixture plus a physical-plan shape assertion."""

from __future__ import annotations

from collections import defaultdict

from vector_search_playground_spark.queries import reliability as REL
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts_us", "event_type", "value")
        .collect()
    )


# --- dq_expectations --------------------------------------------------------


def test_dq_expectations_scorecard(spark, sf_smoke):
    rows = {r["check_id"]: r for r in REL.dq_expectations(spark, sf_smoke).collect()}
    assert len(rows) == 6
    # the fixture is clean by construction: all checks pass, but each row
    # still carries a non-trivial measured statistic
    assert all(r["violations"] == 0 for r in rows.values())
    assert rows["orders_pk_unique"]["observed"] == rows["orders_pk_unique"]["n_scanned"]
    assert rows["events_value_nonnull"]["observed"] == 5.0  # event types
    assert rows["orders_price_positive"]["observed"] > 0


def test_dq_expectations_plan_broadcasts_fk_checks(spark, sf_smoke):
    plan = _plan(REL.dq_expectations(spark, sf_smoke))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# --- interval_merge ---------------------------------------------------------


def _merge_reference(events):
    """Brute-force interval union per user."""
    per = defaultdict(list)
    for r in events:
        s = r["ts_us"]
        # one multiply, like both engines: (v*60)*1e6 rounds differently
        e = s + int(r["value"] * 60_000_000)
        per[r["user_id"]].append((s, e))
    out = {}
    for u, ivs in per.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e), merged[-1][2] + 1)
            else:
                merged.append((s, e, 1))
        out[u] = merged
    return out


def test_interval_merge_matches_bruteforce(spark, sf_smoke):
    ref = _merge_reference(_events(spark, sf_smoke))
    got = defaultdict(list)
    for r in REL.interval_merge(spark, sf_smoke).collect():
        got[r["user_id"]].append(
            (r["island"], r["start_us"], r["end_us"], r["n_intervals"])
        )
    assert set(got) == set(ref)
    for u, islands in got.items():
        islands.sort()
        assert [(s, e, n) for _, s, e, n in islands] == ref[u], u


def test_interval_merge_single_exchange(spark, sf_smoke):
    plan = _plan(REL.interval_merge(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- running_distinct -------------------------------------------------------


def test_running_distinct_invariants(spark, sf_smoke):
    rows = sorted(
        REL.running_distinct(spark, sf_smoke).collect(), key=lambda r: r["day"]
    )
    events = _events(spark, sf_smoke)
    total_users = len({r["user_id"] for r in events})
    assert rows[-1]["cum_users"] == total_users
    cum = 0
    for r in rows:
        cum += r["new_users"]
        assert r["cum_users"] == cum  # running sum consistent
        assert 0 < r["active_users"] <= total_users
        assert r["new_users"] <= r["active_users"]  # new users were active


# --- scd2_build -------------------------------------------------------------


def test_scd2_partitions_timeline_and_compresses(spark, sf_smoke):
    events = _events(spark, sf_smoke)
    per = defaultdict(list)
    for r in sorted(events, key=lambda r: (r["ts_us"], r["event_id"])):
        per[r["user_id"]].append((r["ts_us"], r["event_type"]))
    rows = defaultdict(list)
    for r in REL.scd2_build(spark, sf_smoke).collect():
        rows[r["user_id"]].append(r)
    assert set(rows) == set(per)
    for u, vs in rows.items():
        vs.sort(key=lambda r: r["version"])
        # change-compressed: consecutive states differ
        types = [v["event_type"] for v in vs]
        assert all(a != b for a, b in zip(types, types[1:])), u
        # validity intervals tile the timeline: to == next from, last open
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], u
        assert vs[-1]["valid_to_us"] is None and vs[-1]["is_current"] == 1
        # reconstruct: every event's type == the state valid at its ts
        fromto = [(v["valid_from_us"], v["event_type"]) for v in vs]
        for ts, et in per[u]:
            state = max((f for f in fromto if f[0] <= ts), key=lambda f: f[0])
            assert state[1] == et, (u, ts)


def test_scd2_single_exchange(spark, sf_smoke):
    plan = _plan(REL.scd2_build(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- counter_agg ------------------------------------------------------------


def test_counter_agg_matches_reference(spark, sf_smoke):
    events = _events(spark, sf_smoke)
    per = defaultdict(list)
    for r in sorted(events, key=lambda r: (r["ts_us"], r["event_id"])):
        per[r["user_id"]].append((r["ts_us"], r["value"]))
    for r in REL.counter_agg(spark, sf_smoke).collect():
        seq = per[r["user_id"]]
        total, resets = 0.0, 0
        for (_, prev), (_, cur) in zip(seq, seq[1:]):
            d = cur - prev
            if d >= 0:
                total += d
            else:
                resets += 1
                total += cur
        assert r["n_samples"] == len(seq)
        assert r["n_resets"] == resets
        assert abs(r["total_increase"] - total) < 0.011
        dur = (seq[-1][0] - seq[0][0]) / 1e6
        if dur > 0:
            assert abs(r["rate_per_sec"] - r["total_increase"] / dur) < 1e-5


def test_counter_agg_single_exchange(spark, sf_smoke):
    plan = _plan(REL.counter_agg(spark, sf_smoke))
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- ohlc_bars --------------------------------------------------------------


def test_ohlc_bounds_and_coverage(spark, sf_smoke):
    rows = REL.ohlc_bars(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n"] > 0
    events = _events(spark, sf_smoke)
    assert sum(r["n"] for r in rows) == len(events)


def test_merge_intervals_long_swallows_short(spark):
    """The case lag(e) phrasing gets wrong: one long interval spans
    several later short ones — all must land in ONE island."""
    from vector_search_playground_spark.operators.intervals import (
        merge_intervals,
    )

    rows = [
        # user 1: (0,100) swallows (10,20) and (30,40); (150,160) separate
        (1, 1, 0, 100),
        (1, 2, 10, 20),
        (1, 3, 30, 40),
        (1, 4, 150, 160),
        # user 2: touching intervals merge (end == next start)
        (2, 1, 0, 10),
        (2, 2, 10, 20),
        # user 3: chain where each extends the max
        (3, 1, 0, 5),
        (3, 2, 3, 8),
        (3, 3, 7, 12),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, s long, e long")
    got = {
        (r["user_id"], r["island"]): (r["start_us"], r["end_us"], r["n_intervals"])
        for r in merge_intervals(df).collect()
    }
    assert got == {
        (1, 1): (0, 100, 3),
        (1, 2): (150, 160, 1),
        (2, 1): (0, 20, 2),
        (3, 1): (0, 12, 3),
    }


def test_join_point_in_time_join_free_and_transition_edge(spark, tmp_path):
    """Join-free plan (union + carry on one user_id exchange), and a
    purchase landing exactly ON a state transition sees the NEW tile."""
    import re

    from vector_search_playground_spark.queries import reliability as R

    rows = [
        # user 9: signup@t0, click@t2, purchases at t1, t2 (ON the
        # transition), t3; purchase@t_before any state -> NULL state
        (1, 50, 9, 0.0, "purchase", "{}"),
        (2, 100, 9, 0.0, "signup", "{}"),
        (3, 150, 9, 0.0, "purchase", "{}"),
        (4, 200, 9, 0.0, "click", "{}"),
        (5, 200 - 0, 9, 0.0, "purchase", "{}"),  # same µs as the click
        (6, 300, 9, 0.0, "purchase", "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, value double,"
        " event_type string, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    df = R.join_point_in_time(spark, str(tmp_path))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert keys == {"user_id"}, (keys, plan)
    out = {r["event_id"]: (r["state"], r["version"]) for r in df.collect()}
    assert out[1] == (None, None)  # before any state
    assert out[3] == ("signup", 1)
    assert out[5] == ("click", 2)  # exactly at the transition -> new tile
    assert out[6] == ("click", 2)


def test_join_interval_overlap_nonnegative_and_user_keyed(spark, sf_smoke):
    """Every emitted pair genuinely overlaps (length >= 0 — touching
    counts), and the whole plan reuses the user_id partitioning."""
    import re

    from pyspark.sql import functions as F

    from vector_search_playground_spark.queries import reliability as R

    df = R.join_interval_overlap(spark, sf_smoke)
    assert df.where(F.col("overlap_us") < 0).count() == 0
    assert df.count() > 0
    plan = df._jdf.queryExecution().executedPlan().toString()
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert keys == {"user_id"}, (keys, plan)


def test_growth_daily_first_day_null(spark, sf_smoke):
    from vector_search_playground_spark.queries import analytics as A

    rows = A.growth_daily(spark, sf_smoke).collect()
    by_type = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        by_type.setdefault(r["event_type"], []).append(r)
    for seq in by_type.values():
        assert seq[0]["pct_change"] is None
        assert all(r["pct_change"] is not None for r in seq[1:])
