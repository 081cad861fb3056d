"""Round-7 SQL-surface parity batch: verbatim-text TPC-H joins, FILTER
aggregates, WITH RECURSIVE, LATERAL top-k, NULL tri-valued logic, pipe
syntax, VARIANT JSON, and contrastive triplet mining. Value-level
certification lives in the oracle replay suites (test_oracle_diff /
test_oracle_sf01); these tests pin the verbatim-text property, plan
shape, and semantic invariants."""

from __future__ import annotations

from vector_search_playground_spark import registry
from vector_search_playground_spark.queries import sqlparity

registry.load_all()
Q = registry.QUERIES
O = registry.ORACLES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- verbatim-text property -------------------------------------------------


def test_verbatim_ids_share_one_sql_text():
    """The parity claim for these IDs is 'same bytes on both engines':
    the registered oracle must BE the string the Spark side executes."""
    verbatim = {
        "sql_tpch_q3": sqlparity._TPCH_Q3_SQL,
        "sql_tpch_q5": sqlparity._TPCH_Q5_SQL,
        "sql_tpch_q6": sqlparity._TPCH_Q6_SQL,
        "sql_filtered_agg": sqlparity._FILTERED_AGG_SQL,
        "sql_recursive_cte": sqlparity._RECURSIVE_CTE_SQL,
        "sql_lateral_topk": sqlparity._LATERAL_TOPK_SQL,
        "sql_null_semantics": sqlparity._NULL_SEMANTICS_SQL,
        "sql_tpch_q10": sqlparity._TPCH_Q10_SQL,
        "sql_tpch_q13": sqlparity._TPCH_Q13_SQL,
        "sql_tpch_q14": sqlparity._TPCH_Q14_SQL,
        "sql_tpch_q7": sqlparity._TPCH_Q7_SQL,
        "sql_tpch_q8": sqlparity._TPCH_Q8_SQL,
        "sql_tpch_q17": sqlparity._TPCH_Q17_SQL,
        "sql_tpch_q18": sqlparity._TPCH_Q18_SQL,
        "sql_tpch_q19": sqlparity._TPCH_Q19_SQL,
    }
    for qid, text in verbatim.items():
        assert O[qid] == text, qid


def test_pipe_and_variant_have_distinct_oracle_texts():
    """Pipe syntax and VARIANT are Spark-side dialect — their oracles are
    necessarily different text (classic SQL / DuckDB JSON operators)."""
    assert "|>" in sqlparity._PIPE_SPARK_SQL
    assert "|>" not in O["sql_pipe_syntax"]
    assert "variant_get" in sqlparity._VARIANT_SPARK_SQL
    assert "variant_get" not in O["variant_json"]
    assert "->>" in O["variant_json"]


# --- plan shape -------------------------------------------------------------


def test_q3_takeordered_no_global_sort(spark, sf_smoke):
    plan = _plan(Q["sql_tpch_q3"](spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan, "LIMIT must not global-sort"


def test_q6_filters_reach_parquet_scan(spark, sf_smoke):
    plan = _plan(Q["sql_tpch_q6"](spark, sf_smoke))
    assert "PushedFilters: [" in plan
    # the shipdate band must appear among the pushed filters
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "l_shipdate" in pushed


def test_q5_dimension_chain_broadcasts(spark, sf_smoke):
    plan = _plan(Q["sql_tpch_q5"](spark, sf_smoke))
    assert "BroadcastHashJoin" in plan, "nation/region must broadcast"


# --- semantic invariants ----------------------------------------------------


def test_recursive_cte_cumulative_monotone(spark, sf_smoke):
    rows = sorted(
        Q["sql_recursive_cte"](spark, sf_smoke).collect(),
        key=lambda r: r["mon"],
    )
    assert [r["mon"] for r in rows] == list(range(1, 13))
    for a, b in zip(rows, rows[1:]):
        assert b["cum_revenue_c"] >= a["cum_revenue_c"]


def test_lateral_topk_bounded_and_ordered(spark, sf_smoke):
    rows = Q["sql_lateral_topk"](spark, sf_smoke).collect()
    per_nation: dict[str, list[int]] = {}
    for r in rows:
        per_nation.setdefault(r["n_name"], []).append(r["bal_c"])
    for n_name, bals in per_nation.items():
        assert len(bals) <= 2, n_name
        assert bals == sorted(bals, reverse=True), n_name


def test_null_semantics_identities(spark, sf_smoke):
    r = Q["sql_null_semantics"](spark, sf_smoke).collect()[0]
    # NULLs partition the rows
    assert r["n_rows"] == r["n_nonnull"] + r["n_null"]
    # (et = 'click') is UNKNOWN exactly when et IS NULL
    assert r["n_unknown_cmp"] == r["n_null"]
    # IS DISTINCT FROM counts NULL rows as "not click"
    assert r["n_not_click_3vl"] >= r["n_null"]
    # NOT IN excludes every NULL row (UNKNOWN is not TRUE)
    assert r["n_notin"] <= r["n_nonnull"]
    # 'view' was the NULLIF target, so it never survives
    assert r["max_nonnull"] != "view"


def test_pipe_syntax_equals_classic(spark, sf_smoke):
    pipe = {
        r["l_returnflag"]: (r["revenue_c"], r["n_rows"])
        for r in Q["sql_pipe_syntax"](spark, sf_smoke).collect()
    }
    classic = {
        r["l_returnflag"]: (r["revenue_c"], r["n_rows"])
        for r in spark.sql(sqlparity._PIPE_ORACLE_SQL).collect()
    }
    assert pipe == classic


def test_variant_json_deciles_partition_events(spark, sf_smoke):
    rows = Q["variant_json"](spark, sf_smoke).collect()
    assert all(0 <= r["k_decile"] <= 9 for r in rows)
    from vector_search_playground_spark.sources import load_table

    total = load_table(spark, sf_smoke, "events").count()
    assert sum(r["n_events"] for r in rows) == total


def test_contrastive_pairs_triplet_invariants(spark, sf_smoke):
    from vector_search_playground_spark.sources import load_table

    rows = Q["contrastive_pairs"](spark, sf_smoke).collect()
    assert rows, "fixture labels all have >= 2 members"
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_smoke, "embeddings").collect()
    }
    for r in rows:
        assert r["anchor_id"] % sqlparity_mod() == 0
        assert r["pos_id"] != r["anchor_id"]
        assert labels[r["pos_id"]] == r["anchor_label"], "positive same-label"
        assert r["neg_label"] != r["anchor_label"], "negative cross-label"
        assert labels[r["neg_id"]] == r["neg_label"]
        assert r["pos_dist"] >= 0.0


def sqlparity_mod() -> int:
    from vector_search_playground_spark.queries import trainprep

    return trainprep._CP_MOD


# --- round 9: Q17 / Q18 ------------------------------------------------------


def test_q17_decorrelates_no_per_row_rescan(spark, sf_smoke):
    """The correlated scalar AVG subquery must lower to an aggregate
    joined back on partkey, never a nested-loop re-scan of lineitem."""
    plan = _plan(Q["sql_tpch_q17"](spark, sf_smoke))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2, "per-part avg must be an agg"


def test_q17_nonvacuous_and_consistent(spark, sf_smoke):
    r = Q["sql_tpch_q17"](spark, sf_smoke).collect()[0]
    assert r["n_lines"] > 0, "threshold filter killed every row"
    assert r["avg_yearly_c"] > 0


def test_q18_takeordered_and_semijoin(spark, sf_smoke):
    plan = _plan(Q["sql_tpch_q18"](spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan, "LIMIT must not global-sort"
    assert "LeftSemi" in plan, "IN subquery must plan as a semi-join"


def test_q7_symmetric_pair_and_broadcast_dimensions(spark, sf_smoke):
    df = Q["sql_tpch_q7"](spark, sf_smoke)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, "nation aliases must broadcast"
    rows = df.collect()
    assert rows, "nation pair vacuous at smoke scale"
    for r in rows:
        assert {r["supp_nation"], r["cust_nation"]} <= {
            "NATION_12", "NATION_10"
        }
        assert r["l_year"] in (1996, 1997)
        assert r["n_lines"] > 0


def test_q8_share_is_a_proper_fraction(spark, sf_smoke):
    rows = Q["sql_tpch_q8"](spark, sf_smoke).collect()
    assert [r["o_year"] for r in rows] == [1996, 1997]
    for r in rows:
        assert 0.0 <= r["mkt_share"] < 1.0
        assert r["total_c"] > 0


def test_q18_every_order_clears_threshold(spark, sf_smoke):
    rows = Q["sql_tpch_q18"](spark, sf_smoke).collect()
    assert rows, "threshold vacuous at smoke scale"
    assert len(rows) <= 100
    for r in rows:
        assert r["sum_qty"] > 250, r["o_orderkey"]
    prices = [r["totalprice_c"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q8_dimension_chain_broadcasts_and_no_cartesian(spark, sf_smoke):
    """The 8-relation Q8 join must resolve every dimension probe as a
    broadcast at fixture scale and never degenerate into a cartesian or
    nested-loop plan."""
    plan = _plan(Q["sql_tpch_q8"](spark, sf_smoke))
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
