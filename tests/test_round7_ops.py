"""Round-7 operator tests: corpus statistics (zipf_fit, vocab_growth,
ngram_stats, tokenizer_fertility, readability_score), exact-integer
statistics (gini_index, bootstrap_ci, cross_correlation), graph analytics
(graph_common_neighbors, degree_distribution), and the MIPS→L2 reduction
(knn_mips). Value-level certification lives in the oracle replay suites;
these tests pin structure, invariants, and plan shape."""

from __future__ import annotations

import duckdb
import pytest

from vector_search_playground_spark import registry

registry.load_all()
Q = registry.QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- corpus statistics ------------------------------------------------------


def test_zipf_fit_shape_and_law(spark, sf_smoke):
    r = Q["zipf_fit"](spark, sf_smoke).collect()[0]
    con = duckdb.connect()
    (vocab,) = con.execute(
        f"""
        SELECT count(DISTINCT w) FROM (
            SELECT unnest(string_split(text, ' ')) AS w
            FROM '{sf_smoke}/documents.parquet'
        )
        """
    ).fetchone()
    assert r["n"] == min(100, vocab)
    assert r["slope"] < 0, "frequency must fall with rank"
    assert 0.0 <= r["r2"] <= 1.0


def test_vocab_growth_monotone_and_totals(spark, sf_smoke):
    rows = sorted(
        Q["vocab_growth"](spark, sf_smoke).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(10))
    for a, b in zip(rows, rows[1:]):
        assert b["cum_types"] >= a["cum_types"]
        assert b["cum_tokens"] >= a["cum_tokens"]
    con = duckdb.connect()
    n_types, n_tokens = con.execute(
        f"""
        SELECT count(DISTINCT w), count(*) FROM (
            SELECT unnest(string_split(text, ' ')) AS w
            FROM '{sf_smoke}/documents.parquet'
        )
        """
    ).fetchone()
    assert rows[-1]["cum_types"] == n_types
    assert rows[-1]["cum_tokens"] == n_tokens


def test_ngram_stats_accounting(spark, sf_smoke):
    rows = Q["ngram_stats"](spark, sf_smoke).collect()
    assert len(rows) == 18  # 3 orders x (r=1..5, 6=overflow)
    by_n = {}
    for r in rows:
        by_n.setdefault(r["n"], []).append(r)
    for n, grp in by_n.items():
        distinct = grp[0]["distinct_ngrams"]
        total = grp[0]["total_ngrams"]
        assert sum(r["n_r"] for r in grp) == distinct, n
        assert total >= distinct
    # each higher order has fewer total grams (docs lose n-1 positions)
    assert by_n[1][0]["total_ngrams"] > by_n[2][0]["total_ngrams"]
    assert by_n[2][0]["total_ngrams"] > by_n[3][0]["total_ngrams"]


def test_tokenizer_fertility_ratios(spark, sf_smoke):
    rows = Q["tokenizer_fertility"](spark, sf_smoke).collect()
    assert {r["lang"] for r in rows} == {"en", "de", "zh", "fr", "es"}
    import math

    for r in rows:
        assert r["tokens_per_doc"] == pytest.approx(
            math.floor(r["n_tokens"] / r["n_docs"] * 1e6 + 0.5) / 1e6
        )
        assert r["chars_per_token"] > 1.0  # tokens carry >=1 char + space


def test_readability_rowlocal_no_shuffle(spark, sf_smoke):
    df = Q["readability_score"](spark, sf_smoke)
    assert "Exchange" not in _plan(df), "row-local op must not shuffle"
    rows = df.collect()
    assert len(rows) == 500
    for r in rows[:50]:
        assert r["n_syllables"] >= 1 and r["n_words"] >= 1
        assert -20.0 < r["fk_grade"] < 60.0


# --- exact-integer statistics ----------------------------------------------


def test_gini_matches_numpy(spark, sf_smoke):
    import numpy as np

    rows = Q["gini_index"](spark, sf_smoke).collect()
    assert len(rows) == 5
    con = duckdb.connect()
    for r in rows:
        cents = [
            c
            for (c,) in con.execute(
                f"""
                SELECT CAST(floor(sum(o.o_totalprice) * 100 + 0.5) AS BIGINT)
                FROM '{sf_smoke}/orders.parquet' o
                JOIN '{sf_smoke}/customer.parquet' c
                  ON o.o_custkey = c.c_custkey
                WHERE c.c_mktsegment = '{r["segment"]}'
                GROUP BY o.o_custkey
                """
            ).fetchall()
        ]
        x = np.sort(np.array(cents, dtype=np.float64))
        n = len(x)
        gini = (2 * np.sum(np.arange(1, n + 1) * x) - (n + 1) * x.sum()) / (
            n * x.sum()
        )
        assert 0.0 <= r["gini"] < 1.0
        assert abs(r["gini"] - gini) < 1e-5, r["segment"]


def test_bootstrap_ci_brackets_point_estimate(spark, sf_smoke):
    r = Q["bootstrap_ci"](spark, sf_smoke).collect()[0]
    assert r["ci_lo_cents"] < r["ci_hi_cents"]
    # the resampled sums center on the observed total; with B=200 the
    # 95% interval must bracket it on any non-degenerate series
    assert r["ci_lo_cents"] <= r["total_cents"] <= r["ci_hi_cents"]
    assert r["n_days"] >= 20


def test_cross_correlation_bounds_and_lags(spark, sf_smoke):
    rows = Q["cross_correlation"](spark, sf_smoke).collect()
    assert [r["lag"] for r in rows] == list(range(-7, 8))
    for r in rows:
        assert -1.0 - 1e-9 <= r["r"] <= 1.0 + 1e-9
        assert r["n_days"] >= 15  # 30-day series loses |lag| days


# --- graph analytics --------------------------------------------------------


def test_common_neighbors_structure(spark, sf_smoke):
    rows = Q["graph_common_neighbors"](spark, sf_smoke).collect()
    assert rows and len(rows) <= 20
    for r in rows:
        assert r["a"] < r["b"]
        assert r["common_neighbors"] >= 1
        assert 0.0 < r["jaccard"] <= 1.0
    counts = [r["common_neighbors"] for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_degree_distribution_ccdf(spark, sf_smoke):
    rows = sorted(
        Q["degree_distribution"](spark, sf_smoke).collect(),
        key=lambda r: r["degree"],
    )
    assert rows
    assert rows[0]["ccdf"] == 1.0  # every node has degree >= min degree
    shares = [r["ccdf"] for r in rows]
    assert shares == sorted(shares, reverse=True)
    assert sum(r["n_nodes"] for r in rows) == rows[0]["n_nodes_ge"]


# --- MIPS reduction ---------------------------------------------------------


def test_knn_mips_equals_bruteforce_dot(spark, sf_smoke):
    import numpy as np

    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_smoke}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in data])
    mat = np.array([r[1] for r in data], dtype=np.float64)
    q = mat[ids == 1][0]
    dots = mat @ q
    order = np.lexsort((ids, -np.round(dots, 6)))[:10]
    expected = list(ids[order])
    got = [
        r["vec_id"]
        for r in Q["knn_mips"](spark, sf_smoke)
        .orderBy("dot", ascending=False)
        .collect()
    ]
    # same top-10 set and order (rounded-dot + id tiebreak)
    assert got == expected


def test_knn_mips_plan_is_single_scan_takeordered(spark, sf_smoke):
    plan = _plan(Q["knn_mips"](spark, sf_smoke))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


# --- round-7 second batch ---------------------------------------------------


def test_span_corruption_plan_bounds(spark, sf_smoke):
    df = Q["span_corruption"](spark, sf_smoke)
    assert "Exchange" not in _plan(df), "span planning must not shuffle"
    rows = df.collect()
    assert rows
    by_doc = {}
    for r in rows:
        assert 0 <= r["start_tok"] < r["n_tok"]
        assert 1 <= r["span_len"] <= 2 * 3 - 1
        assert r["start_tok"] + r["span_len"] <= r["n_tok"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc, spans in by_doc.items():
        n_tok = spans[0]["n_tok"]
        assert len(spans) == max(n_tok * 15 // 100 // 3, 1), doc


def test_kfold_split_partitions_everything(spark, sf_smoke):
    rows = Q["kfold_split"](spark, sf_smoke).collect()
    assert {r["fold"] for r in rows} <= set(range(5))
    assert sum(r["n_docs"] for r in rows) == 500
    # per-language shares partition to 1 and no fold hogs a language
    # (smoke-SF cells hold ~15 docs, so binomial spread is wide — the
    # scorecard EXISTS to surface that, the bound only catches collapse)
    by_lang = {}
    for r in rows:
        assert 0.0 < r["fold_share"] < 0.5
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, grp in by_lang.items():
        assert sum(r["n_docs"] for r in grp) == grp[0]["lang_total"], lang


def test_label_weights_balanced_formula(spark, sf_smoke):
    rows = Q["label_weights"](spark, sf_smoke).collect()
    total = sum(r["n"] for r in rows)
    k = len(rows)
    import math

    for r in rows:
        assert r["weight"] == pytest.approx(
            math.floor(total / (k * r["n"]) * 1e6 + 0.5) / 1e6
        )
    # weighted sample mass is uniform across labels by construction
    masses = [r["n"] * r["weight"] for r in rows]
    assert max(masses) / min(masses) < 1.01


def test_sql_tpch_q1_six_groups_exact_cents(spark, sf_smoke):
    rows = Q["sql_tpch_q1"](spark, sf_smoke).collect()
    assert 1 <= len(rows) <= 6  # |returnflag| x |linestatus|
    for r in rows:
        assert r["sum_charge_c"] >= r["sum_disc_c"]  # tax only adds
        assert r["count_order"] > 0


def test_eval_classification_consistency(spark, sf_smoke):
    rows = Q["eval_classification"](spark, sf_smoke).collect()
    # every label present exactly once; micro-counts reconcile with the
    # underlying predictions
    preds = Q["knn_classify"](spark, sf_smoke).collect()
    n_preds = len(preds)
    n_correct = sum(1 for p in preds if p["correct"])
    assert sum(r["tp"] for r in rows) == n_correct
    assert sum(r["tp"] + r["fn"] for r in rows) == n_preds
    assert sum(r["tp"] + r["fp"] for r in rows) == n_preds
    for r in rows:
        for c in ("precision", "recall", "f1"):
            assert r[c] is None or 0.0 <= r[c] <= 1.0


def test_scan_xml_roundtrip_and_caching(spark, sf_smoke):
    import glob
    import os

    df = Q["scan_xml"](spark, sf_smoke)
    rows = {r["doc_id"]: r for r in df.collect()}
    assert len(rows) == 500
    # spot-check content fidelity against parquet
    src = {
        rec["doc_id"]: rec
        for rec in duckdb.sql(
            f"SELECT doc_id, lang, text FROM '{sf_smoke}/documents.parquet'"
        ).df().to_dict("records")
    }
    for did in (0, 123, 499):
        assert rows[did]["text"] == src[did]["text"]
        assert rows[did]["lang"] == src[did]["lang"]
    # second invocation serves the fingerprint-cached materialization
    from vector_search_playground_spark.queries.llm_pipeline import SCRATCH

    assert glob.glob(os.path.join(SCRATCH, "documents_xml_sf0.001_*"))
