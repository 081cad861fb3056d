"""Property + plan tests for the round-5 additions: hybrid retrieval,
graph components, Bloom join, Z-order, LM scoring, sequence/attribution,
compaction, and streaming top-k."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_search_playground_spark.operators.bloom import (
    build_bloom_words,
    might_contain,
)
from vector_search_playground_spark.queries import analytics as A
from vector_search_playground_spark.queries import corpusprep as C
from vector_search_playground_spark.queries import graph as G
from vector_search_playground_spark.queries import hybrid as H
from vector_search_playground_spark.queries import relational as R
from vector_search_playground_spark.queries import surface as S
from vector_search_playground_spark.sources import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- hybrid retrieval -------------------------------------------------------


def test_rrf_scores_consistent_with_ranks(spark, sf_correct):
    rows = H.hybrid_search_rrf(spark, sf_correct).collect()
    assert 0 < len(rows) <= H.K
    for r in rows:
        expect = 0.0
        if r["r_lex"] > 0:
            expect += 1.0 / (H.RRF_K0 + r["r_lex"])
        if r["r_vec"] > 0:
            expect += 1.0 / (H.RRF_K0 + r["r_vec"])
        assert abs(r["rrf"] - round(expect, 6)) < 1e-9
    # descending, tiebroken by doc_id
    keys = [(-r["rrf"], r["doc_id"]) for r in rows]
    assert keys == sorted(keys)


def test_eval_retrieval_bounds(spark, sf_correct):
    row = H.eval_retrieval(spark, sf_correct).collect()[0]
    assert 0.0 <= row["recall_at_k"] <= 1.0
    assert 0.0 <= row["mrr"] <= 1.0
    assert row["n_hits"] <= row["k"]


def test_knn_per_group_k_per_label(spark, sf_correct):
    rows = H.knn_per_group(spark, sf_correct).collect()
    from collections import Counter

    per = Counter(r["label"] for r in rows)
    assert all(v <= H.GROUP_K for v in per.values())
    assert len(per) > 1  # multiple labels actually present


def test_binary_pack_identical_vector_hamming_zero(spark):
    df = spark.createDataFrame(
        [([0.5, -0.25, 0.0, 1.5] * 16,)], "embedding array<double>"
    )
    lo, hi = H._pack_bits(F.col("embedding"))
    a = df.select(lo.alias("lo"), hi.alias("hi")).collect()[0]
    assert (
        bin(a["lo"]).count("1") + bin(a["hi"]).count("1")
        == sum(1 for i in range(64) if ([0.5, -0.25, 0.0, 1.5] * 16)[i] > 0)
    )


def test_quantize_binary_topk_plan(spark, sf_correct):
    plan = _plan(H.quantize_binary(spark, sf_correct))
    assert "TakeOrderedAndProject" in plan, plan


def test_maxsim_orders_desc(spark, sf_correct):
    rows = H.maxsim_multivector(spark, sf_correct).collect()
    scores = [r["maxsim"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # query doc (label 0) contains the query tokens — must score max
    assert rows[0]["label"] == 0
    assert abs(rows[0]["maxsim"] - H.MAXSIM_Q) < 0.01  # each token matches itself


# --- graph ------------------------------------------------------------------


def test_graph_components_edge_consistency(spark, sf_smoke):
    labels = {
        r["node"]: r["rep"]
        for r in G.graph_components(spark, sf_smoke).collect()
    }
    li = load_table(spark, sf_smoke, "lineitem").where(
        (F.col("l_quantity") >= G.MIN_QTY)
        & (F.col("l_extendedprice") > G.MIN_PRICE)
    )
    orders = load_table(spark, sf_smoke, "orders")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(G.SUPP_OFFSET) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
        .collect()
    )
    assert edges, "fixture produced no edges — filter too tight"
    for e in edges:
        assert labels[e["a"]] == labels[e["b"]]
    # representative is the component minimum and a member of it
    for node, rep in labels.items():
        assert rep <= node
        assert labels[rep] == rep


def test_graph_component_sizes_sum_to_nodes(spark, sf_smoke):
    rows = G.graph_components(spark, sf_smoke).collect()
    from collections import Counter

    sizes = Counter(r["rep"] for r in rows)
    for r in rows:
        assert r["comp_size"] == sizes[r["rep"]]


# --- bloom join -------------------------------------------------------------


def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 500).select((F.col("id") * 7919 + 13).alias("k"))
    words = build_bloom_words(keys, "k")
    missed = keys.where(~might_contain(words, F.col("k"))).count()
    assert missed == 0


def test_bloom_filters_most_non_members(spark):
    keys = spark.range(0, 200).select((F.col("id") * 31 + 5).alias("k"))
    words = build_bloom_words(keys, "k")
    others = spark.range(10_000_000, 10_010_000).select(F.col("id").alias("k"))
    passed = others.where(might_contain(words, F.col("k"))).count()
    assert passed < 100  # fpr well under 1% at this load factor


def test_bloom_join_no_python_udf_in_plan(spark, sf_smoke):
    plan = _plan(R.join_bloom_filtered(spark, sf_smoke))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


# --- zorder -----------------------------------------------------------------


def _morton(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_matches_reference_interleave(spark, sf_smoke):
    rows = A.zorder_cluster(spark, sf_smoke).limit(200).collect()
    for r in rows:
        assert r["zkey"] == _morton(r["xb"], r["yb"])
        assert r["zshard"] == r["zkey"] // 4096
        assert 0 <= r["zkey"] < 1 << 16


def test_zorder_no_shuffle(spark, sf_smoke):
    plan = _plan(A.zorder_cluster(spark, sf_smoke))
    assert "Exchange" not in plan, plan


# --- lm_score ---------------------------------------------------------------


def test_lm_score_positive_and_bounded(spark, sf_smoke):
    rows = C.lm_score(spark, sf_smoke).collect()
    assert rows
    docs = load_table(spark, sf_smoke, "documents").count()
    assert len(rows) == docs
    for r in rows:
        assert r["xent"] > 0
        assert r["n_tokens"] > 0


# --- sequence / attribution -------------------------------------------------


def test_sequence_funnel_at_least_ordered_funnel(spark, sf_correct):
    seq = {
        r["pattern"]: r for r in A.sequence_match(spark, sf_correct).collect()
    }
    funnel = A.funnel_events(spark, sf_correct).collect()[0]
    # v.*c.*p (any view before any click before any purchase) is weaker
    # than funnel's first-times ordering, so it matches at least as many
    assert seq["funnel"]["n_matched"] >= funnel["n_full_funnel"]
    for r in seq.values():
        assert r["n_matched"] <= r["n_users"]


def test_attribution_partitions_all_purchases(spark, sf_correct):
    rows = A.attribution_lasttouch(spark, sf_correct).collect()
    total = sum(r["n_purchases"] for r in rows)
    purchases = (
        load_table(spark, sf_correct, "events")
        .where(F.col("event_type") == "purchase")
        .count()
    )
    assert total == purchases
    allowed = {"click", "error", "signup", "view", "direct"}
    assert {r["channel"] for r in rows} <= allowed


# --- maintenance ------------------------------------------------------------


def test_compact_files_invariant(spark, sf_smoke):
    row = S.compact_files(spark, sf_smoke).collect()[0]
    assert row["invariant_ok"]
    assert row["n_files_after"] < row["n_files_before"]
    assert row["n_rows_before"] == row["n_rows_after"]


# --- streaming top-k --------------------------------------------------------


def test_stream_topk_multibatch(spark, sf_smoke, tmp_path, monkeypatch):
    """Top-k survives a multi-micro-batch drain: a TIME-SPLIT two-file
    source drained one file per trigger forces the salted state to
    accumulate across batches, and the final merge must still equal the
    one-shot batch ORDER BY ... LIMIT k."""
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import vector_search_playground_spark.streaming.jobs as J

    d = tmp_path / "ev"
    d.mkdir()
    tbl = pq.read_table(os.path.join(sf_smoke, "events.parquet"))
    mid = pc.quantile(tbl["ts"].cast("int64"), 0.5)[0].as_py()
    early, late = str(d / "events_a.parquet"), str(d / "events_b.parquet")
    keep = pc.less(tbl["ts"].cast("int64"), mid)
    pq.write_table(tbl.filter(keep), early)
    pq.write_table(tbl.filter(pc.invert(keep)), late)
    now = os.stat(late).st_mtime
    os.utime(early, (now - 60, now - 60))
    monkeypatch.setattr(J, "_MAX_FILES_PER_TRIGGER", 1)

    expected = [
        (r["event_id"], r["value"])
        for r in load_table(spark, sf_smoke, "events")
        .orderBy(F.desc("value"), F.asc("event_id"))
        .limit(J.TOPK_K)
        .collect()
    ]
    got = [
        (r["event_id"], r["value"])
        for r in J.stream_topk(spark, str(d)).collect()
    ]
    assert got == expected


# --- pq / mmr / pagerank ----------------------------------------------------


def test_pq_search_recall_floor(spark, sf_correct):
    rows = H.pq_search(spark, sf_correct).collect()
    assert len(rows) == H.K
    assert rows[0]["recall_at_k"] >= 0.5  # structureless uniform fixture
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)


def test_pq_codes_shape_and_range(spark, sf_correct):
    from vector_search_playground_spark.plans import pq as PQ

    emb = load_table(spark, sf_correct, "embeddings")
    books = PQ.fit_codebooks(emb)
    assert books.shape == (PQ.M_SUB, PQ.K_CODES, 64 // PQ.M_SUB)
    codes = PQ.encode(emb.limit(50), books).collect()
    for r in codes:
        assert len(r["codes"]) == PQ.M_SUB
        assert all(0 <= c < PQ.K_CODES for c in r["codes"])


def test_pq_adc_approximates_true_distance(spark, sf_correct):
    """ADC of a vector against its own codebook reconstruction must be
    below ADC against a far vector — sanity that the table lookup wiring
    (code → centroid distance) is not scrambled."""
    import numpy as np

    from vector_search_playground_spark.plans import pq as PQ

    emb = load_table(spark, sf_correct, "embeddings")
    books = PQ.fit_codebooks(emb)
    q = emb.where(F.col("vec_id") == 0).first()["embedding"]
    lut = PQ.adc_table(books, q)
    codes = PQ.encode(emb, books)
    got = {
        r["vec_id"]: r["d"]
        for r in codes.select(
            "vec_id", PQ.adc_distance(F.col("codes"), lut).alias("d")
        ).collect()
    }
    # self-distance ≈ quantization error, strictly < the mean distance
    assert got[0] < float(np.mean(list(got.values())))


def test_mmr_is_more_diverse_than_plain_topk(spark, sf_correct):
    rows = H.topk_diverse(spark, sf_correct).collect()
    picked = [r["vec_id"] for r in rows]
    assert len(picked) == H.K
    assert len(set(picked)) == H.K
    assert [r["rank"] for r in rows] == list(range(1, H.K + 1))
    # diversity proof now rides in-row as exact integer micro-units over
    # the quantized similarity space the greedy optimizes: the MMR page
    # must never be MORE redundant than the plain top-K page
    assert rows[0]["avg_sim_mmr_micro"] <= rows[0]["avg_sim_plain_micro"]


def test_pagerank_sums_to_one_and_positive(spark, sf_smoke):
    import vector_search_playground_spark.queries.graph as GG

    # full vector check: rerun the iteration body cheaply via the query
    # itself (top-N), then validate mass/positivity on the emitted slice
    rows = GG.pagerank_topn(spark, sf_smoke).collect()
    assert rows
    ranks = [r["rank"] for r in rows]
    assert all(v > 0 for v in ranks)
    assert ranks == sorted(ranks, reverse=True)
    assert sum(ranks) <= 1.0 + 1e-6


# --- plan shapes ------------------------------------------------------------


def test_sequence_match_single_user_shuffle(spark, sf_smoke):
    """The stream builder is ONE hash-agg shuffle on user_id; the pattern
    relation joins broadcast (no second data shuffle)."""
    import re

    plan = _plan(A.sequence_match(spark, sf_smoke))
    keys = set(re.findall(r"Exchange hashpartitioning\((\w+)#", plan))
    assert keys <= {"user_id", "pattern"}, (keys, plan)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_attribution_single_user_shuffle(spark, sf_smoke):
    """Carry-forward window + aggregate: the only corpus exchange keys on
    user_id (the final tiny channel agg repartitions |channels| rows)."""
    plan = _plan(A.attribution_lasttouch(spark, sf_smoke))
    assert plan.count("WindowExec") <= 1
    assert "SortMergeJoin" not in plan, plan


def test_lm_score_no_corpus_broadcast_of_tokens(spark, sf_smoke):
    """The token relation is never broadcast (vocabulary join is planned
    by measured size); the 1-row total IS broadcast."""
    plan = _plan(C.lm_score(spark, sf_smoke))
    assert "BroadcastNestedLoopJoin" in plan, plan  # the 1-row total


def test_hybrid_rrf_lists_bounded_before_fusion(spark, sf_smoke):
    """Both ranking lists hit TakeOrderedAndProject before the fusion
    join — the corpus never reaches a global window."""
    plan = _plan(H.hybrid_search_rrf(spark, sf_smoke))
    assert plan.count("TakeOrderedAndProject") >= 2, plan


def test_pagerank_paths_agree(spark, sf_smoke):
    """Driver numpy path ≡ distributed loop path (cutoff forced to 0)."""
    import vector_search_playground_spark.queries.graph as GG

    small = {
        r["node"]: r["rank"]
        for r in GG._pagerank(spark, sf_smoke).collect()
    }
    dist = {
        r["node"]: r["rank"]
        for r in GG._pagerank(
            spark, sf_smoke, small_graph_cutoff=0
        ).collect()
    }
    assert set(small) == set(dist)
    for node in small:
        assert abs(small[node] - dist[node]) < 1e-9, node


def test_rollup_merge_reuses_materialized_partials(spark, sf_smoke):
    """Second invocation must serve history from the stored partials
    (same fingerprint → same path, no rewrite)."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    R.rollup_merge_partials(spark, sf_smoke).count()
    fp = _fixture_fingerprint(sf_smoke, "events")
    tag = os.path.basename(sf_smoke.rstrip("/"))
    path = os.path.join(SCRATCH, f"rollup_partials_{tag}_{fp}")
    assert os.path.exists(os.path.join(path, "_SUCCESS"))
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    R.rollup_merge_partials(spark, sf_smoke).count()
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime


def test_udf_map_arrow_plan_is_arrow(spark, sf_smoke):
    from vector_search_playground_spark.queries import udf_surface as U

    plan = _plan(U.udf_map_arrow(spark, sf_smoke))
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan, plan


def test_mmr_in_row_diversity_columns(spark, sf_correct):
    rows = H.topk_diverse(spark, sf_correct).collect()
    assert rows[0]["avg_sim_mmr_micro"] <= rows[0]["avg_sim_plain_micro"]
    assert (
        len(
            {
                (r["avg_sim_mmr_micro"], r["avg_sim_plain_micro"])
                for r in rows
            }
        )
        == 1
    )


def test_agg_first_last_no_window(spark, sf_smoke):
    """first/last per series is ONE hash-agg — no WindowExec, one
    corpus exchange on the group key."""
    plan = _plan(A.agg_first_last(spark, sf_smoke))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_gapfill_interpolate_values_bracketed(spark, sf_smoke):
    """Interpolated points lie within [min, max] of observed values and
    every spine hour appears exactly once."""
    rows = A.gapfill_interpolate(spark, sf_smoke).collect()
    hours = [r["hour"] for r in rows]
    assert len(hours) == len(set(hours))
    obs = [r["value"] for r in rows if r["kind"] == "observed"]
    if obs:
        lo, hi = min(obs), max(obs)
        for r in rows:
            if r["kind"] == "interpolated":
                assert lo - 1e-9 <= r["value"] <= hi + 1e-9


def test_time_weighted_avg_bounds(spark, sf_smoke):
    """TWA lies within each user's [min, max] value envelope."""
    twa = {r["user_id"]: r["twa"] for r in A.time_weighted_avg(spark, sf_smoke).collect()}
    env = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for u, v in twa.items():
        lo, hi = env[u]
        assert lo - 1e-9 <= v <= hi + 1e-9


def test_ivf_pq_search_prunes_and_reranks(spark, sf_correct):
    """IVFPQ must compound both savings: PartitionFilters on centroid_id
    (listing-time pruning of the code sidecar) AND the ADC scan reading
    codes, never embeddings; recall floor matches the pq_search bar."""
    df = H.ivf_pq_search(spark, sf_correct)
    plan = _plan(df)
    assert "PartitionFilters" in plan and "centroid_id" in plan, plan
    rows = df.collect()
    assert len(rows) == H.K
    assert rows[0]["recall_at_k"] >= 0.5
    dists = [r["dist"] for r in rows]
    assert dists == sorted(dists)


def test_ivf_pq_codes_sidecar_reused(spark, sf_correct):
    """Second invocation must serve codes from the fingerprint-keyed
    sidecar (no rewrite)."""
    import os

    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    H.ivf_pq_search(spark, sf_correct).count()
    fp = _fixture_fingerprint(sf_correct, "embeddings")
    tag = os.path.basename(sf_correct.rstrip("/"))
    marker = os.path.join(SCRATCH, f"ivfpq_codes_{tag}_{fp}", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    H.ivf_pq_search(spark, sf_correct).count()
    assert os.path.getmtime(marker) == mtime


# --- lttb / eval_minhash ----------------------------------------------------


def _lttb_reference(pts, n_out):
    """Independent pure-Python LTTB (Steinarsson 2013 §4.2)."""
    n = len(pts)
    if n <= n_out:
        return list(range(n))
    import math

    edges = [1 + math.floor(b * (n - 2) / (n_out - 2)) for b in range(n_out - 1)]
    picked = [0]
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        if b + 2 <= n_out - 2:
            nlo, nhi = edges[b + 1], edges[b + 2]
        else:
            nlo, nhi = n - 1, n
        cx = sum(p[0] for p in pts[nlo:nhi]) / (nhi - nlo)
        cy = sum(p[1] for p in pts[nlo:nhi]) / (nhi - nlo)
        ax, ay = pts[picked[-1]]
        best, best_area = lo, -1.0
        for i in range(lo, hi):
            area = abs((ax - cx) * (pts[i][1] - ay) - (ax - pts[i][0]) * (cy - ay))
            if area > best_area:
                best, best_area = i, area
        picked.append(best)
    picked.append(n - 1)
    return picked


def test_lttb_matches_reference_and_invariants(spark, sf_smoke):
    from collections import defaultdict

    from vector_search_playground_spark.operators.lttb import lttb_downsample
    from vector_search_playground_spark.queries.analytics import LTTB_N_OUT

    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "ts_us", "value"
    ).collect()
    series = defaultdict(list)
    for r in sorted(ev, key=lambda r: r["ts_us"]):
        series[r["user_id"]].append((r["ts_us"], r["value"]))
    got = defaultdict(list)
    df = lttb_downsample(
        load_table(spark, sf_smoke, "events"), n_out=LTTB_N_OUT
    )
    for r in df.collect():
        got[r["user_id"]].append((r["bucket"], r["ts_us"], r["value"]))
    assert set(got) == set(series)
    for u, rows in got.items():
        rows.sort()
        pts = series[u]
        ref = _lttb_reference(pts, LTTB_N_OUT)
        assert [(t, v) for _, t, v in rows] == [pts[i] for i in ref], u
        # endpoints preserved, ts monotone, bucket ordinal dense
        assert rows[0][1] == pts[0][0] and rows[-1][1] == pts[-1][0]
        assert [b for b, _, _ in rows] == list(range(len(rows)))


def _lttb_q_reference(pts, n_out, t_unit=1_000_000, v_scale=100):
    """Independent pure-Python exact-integer LTTB matching the quantized
    kernel's semantics (rebased/floored t, half-up-cents v, centroid-
    times-m integer area, earliest-index ties)."""
    import math

    n = len(pts)
    t0 = min(t for t, _ in pts)
    t = [(tr - t0) // t_unit for tr, _ in pts]
    v = [math.floor(val * v_scale + 0.5) for _, val in pts]
    if n <= n_out:
        return list(range(n)), v
    ni = n_out - 2
    edges = [1 + (b * (n - 2)) // ni for b in range(n_out - 1)]
    picked = [0]
    for b in range(ni):
        lo, hi = edges[b], edges[b + 1]
        if b + 2 <= ni:
            nlo, nhi = edges[b + 1], edges[b + 2]
        else:
            nlo, nhi = n - 1, n
        m = nhi - nlo
        st, sv = sum(t[nlo:nhi]), sum(v[nlo:nhi])
        at, av = t[picked[-1]], v[picked[-1]]
        best, best_area = lo, -1
        for i in range(lo, hi):
            area = abs(
                (at * m - st) * (v[i] - av) - (at - t[i]) * (sv - av * m)
            )
            if area > best_area:
                best, best_area = i, area
        picked.append(best)
    picked.append(n - 1)
    return picked, v


def test_lttb_quantized_matches_reference(spark, sf_smoke):
    from collections import defaultdict

    from vector_search_playground_spark.queries.analytics import (
        LTTB_N_OUT,
        lttb_downsample_q,
    )

    ev = load_table(spark, sf_smoke, "events").select(
        "user_id", "ts_us", "value"
    ).collect()
    series = defaultdict(list)
    for r in sorted(ev, key=lambda r: r["ts_us"]):
        series[r["user_id"]].append((r["ts_us"], r["value"]))
    got = defaultdict(list)
    for r in lttb_downsample_q(spark, sf_smoke).collect():
        got[r["user_id"]].append((r["bucket"], r["ts_us"], r["v_q"]))
    assert set(got) == set(series)
    for u, rows in got.items():
        rows.sort()
        pts = series[u]
        ref, vq = _lttb_q_reference(pts, LTTB_N_OUT)
        assert [(t, q) for _, t, q in rows] == [
            (pts[i][0], vq[i]) for i in ref
        ], u
        assert rows[0][1] == pts[0][0] and rows[-1][1] == pts[-1][0]
        assert [b for b, _, _ in rows] == list(range(len(rows)))


def test_eval_minhash_error_bound(spark, sf_correct):
    from vector_search_playground_spark.queries.llm_pipeline import eval_minhash

    rows = eval_minhash(spark, sf_correct).collect()
    assert rows
    twins = [r for r in rows if r["kind"] == "twin"]
    neighbors = [r for r in rows if r["kind"] == "neighbor"]
    assert twins and neighbors
    # planted twins really are near-dups; neighbors really are unrelated
    assert sum(r["true_jaccard"] for r in twins) / len(twins) > 0.8
    assert sum(r["true_jaccard"] for r in neighbors) / len(neighbors) < 0.2
    # 32-hash MinHash: expected |err| ~ sqrt(J(1-J)/32) <= 0.09
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.1, mean_err
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0


def test_eval_dedup_scorecard(spark, sf_correct):
    from vector_search_playground_spark.queries.llm_pipeline import eval_dedup

    row = eval_dedup(spark, sf_correct).collect()[0]
    # planted twins must be found (recall); transitive-closure pairs in
    # >2-member clusters are honest false positives, so precision is
    # bounded below but not 1.0 by construction
    assert row["recall"] >= 0.95, row
    assert row["precision"] >= 0.7, row
    assert row["n_hit"] <= row["n_truth"] and row["n_hit"] <= row["n_pred"]
