"""Round-6 tier: property and plan tests for the experiment-statistics
(experiments.py) and corpus-mining (corpusmine.py) queries, beyond the
oracle-differential sweep in test_oracle_diff.py."""

from __future__ import annotations

import collections
import hashlib
import math
import os

import duckdb
import numpy as np
import pytest

from vector_search_playground_spark import registry

registry.load_all()
Q = registry.QUERIES


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- experiments ------------------------------------------------------------


def test_ab_test_welch_matches_reference_formula(spark, sf_smoke):
    row = Q["ab_test_welch"](spark, sf_smoke).first()
    con = duckdb.connect()
    a, b = con.execute(
        f"""
        SELECT list(o_totalprice) FILTER (c_mktsegment = 'BUILDING'),
               list(o_totalprice) FILTER (c_mktsegment = 'MACHINERY')
        FROM '{sf_smoke}/orders.parquet'
        JOIN '{sf_smoke}/customer.parquet' ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        """
    ).fetchone()
    xa, xb = np.array(a), np.array(b)
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    se2 = va / len(xa) + vb / len(xb)
    t = (xa.mean() - xb.mean()) / math.sqrt(se2)
    df_w = se2**2 / (
        (va / len(xa)) ** 2 / (len(xa) - 1)
        + (vb / len(xb)) ** 2 / (len(xb) - 1)
    )
    assert row["n_a"] == len(xa) and row["n_b"] == len(xb)
    assert row["t_stat"] == pytest.approx(t, abs=2e-4)
    assert row["welch_df"] == pytest.approx(df_w, abs=0.02)


def test_ks_2sample_bounds_and_reference(spark, sf_smoke):
    row = Q["ks_2sample"](spark, sf_smoke).first()
    assert 0.0 <= row["ks_d"] <= 1.0
    con = duckdb.connect()
    a, b = con.execute(
        f"""
        SELECT list(c_acctbal) FILTER (c_mktsegment = 'AUTOMOBILE'),
               list(c_acctbal) FILTER (c_mktsegment = 'HOUSEHOLD')
        FROM '{sf_smoke}/customer.parquet'
        WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
        """
    ).fetchone()
    xa, xb = np.sort(np.array(a)), np.sort(np.array(b))
    grid = np.union1d(xa, xb)
    fa = np.searchsorted(xa, grid, side="right") / len(xa)
    fb = np.searchsorted(xb, grid, side="right") / len(xb)
    d = np.max(np.abs(fa - fb))
    assert row["n_a"] == len(xa) and row["n_b"] == len(xb)
    assert row["ks_d"] == pytest.approx(d, abs=1e-6)


def test_psi_terms_nonnegative_and_complete(spark, sf_smoke):
    rows = Q["psi_drift"](spark, sf_smoke).collect()
    assert sorted(r["bucket"] for r in rows) == list(range(10))
    # (p_ref - p_cur) * ln(p_ref / p_cur) >= 0 always — same sign factors
    assert all(r["psi_term"] >= 0.0 for r in rows)


def test_winsorize_bounds(spark, sf_smoke):
    for r in Q["winsorize_stats"](spark, sf_smoke).collect():
        assert r["lo"] <= r["hi"]
        # clamping pulls the mean toward the interior
        assert r["lo"] <= r["win_mean"] <= r["hi"]


def test_mutual_info_information_inequalities(spark, sf_smoke):
    r = Q["mutual_info"](spark, sf_smoke).first()
    assert -1e-6 <= r["mi_nats"] <= min(r["h_a"], r["h_b"]) + 1e-6
    assert -1e-6 <= r["nmi"] <= 1.0 + 1e-6


def test_cohort_ltv_cumulative_monotone(spark, sf_smoke):
    rows = Q["cohort_ltv"](spark, sf_smoke).collect()
    by_cohort: dict[str, list] = collections.defaultdict(list)
    for r in rows:
        by_cohort[r["cohort"]].append((r["age_days"], r["cum_rev_cents"]))
    for seq in by_cohort.values():
        seq.sort()
        cums = [c for _, c in seq]
        assert cums == sorted(cums)
        assert all(c >= 0 for c in cums)


def test_l_diversity_domain_bound(spark, sf_smoke):
    rows = Q["l_diversity"](spark, sf_smoke).collect()
    assert rows, "classes must exist at every SF (non-vacuity)"
    for r in rows:
        assert 1 <= r["l_distinct"] <= 5  # priority domain is 5 values
        assert r["is_risky"] == (r["l_distinct"] < 3)


def test_graph_triangles_matches_bruteforce(spark, sf_smoke):
    row = Q["graph_triangles"](spark, sf_smoke).first()
    con = duckdb.connect()
    pairs = con.execute(
        f"""
        SELECT l_orderkey, l_partkey FROM '{sf_smoke}/lineitem.parquet'
        WHERE l_quantity >= 45
        """
    ).fetchall()
    by_order: dict[int, set] = collections.defaultdict(set)
    for ok, pk in pairs:
        by_order[ok].add(pk)
    edges = set()
    for parts in by_order.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    tri = sum(
        1
        for a, b in edges
        for c in adj[b]
        if c in adj[a]
    )
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri


# --- corpusmine -------------------------------------------------------------


def test_bpe_merge_step_matches_counter(spark, sf_smoke):
    got = [
        (r["a"], r["b"], r["freq"])
        for r in Q["bpe_merge_step"](spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM '{sf_smoke}/documents.parquet'"
        ).fetchall()
        if t is not None
    ]
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        vocab.update(t.split(" "))
    pair: collections.Counter = collections.Counter()
    for tok, cnt in vocab.items():
        for i in range(len(tok) - 1):
            pair[(tok[i], tok[i + 1])] += cnt
    want = sorted(
        ((a, b, f) for (a, b), f in pair.items()),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    assert got == want


def test_feature_hashing_is_join_free(spark, sf_smoke):
    df = Q["feature_hashing"](spark, sf_smoke)
    plan = _plan(df)
    assert "Join" not in plan, "hashing trick must not build a vocabulary"
    rows = df.collect()
    assert rows
    assert all(0 <= r["bucket"] < 64 and r["cnt"] >= 1 for r in rows)


def test_collocations_topk_plan_and_support(spark, sf_smoke):
    df = Q["collocations_pmi"](spark, sf_smoke)
    assert "TakeOrderedAndProject" in _plan(df)
    rows = df.collect()
    assert 0 < len(rows) <= 20
    assert all(r["n_pair"] >= 5 for r in rows)


def test_scan_binaryfile_content_matches_disk(spark, sf_smoke):
    Q["scan_binaryfile"](spark, sf_smoke).collect()  # materializes scratch
    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    fp = _fixture_fingerprint(sf_smoke, "documents")
    tag = os.path.basename(sf_smoke.rstrip("/"))
    base = os.path.join(SCRATCH, f"documents_rawtext_{tag}_{fp}")
    got = {
        r["path"]: (r["length"], hashlib.md5(bytes(r["content"])).hexdigest())
        for r in spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(base)
        .collect()
    }
    assert got
    for path, (length, digest) in got.items():
        local = path.removeprefix("file:")
        raw = open(local, "rb").read()
        assert len(raw) == length
        assert hashlib.md5(raw).hexdigest() == digest


def test_embedding_pca_matches_numpy(spark, sf_smoke):
    rows = Q["embedding_pca"](spark, sf_smoke).collect()
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM '{sf_smoke}/embeddings.parquet'"
    ).fetchall()
    x = np.array([v[0] for v in vecs], dtype=np.float64)
    g = x.T @ x
    vals, vecs_ = np.linalg.eigh(g)
    top = vecs_[:, -1]
    top = top * np.sign(top[int(np.argmax(np.abs(top)))])
    evr = vals[-1] / vals.sum()
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    assert np.allclose(got, top, atol=1e-5)
    assert rows[0]["evr"] == pytest.approx(evr, abs=1e-5)
    assert np.linalg.norm(got) == pytest.approx(1.0, abs=1e-4)


def test_bpe_train_matches_python_reference(spark, sf_smoke):
    got = [
        (r["merge_rank"], r["a"], r["b"], r["freq"])
        for r in Q["bpe_train"](spark, sf_smoke).collect()
    ]
    con = duckdb.connect()
    texts = [
        t
        for (t,) in con.execute(
            f"SELECT text FROM '{sf_smoke}/documents.parquet'"
        ).fetchall()
        if t is not None
    ]
    vocab: collections.Counter = collections.Counter()
    for t in texts:
        vocab.update(t.split(" "))
    words = {tok: tuple(tok) for tok in vocab}
    want = []
    for rank in range(1, 11):
        pair: collections.Counter = collections.Counter()
        for tok, syms in words.items():
            cnt = vocab[tok]
            for i in range(len(syms) - 1):
                pair[(syms[i], syms[i + 1])] += cnt
        if not pair:
            break
        (a, b), freq = min(
            pair.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((rank, a, b, freq))
        for tok, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[tok] = tuple(out)
    assert got == want


def test_benford_chi2_structure(spark, sf_smoke):
    rows = Q["benford_test"](spark, sf_smoke).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    n = sum(r["n_obs"] for r in rows)
    assert n > 0
    assert sum(r["exp_p"] for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert all(r["chi2_term"] >= 0 for r in rows)


def test_holt_forecast_matches_python_recursion(spark, sf_smoke):
    rows = {
        r["user_id"]: (r["n"], r["level_micro"], r["trend_micro"],
                       r["forecast_micro"])
        for r in Q["holt_forecast"](spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    series = con.execute(
        f"""
        SELECT user_id, list(value ORDER BY ts, event_id)
        FROM '{sf_smoke}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    a, g, h = 0.4, 0.3, 3.0
    for uid, xs in series:
        lvl, trd = float(xs[0]), 0.0
        for x in xs[1:]:
            l_new = a * x + (1 - a) * (lvl + trd)
            trd = g * (l_new - lvl) + (1 - g) * trd
            lvl = l_new
        want = (
            len(xs),
            math.floor(lvl * 1e6 + 0.5),
            math.floor(trd * 1e6 + 0.5),
            math.floor((lvl + h * trd) * 1e6 + 0.5),
        )
        assert rows[uid] == want, uid


def test_window_funnel_dp_equals_bruteforce_random():
    """The windowFunnel greedy (keep latest chain-start per depth) must
    equal brute-force EXISTS-chain search on adversarial small series —
    ties, interleavings, and window-boundary spans included."""
    import itertools
    import random

    rng = random.Random(6)
    steps = ["view", "click", "purchase"]
    W = 10

    def brute(events):  # events: [(t, id, type)] any order
        ev = sorted(events, key=lambda e: (e[0], e[1]))
        best = 0
        idx = [
            [i for i, e in enumerate(ev) if e[2] == s] for s in steps
        ]
        for d in (3, 2, 1):
            for combo in itertools.product(*idx[:d]):
                if all(
                    (ev[combo[k]][0], ev[combo[k]][1])
                    < (ev[combo[k + 1]][0], ev[combo[k + 1]][1])
                    for k in range(d - 1)
                ) and ev[combo[-1]][0] - ev[combo[0]][0] <= W:
                    best = max(best, d)
                    break
            if best:
                break
        return best

    def dp(events):
        ev = sorted(events, key=lambda e: (e[0], e[1]))
        NEG = float("-inf")
        best = [NEG] * 4
        depth = 0
        for t, _eid, et in ev:
            if et not in steps:
                continue
            s = steps.index(et) + 1
            if s == 1:
                best[1] = max(best[1], t)
                depth = max(depth, 1)
            elif best[s - 1] != NEG and t - best[s - 1] <= W:
                best[s] = max(best[s], best[s - 1])
                depth = max(depth, s)
        return depth

    kinds = steps + ["error", "signup"]
    for trial in range(500):
        n = rng.randint(0, 12)
        events = [
            (rng.randint(0, 25), i, rng.choice(kinds)) for i in range(n)
        ]
        assert dp(events) == brute(events), events


def test_als_recommend_structure(spark, sf_smoke):
    rows = Q["als_recommend"](spark, sf_smoke).collect()
    assert rows
    con = duckdb.connect()
    parts = {
        p
        for (p,) in con.execute(
            f"SELECT DISTINCT l_partkey FROM '{sf_smoke}/lineitem.parquet'"
        ).fetchall()
    }
    by_user: dict[int, list] = collections.defaultdict(list)
    for r in rows:
        assert r["part_id"] in parts, "recommended part must exist"
        by_user[r["user_id"]].append(r["rank"])
        assert r["user_id"] % 50 == 0
    for u, ranks in by_user.items():
        assert sorted(ranks) == [1, 2, 3], u
    # in-row quality scorecard: global scalars constant across rows;
    # the leave-one-out AUC is honest (~0.5 ceiling on the random
    # fixture) while the train-fit AUC proves the factorization fits
    # the observed matrix — the broken-machinery detector
    for col in ("hit_rate_at_k", "holdout_auc", "train_auc"):
        vals = {r[col] for r in rows}
        assert len(vals) == 1, (col, vals)
        (v,) = vals
        assert 0.0 <= v <= 1.0, (col, v)
    assert next(iter({r["train_auc"] for r in rows})) > 0.6
    for r in rows:
        if r["holdout_part_id"] is not None:
            assert r["holdout_hit"] in (0, 1)


def test_index_build_pq_balance_columns(spark, sf_smoke):
    r = Q["index_build_pq"](spark, sf_smoke).collect()[0]
    assert 0.0 < r["code_balance"] <= 1.0
    assert 0.0 < r["codes_used_frac"] <= 1.0
    # a healthy k-means++ codebook on normalized embeddings uses nearly
    # all 16 codes per subspace near-uniformly
    assert r["code_balance"] > 0.8
    assert r["codes_used_frac"] > 0.8


def test_seasonality_profile_structure(spark, sf_smoke):
    rows = Q["seasonality_profile"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 1 <= r["dow"] <= 7
        assert r["seasonality_index"] > 0


def test_changepoint_cusum_closes_at_zero(spark, sf_smoke):
    rows = sorted(
        Q["changepoint_cusum"](spark, sf_smoke).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    # sum of deviations from the mean is identically zero at the end
    assert rows[-1]["cusum"] == pytest.approx(0.0, abs=1e-4)
    assert any(r["is_peak"] for r in rows)


def test_user_entropy_bounds(spark, sf_smoke):
    for r in Q["user_entropy"](spark, sf_smoke).collect():
        assert -1e-9 <= r["entropy"] <= math.log(5) + 1e-6
        if r["n_types"] == 1:
            assert r["entropy"] == 0.0


def test_impute_missing_accounting(spark, sf_smoke):
    for r in Q["impute_missing"](spark, sf_smoke).collect():
        assert 0 < r["n_missing"] < r["n_total"]
        # roughly one in seven event_ids is in the synthetic missing set
        # (per-type drift is large at sf0.001 — bound loosely)
        assert 0.02 < r["n_missing"] / r["n_total"] < 0.4
        assert r["total_cents_imputed"] > 0


def test_knn_classify_matches_numpy(spark, sf_smoke):
    rows = {
        r["vec_id"]: (r["pred_label"], r["true_label"])
        for r in Q["knn_classify"](spark, sf_smoke).collect()
    }
    con = duckdb.connect()
    data = con.execute(
        f"SELECT vec_id, label, embedding FROM '{sf_smoke}/embeddings.parquet'"
    ).fetchall()
    ids = np.array([d[0] for d in data])
    labels = np.array([d[1] for d in data])
    X = np.array([d[2] for d in data], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    test_mask = ids % 5 == 0
    for qi in np.where(test_mask)[0]:
        dists = np.round(1.0 - Xn[~test_mask] @ Xn[qi], 6)
        tr_ids = ids[~test_mask]
        tr_lbl = labels[~test_mask]
        order = np.lexsort((tr_ids, dists))[:5]
        votes = collections.Counter(tr_lbl[order])
        best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert rows[ids[qi]] == (best, labels[qi]), ids[qi]


def test_embedding_outliers_structure(spark, sf_smoke):
    rows = Q["embedding_outliers"](spark, sf_smoke).collect()
    per = collections.Counter(r["label"] for r in rows)
    assert all(v == 3 for v in per.values())
    assert all(r["dist"] >= 0 and 1 <= r["rank"] <= 3 for r in rows)


def test_session_funnel_paths_shape(spark, sf_smoke):
    import re

    rows = Q["session_funnel_paths"](spark, sf_smoke).collect()
    assert 0 < len(rows) <= 20
    pat = re.compile(r"^[a-z](>[a-z]){0,7}$")
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert pat.match(r["path"]), r["path"]


def test_autocorrelation_bounds(spark, sf_smoke):
    rows = Q["autocorrelation"](spark, sf_smoke).collect()
    assert sorted(r["lag"] for r in rows) == list(range(1, 8))
    for r in rows:
        assert -1.001 <= r["acf"] <= 1.001


def test_attribution_linear_credit_conserved(spark, sf_smoke):
    rows = Q["attribution_linear"](spark, sf_smoke).collect()
    assert rows
    con = duckdb.connect()
    (n_influenced,) = con.execute(
        f"""
        SELECT count(DISTINCT p.event_id)
        FROM '{sf_smoke}/events.parquet' p
        JOIN '{sf_smoke}/events.parquet' t
          ON p.user_id = t.user_id AND t.event_type <> 'purchase'
         AND epoch_us(t.ts) >= epoch_us(p.ts) - 7 * 86400000000
         AND epoch_us(t.ts) < epoch_us(p.ts)
        WHERE p.event_type = 'purchase'
        """
    ).fetchone()
    # linear attribution conserves credit: one unit per influenced purchase
    assert sum(r["credit"] for r in rows) == pytest.approx(
        n_influenced, abs=0.01
    )


def test_survival_km_monotone(spark, sf_smoke):
    rows = sorted(
        Q["survival_km"](spark, sf_smoke).collect(),
        key=lambda r: r["dur_days"],
    )
    assert rows
    surv = [r["survival"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert surv == sorted(surv, reverse=True)
    risks = [r["n_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    con = duckdb.connect()
    (n_users,) = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_smoke}/events.parquet'"
    ).fetchone()
    assert risks[0] == n_users


def test_mannwhitney_matches_reference(spark, sf_smoke):
    row = Q["mannwhitney_u"](spark, sf_smoke).first()
    con = duckdb.connect()
    a, b = con.execute(
        f"""
        SELECT list(c_acctbal) FILTER (c_mktsegment = 'AUTOMOBILE'),
               list(c_acctbal) FILTER (c_mktsegment = 'HOUSEHOLD')
        FROM '{sf_smoke}/customer.parquet'
        WHERE c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
        """
    ).fetchone()
    na, nb = len(a), len(b)
    allv = sorted(a + b)
    # average ranks with ties
    rank_of: dict[float, float] = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        rank_of[allv[i]] = (i + 1 + j) / 2
        i = j
    ra = sum(rank_of[v] for v in a)
    u_a = ra - na * (na + 1) / 2
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["u2_a"] == int(2 * u_a)
    assert 0 <= row["u2_a"] <= 2 * na * nb


def test_sla_compliance_monotone_windows(spark, sf_smoke):
    for r in Q["sla_compliance"](spark, sf_smoke).collect():
        assert (
            0 <= r["within_30"] <= r["within_60"]
            <= r["within_90"] <= r["n_lines"]
        )
        assert 0.0 <= r["pct_30"] <= 1.0


def test_volume_bands_ordered(spark, sf_smoke):
    rows = Q["volume_bands"](spark, sf_smoke).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["p10"] <= r["p50"] <= r["p90"]
        assert r["n_days"] > 0


def test_lift_deciles_partition(spark, sf_smoke):
    rows = Q["lift_deciles"](spark, sf_smoke).collect()
    assert sorted(r["decile"] for r in rows) == sorted(
        {r["decile"] for r in rows}
    )
    total = sum(r["n_users"] for r in rows)
    con = duckdb.connect()
    (n_users,) = con.execute(
        f"SELECT count(DISTINCT user_id) FROM '{sf_smoke}/events.parquet'"
    ).fetchone()
    assert total == n_users
    for r in rows:
        assert 0 <= r["n_buyers"] <= r["n_users"]
        assert r["lift"] >= 0


def test_ab_power_mde_relation(spark, sf_smoke):
    r = Q["ab_power_mde"](spark, sf_smoke).first()
    # MDE = (z_a + z_b) * SE with the shared literals
    assert r["mde"] == pytest.approx(
        (1.959964 + 0.841621) * r["se"], abs=0.05
    )
    assert r["se"] > 0


def test_corpus_summary_consistency(spark, sf_smoke):
    r = Q["corpus_summary"](spark, sf_smoke).first()
    assert r["n_docs"] > 0 and r["n_tokens"] > 0
    assert r["vocab_size"] <= r["n_tokens"]
    assert r["n_langs"] >= 1 and r["n_sources"] >= 1
