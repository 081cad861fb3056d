"""Semantic properties of the round-4 operators that their SQL oracles
can't express directly: chunk coverage/overlap, forward-as-of minimality."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.queries import analytics as A
from vector_search_playground_spark.queries.analytics import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)
from vector_search_playground_spark.queries import relational as R
from vector_search_playground_spark.sources import load_table


def test_chunk_documents_covers_every_token(spark, sf_smoke):
    """Window layout invariants, checked per document:
    - chunk 0 starts at token 1; consecutive window starts differ by the
      stride, so every token index is inside ≥1 window (stride < width);
    - total chunk tokens = n_windows·width − overlaps (no token lost);
    - the LAST chunk reaches the document's final token."""
    chunks = A.chunk_documents(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_id").alias("max_cid"),
            F.sum("n_tokens").alias("sum_tok"),
            F.max(
                F.col("chunk_id") * CHUNK_STRIDE + F.col("n_tokens")
            ).alias("last_end"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["n_chunks"] == r["max_cid"] + 1, r  # dense chunk ids
        assert r["last_end"] == r["n_tok"], r  # final token covered
        # every window start s_k = 1 + k*stride ≤ n_tok (no empty windows)
        assert (r["n_chunks"] - 1) * CHUNK_STRIDE + 1 <= r["n_tok"], r


def test_join_asof_fwd_is_minimal_following_click(spark, sf_smoke):
    """Brute-force check on the fixture: for every purchase, the joined
    click_us is the MINIMUM same-user click timestamp ≥ purchase_us (None
    when no such click exists)."""
    got = {
        r["event_id"]: r["click_us"]
        for r in R.join_asof_fwd(spark, sf_smoke).collect()
    }
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "ts_us"
    ).collect()
    clicks_by_user: dict[int, list[int]] = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks_by_user.setdefault(r["user_id"], []).append(r["ts_us"])
    checked = 0
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        later = [
            c for c in clicks_by_user.get(r["user_id"], []) if c >= r["ts_us"]
        ]
        want = min(later) if later else None
        assert got[r["event_id"]] == want, (r["event_id"], got[r["event_id"]], want)
        checked += 1
    assert checked > 0


def test_passjoin_matches_bruteforce_random(spark):
    """PassJoin completeness/precision on adversarial random strings:
    variable lengths (including below the segment-degeneracy threshold),
    edit-mutated clusters, and a tiny alphabet to force block collisions.
    The blocked result must equal the brute-force O(n²) answer exactly."""
    import random

    from vector_search_playground_spark.operators.passjoin import (
        edit_distance_pairs,
    )

    rng = random.Random(425)
    alpha = "abc"
    base = ["".join(rng.choice(alpha) for _ in range(rng.randint(0, 24)))
            for _ in range(40)]
    strings = list(base)
    for s in base:  # mutated near-neighbors (subs/ins/dels)
        t = list(s)
        for _ in range(rng.randint(1, 5)):
            op = rng.choice("sid")
            if op == "s" and t:
                t[rng.randrange(len(t))] = rng.choice(alpha)
            elif op == "i":
                t.insert(rng.randint(0, len(t)), rng.choice(alpha))
            elif op == "d" and t:
                del t[rng.randrange(len(t))]
        strings.append("".join(t))

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    D = 4
    want = {
        (i, j, lev(strings[i], strings[j]))
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if lev(strings[i], strings[j]) <= D
    }
    df = spark.createDataFrame(
        list(enumerate(strings)), "doc_id int, name string"
    )
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in edit_distance_pairs(df, max_dist=D).collect()
    }
    assert got == want


def test_funnel_latency_consistent_with_funnel(spark, sf_smoke):
    """Converted-user count must be positive and latencies ordered
    (p50 ≤ p95); every latency is non-negative by construction."""
    from vector_search_playground_spark.queries import analytics as A

    row = A.funnel_latency(spark, sf_smoke).first()
    assert row["n_converted"] > 0
    assert 0 <= row["p50_s"] <= row["p95_s"]


def test_audience_overlap_matrix_shape(spark, sf_smoke):
    """C(5,2) = 10 unordered type pairs, jaccard in (0, 1], and n_both
    never exceeds either set size (checked via the jaccard identity)."""
    from vector_search_playground_spark.queries import analytics as A

    rows = A.audience_overlap(spark, sf_smoke).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 < r["jaccard"] <= 1


def test_path_transitions_probabilities_normalize(spark, sf_smoke):
    """Per from_type, probabilities sum to ~1 and counts are positive."""
    from vector_search_playground_spark.queries import analytics as A

    rows = A.path_transitions(spark, sf_smoke).collect()
    assert rows
    from collections import defaultdict

    sums = defaultdict(float)
    for r in rows:
        assert r["n"] > 0 and 0 < r["p"] <= 1
        sums[r["from_type"]] += r["p"]
    for s in sums.values():
        assert abs(s - 1.0) < 1e-4


def test_path_transitions_single_event_exchange(spark, sf_smoke):
    """The event stream shuffles once (user_id window); the normalizing
    window runs on the 25-row matrix."""
    import re

    from vector_search_playground_spark.queries import analytics as A

    plan = A.path_transitions(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    keys = re.findall(r"Exchange hashpartitioning\((\w+)#", plan)
    assert keys.count("user_id") == 1, (keys, plan)


def test_rfm_scores_monotone_in_features(spark, sf_smoke):
    """Scores are 1..4 and monotone: a user with strictly larger m than
    another never has a smaller m_score (same for f; r_score grows with
    staleness)."""
    from vector_search_playground_spark.queries import analytics as A

    rows = A.rfm_segments(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        for c in ("r_score", "f_score", "m_score"):
            assert 1 <= r[c] <= 4
    by_m = sorted(rows, key=lambda r: r["m"])
    for a, b in zip(by_m, by_m[1:]):
        assert a["m_score"] <= b["m_score"]
    by_f = sorted(rows, key=lambda r: r["f"])
    for a, b in zip(by_f, by_f[1:]):
        assert a["f_score"] <= b["f_score"]
    by_r = sorted(rows, key=lambda r: r["r_days"])
    for a, b in zip(by_r, by_r[1:]):
        assert a["r_score"] <= b["r_score"]


def test_embedding_drift_identical_halves_zero(spark, tmp_path):
    """If both halves hold identical vectors per label, drift must be
    exactly 0; bounds hold on the fixture."""
    rows = []
    for i in range(40):
        label = (i % 8) // 2  # each label sees even AND odd vec_ids
        base = [float((label + 1) * (d + 1) % 7 - 3) for d in range(8)]
        rows.append((i, base, label))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from vector_search_playground_spark.queries import analytics as A

    out = A.embedding_drift(spark, str(tmp_path)).collect()
    assert len(out) == 4
    for r in out:
        assert r["drift"] == 0.0
        assert r["n_a"] == r["n_b"] == 5


def test_embedding_drift_fixture_bounds(spark, sf_smoke):
    from vector_search_playground_spark.queries import analytics as A

    for r in A.embedding_drift(spark, sf_smoke).collect():
        assert -1e-6 <= r["drift"] <= 2
        assert r["n_a"] > 0 and r["n_b"] > 0


def test_rolling_active_users_invariants(spark, sf_smoke):
    """wau7 >= dau always; wau7 <= total users; first day wau7 == dau."""
    from vector_search_playground_spark.queries import analytics as A
    from vector_search_playground_spark.sources import load_table

    rows = sorted(
        A.rolling_active_users(spark, sf_smoke).collect(),
        key=lambda r: r["day"],
    )
    assert rows
    total = (
        load_table(spark, sf_smoke, "events")
        .select("user_id").distinct().count()
    )
    for r in rows:
        assert r["dau"] <= r["wau7"] <= total
    assert rows[0]["wau7"] == rows[0]["dau"]
