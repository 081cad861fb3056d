"""Hypothesis property tests (SURVEY §5.3): the two independent distance
implementations — the codegen'd HOF Column kernel (functions/vector.py)
and the broadcast BLAS kernel (operators/simjoin.py) — must agree on the
same pair set for arbitrary inputs, and top-k must obey its containment
laws for arbitrary thresholds.

Example counts are small because every example is a Spark job; the
domain coverage comes from hypothesis shrinking, not volume.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vector_search_playground_spark.functions.vector import cosine_distance
from vector_search_playground_spark.operators.simjoin import sim_join_exact

DIM = 4

finite_f = st.floats(
    min_value=-4.0, max_value=4.0, allow_nan=False, width=32
)
vectors = st.lists(finite_f, min_size=DIM, max_size=DIM)


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=2, max_value=6))
    vecs = [draw(vectors) for _ in range(n)]
    assume(all(any(x != 0.0 for x in v) for v in vecs))
    return vecs


@given(corpus=corpora(), threshold=st.floats(min_value=0.05, max_value=1.9))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_blas_kernel_agrees_with_hof_kernel(spark, corpus, threshold):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)],
        "vec_id: bigint, embedding: array<float>",
    )
    blas = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in sim_join_exact(
            df, threshold=threshold, round_to=6
        ).collect()
    }
    a = df.select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("va"))
    b = df.select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("vb"))
    hof = {
        (r["a_id"], r["b_id"], r["dist"])
        for r in a.crossJoin(b)
        .where(F.col("a_id") < F.col("b_id"))
        .withColumn("d", cosine_distance(F.col("va"), F.col("vb")))
        .where(F.col("d") < threshold)
        .select("a_id", "b_id", F.round("d", 6).alias("dist"))
        .collect()
    }
    assert blas == hof


@given(corpus=corpora(), threshold=st.floats(min_value=0.0, max_value=2.0))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_topk_containment_laws(spark, corpus, threshold):
    """|top-k| ≤ k; top-k ⊆ thresholded set; distances ascending."""
    from vector_search_playground_spark.operators.knn import knn

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)],
        "vec_id: bigint, embedding: array<float>",
    )
    q = corpus[0]
    k = 3
    top = knn(
        df, q, vector_col="embedding", metric="cosine",
        threshold=threshold, k=k, tiebreak="vec_id",
    ).collect()
    assert len(top) <= k
    dists = [r["dist"] for r in top]
    assert dists == sorted(dists)
    assert all(not math.isnan(d) and d < threshold for d in dists)


# --- interval join & sequence packing ---------------------------------------


@st.composite
def interval_cases(draw):
    n_iv = draw(st.integers(min_value=1, max_value=5))
    n_pt = draw(st.integers(min_value=1, max_value=8))
    tss = st.integers(min_value=0, max_value=500)
    ivs = [
        (i, s, s + draw(st.integers(min_value=1, max_value=60)))
        for i, s in enumerate(draw(st.lists(tss, min_size=n_iv,
                                            max_size=n_iv)))
    ]
    pts = [(j, t) for j, t in enumerate(draw(st.lists(tss, min_size=n_pt,
                                                      max_size=n_pt)))]
    width = draw(st.integers(min_value=1, max_value=80))
    return ivs, pts, width


@given(case=interval_cases())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_interval_join_equals_brute_force(spark, case):
    """For arbitrary intervals, points, and bucket widths (including
    widths far smaller than the longest interval), the bucketed equi-join
    yields exactly the brute-force pair set — no dupes, no misses."""
    from vector_search_playground_spark.operators.rangejoin import (
        interval_join,
    )

    ivs, pts, width = case
    expected = {
        (i, j) for i, s, e in ivs for j, t in pts if s <= t < e
    }
    iv_df = spark.createDataFrame(
        ivs, "iv_id: bigint, start_us: bigint, end_us: bigint"
    )
    pt_df = spark.createDataFrame(pts, "pt_id: bigint, ts_us: bigint")
    got = {
        (r["iv_id"], r["pt_id"])
        for r in interval_join(
            iv_df, pt_df, start_col="start_us", end_col="end_us",
            ts_col="ts_us", bucket_width=width,
        ).collect()
    }
    assert got == expected


@given(
    weights=st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                     max_size=24),
    budget=st.integers(min_value=1, max_value=60),
    num_buckets=st.integers(min_value=1, max_value=5),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pack_sequences_equals_serial_scan(spark, weights, budget,
                                           num_buckets):
    """For arbitrary weights, budgets, and bucket counts, the distributed
    two-pass prefix sum assigns exactly the sequence ids a serial scan
    would."""
    from vector_search_playground_spark.operators.packing import (
        pack_sequences,
    )

    rows = [(i, w) for i, w in enumerate(weights)]
    acc, expected = 0, {}
    for i, w in rows:
        expected[i] = acc // budget
        acc += w
    df = spark.createDataFrame(rows, "doc_id: bigint, n_tokens: bigint")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(
            df, order_col="doc_id", weight_col="n_tokens", budget=budget,
            num_buckets=num_buckets,
        ).collect()
    }
    assert got == expected


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_subnormal=False),
        min_size=1, max_size=40,
    ),
    q=st.sampled_from([0.0, 0.25, 0.5, 0.75, 0.9, 1.0]),
    sub_bits=st.sampled_from([0, 1, 3, 6]),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_quantile_matches_holistic_percentile(spark, values, q,
                                                    sub_bits):
    """The distributed-selection quantile must equal Spark's holistic
    percentile() (same percentile_cont semantics) for arbitrary data —
    including constant columns, single rows, duplicates, and radix
    resolutions down to one bucket per binary octave."""
    from vector_search_playground_spark.operators.selection import (
        exact_quantile,
    )

    rows = [("a", float(v)) for v in values] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "col: string, v: double")
    got = exact_quantile(df, "col", "v", q, sub_bits=sub_bits)
    expected = {
        r["col"]: r["p"]
        for r in df.groupBy("col")
        .agg(F.expr(f"percentile(v, {q})").alias("p"))
        .collect()
    }
    assert set(got) == set(expected)
    for k in expected:
        assert math.isclose(got[k], expected[k], rel_tol=1e-12,
                            abs_tol=1e-12), (k, got[k], expected[k])


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
                  allow_subnormal=False),
        min_size=1, max_size=40,
    ),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_exact_quantiles_multi_q_matches_singles(spark, values):
    """Batched quantiles (one shared pass set) must equal the per-q
    single calls for every requested q — the union-of-indices logic must
    not perturb any individual quantile."""
    from vector_search_playground_spark.operators.selection import (
        exact_quantile,
        exact_quantiles,
    )

    qs = [0.0, 0.5, 0.95, 1.0]
    rows = [("a", float(v)) for v in values]
    df = spark.createDataFrame(rows, "col: string, v: double")
    multi = exact_quantiles(df, "col", "v", qs, sub_bits=3)
    for q in qs:
        single = exact_quantile(df, "col", "v", q, sub_bits=3)
        for k in single:
            assert math.isclose(multi[k][q], single[k], rel_tol=1e-12,
                                abs_tol=1e-12), (k, q)


@given(
    edges=st.lists(
        st.tuples(st.integers(min_value=0, max_value=14),
                  st.integers(min_value=0, max_value=14)),
        min_size=0, max_size=20,
    ),
    n_nodes=st.integers(min_value=1, max_value=15),
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cc_driver_path_equals_distributed_loop(spark, edges, n_nodes):
    """The union-find short-circuit and the min-label-propagation loop
    must produce identical labelings for arbitrary graphs (self-loops,
    duplicate edges, disconnected nodes). Contract: edges reference ids
    present in the node relation (callers derive both from one corpus)."""
    from vector_search_playground_spark.operators.dedup import (
        connected_components,
    )

    edges = [(a % n_nodes, b % n_nodes) for a, b in edges]
    edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    nodes_df = spark.createDataFrame(
        [(i,) for i in range(n_nodes)], "doc_id: long"
    )
    edge_df = spark.createDataFrame(
        edges or [], "a_id: long, b_id: long"
    )
    small = {
        r["doc_id"]: r["rep_id"]
        for r in connected_components(nodes_df, edge_df).collect()
    }
    looped = {
        r["doc_id"]: r["rep_id"]
        for r in connected_components(
            nodes_df, edge_df, small_graph_cutoff=-1
        ).collect()
    }
    assert small == looped
    assert set(small) == set(range(n_nodes))


# --- round-5 properties: Bloom filter and Z-order ---------------------------


@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_never_false_negative(spark, keys):
    """∀ key sets: every inserted key passes the membership probe — the
    property the exact-join correctness of join_bloom_filtered rests on."""
    from vector_search_playground_spark.operators.bloom import (
        build_bloom_words,
        might_contain,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    words = build_bloom_words(df, "k")
    assert df.where(~might_contain(words, F.col("k"))).count() == 0


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_zorder_interleave_matches_reference(spark, pts):
    """∀ (x, y) byte pairs: the generated Spark bit-interleave equals the
    independent Python reference implementation."""
    from vector_search_playground_spark.queries.analytics import _Z_SPARK

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pts, "xb int, yb int")
    got = df.select(F.expr(_Z_SPARK).cast("int").alias("z")).collect()
    want = [morton(x, y) for x, y in pts]
    assert [r["z"] for r in got] == want
