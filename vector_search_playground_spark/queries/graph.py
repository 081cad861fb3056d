"""Graph tier: connected components over a relationally-derived graph.

The dedup family already runs min-label connected components internally
(operators/dedup.py:connected_components — union-find below a measured
edge-count cutoff, pointer-jumping label propagation above it). This module
exposes that operator as a first-class, HASH-CERTIFIED query: the oracle is
a recursive-CTE reachability closure in DuckDB, so the driver verifies the
component labels value-for-value, not just row counts — the strongest
correctness signal an iterative algorithm can get.

Graph: the customer–supplier bipartite graph induced by high-value order
lines (who bought big-ticket volume from whom). Supplier node ids are
offset by ``SUPP_OFFSET`` so the two key spaces cannot collide.

Scale: edge derivation is one join of the FILTERED lineitem relation
(predicate pushed to the parquet scan) against orders on the order key;
the component step is the measured-size-adaptive operator — driver
union-find when the edge list is provably tiny, distributed
O(log diameter) label propagation otherwise. The recursive closure lives
only in the ORACLE (it is quadratic per component and exists to certify
the linear-state Spark answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_playground_spark.operators.dedup import connected_components
from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table

SUPP_OFFSET = 1_000_000  # shifts supplier keys out of the customer id space
MIN_QTY = 49
MIN_PRICE = 90_000

_EDGES_SQL = f"""
        SELECT DISTINCT o.o_custkey AS a,
                        {SUPP_OFFSET} + l.l_suppkey AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= {MIN_QTY} AND l.l_extendedprice > {MIN_PRICE}
"""


@query(
    "graph_components",
    oracle=f"""
    WITH RECURSIVE
    edges AS ({_EDGES_SQL}),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b AS src, a AS dst FROM edges
    ),
    reach(node, r) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT reach.node, sym.dst FROM reach JOIN sym ON reach.r = sym.src
    ),
    labels AS (
        SELECT node, min(r) AS rep FROM reach GROUP BY node
    )
    SELECT node, rep,
           CAST(count(*) OVER (PARTITION BY rep) AS BIGINT) AS comp_size
    FROM labels
    ORDER BY node
    """,
)
def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the high-value customer–supplier graph:
    every node labelled with the minimum node id reachable from it, plus
    its component's size.

    The Spark side never materializes reachability: below the measured
    edge cutoff the edge LIST (not the node relation) is solved with a
    driver union-find and broadcast back; above it, pointer-jumping
    min-label propagation converges in O(log diameter) rounds of
    shuffle-join + aggregate (operators/dedup.py:480). The oracle's
    recursive closure is the quadratic-per-component certificate, kept
    SQL-side only."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= MIN_QTY)
        & (F.col("l_extendedprice") > MIN_PRICE)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("a_id"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("b_id"),
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col("a_id").alias("doc_id"))
        .unionByName(edges.select(F.col("b_id").alias("doc_id")))
        .distinct()
    )
    labels = connected_components(nodes, edges).select(
        F.col("doc_id").alias("node"), F.col("rep_id").alias("rep")
    )
    sizes = labels.groupBy("rep").agg(F.count(F.lit(1)).alias("comp_size"))
    return (
        labels.join(F.broadcast(sizes), "rep")
        .select("node", "rep", "comp_size")
        .orderBy("node")
    )


PR_DAMPING = 0.85
PR_ITERS = 12
PR_TOP = 20


@query("pagerank_topn")  # rows-only: fixed-point float iteration, not SQL
def pagerank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the same customer–supplier graph (symmetrized), the
    iterative-algorithm sibling of ``graph_components``: influence
    scores for entity-importance ranking. Power iteration with damping
    0.85, PR_ITERS rounds.

    Size-adaptive like ``connected_components`` (operators/dedup.py:480):
    below the measured edge cutoff the EDGE LIST (never a corpus-scale
    relation) collects and numpy runs the PR_ITERS sparse mat-vec rounds
    in microseconds — 12 distributed rounds on a 4k-node graph would pay
    12× per-round job overhead for empty work (measured 10.9 s → <1 s at
    sf0.1). Above the cutoff, the distributed loop: per round, one join
    of the edge relation against the rank vector (both keyed on the
    source node — the exchange is planned once and reused) and one
    hash-agg on the destination; rank state stays distributed and
    localCheckpoint keeps plans constant-size. Both paths compute the
    identical iteration; the distributed path is pinned by its own test
    (tests/test_round5_ops.py) at a forced cutoff of 0."""
    return _pagerank(spark, sf_dir)


def _pagerank(spark: SparkSession, sf_dir: str,
              small_graph_cutoff: int = 100_000) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= MIN_QTY)
        & (F.col("l_extendedprice") > MIN_PRICE)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    edges = edges.persist()
    n_edges = edges.count()
    if n_edges <= small_graph_cutoff:
        import numpy as np

        pairs = [(r["a"], r["b"]) for r in edges.collect()]
        edges.unpersist(blocking=False)
        node_ids = sorted({x for p in pairs for x in p})
        idx = {v: i for i, v in enumerate(node_ids)}
        n = len(node_ids)
        src = np.array(
            [idx[a] for a, b in pairs] + [idx[b] for a, b in pairs]
        )
        dst = np.array(
            [idx[b] for a, b in pairs] + [idx[a] for a, b in pairs]
        )
        deg = np.bincount(src, minlength=n).astype(np.float64)
        rank = np.full(n, 1.0 / n)
        for _ in range(PR_ITERS):
            contrib = np.bincount(
                dst, weights=rank[src] / deg[src], minlength=n
            )
            rank = (1.0 - PR_DAMPING) / n + PR_DAMPING * contrib
        order = np.lexsort((node_ids, -rank))[:PR_TOP]
        rows = [
            (int(node_ids[i]), float(round(rank[i], 8))) for i in order
        ]
        return spark.createDataFrame(rows, "node long, rank double")
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    edges.unpersist(blocking=False)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    out_edges = sym.join(deg, "src").localCheckpoint(eager=True)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    n_nodes = nodes.count()
    ranks = nodes.select(
        "node", F.lit(1.0 / n_nodes).alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(PR_ITERS):
        contrib = (
            out_edges.join(
                ranks, out_edges.src == ranks.node
            )
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # symmetrized graph has no dangling nodes: every node has ≥1 edge
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - PR_DAMPING) / n_nodes)
                    + PR_DAMPING * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.orderBy(F.desc("rank"), F.asc("node"))
        .limit(PR_TOP)
        .select("node", F.round("rank", 8).alias("rank"))
    )
