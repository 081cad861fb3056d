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

from pyspark.sql import DataFrame, SparkSession, Window
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


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared high-value (customer, supplier+OFFSET) edge relation —
    the Spark mirror of ``_EDGES_SQL`` (filter pushed to the fact scan,
    one join, distinct)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_quantity") >= MIN_QTY)
        & (F.col("l_extendedprice") > MIN_PRICE)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").alias("a"),
            (F.lit(SUPP_OFFSET) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )


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


PR_DAMPING_PCT = 85  # damping 0.85 expressed as an exact integer percent
PR_ITERS = 12
PR_TOP = 20
PR_SCALE = 10**15  # rank unit: 1e-15 of total mass (fixed-point femto-units)


def _pagerank_oracle_sql() -> str:
    """12 unrolled iteration CTEs of the EXACT fixed-point recurrence.

    All arithmetic is BIGINT (DuckDB promotes SUM to HUGEINT — lossless):
    integer sums commute, so the per-node contribution aggregate has NO
    floating summation-order sensitivity on either engine — the oracle
    certifies the iteration value-for-value with zero rounding knife edge,
    unlike a double-based power iteration whose grouped sums reorder
    between DuckDB and distributed Spark."""
    nb = f"({15 * PR_SCALE} // (100 * (SELECT n FROM c)))"
    its = []
    for i in range(1, PR_ITERS + 1):
        its.append(f"""
    pr{i} AS (
        SELECT n.node,
               CAST({nb} + (85 * COALESCE(s.contrib, 0)) // 100
                    AS BIGINT) AS rank_fp
        FROM nodes n
        LEFT JOIN (
            SELECT e.dst AS node,
                   SUM(p.rank_fp // d.deg) AS contrib
            FROM sym e
            JOIN pr{i - 1} p ON e.src = p.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        ) s ON n.node = s.node
    )""")
    return f"""
    WITH edges AS ({_EDGES_SQL}),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b AS src, a AS dst FROM edges
    ),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM sym),
    c AS (SELECT count(*) AS n FROM nodes),
    pr0 AS (
        SELECT node,
               CAST({PR_SCALE} // (SELECT n FROM c) AS BIGINT) AS rank_fp
        FROM nodes
    ),{",".join(its)}
    SELECT CAST(node AS BIGINT) AS node,
           rank_fp,
           CAST(rank_fp AS DOUBLE) / 1e15 AS rank
    FROM pr{PR_ITERS}
    ORDER BY rank_fp DESC, node
    LIMIT {PR_TOP}
    """


@query("pagerank_topn", oracle=_pagerank_oracle_sql())
def pagerank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the same customer–supplier graph (symmetrized), the
    iterative-algorithm sibling of ``graph_components``: influence
    scores for entity-importance ranking. Power iteration with damping
    0.85, PR_ITERS rounds, run ENTIRELY in fixed-point BIGINT femto-units
    (PR_SCALE): per edge ``rank_fp div deg`` then an integer sum per
    destination, ``rank' = (15·SCALE)//(100·n) + (85·Σ)//100``. Integer
    addition commutes, so both engines — and both Spark paths — produce
    bit-identical ranks regardless of partitioning/summation order; the
    truncation the fixed point introduces is < deg·1e-15 per node per
    round, ~1e-9 relative at the emitted 15-digit precision. The oracle
    is the same recurrence as 12 unrolled DuckDB CTEs — a full value
    certificate for an iterative algorithm, the ``graph_components``
    discipline (recursive/iterated SQL lives oracle-side only).

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
    identical integer iteration; the distributed path is pinned by its
    own test (tests/test_round5_ops.py) at a forced cutoff of 0."""
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
            [idx[a] for a, b in pairs] + [idx[b] for a, b in pairs],
            dtype=np.int64,
        )
        dst = np.array(
            [idx[b] for a, b in pairs] + [idx[a] for a, b in pairs],
            dtype=np.int64,
        )
        deg = np.bincount(src, minlength=n).astype(np.int64)
        # exact fixed-point recurrence (see pagerank_topn docstring):
        # int64 headroom — rank_fp ≤ SCALE=1e15, 85·Σcontrib ≤ 85·SCALE
        # = 8.5e16 ≪ 2^63; np.add.at accumulates int64 exactly
        base = (15 * PR_SCALE) // (100 * n)
        rank = np.full(n, PR_SCALE // n, dtype=np.int64)
        for _ in range(PR_ITERS):
            contrib = np.zeros(n, dtype=np.int64)
            np.add.at(contrib, dst, rank[src] // deg[src])
            rank = base + (85 * contrib) // 100
        order = np.lexsort((node_ids, -rank))[:PR_TOP]
        rows = [
            (int(node_ids[i]), int(rank[i]), float(rank[i]) / 1e15)
            for i in order
        ]
        return spark.createDataFrame(
            rows, "node long, rank_fp long, rank double"
        )
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
    # exact fixed-point recurrence (see pagerank_topn docstring); LONG
    # arithmetic end to end, so the hash-agg's partial-sum order is
    # irrelevant — the distributed answer is bit-identical to the numpy
    # path and to the DuckDB oracle
    base = (15 * PR_SCALE) // (100 * n_nodes)
    ranks = nodes.select(
        "node", F.lit(PR_SCALE // n_nodes).alias("rank_fp")
    ).localCheckpoint(eager=True)
    for _ in range(PR_ITERS):
        contrib = (
            out_edges.join(
                ranks, out_edges.src == ranks.node
            )
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div deg").alias("c"),
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
                    F.lit(base)
                    + F.expr("(85 * coalesce(c, 0L)) div 100")
                ).alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        ranks.orderBy(F.desc("rank_fp"), F.asc("node"))
        .limit(PR_TOP)
        .select(
            "node",
            "rank_fp",
            (F.col("rank_fp").cast("double") / F.lit(1e15)).alias("rank"),
        )
    )


# --- graph_common_neighbors -------------------------------------------------

_CN_TOP = 20


@query(
    "graph_common_neighbors",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b AS src, a AS dst FROM edges
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM sym GROUP BY src),
    cn AS (
        SELECT e1.dst AS a, e2.dst AS b, count(*) AS common
        FROM sym e1 JOIN sym e2
          ON e1.src = e2.src AND e1.dst < e2.dst
        GROUP BY e1.dst, e2.dst
    )
    SELECT CAST(cn.a AS BIGINT) AS a, CAST(cn.b AS BIGINT) AS b,
           CAST(common AS BIGINT) AS common_neighbors,
           floor(CAST(common AS DOUBLE)
                 / (da.deg + db.deg - common) * 1e6 + 0.5) / 1e6
               AS jaccard
    FROM cn
    JOIN deg da ON da.node = cn.a
    JOIN deg db ON db.node = cn.b
    ORDER BY common DESC, cn.a, cn.b LIMIT {_CN_TOP}
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor similarity over the high-value customer–supplier
    graph: the top-{t} node pairs by shared-neighbor count with their
    neighborhood Jaccard — the link-prediction / lookalike verb next to
    ``graph_components`` (who co-transacts with the same counterparties
    without transacting directly). Counts exact int64; the single ratio
    is half-up floored at 6 dp from exact integers.

    Shape at 100 TB: the wedge enumeration joins the symmetrized edge
    relation with itself ON THE SHARED ENDPOINT — pair space is
    Σ_v C(deg(v), 2), bounded by the business-selective edge filter
    (pushed to the fact scan), never nodes²; a power-law hub would cap
    via the same per-key salting the dedup family uses. One hash-agg to
    pair counts, degree joins on the |nodes| relation, TakeOrdered {t}.
    """.format(t=_CN_TOP)
    # the filtered edge relation is reused ~6x (sym twice, deg, both
    # wedge sides); materialize it once so the fact join never re-runs
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    e1 = sym.select(F.col("src").alias("m"), F.col("dst").alias("a"))
    e2 = sym.select(F.col("src").alias("m"), F.col("dst").alias("b"))
    cn = (
        e1.join(e2, "m")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    return (
        cn.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common_neighbors"),
            (
                F.floor(
                    F.col("common").cast("double")
                    / (F.col("da") + F.col("db") - F.col("common"))
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("jaccard"),
        )
        .orderBy(F.desc("common_neighbors"), "a", "b")
        .limit(_CN_TOP)
    )


# --- degree_distribution ----------------------------------------------------


@query(
    "degree_distribution",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    sym AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b AS src, a AS dst FROM edges
    ),
    deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
    hist AS (SELECT deg, count(*) AS n_nodes FROM deg GROUP BY deg),
    t AS (SELECT sum(n_nodes) AS total FROM hist)
    SELECT CAST(deg AS BIGINT) AS degree,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(sum(n_nodes) OVER (ORDER BY deg DESC) AS BIGINT)
               AS n_nodes_ge,
           floor(CAST(sum(n_nodes) OVER (ORDER BY deg DESC) AS DOUBLE)
                 / t.total * 1e6 + 0.5) / 1e6 AS ccdf
    FROM hist CROSS JOIN t
    ORDER BY degree
    """,
)
def degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram + complementary CDF of the high-value
    customer–supplier graph — the first thing anyone asks of a derived
    graph (is it power-law? where do the hubs start?), and the planning
    input for every wedge/triangle bound above. Counts exact; the ccdf
    share is half-up floored at 6 dp from exact integers.

    Shape at 100 TB: degrees are one hash-agg on the edge relation; the
    histogram is a second agg over |nodes| rows; the cumulative window
    runs over the |distinct degrees| spine — metadata all the way down.
    """
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    sym = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
    total = hist.agg(F.sum("n_nodes").alias("total"))
    w = Window.orderBy(F.desc("deg"))  # |distinct degrees| spine
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            F.col("deg").cast("long").alias("degree"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.sum("n_nodes").over(w).alias("n_nodes_ge"),
            (
                F.floor(
                    F.sum("n_nodes").over(w).cast("double")
                    / F.col("total")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("ccdf"),
        )
        .orderBy("degree")
    )


# --- graph_label_propagation -------------------------------------------------

LP_ITERS = 8  # FIXED synchronous rounds — the certified recurrence, not
# a convergence loop: the oracle unrolls exactly this many steps


def _lp_oracle_sql() -> str:
    """LP_ITERS unrolled min-label rounds as MATERIALIZED DuckDB CTEs
    (the pagerank_topn discipline): l_i(v) = least(l_{i-1}(v),
    min over in-neighbors u of l_{i-1}(u)). Pure BIGINT min/least —
    commutative and idempotent, zero floating arithmetic anywhere, so
    the certificate has no rounding knife edge at all."""
    its = []
    for i in range(1, LP_ITERS + 1):
        its.append(f"""
    l{i} AS MATERIALIZED (
        SELECT p.node, least(p.label, m.nb) AS label
        FROM l{i - 1} p
        JOIN (SELECT e.dst AS node, min(q.label) AS nb
              FROM sym e JOIN l{i - 1} q ON e.src = q.node
              GROUP BY e.dst) m
        ON p.node = m.node
    )""")
    return f"""
    WITH edges AS MATERIALIZED ({_EDGES_SQL}),
    sym AS MATERIALIZED (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT b AS src, a AS dst FROM edges
    ),
    l0 AS MATERIALIZED (
        SELECT DISTINCT src AS node, src AS label FROM sym
    ),{",".join(its)}
    SELECT node, label,
           CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS comm_size
    FROM l{LP_ITERS}
    ORDER BY node
    """


@query("graph_label_propagation", oracle=_lp_oracle_sql())
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous min-label propagation over the
    high-value customer-supplier graph (the graph_components relation):
    every node starts labelled with its own id; each round it adopts the
    minimum of its label and its neighbors' labels; after LP_ITERS FIXED
    rounds, nodes sharing a label form a community. Unlike
    graph_components (which iterates to convergence), the fixed horizon
    makes this a bounded-radius community probe — a node joins a
    community only if a smaller id sits within LP_ITERS hops — and,
    crucially, makes the whole iteration a finite exact-integer
    recurrence the oracle can unroll CTE-for-CTE (min is commutative
    AND idempotent: no summation-order hazard, no rounding, bit-equal
    across engines and partitionings by construction).

    Size-adaptive like pagerank_topn: below the measured edge cutoff the
    EDGE LIST (never a corpus-scale relation) collects and numpy runs
    the LP_ITERS scatter-min rounds driver-side; above it, the
    distributed loop — per round one join of the symmetric edge relation
    against the label vector plus one min hash-agg on the destination,
    label state distributed throughout, localCheckpoint keeping the plan
    constant-size. Both paths compute the identical integer recurrence;
    the distributed path is pinned by its own test at a forced cutoff
    of 0 (tests/test_r13_ops.py)."""
    return _label_prop(spark, sf_dir)


def _label_prop(
    spark: SparkSession, sf_dir: str, small_graph_cutoff: int = 100_000
) -> DataFrame:
    edges = _edges(spark, sf_dir).persist()
    n_edges = edges.count()
    if n_edges <= small_graph_cutoff:
        import numpy as np

        pairs = [(r["a"], r["b"]) for r in edges.collect()]
        edges.unpersist(blocking=False)
        node_ids = sorted({x for p in pairs for x in p})
        idx = {v: i for i, v in enumerate(node_ids)}
        n = len(node_ids)
        src = np.array(
            [idx[a] for a, b in pairs] + [idx[b] for a, b in pairs],
            dtype=np.int64,
        )
        dst = np.array(
            [idx[b] for a, b in pairs] + [idx[a] for a, b in pairs],
            dtype=np.int64,
        )
        labels = np.array(node_ids, dtype=np.int64)
        for _ in range(LP_ITERS):
            nb = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(nb, dst, labels[src])
            labels = np.minimum(labels, nb)
        counts: dict[int, int] = {}
        for lab in labels:
            counts[int(lab)] = counts.get(int(lab), 0) + 1
        rows = [
            (int(node_ids[i]), int(labels[i]), counts[int(labels[i])])
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "node long, label long, comm_size long"
        ).orderBy("node")
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges.unpersist(blocking=False)
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(LP_ITERS):
        nb = (
            sym.join(labels, sym.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nb"))
        )
        # symmetrized graph: every node has >= 1 in-neighbor, so the
        # inner join drops nothing (mirrors the oracle's inner join)
        labels = (
            labels.join(nb, labels.node == nb.dst)
            .select("node", F.least("label", "nb").alias("label"))
            .localCheckpoint(eager=True)
        )
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("comm_size")
    )
    return (
        labels.join(F.broadcast(sizes), "label")
        .select("node", "label", "comm_size")
        .orderBy("node")
    )
