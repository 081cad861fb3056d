"""`join_bucketed` — the co-located fact⨝fact join over bucketed storage.

The relational tier's `join_inner_eq` pays a full two-sided shuffle every
run; this query is the storage-aware twin: both `lineitem` and `orders`
are written ONCE as tables bucketed by their order key
(`sources/bucketed.py`), after which the same join compiles to a
SortMergeJoin whose inputs are bucketed scans — **zero Exchange below
the join**, asserted in `tests/test_bucketjoin.py`. The only shuffle in
the whole plan is the 5-row priority rollup above it.

This is the highest-leverage physical pattern at 100 TB: the two
largest relations in the fixture set never move over the wire again for
any keyed query, and the one-off bucketed write replaces a per-query
exchange of the full fact table. The MERGE hint pins the join strategy
so the demonstration doesn't silently degrade to a broadcast at toy
scale (where `orders` fits under the broadcast threshold) — at real
scale neither side broadcasts and SMJ-over-buckets is the plan you
want anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import ROUND_MONEY, query
from vector_search_playground_spark.sources import load_table

SCRATCH = "/root/repo/.scratch"
BUCKETS = 8


def _bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Catalog names of the bucketed (lineitem, orders) pair for this
    fixture, building them on first use. Names carry the fixture
    content-fingerprint so a rewritten fixture gets fresh tables instead
    of silently serving stale buckets."""
    from vector_search_playground_spark.queries.llm_pipeline import (
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.sources.bucketed import (
        ensure_bucketed_table,
    )

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    li_fp = _fixture_fingerprint(sf_dir, "lineitem")[:12]
    od_fp = _fixture_fingerprint(sf_dir, "orders")[:12]
    li_name = f"lineitem_b{BUCKETS}_{tag}_{li_fp}"
    od_name = f"orders_b{BUCKETS}_{tag}_{od_fp}"
    # Only the joined/aggregated columns are stored: bucketing prunes
    # shuffles, projection pruning keeps the layout narrow.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    ensure_bucketed_table(
        spark, li, li_name,
        os.path.join(SCRATCH, f"bucketed_{li_name}"),
        "l_orderkey", BUCKETS,
    )
    ensure_bucketed_table(
        spark, od, od_name,
        os.path.join(SCRATCH, f"bucketed_{od_name}"),
        "o_orderkey", BUCKETS,
    )
    return li_name, od_name


@query(
    "join_bucketed",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), {ROUND_MONEY})
             AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def join_bucketed_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order priority over the bucketed pair. The oracle is
    the PLAIN join — bucketing must be a pure physical rewrite, so the
    hash check proves layout never changes answers (the same contract
    `join_skew_salted` makes for salting)."""
    li_name, od_name = _bucketed_pair(spark, sf_dir)
    li = spark.table(li_name)
    od = spark.table(od_name)
    joined = li.hint("merge").join(
        od, li["l_orderkey"] == od["o_orderkey"]
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                ROUND_MONEY,
            ).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
