"""AQE skew-join certificate (r11 verdict #7's proposed certificate,
implemented — it is a test, not a registry ID, so the registry freeze
holds).

``join_skew_salted`` certifies the MANUAL skew mitigation (salting) as
a pure physical rewrite. On a 1000-executor cluster the other half of
the skew story is Spark's own: AQE's OptimizeSkewedJoin splits a hot
shuffle partition into sub-partitions at runtime. This certificate
proves, on a deliberately skewed fixture, that

1. the hot key actually triggers the split (the final adaptive plan's
   SortMergeJoin carries ``skew=true`` — asserted, so the certificate
   cannot pass vacuously on an un-skewed layout), and
2. the skew-split join's result is EXACTLY the un-skewed truth: both
   the AQE plain join and the salted rewrite hash-match DuckDB on the
   same skewed data.

Fixture: lineitem replicated 100× under fresh orderkeys with a
deterministic 30% of rows remapped to ONE hot supplier (~1.8M of 6M
rows on a single join key — far beyond the lowered skew thresholds).
The aggregates are integer-exact (BIGINT quantity sums + counts), so
the cross-engine hash has no float-accumulation knife edge at the
6M-row scale (a ROUND(sum-of-doubles, 2) would sit inside different
engines' accumulation-order noise at this magnitude — measure choice
is part of the certificate design, not an accident).

Broadcast is disabled for the plain arm (both the static and the AQE
threshold: supplier is tiny and AQE would otherwise convert the SMJ to
a broadcast join at runtime, making skew handling moot) — that is the
scenario the certificate targets: the dim too big to broadcast on a
memory-constrained cluster, the fact skewed.

Reference parity: the reference's single-process Postgres
(/root/reference/docker-compose.yaml:3-10) has no notion of partition
skew; on Spark, skew-robustness is part of the 100 TB contract.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from vector_search_playground_spark import registry

_FACTOR = 100
_HOT_SUPPKEY = 1

_SKEW_CONF = {
    # force the sort-merge path: static planner AND AQE's runtime
    # broadcast conversion both off, else the tiny dim broadcasts and
    # there is no shuffle to skew
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # lower the skew thresholds to fixture scale: a partition is skewed
    # if > factor x median AND > threshold; split target = advisory size
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
    # keep the ugly layout observable
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def _skew_dir() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(here, ".scratch", "skew_join")
    marker = os.path.join(root, "_READY")
    try:
        with open(marker) as fh:
            if fh.read().strip() == "v1":
                return root
    except OSError:
        pass
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    base = "/root/testdata/sf0.01"
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT l.* REPLACE (
                r.k * 100000000 + l.l_orderkey AS l_orderkey,
                CASE WHEN (l.l_orderkey + r.k) % 10 < 3
                     THEN {_HOT_SUPPKEY}
                     ELSE l.l_suppkey END AS l_suppkey)
            FROM read_parquet('{base}/lineitem.parquet') l
            CROSS JOIN (SELECT unnest(range({_FACTOR})) AS k) r
        ) TO '{root}/lineitem.parquet' (FORMAT parquet)
        """
    )
    con.close()
    shutil.copy(
        os.path.join(base, "supplier.parquet"),
        os.path.join(root, "supplier.parquet"),
    )
    with open(marker, "w") as fh:
        fh.write("v1")
    return root


_ORACLE = """
SELECT s.s_nationkey,
       COUNT(*) AS n_items,
       SUM(CAST(l.l_quantity AS BIGINT)) AS qty
FROM read_parquet('{d}/lineitem.parquet') l
JOIN read_parquet('{d}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_nationkey
"""


def _truth(d: str) -> dict:
    con = duckdb.connect()
    rows = con.execute(_ORACLE.format(d=d)).fetchall()
    con.close()
    return {r[0]: (r[1], r[2]) for r in rows}


def _spark_rows(df) -> dict:
    return {
        r["s_nationkey"]: (r["n_items"], r["qty"]) for r in df.collect()
    }


@pytest.fixture()
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_split_fires_and_preserves_exact_results(spark, skew_conf):
    from pyspark.sql import functions as F

    from vector_search_playground_spark.sources import load_table

    registry.load_all()
    d = _skew_dir()
    li = load_table(spark, d, "lineitem")
    sup = load_table(spark, d, "supplier").select("s_suppkey", "s_nationkey")
    plain = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    got = _spark_rows(plain)
    # the final adaptive plan must show the skew split actually engaged
    final_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, (
        "AQE never marked the join skewed — the certificate ran "
        "vacuously (hot partition below the lowered thresholds?)"
    )
    assert got == _truth(d), "AQE skew-split join diverged from DuckDB"


def test_salted_rewrite_matches_on_the_same_skewed_data(spark, skew_conf):
    """The manual mitigation (join_skew_salted's rewrite, inlined here
    with the integer-exact measure) on the SAME skewed fixture: salting
    must stay a pure physical rewrite when the skew is real, not just
    at the bench fixture's even key distribution."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.queries.trainprep import SALT_BUCKETS
    from vector_search_playground_spark.sources import load_table

    registry.load_all()
    d = _skew_dir()
    li = load_table(spark, d, "lineitem").withColumn(
        "salt", F.pmod(F.col("l_orderkey"), F.lit(SALT_BUCKETS)).cast("int")
    )
    sup = load_table(spark, d, "supplier").select("s_suppkey", "s_nationkey")
    salts = spark.range(SALT_BUCKETS).select(
        F.col("id").cast("int").alias("salt")
    )
    sup_rep = sup.crossJoin(salts)
    salted = (
        li.join(
            sup_rep,
            (li.l_suppkey == sup_rep.s_suppkey) & (li.salt == sup_rep.salt),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("qty"),
        )
    )
    assert _spark_rows(salted) == _truth(d), (
        "salted rewrite diverged from DuckDB on skewed data"
    )
