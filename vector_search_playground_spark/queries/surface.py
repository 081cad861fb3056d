"""Tier A/B leftovers: pagination, multi-key ordering, general predicates,
the append sink, and the DDL verbs (SURVEY.md §2 Tier A/B).

These close out the reference's stack-exposed surface: sea-orm's
``PaginatorTrait``/``QueryOrder``/``QueryFilter`` imports
(`/root/reference/src/main.rs:7-12`) and the migration DDL
(`/root/reference/migration/src/m20250414_131949_create_search.rs`).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table

SCRATCH = "/root/repo/.scratch"


@query(
    "offset_paginate",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 10
    """,
)
def offset_paginate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (sea-orm PaginatorTrait, src/main.rs:12).

    Spark has no native OFFSET pushdown, and a global row_number window
    would single-partition the whole table. Scale-safe shape: TakeOrdered
    the first offset+k rows (per-partition heaps), THEN row_number over
    that tiny result — the global window only ever sees offset+k rows.
    """
    offset, k = 10, 10
    o = load_table(spark, sf_dir, "orders")
    page = (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(offset + k)
        .select("o_orderkey", "o_totalprice")
    )
    w = Window.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        page.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > offset)
        .drop("__rn")
    )


@query(
    "order_multi",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
    ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC,
             l_linenumber ASC
    LIMIT 50
    """,
)
def order_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key mixed-direction ORDER BY (sea-orm QueryOrder,
    src/main.rs:8)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.asc("l_returnflag"),
            F.desc("l_quantity"),
            F.asc("l_orderkey"),
            F.asc("l_linenumber"),
        )
        .limit(50)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    )


@query(
    "filter_where",
    oracle="""
    SELECT p_partkey, p_name, p_type, p_size FROM part
    WHERE p_type IN ('ECONOMY', 'SMALL')
      AND p_name LIKE '%red%'
      AND p_size BETWEEN 10 AND 40
      AND p_retailprice IS NOT NULL
    """,
)
def filter_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General predicate surface (sea-orm QueryFilter, src/main.rs:12,
    used at :89) — IN + LIKE + BETWEEN + IS NOT NULL on a second table,
    all pushable to the parquet scan."""
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").isin("ECONOMY", "SMALL")
        & F.col("p_name").like("%red%")
        & F.col("p_size").between(10, 40)
        & F.col("p_retailprice").isNotNull()
    ).select("p_partkey", "p_name", "p_type", "p_size")


@query("insert_row")  # rows-only: side-effecting append (SURVEY Tier A)
def insert_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `create` verb as a sink (src/main.rs:72-80): append
    rows to a parquet table, read back. Ids via monotonically_increasing_id
    (unique, not dense — Postgres serial isn't gap-free either)."""
    path = os.path.join(SCRATCH, "insert_row_table")
    shutil.rmtree(path, ignore_errors=True)
    rows = spark.createDataFrame(
        [("hello world",), ("vector search",), ("spark native",)],
        "content: string",
    )
    out = rows.withColumn("id", F.monotonically_increasing_id()).select(
        "id", "content"
    )
    out.write.mode("append").parquet(path)
    back = spark.read.parquet(path)
    return back.agg(F.count(F.lit(1)).alias("n_inserted"))


@query("ddl_create_table")  # rows-only: DDL has no DuckDB-comparable output
def ddl_create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE search(id, content, vector) — the migration's up()
    (m20250414_131949_create_search.rs:22-37) against Spark's session
    catalog. Returns the declared columns for the smoke check."""
    spark.sql("DROP TABLE IF EXISTS search")
    spark.sql(
        "CREATE TABLE search (id BIGINT, content STRING NOT NULL, "
        "vector ARRAY<FLOAT> NOT NULL) USING parquet"
    )
    return (
        spark.sql("DESCRIBE TABLE search")
        .select("col_name", "data_type")
        .orderBy("col_name")
    )


@query("ddl_create_extension")  # rows-only: no-op token (SURVEY §2 Tier A)
def ddl_create_extension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE EXTENSION vector (m20250414_131949_create_search.rs:10-20) is
    a Spark no-op: vector distance is a built-in Catalyst expression here
    (functions/vector.py), not an extension type. Registered as an explicit
    token so the capability mapping is auditable."""
    return spark.createDataFrame(
        [("vector", "builtin", "distance ops are Catalyst HOF expressions")],
        "extension: string, status: string, note: string",
    )


@query("ddl_drop")  # rows-only: DDL
def ddl_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-migration (m20250414_131949_create_search.rs:44-63): drop the
    table, verify it is gone from the catalog."""
    spark.sql("CREATE TABLE IF NOT EXISTS search_drop_me (id BIGINT) USING parquet")
    spark.sql("DROP TABLE search_drop_me")
    exists = spark.catalog.tableExists("search_drop_me")
    return spark.createDataFrame(
        [("search_drop_me", bool(exists))], "table: string, still_exists: boolean"
    )


@query("compact_files")  # rows-only: file layout is not SQL-expressible
def compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance verb (Delta
    OPTIMIZE / Iceberg rewrite_data_files) a long-lived 100 TB table
    needs after streaming/CDC ingest fragments it: thousands of KB-sized
    files turn every scan into a file-listing + task-scheduling storm.

    A deliberately fragmented copy of ``documents`` (64 shards) is
    rewritten to ceil(bytes / TARGET_FILE_BYTES) files with ``coalesce``
    — a NARROW dependency: existing files concatenate into bigger ones
    with no shuffle and no re-sort, which is exactly how a bin-packing
    compactor behaves (repartition would pay a full shuffle to achieve
    the same layout). Emits before/after file counts and row-preservation
    so the driver's rows-only check pins the invariant that maintenance
    never changes data."""
    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH,
        _fixture_fingerprint,
    )

    TARGET_FILE_BYTES = 1 << 20  # 1 MiB — stands in for the 128 MB prod target

    docs = load_table(spark, sf_dir, "documents")
    fp = _fixture_fingerprint(sf_dir, "documents")
    tag = os.path.basename(sf_dir.rstrip("/"))
    frag = os.path.join(SCRATCH, f"documents_frag_{tag}_{fp}")
    if not os.path.exists(os.path.join(frag, "_SUCCESS")):
        docs.repartition(64).write.mode("overwrite").parquet(frag)

    def data_files(path):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(path)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = data_files(frag)
    n_bytes = sum(os.path.getsize(f) for f in before)
    n_target = max(1, -(-n_bytes // TARGET_FILE_BYTES))

    compacted = os.path.join(SCRATCH, f"documents_compact_{tag}_{fp}")
    fragmented = spark.read.schema(docs.schema).parquet(frag)
    fragmented.coalesce(n_target).write.mode("overwrite").parquet(compacted)
    after = data_files(compacted)
    rows_before = fragmented.count()
    rows_after = spark.read.schema(docs.schema).parquet(compacted).count()
    return spark.createDataFrame(
        [
            (
                len(before),
                len(after),
                int(rows_before),
                int(rows_after),
                rows_before == rows_after and len(after) <= len(before),
            )
        ],
        "n_files_before: int, n_files_after: int, n_rows_before: long, "
        "n_rows_after: long, invariant_ok: boolean",
    )
