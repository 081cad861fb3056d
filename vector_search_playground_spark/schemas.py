"""Explicit StructType schemas for every fixture table.

The reference manages its one-table schema with a migration
(`/root/reference/migration/src/m20250414_131949_create_search.rs:22-37`,
table ``search(id, content, vector)``); the Spark equivalent of
"migration-managed schema" is a single module of explicit StructTypes that
every read goes through — schema inference never runs on the hot path
(SURVEY.md §1.2).

The reference's ``search`` table maps onto the ``documents`` ⊕ ``embeddings``
pair: ``documents(doc_id, text)`` ⋈ ``embeddings(vec_id, embedding)`` on
``doc_id = vec_id`` ≡ ``search(id, content, vector)``
(`/root/reference/entity/src/generated/search.rs:7-13`).

Vector storage type is ``ArrayType(FloatType)`` — pgvector's ``vector`` is an
f32 array (`/root/reference/migration/src/m20250414_131949_create_search.rs:34`),
and ArrayType round-trips through Parquet/Arrow/DuckDB cleanly where MLlib's
VectorUDT does not. Convert at the MLlib boundary only.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable=True) for n, t in fields])


REGION = _st(("r_regionkey", IntegerType()), ("r_name", StringType()))

NATION = _st(
    ("n_nationkey", IntegerType()),
    ("n_name", StringType()),
    ("n_regionkey", IntegerType()),
)

SUPPLIER = _st(
    ("s_suppkey", LongType()),
    ("s_name", StringType()),
    ("s_nationkey", IntegerType()),
    ("s_acctbal", DoubleType()),
)

CUSTOMER = _st(
    ("c_custkey", LongType()),
    ("c_name", StringType()),
    ("c_nationkey", IntegerType()),
    ("c_acctbal", DoubleType()),
    ("c_mktsegment", StringType()),
)

PART = _st(
    ("p_partkey", LongType()),
    ("p_name", StringType()),
    ("p_brand", StringType()),
    ("p_type", StringType()),
    ("p_size", IntegerType()),
    ("p_retailprice", DoubleType()),
)

ORDERS = _st(
    ("o_orderkey", LongType()),
    ("o_custkey", LongType()),
    ("o_orderstatus", StringType()),
    ("o_totalprice", DoubleType()),
    ("o_orderdate", TimestampNTZType()),
    ("o_orderpriority", StringType()),
)

LINEITEM = _st(
    ("l_orderkey", LongType()),
    ("l_partkey", LongType()),
    ("l_suppkey", LongType()),
    ("l_linenumber", IntegerType()),
    ("l_quantity", DoubleType()),
    ("l_extendedprice", DoubleType()),
    ("l_discount", DoubleType()),
    ("l_tax", DoubleType()),
    ("l_returnflag", StringType()),
    ("l_linestatus", StringType()),
    ("l_shipdate", TimestampNTZType()),
)

# events.parquet stores ts as parquet timestamp[us] (verified with pyarrow
# at every SF); declaring LongType here makes Spark surface the raw int64
# (epoch MICROseconds). sources/tables.py derives the proper `ts` timestamp
# and keeps the exact `ts_us` long for integer time arithmetic that must
# match DuckDB's epoch_us(ts) (session islands, range buckets).
EVENTS_RAW = _st(
    ("event_id", LongType()),
    ("ts", LongType()),  # epoch MICROseconds on disk (timestamp[us])
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),  # JSON, shape {"k": <int>}
)

DOCUMENTS = _st(
    ("doc_id", LongType()),
    ("text", StringType()),
    ("lang", StringType()),
    ("source", StringType()),
    ("n_chars", LongType()),
)

EMBEDDINGS = _st(
    ("vec_id", LongType()),
    # 64-dim L2-normalized f32 (FIXTURES.md) — reference uses 384-dim
    # AllMiniLM-L6-v2 output, also L2-normalized (src/main.rs:54).
    ("embedding", ArrayType(FloatType(), containsNull=False)),
    ("label", IntegerType()),
)

TABLES: dict[str, StructType] = {
    "region": REGION,
    "nation": NATION,
    "supplier": SUPPLIER,
    "customer": CUSTOMER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS_RAW,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

EMBEDDING_DIM = 64
