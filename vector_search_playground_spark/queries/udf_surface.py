"""UDF surface tier (SURVEY §2): one demo per user-function flavor Spark
offers. The reference has no UDF system — every expression is a sea-orm /
SQL builtin (`/root/reference/src/main.rs:86-91`) — so this tier is
purely north-star: the escape hatches a pipeline needs when builtins run
out, each demonstrated on fixture data with a DuckDB oracle.

Perf ranking, restated per the 100 TB posture (each docstring says where
its flavor sits):
1. builtin Column expressions — codegen'd, always first choice;
2. pandas_udf / applyInPandas — Arrow-batched, the acceptable Python path;
3. row-at-a-time ``udf`` — serialization per row, registered here ONLY as
   surface proof on a 25-row dim table, never on a fact table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from vector_search_playground_spark.registry import query
from vector_search_playground_spark.sources import load_table


@query(
    "udf_scalar",
    oracle="""
    SELECT n_nationkey,
           lower(n_name) || '-' || CAST(n_regionkey AS VARCHAR) AS label
    FROM nation
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — the SLOW path (one Python round-trip
    per row). Demonstrated on the 25-row nation dim only; on a fact table
    this exact logic belongs in builtins (see the oracle: it IS
    SQL-expressible, which is the point of the ranking)."""

    @F.udf(returnType=StringType())
    def label(name: str, regionkey: int) -> str:
        return f"{name.lower()}-{regionkey}"

    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey", label("n_name", "n_regionkey").alias("label")
    )


@query(
    "udf_pandas",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
)
def udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF: Arrow ships columnar batches, the
    body is one NumPy expression over the whole batch — 10-100× the
    row-at-a-time path. This is the floor for Python on a fact table."""

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    # Round with the builtin at the product's full precision (2dp price ×
    # 2dp discount → exact 4dp): pandas rounds half-to-even, Spark rounds
    # the shortest-decimal repr, DuckDB the binary value — at a digit where
    # exact halves occur they all disagree, so don't round there.
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            net_price("l_extendedprice", "l_discount"), 4
        ).alias("net_price"),
    )


@query(
    "udf_grouped_map",
    oracle="""
    SELECT o_orderkey, o_orderstatus, order_year,
           ROUND(o_totalprice / sum(o_totalprice)
                   OVER (PARTITION BY o_orderstatus, order_year),
                 9) AS price_share
    FROM (SELECT o_orderkey, o_orderstatus, year(o_orderdate) AS order_year,
                 o_totalprice
          FROM orders)
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: each (status, year) cohort of orders
    arrives as one pandas frame; the body computes each order's share of
    the cohort total. Shuffles on the group key like any aggregation.

    Group-size discipline: a cohort must fit in executor memory, and the
    per-group Python invocation costs ~1 ms — so the key should make FEW,
    LARGE groups (~20 cohorts of ~7k rows here). Keying this by customer
    (15k groups of ~10 rows at sf0.1) measured 18 s of pure invocation
    overhead for the same arithmetic; per-entity math at high cardinality
    belongs in windows, not grouped-map UDFs.
    """

    def share(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        pdf["price_share"] = pdf["o_totalprice"] / pdf["o_totalprice"].sum()
        return pdf[["o_orderkey", "o_orderstatus", "order_year", "price_share"]]

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.year("o_orderdate").alias("order_year"),
        "o_totalprice",
    )
    # round outside the UDF: pandas rounds half-to-even, the oracle
    # half-away-from-zero (see udf_pandas)
    return (
        o.groupBy("o_orderstatus", "order_year")
        .applyInPandas(
            share,
            "o_orderkey bigint, o_orderstatus string, order_year int,"
            " price_share double",
        )
        .withColumn("price_share", F.round("price_share", 9))
    )


@query(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           ROUND(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6)
             AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (the UDAF shape): quantity-weighted
    mean price per return flag. The whole group's columns arrive as
    Series; Spark still does the shuffle/partial machinery around it."""

    @F.pandas_udf(DoubleType())
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wavg("l_extendedprice", "l_quantity"), 6).alias("wavg_price")
    )


@query(
    "udf_table",
    oracle="""
    SELECT doc_id, token, length(token) AS token_len
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents WHERE doc_id < 50
    )
    """,
)
def udf_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → many output rows, here a
    tokenizer exploding each document into (token, token_len) rows via a
    LATERAL join. The table-function shape for expansion logic too
    procedural for ``explode`` — still Python-per-row, so at scale
    prefer builtin generators where expressible (the oracle shows this
    one is)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, token_len: int")
    class Tokenize:
        def eval(self, text: str):
            for tok in text.split(" "):
                yield tok, len(tok)

    spark.udtf.register("tokenize_udtf", Tokenize)
    docs = load_table(spark, sf_dir, "documents")
    docs.where(F.col("doc_id") < 50).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.token, t.token_len
        FROM udtf_docs d, LATERAL tokenize_udtf(d.text) t
        """
    )


@query(
    "udf_map_arrow",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
               AS charged
    FROM lineitem
    """,
)
def udf_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` — the zero-copy floor of the Python escape hatch:
    batches arrive as raw ``pyarrow.RecordBatch`` (no pandas conversion,
    no index materialization), the body is Arrow compute kernels, and the
    result goes back as RecordBatches. The flavor to reach for when the
    Python work is itself Arrow-native (feature libs, Arrow-backed
    models): pandas' Series overhead disappears while keeping the same
    vectorized contract. Arithmetic matches the SQL oracle exactly —
    compute kernels are IEEE doubles, same as codegen. Rounded at 6 dp,
    the product's full decimal precision (2dp × 2dp × 2dp), where no
    exact .5 ties exist — Arrow rounds half-to-even, DuckDB half-away,
    and at 4 dp they disagree on real fixture rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def charge(batches):
        for b in batches:
            price = b.column("l_extendedprice")
            disc = b.column("l_discount")
            tax = b.column("l_tax")
            charged = pc.round(
                pc.multiply(
                    pc.multiply(price, pc.subtract(pa.scalar(1.0), disc)),
                    pc.add(pa.scalar(1.0), tax),
                ),
                ndigits=6,
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), b.column("l_linenumber"), charged],
                names=["l_orderkey", "l_linenumber", "charged"],
            )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax"
    )
    return li.mapInArrow(
        charge, "l_orderkey long, l_linenumber int, charged double"
    )
