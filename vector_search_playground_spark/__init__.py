"""vector_search_playground_spark — a PySpark-native analytics engine.

A brand-new, idiomatic-Spark engine with the query and data-processing
capabilities of the ``aqora-io/vector_search_playground`` reference
(Rust + Postgres/pgvector semantic-search playground; see SURVEY.md), plus
the relational / vector / streaming surface its stack exposes, re-expressed
as Catalyst logical plans over Parquet.

Design stance (SURVEY.md §1.2, §4):
- DataFrame/SQL API everywhere; RDDs nowhere.
- Vector distance kernels are Catalyst higher-order-function expressions
  (``zip_with`` + ``aggregate``) — JVM codegen, no Python on the hot path.
- Explicit StructType schemas (never infer on the hot path).
- AQE + broadcast-join thresholds tuned for the star schema.
"""

from vector_search_playground_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
