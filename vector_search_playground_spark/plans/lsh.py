"""Random-hyperplane (SimHash-family) LSH index over embeddings.

SURVEY §2 Tier C ``index_build_lsh``. Public construction (Charikar 2002
random hyperplane rounding): ``nbits`` fixed random hyperplanes; a
vector's bucket is the sign-bit pattern of its projections. Cosine-close
vectors agree on each bit with probability 1 − θ/π, so near-duplicates
land in the same or a 1-bit-adjacent bucket.

Spark shape:
- **Build**: the hyperplanes are a seeded constant (driver metadata,
  broadcast as literals into the plan); bucket assignment is a pure map
  of codegen'd dot products — no shuffle, no Python.
- **Search**: hash the query, probe its bucket plus all 1-bit flips
  (multiprobe), exact-rank only inside the probed buckets. The bucket
  predicate is a plain column filter, so with the index materialized
  partitioned-by-bucket it prunes at listing time exactly like IVF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vector_search_playground_spark.functions.vector import (
    cosine_distance,
    dot_product,
)

DEFAULT_NBITS = 8


def hyperplanes(dim: int, nbits: int = DEFAULT_NBITS, seed: int = 42):
    """Seeded Gaussian hyperplanes — deterministic index metadata."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.randn(nbits, dim)


def bucket_expr(vec: Column, planes) -> Column:
    """Bit-packed sign pattern of the vector's projections (one BIGINT)."""
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        plit = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            dot_product(vec, plit) >= 0, F.lit(1 << b)
        ).otherwise(F.lit(0)).cast("long")
    return bucket


def build_lsh(
    emb: DataFrame,
    planes,
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus + ``bucket`` column — the materializable hash table."""
    return emb.withColumn("bucket", bucket_expr(F.col(vec_col), planes))


def _query_buckets(planes, query: list[float]) -> list[int]:
    """Query bucket plus every 1-bit flip (multiprobe set)."""
    base = 0
    for b, plane in enumerate(planes):
        if sum(p * q for p, q in zip(plane, query)) >= 0:
            base |= 1 << b
    return [base] + [base ^ (1 << b) for b in range(len(planes))]


def search_lsh_partitioned(
    spark,
    path: str,
    planes,
    query: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Steady-state search against a bucket-partitioned on-disk index.

    Same multiprobe semantics as :func:`search_lsh`, but the bucket
    predicate hits a parquet partition column, so pruning happens at
    file-listing time (PartitionFilters) — only the probed cells' files
    are ever opened, exactly the IVF pattern (plans/ivf.py::search_ivf)."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    probed = spark.read.parquet(path).where(
        F.col("bucket").isin(_query_buckets(planes, query))
    )
    return (
        probed.withColumn("dist", cosine_distance(F.col(vec_col), qlit))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("dist", 6).alias("dist"))
    )


def search_lsh(
    indexed: DataFrame,
    planes,
    query: list[float],
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k among the multiprobed buckets — approximate by construction;
    recall is a property-test concern (planted near-dups must surface),
    never an oracle hash."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    probed = indexed.where(F.col("bucket").isin(_query_buckets(planes, query)))
    return (
        probed.withColumn("dist", cosine_distance(F.col(vec_col), qlit))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("dist", 6).alias("dist"))
    )
