"""IVF (inverted-file) vector index: k-means partitioning + pruned search.

SURVEY §2 Tier C ``index_build_ivf``. The reference has **no** index — its
migration creates only the table (`/root/reference/migration/src/
m20250414_131949_create_search.rs:22-37`), every search is a brute-force
scan. This is the Spark-native answer to "what pgvector's IVFFlat would
have given you", built from public primitives:

- **Build**: MLlib KMeans (seeded) assigns each vector a ``centroid_id``;
  the corpus is written as parquet **partitioned by centroid_id**. At
  100 TB that's a one-off shuffle-on-write; the centroid table itself is
  k rows of model metadata.
- **Search**: rank the k centroids against the query (k is tiny — driver
  arithmetic, the same place the model object lives), take the ``nprobe``
  nearest, and scan ONLY those partitions — Spark's partition pruning
  turns the predicate ``centroid_id IN (...)`` into "don't even list the
  other directories". Cost drops from O(N) to O(N·nprobe/k) with recall
  controlled by nprobe; exact ranking inside the probed cells reuses the
  codegen'd cosine kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_playground_spark.functions.vector import cosine_distance


def build_ivf(
    emb: DataFrame,
    path: str,
    *,
    k: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    overwrite: bool = False,
) -> list[list[float]]:
    """Fit k-means, write the corpus partitioned by centroid_id, return
    the centroid list (model metadata — k rows, lives with the driver).

    ``overwrite=False`` (cache-build semantics): if ``path`` already
    holds a complete artifact, a racing rebuild is discarded — callers
    MUST key ``path`` by corpus fingerprint so "already built" implies
    "same content". ``overwrite=True`` (rebuild semantics): the new
    index atomically replaces whatever sat at ``path``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn(
        "__features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=k, seed=seed, maxIter=20, featuresCol="__features"
    ).fit(feats)
    assigned = (
        model.transform(feats)
        .withColumnRenamed("prediction", "centroid_id")
        .drop("__features")
    )
    from vector_search_playground_spark.sources import atomic_build

    atomic_build(
        lambda p: assigned.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(p),
        path,
        overwrite=overwrite,
    )
    return [c.tolist() for c in model.clusterCenters()]


def _rank_centroids(centroids: list[list[float]], query: list[float]) -> list[int]:
    """Centroid ids ordered by cosine distance to the query — k values of
    model metadata, plain Python (this is not a data-scale operation)."""

    def cos_dist(c: list[float]) -> float:
        dot = sum(x * y for x, y in zip(c, query))
        nc = sum(x * x for x in c) ** 0.5
        nq = sum(y * y for y in query) ** 0.5
        if nc == 0 or nq == 0:
            return float("nan")
        return 1.0 - dot / (nc * nq)

    return sorted(range(len(centroids)), key=lambda i: (cos_dist(centroids[i]), i))


def search_ivf(
    spark: SparkSession,
    path: str,
    centroids: list[list[float]],
    query: list[float],
    *,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k by cosine distance scanning only the nprobe nearest cells.

    The ``isin`` predicate on the partition column prunes at file-listing
    time (verify with ``explain``: PartitionFilters, not PushedFilters);
    ranking is the same TakeOrderedAndProject shape as exact knn.
    """
    probe = _rank_centroids(centroids, query)[:nprobe]
    qlit = F.array(*[F.lit(float(x)) for x in query])
    cell = spark.read.parquet(path).where(F.col("centroid_id").isin(probe))
    return (
        cell.withColumn("dist", cosine_distance(F.col(vec_col), qlit))
        .orderBy(F.asc("dist"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("dist", 6).alias("dist"))
    )


def cell_radii(
    spark: SparkSession,
    path: str,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
) -> list[float]:
    """Max ANGULAR distance (radians) from each centroid to its members —
    the per-cell covering radius that makes radius search exactly
    complete via the triangle inequality on angles.

    One linear pass over the index (16-row broadcast join + hash-agg);
    at scale this is computed once at build time and cached next to the
    centroid metadata, exactly like the caller does here.
    """
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "centroid_id int, centroid array<double>",
    )
    idx = spark.read.parquet(path)
    cos_sim = F.lit(1.0) - cosine_distance(F.col(vec_col), F.col("centroid"))
    ang = F.acos(F.least(F.lit(1.0), F.greatest(F.lit(-1.0), cos_sim)))
    rows = (
        idx.join(F.broadcast(cdf), "centroid_id")
        .groupBy("centroid_id")
        .agg(F.max(ang).alias("r"))
        .collect()
    )
    radii = [0.0] * len(centroids)
    for row in rows:
        radii[row["centroid_id"]] = float(row["r"])
    return radii


def range_search_ivf(
    spark: SparkSession,
    path: str,
    centroids: list[list[float]],
    radii: list[float],
    query: list[float],
    threshold: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """ALL vectors with cosine distance < threshold (pgvector's
    index-assisted ``WHERE embedding <=> q < t`` form), scanning only the
    cells the triangle inequality cannot rule out.

    Completeness is EXACT, not probabilistic: for any member x of cell c,
    θ(q,x) ≥ θ(q,c) − r_c, so a cell with θ(q,c) − r_c > θ_t can hold no
    hit — pruning never drops a qualifying vector (ε-slack absorbs float
    noise and the 6-dp threshold rounding). That is why this query gets a
    full value-hash oracle (the brute-force scan), unlike the top-k
    searches whose nprobe cut is approximate by construction. On
    well-clustered corpora the prune skips most cells (property-tested on
    a planted clustered set); on structureless uniform fixtures cell
    radii approach 90° and the prune honestly keeps everything — same
    answer, full scan.
    """
    import math

    def angle_to_query(c: list[float]) -> float:
        dot = sum(x * y for x, y in zip(c, query))
        nc = math.sqrt(sum(x * x for x in c))
        nq = math.sqrt(sum(y * y for y in query))
        if nc == 0 or nq == 0:
            return math.pi
        return math.acos(max(-1.0, min(1.0, dot / (nc * nq))))

    # threshold + ε: the oracle filters on the ROUNDED distance, so a
    # true distance up to half an ulp-of-6dp above t can still qualify
    theta_t = math.acos(max(-1.0, min(1.0, 1.0 - (threshold + 1e-6))))
    survivors = [
        i
        for i, c in enumerate(centroids)
        if angle_to_query(c) - radii[i] <= theta_t + 1e-9
    ]
    cell = spark.read.parquet(path).where(F.col("centroid_id").isin(survivors))
    qlit = F.array(*[F.lit(float(x)) for x in query])
    return (
        cell.withColumn(
            "dist", F.round(cosine_distance(F.col(vec_col), qlit), round_to)
        )
        .where(F.col("dist") < threshold)
        .select(id_col, "dist")
    )
