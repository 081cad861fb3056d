from vector_search_playground_spark.operators.dedup import (
    dedup_near,
    simhash_pairs,
    simhash_signatures,
)
from vector_search_playground_spark.operators.ids import dense_ids
from vector_search_playground_spark.operators.knn import knn, knn_batch
from vector_search_playground_spark.operators.setjoin import jaccard_join
from vector_search_playground_spark.operators.simjoin import sim_join_exact

__all__ = [
    "knn",
    "knn_batch",
    "dedup_near",
    "dense_ids",
    "jaccard_join",
    "sim_join_exact",
    "simhash_signatures",
    "simhash_pairs",
]
