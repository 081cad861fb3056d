from vector_search_playground_spark.operators.dedup import dedup_near
from vector_search_playground_spark.operators.knn import knn, knn_batch

__all__ = ["knn", "knn_batch", "dedup_near"]
