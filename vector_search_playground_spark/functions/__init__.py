from vector_search_playground_spark.functions.embed import (
    embed_batch,
    embed_query,
)
from vector_search_playground_spark.functions.multimodal import (
    extract_features,
    synthesize_media,
)
from vector_search_playground_spark.functions.vector import (
    cosine_distance,
    cosine_similarity,
    dot_product,
    inner_product_distance,
    l2_distance,
    l2_norm,
)

__all__ = [
    "cosine_distance",
    "cosine_similarity",
    "dot_product",
    "inner_product_distance",
    "l2_distance",
    "l2_norm",
    "embed_batch",
    "embed_query",
    "extract_features",
    "synthesize_media",
]
