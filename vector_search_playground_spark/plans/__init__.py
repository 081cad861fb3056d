"""Physical access-path plans the optimizer can't derive on its own:
materialized vector indexes (IVF partition pruning, LSH bucket probing)."""

from vector_search_playground_spark.plans.ivf import (
    build_ivf,
    search_ivf,
)
from vector_search_playground_spark.plans.lsh import (
    build_lsh,
    hyperplanes,
    search_lsh,
)

__all__ = ["build_ivf", "search_ivf", "build_lsh", "hyperplanes", "search_lsh"]
