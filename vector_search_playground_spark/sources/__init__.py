from vector_search_playground_spark.sources.tables import (
    atomic_build,
    fan_out,
    load_table,
    normalize_events,
    register_views,
)

__all__ = [
    "atomic_build",
    "fan_out",
    "load_table",
    "normalize_events",
    "register_views",
]
