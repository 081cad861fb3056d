from vector_search_playground_spark.sources.tables import (
    load_table,
    normalize_events,
    register_views,
)

__all__ = ["load_table", "normalize_events", "register_views"]
