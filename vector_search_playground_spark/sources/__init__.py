from vector_search_playground_spark.sources.tables import (
    fan_out,
    load_table,
    normalize_events,
    register_views,
)

__all__ = ["fan_out", "load_table", "normalize_events", "register_views"]
