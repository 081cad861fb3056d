"""Query modules — importing this package registers every query ID."""

from vector_search_playground_spark.queries import vector_search  # noqa: F401
