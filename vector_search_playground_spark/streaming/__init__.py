"""Structured Streaming tier — importing registers the stream_* queries."""

from vector_search_playground_spark.streaming import jobs  # noqa: F401
