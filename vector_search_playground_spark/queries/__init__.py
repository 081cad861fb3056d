"""Query modules — importing this package registers every query ID."""

from vector_search_playground_spark import streaming  # noqa: F401
from vector_search_playground_spark.queries import (  # noqa: F401
    corpusprep,
    llm_pipeline,
    relational,
    surface,
    trainprep,
    udf_surface,
    vector_search,
)
