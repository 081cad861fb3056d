"""Query modules — importing this package registers every query ID.

Import order IS driver-check priority: ``__spark_entry__._prioritized``
lists never-driver-verified IDs first in registration order, and the
driver's per-round correctness run covers a bounded number of queries.
Modules whose unverified IDs have waited longest (the r01/r02-era
relational/surface/udf/vector stragglers) therefore import first;
the round-3 tiers (llm additions, streaming joins, trainprep,
corpusprep, dataselect) queue behind them.
"""

from vector_search_playground_spark.queries import (  # noqa: F401
    relational,
    surface,
    udf_surface,
    vector_search,
)
from vector_search_playground_spark import streaming  # noqa: F401
from vector_search_playground_spark.queries import (  # noqa: F401
    corpusprep,
    dataselect,
    llm_pipeline,
    trainprep,
)
from vector_search_playground_spark.queries import bucketjoin  # noqa: F401
from vector_search_playground_spark.queries import analytics  # noqa: F401
from vector_search_playground_spark.queries import hybrid  # noqa: F401
from vector_search_playground_spark.queries import graph  # noqa: F401
from vector_search_playground_spark.queries import reliability  # noqa: F401
from vector_search_playground_spark.queries import statistics  # noqa: F401
from vector_search_playground_spark.queries import experiments  # noqa: F401
from vector_search_playground_spark.queries import corpusmine  # noqa: F401
from vector_search_playground_spark.queries import sqlparity  # noqa: F401
