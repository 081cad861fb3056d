"""Registry wiring query implementations to their DuckDB oracle SQL.

Every operator in SURVEY.md §2 registers here via the ``@query`` decorator;
``__spark_entry__.py`` re-exports the two dicts to the driver. Queries with
``oracle=None`` are non-SQL-expressible (embedding inference, approximate
algorithms, streaming semantics) and get the driver's rows-only check.

Hash-stability rules (SURVEY.md §5, FIXTURES.md oracle notes) enforced by
convention in every registered pair:
- alias every computed column identically on both sides;
- round float outputs (ROUND_* constants below) on both sides;
- any LIMIT carries a deterministic tiebreak key in the ORDER BY;
- timestamps are emitted as formatted strings or epoch integers, never raw
  (Spark µs vs DuckDB ns precision).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}

# Rounding discipline: distances/ratios to 6 dp (f32-dot noise ~1e-7);
# big double sums to 2 dp (summation-order noise ~1e-7 absolute).
ROUND_DIST = 6
ROUND_MONEY = 2
ROUND_AVG = 6


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, duckdb_oracle_sql) pair under a SURVEY §2 ID."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query id {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from vector_search_playground_spark import queries as _q  # noqa: F401
