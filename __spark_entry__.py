"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``vector_search_playground_spark``; this module is
a thin adapter.
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_search_playground_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"

_HERE = os.path.dirname(os.path.abspath(__file__))


def _driver_status() -> tuple[set[str], set[str]]:
    """(ever-checked ids, ids whose LATEST driver check failed).

    Round files are read in round order so the newest verdict per id wins:
    an id that failed in r3 but passed in r4 is not re-prioritized."""
    seen: set[str] = set()
    last_ok: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_HERE, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        seen.update(data.keys())
        for qid, row in data.items():
            if not isinstance(row, dict):
                continue
            if row.get("err") == "no_oracle":
                # rows-only by design: the weak check passed iff the
                # query executed (a row count was recorded)
                ok = row.get("spark_rows") is not None
            else:
                ok = (
                    row.get("err") is None
                    and row.get("rows_match") is not False
                    and row.get("hash_match") is not False
                )
            last_ok[qid] = ok
    failed = {q for q, ok in last_ok.items() if not ok}
    return seen, failed


def _prioritized(d: dict) -> dict:
    """Never-driver-checked IDs first, then IDs whose latest driver check
    FAILED (the repaired-bug re-verification), then the stable greens —
    registration order within each group.

    The per-round correctness run covers a bounded number of queries;
    this ordering guarantees every new query eventually gets a driver
    entry AND every fix gets re-judged before the cap can cut it off."""
    seen, failed = _driver_status()
    head = {k: v for k, v in d.items() if k not in seen}
    repair = {k: v for k, v in d.items() if k in failed and k in seen}
    tail = {k: v for k, v in d.items() if k in seen and k not in failed}
    return {**head, **repair, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (exact cosine KNN, the reference's `search` verb) on
    /root/testdata/sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES["knn_search"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    registry.load_all()
    return _prioritized(dict(registry.QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query id (omitted → rows-only check)."""
    registry.load_all()
    return _prioritized(dict(registry.ORACLES))
