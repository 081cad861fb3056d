"""The engine must give identical answers under ANY driver session
configuration — the driver contract hands queries an arbitrary
SparkSession, not one built by our factory. Session timezone is the
live hazard: TIMESTAMP_LTZ→NTZ casts render instants in the session
zone, so a normalization that goes through an LTZ intermediate shifts
every event wall-clock when the driver runs in, say, America/New_York
(caught live in round 4: retention_cohorts/time_bucket_gapfill/
rollup_hypertable all drifted -5 h)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connect

# The events-`ts`-consuming batch queries — exactly the set that shifted
# before normalize_events switched to pure NTZ arithmetic.
TZ_SENSITIVE = [
    "retention_cohorts",
    "time_bucket_gapfill",
    "rollup_hypertable",
    "fn_date",
    # round-5 time-touching additions: hour-truncations, date casts, and
    # sequence ordering must all survive a foreign session zone
    "sequence_match",
    "attribution_lasttouch",
    "rollup_merge_partials",
    "gapfill_interpolate",
    "time_weighted_avg",
    "agg_first_last",
    "pareto_frontier",
]


@pytest.mark.parametrize("qid", TZ_SENSITIVE)
def test_oracle_match_under_foreign_session_timezone(
    spark, sf_correct, qid
):
    """Flip the session timezone (a runtime conf) to a non-UTC zone and
    re-run the oracle comparison: results must not move."""
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        con = duck_connect(sf_correct)
        try:
            compare(queries[qid](spark, sf_correct), con, oracles[qid], qid)
        finally:
            con.close()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
