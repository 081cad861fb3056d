"""Second-SF oracle differential: every SQL-oracled query vs DuckDB at
sf0.1 (the driver's BENCH scale), in addition to the sf0.01 run in
``test_oracle_diff.py``.

Why a second SF (round-4 verdict item 6): the round-3 events
timestamp-unit bug and the round-4 ``k_anonymity`` vacuity were both
SCALE-VISIBLE — invisible at one fixture size, obvious at another. One
extra SF catches empty-result and unit bugs cheaply.

The vacuity guard is the point: ``compare`` hash-matches the empty set,
which certifies nothing, so any query that returns ZERO rows at sf0.1
must be explicitly allowlisted here with a reason — an unexplained empty
is a failure.

Opt out with ``SPARK_GRAFT_SKIP_SF01=1`` for fast local iteration.
"""

from __future__ import annotations

import os

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connect

SF_BENCH = "/root/testdata/sf0.1"

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SKIP_SF01") == "1",
    reason="sf0.1 oracle sweep disabled via SPARK_GRAFT_SKIP_SF01",
)

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

# Queries allowed to be empty at sf0.1, each with the reason the empty
# set is the CORRECT answer there (not a vacuous certification).
ALLOWED_EMPTY: dict[str, str] = {}

# Oracles too slow to replay at sf0.1 (the POINT of the blocked Spark
# form is that the brute-force SQL doesn't survive this scale); these
# stay sf0.01-certified plus property-tested.
SLOW_ORACLE: dict[str, str] = {
    "join_fuzzy_blocked": (
        "brute-force levenshtein θ-join takes ~78 s in DuckDB at sf0.1; "
        "exactness is covered by the sf0.01 oracle match and the "
        "random-string brute-force property test"
    ),
}


@pytest.fixture(scope="module")
def duck01():
    con = duck_connect(SF_BENCH)
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_match_sf01(spark, duck01, qid):
    if qid in SLOW_ORACLE:
        pytest.skip(SLOW_ORACLE[qid])
    df = QUERIES[qid](spark, SF_BENCH)
    compare(df, duck01, ORACLES[qid], qid)
    if qid not in ALLOWED_EMPTY:
        n = df.count()
        assert n > 0, (
            f"{qid}: empty result at sf0.1 — the oracle hash-matches the "
            "empty set vacuously; allowlist with a reason if this is the "
            "genuinely correct answer"
        )
