"""Oracle-differential tests: every registered query vs its DuckDB oracle
at sf0.01 — the driver's correctness gate, run locally."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_harness import compare, duck_connect

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_correct):
    con = duck_connect(sf_correct)
    yield con
    con.close()


@pytest.mark.parametrize("qid", sorted(ORACLES))
def test_oracle_match(spark, sf_correct, duck, qid):
    df = QUERIES[qid](spark, sf_correct)
    compare(df, duck, ORACLES[qid], qid)


@pytest.mark.parametrize("qid", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, sf_correct, qid):
    """Queries without an oracle still must run and return a stable schema."""
    df = QUERIES[qid](spark, sf_correct)
    assert df.columns, qid
    assert df.count() >= 0, qid


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "text", "dist"}
