"""Multi-format source/sink roundtrips: a format change must never change
values — including timestamp microseconds through the text formats."""

from __future__ import annotations

import os

import pytest

from vector_search_playground_spark.sources import load_table
from vector_search_playground_spark.sources.formats import (
    read_table,
    write_table,
)

SCRATCH = "/root/repo/.scratch/formats"


def _roundtrip(spark, df, fmt):
    path = os.path.join(SCRATCH, f"rt_{fmt}")
    write_table(df, path, fmt=fmt)
    return read_table(spark, path, df.schema, fmt=fmt)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_orders_roundtrip_exact(spark, sf_smoke, fmt):
    """orders carries BIGINT keys, doubles, strings, and a timestamp —
    every format must return the identical row multiset."""
    orders = load_table(spark, sf_smoke, "orders")
    got = _roundtrip(spark, orders, fmt)
    assert got.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b, fmt


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_documents_text_column_survives_text_formats(spark, sf_smoke, fmt):
    """Free-text columns (quoting/escaping territory for CSV) roundtrip
    byte-identically."""
    docs = load_table(spark, sf_smoke, "documents")
    got = _roundtrip(spark, docs, fmt)
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in got.collect()}
    assert a == b, fmt


def test_unsupported_format_is_loud(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError):
        write_table(docs, os.path.join(SCRATCH, "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_table(spark, SCRATCH, docs.schema, fmt="xml")
