"""Build-time guard for the driver's hash canonicalization contract.

The driver certifies a query by comparing its Spark result against the
DuckDB oracle after canonicalizing every cell (sort columns by name →
normalize values → order-insensitive multiset hash). Rounds 4-6 each
lost a driver slot to a SCHEMA-level mistake that this suite now catches
locally at build time, before a query ever reaches the driver:

- list/map/struct/binary cells cannot be hashed portably (pandas cannot
  hash list cells; DuckDB BLOBs don't round-trip) — sequence outputs
  must be string-serialized, joined with a delimiter that is unambiguous
  against negative ids (comma, never dash);
- float32 columns carry ~1e-7 noise, far above the canonicalizer's 9-dp
  rounding, so oracled queries must emit float64;
- engine-native ROUND ties differ (Spark exact HALF_UP vs DuckDB float
  multiply; Python round() is banker's) — the shared discipline is
  ``floor(x*10^k + 0.5)/10^k`` spelled identically on both engines.

The value-level discipline is enforced by the full oracle replay
(test_oracle_diff / test_oracle_sf01); this suite pins the schema-level
contract for ALL registered queries plus the normalizer's edge cases.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from tests.oracle_harness import _norm_cell
from vector_search_playground_spark import registry

# rows-only queries may keep rich types (the driver only counts rows);
# ORACLED queries go through the value hash and must stay hashable.
_HASH_BANNED = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)


def _flat_types(schema: T.StructType):
    for f in schema.fields:
        yield f.name, f.dataType


@pytest.fixture(scope="module")
def all_schemas(spark, sf_smoke):
    registry.load_all()
    schemas = {}
    errors = {}
    for qid, fn in sorted(registry.QUERIES.items()):
        try:
            schemas[qid] = fn(spark, sf_smoke).schema
        except Exception as exc:  # pragma: no cover - report per-id below
            errors[qid] = repr(exc)
    assert not errors, f"queries failed to build at smoke SF: {errors}"
    return schemas


def test_oracled_queries_emit_hashable_flat_schemas(all_schemas):
    bad = {}
    for qid, schema in all_schemas.items():
        if qid not in registry.ORACLES:
            continue
        for name, dtype in _flat_types(schema):
            if isinstance(dtype, _HASH_BANNED):
                bad.setdefault(qid, []).append(
                    f"{name}: {dtype.simpleString()} (serialize to string "
                    "— comma-joined, never dash)"
                )
    assert not bad, f"unhashable columns in oracled queries: {bad}"


def test_oracled_queries_never_emit_float32(all_schemas):
    bad = {
        qid: [
            f"{name}: float32"
            for name, dtype in _flat_types(schema)
            if isinstance(dtype, T.FloatType)
        ]
        for qid, schema in all_schemas.items()
        if qid in registry.ORACLES
    }
    bad = {k: v for k, v in bad.items() if v}
    assert not bad, (
        "float32 noise (~1e-7) exceeds the canonicalizer's 9-dp rounding; "
        f"cast to double: {bad}"
    )


def test_every_query_has_distinct_column_names(all_schemas):
    """The canonicalizer sorts columns BY NAME before hashing — duplicate
    names make the cell ordering undefined on one engine."""
    bad = {
        qid: [f.name for f in schema.fields]
        for qid, schema in all_schemas.items()
        if len({f.name for f in schema.fields}) != len(schema.fields)
    }
    assert not bad, f"duplicate column names: {bad}"


def test_registry_oracles_reference_registered_queries():
    registry.load_all()
    orphans = set(registry.ORACLES) - set(registry.QUERIES)
    assert not orphans, f"oracles without queries: {orphans}"


# --- normalizer edge cases (the documented cell-level contract) -------------


def test_norm_cell_float_discipline():
    assert _norm_cell(-0.0) == 0.0 and repr(_norm_cell(-0.0)) == "0.0"
    assert _norm_cell(float("nan")) == "NaN"
    assert _norm_cell(1.23456789012) == round(1.23456789012, 9)
    assert _norm_cell(True) == 1 and _norm_cell(False) == 0
    assert _norm_cell(Decimal("2.5")) == 2.5
    assert _norm_cell(None) is None


def test_norm_cell_temporal_discipline():
    naive = dt.datetime(2024, 3, 1, 12, 30, 15, 123456)
    aware = naive.replace(tzinfo=dt.timezone.utc)
    assert _norm_cell(naive) == _norm_cell(aware)
    assert _norm_cell(dt.date(2024, 3, 1)) == "2024-03-01"


def test_norm_cell_sequence_discipline():
    # the LOCAL harness tolerates lists (tuple-izing them); the DRIVER's
    # pandas-based hasher does not — which is why the schema tests above
    # ban them from oracled outputs outright
    assert _norm_cell([1, [2.0, None]]) == (1, (2.0, None))
    assert _norm_cell({"b": 1, "a": None}) == (("a", None), ("b", 1))
