"""Local replica of the driver's oracle-differential comparison.

Runs a registered Spark query and its DuckDB oracle SQL over the same
parquet fixtures and compares row count, column names, and an
order-insensitive multiset of normalized values — the same three checks the
driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math
import os
from decimal import Decimal

import duckdb

TABLE_NAMES = (
    "region",
    "nation",
    "supplier",
    "customer",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:  # -0.0 == 0.0 but repr differs
            return 0.0
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    return v


def spark_result(df):
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for r in df.collect()]
    return cols, sorted(rows, key=repr)


def duck_result(con, sql: str):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm_cell(r[i]) for i in order) for r in cur.fetchall()]
    return sorted(cols), sorted(rows, key=repr)


def compare(df, con, sql: str, qid: str = "?"):
    scols, srows = spark_result(df)
    dcols, drows = duck_result(con, sql)
    assert scols == dcols, f"{qid}: column mismatch spark={scols} duck={dcols}"
    assert len(srows) == len(drows), (
        f"{qid}: row count spark={len(srows)} duck={len(drows)}"
    )
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{qid}: first differing row #{i}: spark={a!r} duck={b!r}"
