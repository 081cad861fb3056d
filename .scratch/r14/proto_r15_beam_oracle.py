"""r15 design de-risk: full DuckDB oracle prototype for the proposed
`knn_graph_search` (beam search over the knn_graph edge list), validated
at sf0.01 against an independent Python simulation — the oracles-first
discipline applied one round early so the r15 landing is a composition
of an already-validated recurrence."""
import math

import duckdb
import numpy as np

SF = "/root/testdata/sf0.01"
K, W, H, TOPK = 5, 16, 6, 10

con = duckdb.connect()
con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")

QE = (
    "list_transform(CAST({col} AS DOUBLE[]), "
    "x -> CAST(round(x * 127.0 / GREATEST("
    "list_max(list_transform(CAST({col} AS DOUBLE[]), y -> abs(y))), "
    "1e-30)) AS BIGINT))"
)

parts = [
    "WITH qz AS MATERIALIZED (",
    f"    SELECT vec_id, {QE.format(col='embedding')} AS qv FROM embeddings",
    "),",
    "qn AS MATERIALIZED (",
    "    SELECT vec_id, qv,",
    "           sqrt(list_inner_product(CAST(qv AS DOUBLE[]),"
    " CAST(qv AS DOUBLE[]))) AS nrm FROM qz",
    "),",
    # the persisted knn_graph edge relation (the r14-certified build)
    "pairs AS MATERIALIZED (",
    "    SELECT a.vec_id AS src, b.vec_id AS dst,",
    "           ROUND(1 - list_inner_product(CAST(a.qv AS DOUBLE[]),"
    " CAST(b.qv AS DOUBLE[]))",
    "                     / GREATEST(a.nrm * b.nrm, 1e-30), 6) AS dist",
    "    FROM qn a JOIN qn b ON a.vec_id <> b.vec_id",
    "),",
    "graph AS MATERIALIZED (",
    "    SELECT src, dst FROM (",
    "        SELECT src, dst, row_number() OVER (PARTITION BY src",
    "            ORDER BY floor(dist * 1e6 + 0.5) ASC, dst ASC) AS rank",
    "        FROM pairs) WHERE rank <= " + str(K),
    "),",
    # dist of every node to the query (vec 0), micro-keyed
    "dq AS MATERIALIZED (",
    "    SELECT b.vec_id,",
    "           CAST(floor(ROUND(1 - list_inner_product("
    "CAST(q.qv AS DOUBLE[]), CAST(b.qv AS DOUBLE[]))",
    "                 / GREATEST(q.nrm * b.nrm, 1e-30), 6) * 1e6 + 0.5)"
    " AS BIGINT) AS micro,",
    "           ROUND(1 - list_inner_product(CAST(q.qv AS DOUBLE[]),"
    " CAST(b.qv AS DOUBLE[]))",
    "                 / GREATEST(q.nrm * b.nrm, 1e-30), 6) AS dist",
    "    FROM qn q, qn b WHERE q.vec_id = 0 AND b.vec_id <> 0",
    "),",
    "v0 AS MATERIALIZED (SELECT max(vec_id) AS vec_id FROM qz),",
    "f0 AS MATERIALIZED (SELECT vec_id FROM v0),",
]
for i in range(1, H + 1):
    p = i - 1
    parts += [
        f"v{i} AS MATERIALIZED (",
        f"    SELECT vec_id FROM v{p}",
        "    UNION",
        f"    SELECT g.dst AS vec_id FROM graph g JOIN f{p} f"
        " ON g.src = f.vec_id WHERE g.dst <> 0",
        "),",
        f"f{i} AS MATERIALIZED (",
        f"    SELECT v.vec_id FROM v{i} v JOIN dq d USING (vec_id)",
        f"    ORDER BY d.micro ASC, v.vec_id ASC LIMIT {W}",
        "),",
    ]
parts += [
    "exact AS MATERIALIZED (",
    f"    SELECT vec_id FROM dq ORDER BY micro ASC, vec_id ASC"
    f" LIMIT {TOPK}",
    "),",
    "found AS MATERIALIZED (",
    "    SELECT CAST(row_number() OVER (ORDER BY d.micro ASC,"
    " v.vec_id ASC) AS INT) AS rank,",
    "           v.vec_id, d.dist",
    f"    FROM v{H} v JOIN dq d USING (vec_id)",
    f"    ORDER BY d.micro ASC, v.vec_id ASC LIMIT {TOPK}",
    ")",
    "SELECT f.rank, f.vec_id, f.dist,",
    f"       (SELECT count(*) FROM v{H}) AS n_visited,",
    "       ROUND((SELECT count(*) FROM found"
    " JOIN exact USING (vec_id)) / " + f"{TOPK}.0, 6) AS recall_at_k",
    "FROM found f ORDER BY f.rank",
]
sql = "\n".join(parts)
rows = con.sql(sql).fetchall()
print("oracle rows:")
for r in rows:
    print(" ", r)

# --- independent Python simulation (same semantics, no SQL) -------------------
raw = con.sql(
    f"SELECT vec_id, {QE.format(col='embedding')} FROM embeddings"
).fetchall()
codes = {v: np.array(c, float) for v, c in raw}
nrm = {v: math.sqrt(c @ c) for v, c in codes.items()}


def dist(a, b):
    return round(
        1.0 - float(codes[a] @ codes[b]) / max(nrm[a] * nrm[b], 1e-30), 6
    )


N = sorted(codes)
edges = {
    s: [
        t
        for _, t in sorted(
            (math.floor(dist(s, t) * 1e6 + 0.5), t) for t in N if t != s
        )[:K]
    ]
    for s in N
}
q = 0
entry = max(N)


def key(v):
    return (math.floor(dist(q, v) * 1e6 + 0.5), v)


visited = {entry}
frontier = [entry]
for _ in range(H):
    visited |= {t for f in frontier for t in edges[f]} - {q}
    frontier = sorted(visited, key=key)[:W]
found = sorted(visited - {q}, key=key)[:TOPK]
exact = sorted((v for v in N if v != q), key=key)[:TOPK]
rec = round(len(set(found) & set(exact)) / TOPK, 6)
sim = [
    (r + 1, v, dist(q, v), len(visited - {q}), rec)
    for r, v in enumerate(found)
]
print("simulation rows:")
for r in sim:
    print(" ", r)
assert [tuple(r) for r in rows] == sim, "oracle != simulation"
print("ORACLE == SIMULATION: OK  (visited", len(visited - {q}),
      "recall", rec, ")")
