"""r14 oracle prototypes — validate the three designed oracles in DuckDB
at sf0.01 before any Spark code exists (oracles-first, r13 verdict ask #1)."""
import duckdb

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

QE = (
    "list_transform(CAST({col} AS DOUBLE[]), "
    "x -> CAST(round(x * 127.0 / GREATEST("
    "list_max(list_transform(CAST({col} AS DOUBLE[]), y -> abs(y))), "
    "1e-30)) AS BIGINT))"
)
QCOS = (
    "list_inner_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / GREATEST("
    "sqrt(list_inner_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_inner_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))),"
    " 1e-30)"
)

# ---------- knn_graph ----------
KNN_GRAPH_K = 5
knn_graph = f"""
WITH qz AS MATERIALIZED (
    SELECT vec_id, {QE.format(col='embedding')} AS qv FROM embeddings
),
pairs AS MATERIALIZED (
    SELECT a.vec_id AS src, b.vec_id AS dst,
           ROUND(1 - {QCOS.format(a='a.qv', b='b.qv')}, 6) AS dist
    FROM qz a JOIN qz b ON a.vec_id <> b.vec_id
),
ranked AS (
    SELECT src, dst, dist,
           row_number() OVER (
               PARTITION BY src
               ORDER BY floor(dist * 1e6 + 0.5) ASC, dst ASC) AS rank
    FROM pairs
)
SELECT src, CAST(rank AS INT) AS rank, dst, dist
FROM ranked WHERE rank <= {KNN_GRAPH_K}
"""
r = con.sql(knn_graph).fetchall()
print("knn_graph rows:", len(r), "(expect 500*5 = 2500)")
by_src = {}
for src, rank, dst, dist in r:
    by_src.setdefault(src, []).append((rank, dst, dist))
assert all(len(v) == KNN_GRAPH_K for v in by_src.values())
assert len(by_src) == 500
# monotone dist within every src
for src, v in by_src.items():
    v.sort()
    ds = [d for _, _, d in v]
    assert ds == sorted(ds), (src, v)
    assert all(dst != src for _, dst, _ in v)
print("  sample src=0:", by_src[0])

# ---------- boilerplate_paragraphs ----------
PARA = 32
STRIDE = 1_000_000
boiler = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
para AS (
    SELECT doc_id,
           doc_id * {STRIDE} + CAST(s - 1 AS BIGINT) // {PARA} AS para_id,
           array_to_string(w[s:s + {PARA} - 1], ' ') AS ptext
    FROM tok, unnest(range(1, len(w) + 1, {PARA})) AS t(s)
)
SELECT md5(ptext) AS ptext_md5,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_paras,
       min(para_id) AS min_para_id
FROM para
GROUP BY ptext
HAVING count(DISTINCT doc_id) >= 2
"""
b = con.sql(boiler).fetchall()
print("boilerplate_paragraphs rows:", len(b))
from collections import Counter

print("  n_docs histogram:", sorted(Counter(x[1] for x in b).items()))
for row in sorted(b)[:3]:
    print(" ", row)

# ---------- doc_dup_fraction ----------
dup_frac = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
para AS (
    SELECT doc_id * {STRIDE} + CAST(s - 1 AS BIGINT) // {PARA} AS para_id,
           w[s:s + {PARA} - 1] AS pw
    FROM tok, unnest(range(1, len(w) + 1, {PARA})) AS t(s)
),
sh AS MATERIALIZED (
    SELECT para_id,
           list_distinct(
             CASE WHEN len(pw) >= 3
                  THEN list_transform(
                         range(1, len(pw) - 1),
                         i -> array_to_string(pw[i:i+2], ' '))
                  ELSE pw END) AS s
    FROM para
),
pairs AS MATERIALIZED (
    SELECT a.para_id AS ka, b.para_id AS kb
    FROM sh a JOIN sh b ON a.para_id < b.para_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
      AND a.para_id // {STRIDE} <> b.para_id // {STRIDE}
),
dup AS (
    SELECT ka AS pid FROM pairs UNION SELECT kb AS pid FROM pairs
)
SELECT p.para_id // {STRIDE} AS doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(count(d.pid) AS BIGINT) AS n_dup_paras,
       floor(CAST(count(d.pid) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             * 1e6 + 0.5) / 1e6 AS dup_fraction
FROM para p LEFT JOIN dup d ON p.para_id = d.pid
GROUP BY p.para_id // {STRIDE}
"""
f = con.sql(dup_frac).fetchall()
print("doc_dup_fraction rows:", len(f), "(expect 500 docs... or fewer if empty docs)")
nz = [x for x in f if x[2] > 0]
print("  docs with cross-doc dup paragraphs:", len(nz))
for row in sorted(nz)[:5]:
    print(" ", row)
tot = sum(x[1] for x in f)
print("  total paragraphs:", tot)
