"""r13 oracle prototypes — validate the three designed oracles in DuckDB
at sf0.01 before any Spark code exists (oracles-first, verdict ask #1)."""
import duckdb

SF = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["documents", "embeddings", "lineitem", "orders"]:
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

# ---------- rerank_feature ----------
W_COS, W_JAC, W_LEN = 0.6, 0.3, 0.1
rerank = f"""
WITH qz AS MATERIALIZED (
    SELECT vec_id, {QE.format(col='embedding')} AS qv FROM embeddings
),
q0 AS MATERIALIZED (SELECT qv AS q0v FROM qz WHERE vec_id = 0),
cand AS MATERIALIZED (
    SELECT vec_id,
           ROUND(1 - {QCOS.format(a='qv', b='q0v')}, 6) AS dist_q
    FROM qz, q0 WHERE vec_id <> 0
    ORDER BY dist_q ASC, vec_id ASC LIMIT 50
),
qdoc AS MATERIALIZED (
    SELECT list_distinct(string_split(text, ' ')) AS qt,
           CAST(len(string_split(text, ' ')) AS DOUBLE) AS qn
    FROM documents WHERE doc_id = 0
),
feats AS MATERIALIZED (
    SELECT c.vec_id,
           1 - c.dist_q AS cos_sim,
           floor(CAST(len(list_intersect(list_distinct(string_split(d.text, ' ')), q.qt)) AS DOUBLE)
                 / (len(list_distinct(string_split(d.text, ' '))) + len(q.qt)
                    - len(list_intersect(list_distinct(string_split(d.text, ' ')), q.qt)))
                 * 1e6 + 0.5) / 1e6 AS tok_jaccard,
           floor(ln(CAST(len(string_split(d.text, ' ')) AS DOUBLE) / q.qn) * 1e6 + 0.5) / 1e6
             AS len_logratio
    FROM cand c JOIN documents d ON d.doc_id = c.vec_id, qdoc q
),
scored AS MATERIALIZED (
    SELECT vec_id, cos_sim, tok_jaccard, len_logratio,
           floor(({W_COS} * cos_sim + {W_JAC} * tok_jaccard + {W_LEN} * len_logratio)
                 * 1e6 + 0.5) / 1e6 AS score
    FROM feats
)
SELECT CAST(row_number() OVER (ORDER BY floor(score * 1e6 + 0.5) DESC, vec_id) AS INT) AS rank,
       vec_id, cos_sim, tok_jaccard, len_logratio, score
FROM scored
ORDER BY floor(score * 1e6 + 0.5) DESC, vec_id
LIMIT 10
"""
r = con.sql(rerank).fetchall()
print("rerank_feature rows:", len(r))
for row in r:
    print(" ", row)

# ---------- dedup_paragraph ----------
PARA = 32
dedup = f"""
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
para AS (
    SELECT doc_id * 1000 + CAST(s - 1 AS BIGINT) // {PARA} AS para_id,
           w[s:s + {PARA} - 1] AS pw
    FROM tok, unnest(range(1, len(w) + 1, {PARA})) AS t(s)
),
sh AS (
    SELECT para_id,
           list_distinct(
             CASE WHEN len(pw) >= 3
                  THEN list_transform(range(1, len(pw) - 1),
                                      i -> array_to_string(pw[i:i+2], ' '))
                  ELSE pw END) AS s
    FROM para
)
SELECT a.para_id AS keep_id, b.para_id AS dup_id,
       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM sh a JOIN sh b ON a.para_id < b.para_id
WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
ORDER BY keep_id, dup_id
"""
d = con.sql(dedup).fetchall()
print("dedup_paragraph pairs:", len(d))
for row in d[:5]:
    print(" ", row)

# ---------- graph_label_propagation ----------
EDGES = """
        SELECT DISTINCT o.o_custkey AS a,
                        1000000 + l.l_suppkey AS b
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_quantity >= 49 AND l.l_extendedprice > 90000
"""
ITERS = 8
its = []
for i in range(1, ITERS + 1):
    its.append(f"""
l{i} AS MATERIALIZED (
    SELECT p.node, least(p.label, m.nb) AS label
    FROM l{i - 1} p
    JOIN (SELECT e.dst AS node, min(q.label) AS nb
          FROM sym e JOIN l{i - 1} q ON e.src = q.node
          GROUP BY e.dst) m
    ON p.node = m.node
)""")
lp = f"""
WITH edges AS MATERIALIZED ({EDGES}),
sym AS MATERIALIZED (
    SELECT a AS src, b AS dst FROM edges
    UNION
    SELECT b AS src, a AS dst FROM edges
),
l0 AS MATERIALIZED (
    SELECT DISTINCT src AS node, src AS label FROM sym
),{",".join(its)}
SELECT node, label,
       CAST(count(*) OVER (PARTITION BY label) AS BIGINT) AS comm_size
FROM l{ITERS}
ORDER BY node
"""
g = con.sql(lp).fetchall()
print("graph_label_propagation rows:", len(g))
print(" distinct labels:", len({x[1] for x in g}))
for row in g[:5]:
    print(" ", row)
