"""r15 design de-risk, part 2: full DuckDB oracle prototypes for the
proposed `corpus_dup_profile` and `boilerplate_strip`, each validated
at sf0.01 against an independent Python recompute."""
import hashlib
import math

import duckdb

SF = "/root/testdata/sf0.01"
PARA, S = 32, 1_000_000

con = duckdb.connect()
con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")

# ---------- corpus_dup_profile ----------
profile_sql = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
para AS (
    SELECT doc_id*{S} + CAST(s-1 AS BIGINT)//{PARA} AS para_id,
           w[s:s+{PARA}-1] AS pw
    FROM tok, unnest(range(1, len(w)+1, {PARA})) AS t(s)
),
sh AS MATERIALIZED (
    SELECT para_id, list_distinct(CASE WHEN len(pw) >= 3
        THEN list_transform(range(1, len(pw)-1),
                            i -> array_to_string(pw[i:i+2],' '))
        ELSE pw END) AS s FROM para
),
pairs AS MATERIALIZED (
    SELECT a.para_id ka, b.para_id kb
    FROM sh a JOIN sh b ON a.para_id < b.para_id
    WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
          / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= 0.8
      AND a.para_id//{S} <> b.para_id//{S}
),
dup AS (SELECT ka pid FROM pairs UNION SELECT kb FROM pairs),
per AS (
    SELECT p.para_id//{S} doc_id, count(*) n, count(d.pid) nd,
           floor(CAST(count(d.pid) AS DOUBLE)/CAST(count(*) AS DOUBLE)
                 *1e6+0.5)/1e6 f
    FROM para p LEFT JOIN dup d ON p.para_id = d.pid
    GROUP BY p.para_id//{S}
)
SELECT LEAST(CAST(floor(f*10) AS INT), 9) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n) AS BIGINT) AS n_paras,
       CAST(sum(nd) AS BIGINT) AS n_dup_paras,
       floor(CAST(sum(nd) AS DOUBLE)/CAST(sum(n) AS DOUBLE)*1e6+0.5)/1e6
         AS decile_dup_rate
FROM per GROUP BY 1 ORDER BY 1
"""
got = con.sql(profile_sql).fetchall()
print("corpus_dup_profile oracle:")
for r in got:
    print(" ", r)

# Python recompute from first principles
docs = con.sql("SELECT doc_id, text FROM documents").fetchall()
paras = {}  # pid -> (doc, shingle set)
for doc_id, text in docs:
    if text is None:
        continue
    w = text.split(" ")
    for idx, st in enumerate(range(0, len(w), PARA)):
        pw = w[st : st + PARA]
        sh = (
            {" ".join(pw[i : i + 3]) for i in range(len(pw) - 2)}
            if len(pw) >= 3
            else set(pw)
        )
        paras[doc_id * S + idx] = (doc_id, sh)
pids = sorted(paras)
dup = set()
for i, a in enumerate(pids):
    da, sa = paras[a]
    for b in pids[i + 1 :]:
        db, sb = paras[b]
        if da == db:
            continue
        inter = len(sa & sb)
        if inter and inter / (len(sa) + len(sb) - inter) >= 0.8:
            dup.add(a)
            dup.add(b)
per = {}
for pid, (d, _) in paras.items():
    n, nd = per.get(d, (0, 0))
    per[d] = (n + 1, nd + (1 in (1,) and (1 if pid in dup else 0)))
buckets = {}
for d, (n, nd) in per.items():
    f = math.floor(nd / n * 1e6 + 0.5) / 1e6
    dec = min(int(math.floor(f * 10)), 9)
    c = buckets.get(dec, [0, 0, 0])
    c[0] += 1
    c[1] += n
    c[2] += nd
    buckets[dec] = c
expect = [
    (dec, c[0], c[1], c[2], math.floor(c[2] / c[1] * 1e6 + 0.5) / 1e6)
    for dec, c in sorted(buckets.items())
]
print("python recompute:")
for r in expect:
    print(" ", r)
assert [tuple(r) for r in got] == expect, "profile oracle != python"
print("CORPUS_DUP_PROFILE ORACLE == PYTHON: OK")

# ---------- boilerplate_strip ----------
strip_sql = f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
para AS (
    SELECT doc_id,
           CAST(s-1 AS BIGINT)//{PARA} AS idx,
           array_to_string(w[s:s+{PARA}-1], ' ') AS ptext
    FROM tok, unnest(range(1, len(w)+1, {PARA})) AS t(s)
),
boiler AS MATERIALIZED (
    SELECT ptext FROM para GROUP BY ptext
    HAVING count(DISTINCT doc_id) >= 2
),
kept AS (
    SELECT p.doc_id, p.idx, p.ptext
    FROM para p ANTI JOIN boiler b ON p.ptext = b.ptext
)
SELECT p.doc_id,
       CAST(count(k.ptext) AS BIGINT) AS n_kept,
       CAST(count(*) - count(k.ptext) AS BIGINT) AS n_stripped,
       md5(coalesce(string_agg(k.ptext, ' ' ORDER BY k.idx), ''))
         AS stripped_md5
FROM para p
LEFT JOIN kept k ON p.doc_id = k.doc_id AND p.idx = k.idx
GROUP BY p.doc_id
"""
got2 = con.sql(strip_sql).fetchall()
print("boilerplate_strip oracle rows:", len(got2))

boiler = set()
by_text = {}
for pid, (d, _) in paras.items():
    pass
texts = {}
for doc_id, text in docs:
    if text is None:
        continue
    w = text.split(" ")
    for idx, st in enumerate(range(0, len(w), PARA)):
        pt = " ".join(w[st : st + PARA])
        texts.setdefault(pt, set()).add(doc_id)
boiler = {pt for pt, ds in texts.items() if len(ds) >= 2}
expect2 = set()
for doc_id, text in docs:
    if text is None:
        continue
    w = text.split(" ")
    kept, total = [], 0
    for st in range(0, len(w), PARA):
        pt = " ".join(w[st : st + PARA])
        total += 1
        if pt not in boiler:
            kept.append(pt)
    expect2.add(
        (
            doc_id,
            len(kept),
            total - len(kept),
            hashlib.md5(" ".join(kept).encode("utf-8")).hexdigest(),
        )
    )
assert {tuple(r) for r in got2} == expect2, "strip oracle != python"
n_any = sum(1 for r in got2 if r[2] > 0)
print("BOILERPLATE_STRIP ORACLE == PYTHON: OK "
      f"({n_any} docs stripped >=1 paragraph)")
