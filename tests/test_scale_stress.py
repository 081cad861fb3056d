"""Measured scale-up stress for the dedup/ANN tier (round-7 VERDICT #7).

The 100×-scale story for the banded/bucketed operators has so far been
argued from plan shape; this suite adds a measured datapoint: a
deterministic 10× blow-up of the sf0.01 documents/embeddings fixtures
(each doc replicated with a one-token perturbation — realistic near-dup
clusters of 10; each vector replicated under fresh ids — 10× bucket
density) and a one-shot run of the five nominated queries at both
scales, asserting

1. wall time grows ≲ linearly: t(10×)/t(1×) far below the ~100× a
   quadratic pair space would show (generous bound — single runs flap
   2-3× in this sandbox, so the assertion separates O(n) from O(n²),
   not 10.0 from 12.0), and
2. the physical plan keeps its shape: no new Exchange appears, and the
   IVF scan keeps its PartitionFilters pruning at the bigger scale.

Index builds (IVF lists, PQ codebooks) run untimed in the fixture —
they are the one-off cost the search queries amortize, same split the
bench's build/query categories draw.
"""

from __future__ import annotations

import os
import shutil
import time

import duckdb
import pytest

from vector_search_playground_spark import registry

_TABLES = (
    "region nation supplier customer part orders lineitem events "
    "documents embeddings"
).split()

_QUERIES = ["dedup_ngram", "dedup_near", "semdedup", "ivf_search", "pq_search"]

# single-run wall ratios flap with sandbox noise; a quadratic operator
# at 10× data shows ~100×, linear shows ~10× — the bound sits between
_MAX_RATIO = 35.0


def _scratch_root() -> str:
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(here, ".scratch", "scale_stress")


def _build_dirs() -> tuple[str, str]:
    base = "/root/testdata/sf0.01"
    root = _scratch_root()
    x1, x10 = os.path.join(root, "x1"), os.path.join(root, "x10")
    if os.path.exists(os.path.join(x10, "_READY")):
        return x1, x10
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(x1)
    os.makedirs(x10)
    for t in _TABLES:
        shutil.copy(
            os.path.join(base, f"{t}.parquet"), os.path.join(x1, f"{t}.parquet")
        )
        if t not in ("documents", "embeddings"):
            shutil.copy(
                os.path.join(base, f"{t}.parquet"),
                os.path.join(x10, f"{t}.parquet"),
            )
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT r.k * 10000000 + d.doc_id AS doc_id,
                   CASE WHEN r.k = 0 THEN d.text
                        ELSE d.text || ' r' || r.k END AS text,
                   d.lang, d.source, d.n_chars
            FROM read_parquet('{base}/documents.parquet') d
            CROSS JOIN (SELECT unnest(range(10)) AS k) r
        ) TO '{x10}/documents.parquet' (FORMAT parquet)
        """
    )
    con.execute(
        f"""
        COPY (
            SELECT r.k * 10000000 + e.vec_id AS vec_id,
                   e.embedding, e.label
            FROM read_parquet('{base}/embeddings.parquet') e
            CROSS JOIN (SELECT unnest(range(10)) AS k) r
        ) TO '{x10}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.close()
    with open(os.path.join(x10, "_READY"), "w") as fh:
        fh.write("ok")
    return x1, x10


@pytest.fixture(scope="module")
def scale_dirs(spark):
    registry.load_all()
    x1, x10 = _build_dirs()
    # one-off index builds, untimed (the cost ivf/pq_search amortize)
    for d in (x1, x10):
        registry.QUERIES["index_build_ivf"](spark, d).collect()
        registry.QUERIES["index_build_pq"](spark, d).collect()
    return x1, x10


def _timed_run(spark, qid: str, sf_dir: str) -> tuple[float, str]:
    fn = registry.QUERIES[qid]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    plan = df._jdf.queryExecution().executedPlan().toString()
    spark.catalog.clearCache()
    return dt, plan


@pytest.mark.parametrize("qid", _QUERIES)
def test_tenfold_scaleup_stays_linear_and_keeps_plan_shape(
    spark, scale_dirs, qid
):
    x1, x10 = scale_dirs
    _timed_run(spark, qid, x1)  # warm code paths / sidecar caches
    t1, plan1 = _timed_run(spark, qid, x1)
    t10, plan10 = _timed_run(spark, qid, x10)
    ratio = t10 / max(t1, 1e-6)
    print(f"# scale_stress {qid}: x1={t1:.2f}s x10={t10:.2f}s "
          f"ratio={ratio:.1f}")
    assert ratio < _MAX_RATIO, (
        f"{qid}: 10x data cost {ratio:.1f}x wall time — superlinear"
    )
    assert plan10.count("Exchange") <= plan1.count("Exchange"), (
        f"{qid}: scale-up introduced a new shuffle"
    )
    if qid == "ivf_search":
        assert "PartitionFilters" in plan10, (
            "IVF listing-time pruning lost at 10x scale"
        )
