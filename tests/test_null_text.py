"""Null-text robustness (round-5 advice): ``split(NULL)`` is NULL, and
``explode_outer`` emits it as a row with a NULL token — every tokenize/
shingle consumer must drop those rows (SQL ``unnest(NULL)`` semantics),
so a null document adds neither token rows nor a phantom doc_id.

Strategy: clone the sf0.001 fixture into a tmp dir with ONE extra
null-text document row appended, run the tokenize-family queries against
both dirs, and assert identical results.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vector_search_playground_spark import registry

TOKENIZE_QUERIES = [
    "text_stats",
    "text_quality",
    "tfidf_topterms",
    "quality_gopher",
    "dsir_weights",
    "ngram_topk",
    # r13: the paragraph splitter shares the explode_outer null guard
    "dedup_paragraph",
    # r14: both compose the same splitter (boilerplate via one hash-agg,
    # dup-fraction via the pair relation) — a null doc must not add a
    # phantom doc_id row to either scorecard
    "boilerplate_paragraphs",
    "doc_dup_fraction",
]


@pytest.fixture(scope="module")
def sf_with_null_doc(sf_smoke, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_nulldoc")
    for name in os.listdir(sf_smoke):
        src = os.path.join(sf_smoke, name)
        if name == "documents.parquet":
            t = pq.read_table(src)
            extra = pa.table(
                {
                    "doc_id": pa.array([10_000_000], pa.int64()),
                    "text": pa.array([None], pa.string()),
                    "lang": pa.array(["en"], pa.string()),
                    "source": pa.array(["null-probe"], pa.string()),
                    "n_chars": pa.array([0], pa.int64()),
                }
            )
            merged = pa.concat_tables(
                [t.select(extra.column_names), extra]
            )
            pq.write_table(merged, os.path.join(out, name))
        else:
            shutil.copy(src, os.path.join(out, name))
    return str(out)


@pytest.mark.parametrize("qid", TOKENIZE_QUERIES)
def test_null_doc_is_inert(spark, sf_smoke, sf_with_null_doc, qid):
    registry.load_all()
    q = registry.QUERIES[qid]
    base = q(spark, sf_smoke)
    with_null = q(spark, sf_with_null_doc)
    cols = sorted(base.columns)
    a = sorted(map(tuple, base.select(cols).collect()))
    b = sorted(map(tuple, with_null.select(cols).collect()))
    assert a == b, f"{qid}: null-text doc changed the result"


def test_null_doc_has_no_minhash_signature(spark):
    from pyspark.sql import functions as F

    from vector_search_playground_spark.operators.dedup import (
        minhash_signatures,
        shingle_sets,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, None), (3, "a b c e")],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(shingle_sets(docs), num_hashes=4)
    ids = sorted(r.doc_id for r in sigs.select("doc_id").collect())
    assert ids == [1, 3]
    # and no signature column is null for the surviving docs
    nulls = sigs.where(
        F.greatest(*[F.col(c).isNull().cast("int") for c in sigs.columns]) == 1
    ).count()
    assert nulls == 0
