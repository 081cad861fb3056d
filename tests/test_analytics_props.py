"""Semantic properties of the round-4 operators that their SQL oracles
can't express directly: chunk coverage/overlap, forward-as-of minimality."""

from __future__ import annotations

from pyspark.sql import functions as F

from vector_search_playground_spark.queries import analytics as A
from vector_search_playground_spark.queries.analytics import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)
from vector_search_playground_spark.queries import relational as R
from vector_search_playground_spark.sources import load_table


def test_chunk_documents_covers_every_token(spark, sf_smoke):
    """Window layout invariants, checked per document:
    - chunk 0 starts at token 1; consecutive window starts differ by the
      stride, so every token index is inside ≥1 window (stride < width);
    - total chunk tokens = n_windows·width − overlaps (no token lost);
    - the LAST chunk reaches the document's final token."""
    chunks = A.chunk_documents(spark, sf_smoke)
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_id").alias("max_cid"),
            F.sum("n_tokens").alias("sum_tok"),
            F.max(
                F.col("chunk_id") * CHUNK_STRIDE + F.col("n_tokens")
            ).alias("last_end"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["n_chunks"] == r["max_cid"] + 1, r  # dense chunk ids
        assert r["last_end"] == r["n_tok"], r  # final token covered
        # every window start s_k = 1 + k*stride ≤ n_tok (no empty windows)
        assert (r["n_chunks"] - 1) * CHUNK_STRIDE + 1 <= r["n_tok"], r


def test_join_asof_fwd_is_minimal_following_click(spark, sf_smoke):
    """Brute-force check on the fixture: for every purchase, the joined
    click_us is the MINIMUM same-user click timestamp ≥ purchase_us (None
    when no such click exists)."""
    got = {
        r["event_id"]: r["click_us"]
        for r in R.join_asof_fwd(spark, sf_smoke).collect()
    }
    ev = load_table(spark, sf_smoke, "events").select(
        "event_id", "user_id", "event_type", "ts_us"
    ).collect()
    clicks_by_user: dict[int, list[int]] = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks_by_user.setdefault(r["user_id"], []).append(r["ts_us"])
    checked = 0
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        later = [
            c for c in clicks_by_user.get(r["user_id"], []) if c >= r["ts_us"]
        ]
        want = min(later) if later else None
        assert got[r["event_id"]] == want, (r["event_id"], got[r["event_id"]], want)
        checked += 1
    assert checked > 0
