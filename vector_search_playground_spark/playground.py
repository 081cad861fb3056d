"""The reference's public API, Spark-native: create / count / search.

Mirrors the three CLI verbs of `/root/reference/src/main.rs:24-50`:
- ``create(content)``  — embed + append one row      (`src/main.rs:72-80`)
- ``count()``          — total rows                  (`src/main.rs:81-84`)
- ``search(query, t)`` — cosine KNN, top-10 contents (`src/main.rs:85-96`)

Storage is an append-only Parquet directory instead of a Postgres table;
ids are assigned with ``monotonically_increasing_id`` offset by the current
max (unique and monotone like Postgres serial, not gap-free — Postgres
serials aren't gap-free either, e.g. on rollback).
"""

from __future__ import annotations

import json
import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from vector_search_playground_spark.functions.embed import embed_batch, embed_query
from vector_search_playground_spark.operators.knn import knn

SEARCH_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("content", StringType()),
        StructField("vector", ArrayType(FloatType())),
    ]
)

DEFAULT_THRESHOLD = 0.6  # reference CLI default, src/main.rs:20-21
DEFAULT_K = 10  # hardcoded in the reference,  src/main.rs:91


class Playground:
    """A vector-search table backed by a Parquet path."""

    def __init__(self, spark: SparkSession, path: str, model: str = "hash64"):
        self.spark = spark
        self.path = path
        self.model = model

    def _table(self) -> DataFrame:
        try:
            return self.spark.read.schema(SEARCH_SCHEMA).parquet(self.path)
        except AnalysisException:  # path does not exist yet → empty table
            return self.spark.createDataFrame([], SEARCH_SCHEMA)

    def _counter_path(self) -> str:
        return os.path.join(self.path, "_id_counter.json")

    def create(self, *contents: str) -> int:
        """Embed and append rows (batched, unlike the reference's 1-at-a-time).

        Ids are ``base + monotonically_increasing_id()`` where ``base`` comes
        from a tiny persisted counter sidecar — the Spark analogue of
        Postgres's serial counter. Unique and monotone across batches, not
        gap-free (neither is Postgres serial, e.g. on rollback). Unlike a
        ``max(id)`` probe, the counter read is O(1) metadata, never a table
        scan — at 100 TB a per-append full scan would dominate insert cost.

        Crash-safety: the sidecar is written twice per append, both times
        via temp-file + ``os.replace`` (no torn reads). A ``pending`` marker
        lands BEFORE the parquet append; the final counter (pending
        cleared) lands after. The happy path therefore never scans the
        table, while any interrupted append — and a missing/corrupt sidecar
        over a non-empty table (data predating the counter, deleted
        sidecar) — is detected on the next call and recovered with a
        one-off ``max(id)`` probe. Uniqueness never depends on the sidecar
        surviving.
        """
        base = self._next_id_base()
        self._write_counter(base, pending=True)
        df = self.spark.createDataFrame(
            [(c,) for c in contents], StructType([StructField("content", StringType())])
        )
        out = (
            embed_batch(df, "content", "vector", model=self.model)
            .withColumn("id", F.monotonically_increasing_id() + F.lit(base))
            .select("id", "content", "vector")
        )
        out.write.mode("append").parquet(self.path)
        # max over the just-written batch only (batch-scale, not table-scale)
        hi = out.agg(F.max("id")).first()[0]
        self._write_counter(int(hi) + 1, pending=False)
        return len(contents)

    def _write_counter(self, nxt: int, *, pending: bool) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self._counter_path()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"next": nxt, "pending": pending}, f)
        os.replace(tmp, self._counter_path())

    def _next_id_base(self) -> int:
        """Next id to assign. O(1) sidecar read on the happy path; a
        ``max(id)`` probe of the table only when the sidecar is missing,
        corrupt, or flagged pending (an append started but its counter
        update never landed — the probe must floor the counter so the
        just-written id range is never reused)."""
        counter = None
        pending = True
        try:
            with open(self._counter_path()) as f:
                state = json.load(f)
            counter = int(state["next"])
            pending = bool(state.get("pending", False))
        except (OSError, ValueError, KeyError, TypeError):
            counter = None
        if counter is not None and not pending:
            return counter
        hi = self._table().agg(F.max("id")).first()[0]
        floor = int(hi) + 1 if hi is not None else 0
        return floor if counter is None else max(counter, floor)

    def count(self) -> int:
        return self._table().count()

    def search(
        self,
        query: str,
        threshold: float = DEFAULT_THRESHOLD,
        k: int = DEFAULT_K,
    ) -> DataFrame:
        qv = embed_query(query, model=self.model)
        # hash-embedder outputs are L2-normalized → the 1-aggregate
        # normalized kernel (1 − dot) instead of the 3-aggregate general one.
        return knn(
            self._table(),
            qv,
            vector_col="vector",
            metric="cosine_norm",
            threshold=threshold,
            k=k,
            tiebreak="id",
        ).select("content", "dist")

    def search_hybrid(self, query: str, k: int = DEFAULT_K,
                      rrf_k0: int = 60) -> DataFrame:
        """Lexical ⊕ vector hybrid search with reciprocal-rank fusion —
        the facade verb over the ``hybrid_search_rrf`` machinery
        (queries/hybrid.py): the query's tokens rank rows by match count
        (tf of query terms), the embedding ranks by cosine, and
        RRF(k0) fuses the two bounded top-2k lists. Returns
        (content, rrf) descending."""
        from pyspark.sql import Window

        table = self._table()
        depth = 2 * k
        toks = [t for t in query.split(" ") if t]
        vec = (
            knn(
                table,
                embed_query(query, model=self.model),
                vector_col="vector",
                metric="cosine_norm",
                threshold=None,
                k=depth,
                tiebreak="id",
            )
            .select("id", "dist")
            .withColumn(
                "r_vec",
                F.row_number().over(
                    Window.orderBy(F.asc("dist"), F.asc("id"))
                ),
            )
            .select("id", "r_vec")
        )
        hits = F.size(
            F.filter(F.split("content", " "), lambda w: w.isin(*toks))
        )
        lex = (
            table.select("id", hits.alias("n_hits"))
            .where(F.col("n_hits") > 0)
            .orderBy(F.desc("n_hits"), F.asc("id"))
            .limit(depth)
            .withColumn(
                "r_lex",
                F.row_number().over(
                    Window.orderBy(F.desc("n_hits"), F.asc("id"))
                ),
            )
            .select("id", "r_lex")
        )
        fused = vec.join(lex, "id", "full_outer").select(
            "id",
            (
                F.coalesce(1.0 / (rrf_k0 + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (rrf_k0 + F.col("r_vec")), F.lit(0.0))
            ).alias("rrf"),
        )
        return (
            fused.join(table.select("id", "content"), "id")
            .orderBy(F.desc("rrf"), F.asc("id"))
            .limit(k)
            .select("content", F.round("rrf", 6).alias("rrf"))
        )

    def dedup(self, jaccard_threshold: float = 0.7) -> DataFrame:
        """Near-duplicate groups over the stored contents — the
        training-data verb on the facade: MinHash-LSH banding + exact
        Jaccard verify + min-id components (operators/dedup.py).
        Returns (id, rep_id); keep rows where id == rep_id to
        deduplicate the table."""
        from vector_search_playground_spark.operators.dedup import dedup_near

        labels = dedup_near(
            self._table().select(
                F.col("id").alias("doc_id"), F.col("content").alias("text")
            ),
            jaccard_threshold=jaccard_threshold,
        )
        return labels.select(
            F.col("doc_id").alias("id"), F.col("rep_id")
        )
