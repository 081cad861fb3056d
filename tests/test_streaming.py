"""Streaming semantics that need multiple micro-batches (SURVEY §5):
watermark late-data drop, cross-batch stateful accumulation, cross-batch
dedup. The hash-checkable single-drain behavior is covered by the
stream_* oracle entries; these tests drive a live query over a growing
file source with ``processAllAvailable`` between appends."""

from __future__ import annotations

import os
import shutil
from uuid import uuid4

import pytest
from pyspark.sql import functions as F

from vector_search_playground_spark import schemas
from vector_search_playground_spark.sources import normalize_events

SCRATCH = "/root/repo/.scratch/streaming_tests"

HOUR_US = 3_600_000_000
BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def _write_batch(spark, src, rows):
    """Append one file of events-shaped rows: (event_id, ts_us offset hours)."""
    data = [
        (eid, BASE_US + int(h * HOUR_US), 1, "click", 1.0, "{}")
        for eid, h in rows
    ]
    df = spark.createDataFrame(data, schemas.EVENTS_RAW)
    df.coalesce(1).write.mode("append").parquet(src)


def _stream(spark, src):
    raw = (
        spark.readStream.schema(schemas.EVENTS_RAW)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return normalize_events(raw).withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture()
def scratch():
    path = os.path.join(SCRATCH, uuid4().hex[:8])
    os.makedirs(path)
    yield path
    shutil.rmtree(path, ignore_errors=True)


def test_watermark_drops_late(spark, scratch):
    """A row older than the watermark must not resurrect its window."""
    src = os.path.join(scratch, "src")
    ckpt = os.path.join(scratch, "ckpt")
    _write_batch(spark, src, [(1, 0.2), (2, 2.5)])  # window 0 + advance

    ev = _stream(spark, src)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("h"), "n")
    )
    qname = f"wm_{uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark is now 02:30-10min=02:20 > 01:00 — window 0 is closed.
        # late row into window 0 + a fresh row to advance the watermark:
        _write_batch(spark, src, [(3, 0.4), (4, 5.0)])
        q.processAllAvailable()
        _write_batch(spark, src, [(5, 8.0)])  # flush window [05:00,06:00)
        q.processAllAvailable()
        rows = {r["h"]: r["n"] for r in spark.table(qname).collect()}
    finally:
        q.stop()
    # window 00:00 was finalized with exactly the on-time row; the late
    # arrival (event 3) must have been dropped, not re-emitted.
    assert rows.get("00:00") == 1, rows
    assert spark.table(qname).groupBy("h").count().where("count > 1").count() == 0


def test_stateful_accumulates_across_batches(spark, scratch):
    """applyInPandasWithState must carry (count, sum) across micro-batches."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = os.path.join(scratch, "src")
    ckpt = os.path.join(scratch, "ckpt")
    _write_batch(spark, src, [(1, 0.0), (2, 1.0)])

    def running(key, pdfs, state: GroupState):
        import pandas as pd

        cnt = state.get[0] if state.exists else 0
        for pdf in pdfs:
            cnt += len(pdf)
        state.update((cnt,))
        yield pd.DataFrame({"user_id": [key[0]], "n": [cnt]})

    ev = _stream(spark, src)
    out = ev.groupBy("user_id").applyInPandasWithState(
        running,
        outputStructType="user_id long, n long",
        stateStructType="cnt long",
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    qname = f"st_{uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(3, 2.0)])
        q.processAllAvailable()
        ns = sorted(r["n"] for r in spark.table(qname).collect())
    finally:
        q.stop()
    # batch 1 emits 2, batch 2 emits 3 — state survived the batch boundary
    assert ns == [2, 3], ns


def test_dedup_across_batches(spark, scratch):
    """dropDuplicatesWithinWatermark must suppress a duplicate id arriving
    in a later micro-batch while it is still inside the watermark."""
    src = os.path.join(scratch, "src")
    ckpt = os.path.join(scratch, "ckpt")
    _write_batch(spark, src, [(1, 0.0), (2, 0.1)])

    ev = _stream(spark, src)
    dd = ev.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    ).select("event_id")
    qname = f"dd_{uuid4().hex[:8]}"
    q = (
        dd.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [(1, 0.2), (3, 0.3)])  # id 1 again
        q.processAllAvailable()
        ids = sorted(r["event_id"] for r in spark.table(qname).collect())
    finally:
        q.stop()
    assert ids == [1, 2, 3], ids


def test_session_timezone_restored_after_drain(spark, sf_smoke):
    """read_events_stream pins UTC for window alignment; the drain helper
    must hand the caller's timezone back afterwards (ADVICE r02: a reader
    function must not permanently mutate shared session config)."""
    from vector_search_playground_spark.streaming import jobs

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        jobs.stream_tumble(spark, sf_smoke).collect()
        assert (
            spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_update_sink_reduces_to_final_totals_across_batches(
    spark, sf_smoke, tmp_path, monkeypatch
):
    """stream_stateful over a two-file source drained one file per
    micro-batch: the update-mode sink then holds one row per (user,
    batch), and the reduction must return exactly the final total per
    user — correctness must not depend on the drain fitting in one
    micro-batch (ADVICE r02)."""
    import shutil as _sh

    from vector_search_playground_spark.sources import load_table
    from vector_search_playground_spark.streaming import jobs

    d = tmp_path / "ev"
    d.mkdir()
    src = os.path.join(sf_smoke, "events.parquet")
    _sh.copy(src, d / "events_a.parquet")
    _sh.copy(src, d / "events_b.parquet")
    monkeypatch.setattr(jobs, "_MAX_FILES_PER_TRIGGER", 1)

    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in jobs.stream_stateful(spark, str(d)).collect()
    }
    want = {
        r["user_id"]: (2 * r["n"], round(2 * r["s"], 2))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for u in want:
        assert got[u][0] == want[u][0], f"user {u} count"
        assert abs(got[u][1] - want[u][1]) < 0.05, f"user {u} sum"


def test_watermark_job_green_across_batches(
    spark, sf_smoke, tmp_path, monkeypatch
):
    """stream_watermark over a TIME-SPLIT two-file source drained one file
    per micro-batch: early half first, late half second (mtime-ordered —
    the file source processes oldest-first). No row is late (the second
    batch is entirely newer than the first's watermark), but the boundary
    hour's window receives updates in BOTH batches, so the update-mode
    sink holds two rows for it and the max/max_by reduction must pick the
    final one. Result must equal the one-shot batch group-by (VERDICT r03
    item 8)."""
    from vector_search_playground_spark.sources import load_table
    from vector_search_playground_spark.streaming import jobs

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    ev = load_table(spark, sf_smoke, "events")
    d = tmp_path / "ev"
    d.mkdir()
    # flat files (the stream source's pathGlobFilter matches leaf names),
    # time-split in half, early file mtime'd older so it drains first
    tbl = pq.read_table(os.path.join(sf_smoke, "events.parquet"))
    mid = pc.quantile(tbl["ts"].cast("int64"), 0.5)[0].as_py()
    early, late = str(d / "events_a.parquet"), str(d / "events_b.parquet")
    keep = pc.less(tbl["ts"].cast("int64"), mid)
    pq.write_table(tbl.filter(keep), early)
    pq.write_table(tbl.filter(pc.invert(keep)), late)
    now = os.stat(late).st_mtime
    os.utime(early, (now - 60, now - 60))
    monkeypatch.setattr(jobs, "_MAX_FILES_PER_TRIGGER", 1)

    got = {
        r["hour"]: (r["n_events"], r["avg_value"])
        for r in jobs.stream_watermark(spark, str(d)).collect()
    }
    want = {
        r["hour"]: (r["n_events"], r["avg_value"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss")
            .alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("avg_value"),
        )
        .collect()
    }
    assert got == want


def test_kafka_shaped_parse_equals_file_source_schema(spark, sf_smoke):
    """parse_kafka_events on a batch frame in Kafka wire format must yield
    the exact columns the file source yields — the aggregations downstream
    are source-agnostic by construction."""
    from vector_search_playground_spark.streaming import jobs

    file_src = jobs.read_events_stream(spark, sf_smoke)
    # undo the UTC pin the source call stashed (no drain follows)
    if jobs._SAVED_TZ:
        prev = jobs._SAVED_TZ.pop()
        if prev is not None:
            spark.conf.set("spark.sql.session.timeZone", prev)

    wire = spark.createDataFrame(
        [
            (
                b"1",
                b'{"event_id": 1, "ts": "2026-01-01T00:00:00Z",'
                b' "user_id": 7, "event_type": "click", "value": 1.5}',
            )
        ],
        "key binary, value binary",
    )
    parsed = jobs.parse_kafka_events(wire)
    assert dict(parsed.dtypes) == dict(file_src.dtypes), (
        parsed.dtypes, file_src.dtypes,
    )
    row = parsed.first()
    assert row["event_id"] == 1 and row["user_id"] == 7
    assert row["value"] == 1.5 and row["event_type"] == "click"
    assert row["ts_us"] == row["ts"].timestamp() * 0 + 1767225600 * 10**6


def test_kafka_shaped_stream_feeds_same_aggregation(spark):
    """The windowed aggregation from stream_tumble runs unchanged on the
    Kafka-shaped rate source: start it, let a few micro-batches land, and
    check the sink has the tumble output schema with sane values."""
    import time as _t

    from vector_search_playground_spark.streaming import jobs

    ev = jobs.read_events_kafka_shaped(spark, rows_per_second=200)
    agg = ev.groupBy(
        F.window("ts", "1 minute").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    out = agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("minute"),
        "event_type",
        "n_events",
        "sum_value",
    )
    qname = "s_kafka_shaped"
    ckpt = os.path.join(jobs.SCRATCH, f"ckpt_{qname}")
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (
        out.writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        deadline = _t.time() + 30
        rows = []
        while _t.time() < deadline:
            _t.sleep(2)
            rows = spark.table(qname).collect()
            if rows and sum(r["n_events"] for r in rows) >= 100:
                break
    finally:
        q.stop()
        # restore the tz stash read_events_kafka_shaped saved (no
        # run_available_now drain in this manual harness)
        if jobs._SAVED_TZ:
            prev = jobs._SAVED_TZ.pop()
            if prev is not None:
                spark.conf.set("spark.sql.session.timeZone", prev)
    assert rows, "no micro-batch reached the sink in 30s"
    assert {r["event_type"] for r in rows} <= {"click", "view", "purchase"}
    assert all(r["n_events"] > 0 for r in rows)


def test_parquet_production_sink_roundtrip(spark, sf_smoke, tmp_path):
    """Production sink shape: the same streaming source written to a
    parquet sink (append mode + checkpoint) instead of the test-harness
    memory sink — the output on disk must equal the batch table."""
    from vector_search_playground_spark.sources import load_table
    from vector_search_playground_spark.streaming import jobs

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = jobs.read_events_stream(spark, sf_smoke).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = (
        ev.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # manual drain — restore the tz stash ourselves
    if jobs._SAVED_TZ:
        prev = jobs._SAVED_TZ.pop()
        if prev is not None:
            spark.conf.set("spark.sql.session.timeZone", prev)

    got = spark.read.parquet(out_dir)
    want = load_table(spark, sf_smoke, "events")
    assert got.count() == want.count()
    assert got.agg(F.sum("value")).first()[0] == pytest.approx(
        want.agg(F.sum("value")).first()[0]
    )
    assert set(got.columns) == {"event_id", "user_id", "event_type", "value"}


def test_stream_index_append_equals_batch_index(spark, sf_smoke):
    """The stream-ingested bucket-partitioned LSH index must serve
    EXACTLY the results of the batch-built in-memory index: same planes,
    same multiprobe set, same exact ranking inside probed buckets —
    layout and ingestion mode must never change answers."""
    from vector_search_playground_spark.plans.lsh import (
        build_lsh,
        hyperplanes,
        search_lsh,
    )
    from vector_search_playground_spark.sources import load_table
    from vector_search_playground_spark.streaming import jobs

    streamed = jobs.stream_index_append(spark, sf_smoke).collect()

    emb = load_table(spark, sf_smoke, "embeddings")
    qvec = [float(x) for x in emb.where(F.col("vec_id") == 0).first()["embedding"]]
    planes = hyperplanes(len(qvec), nbits=8, seed=42)
    batch = search_lsh(build_lsh(emb, planes), planes, qvec, k=10).collect()

    assert [(r["vec_id"], r["dist"]) for r in streamed] == [
        (r["vec_id"], r["dist"]) for r in batch
    ]


def test_stream_index_append_crash_recovery_exactly_once(
    spark, sf_smoke, tmp_path
):
    """r10 (verdict #6): crash-recovery certificate for the one
    side-effecting streaming sink. Phase 1 commits micro-batch 0 (the
    even half of the corpus). The crash is then simulated at its
    sharpest point: a batch-1 task WROTE its bucket parquet files but
    died before the sink's _spark_metadata commit — injected as poison
    rows (the query vector itself under fake ids, which would rank #1
    if visible) appended to the index dir outside the metadata log.
    Phase 2 restarts from the same checkpoint with the odd half added:
    the recovered index must hold every corpus row exactly once, the
    orphan files must stay invisible to reads and to search, and the
    search must equal the batch-built index over the full corpus."""
    import glob as _glob
    import os as _os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from vector_search_playground_spark.plans.lsh import (
        bucket_expr,
        build_lsh,
        hyperplanes,
        search_lsh,
    )
    from vector_search_playground_spark.queries.llm_pipeline import (
        SCRATCH as LLM_SCRATCH,
        _fixture_fingerprint,
    )
    from vector_search_playground_spark.streaming import jobs

    d = tmp_path / "emb"
    d.mkdir()
    tbl = pq.read_table(_os.path.join(sf_smoke, "embeddings.parquet"))
    even = pc.equal(pc.bit_wise_and(tbl["vec_id"], 1), 0)
    # the even half IS embeddings.parquet (vec 0 included, so the query
    # vector and the scratch fingerprint stay stable across phases)
    pq.write_table(tbl.filter(even), str(d / "embeddings.parquet"))

    # phase 1: batch 0 ingests the even half and commits
    jobs.stream_index_append(spark, str(d)).collect()
    tag = _os.path.basename(str(d))
    fp = _fixture_fingerprint(str(d), "embeddings")
    root = _os.path.join(LLM_SCRATCH, f"stream_lsh_{tag}_{fp}")
    idx = _os.path.join(root, "index")
    ckpt = _os.path.join(root, "ckpt")
    assert _os.path.exists(_os.path.join(ckpt, "commits", "0")), (
        "batch 0 must have committed in phase 1"
    )
    assert not _os.path.exists(_os.path.join(ckpt, "commits", "1"))

    # simulated mid-batch-1 crash: bucket files on disk, no metadata
    # commit. Poison embedding = the query vector => dist 0, rank #1 if
    # any read path trusts the directory listing over the commit log.
    emb_a = spark.read.parquet(str(d / "embeddings.parquet"))
    qvec = [
        float(x)
        for x in emb_a.where(F.col("vec_id") == 0).first()["embedding"]
    ]
    planes = hyperplanes(len(qvec), nbits=8, seed=42)
    poison = spark.createDataFrame(
        [(9_000_000 + i, qvec, -1) for i in range(3)],
        "vec_id: bigint, embedding: array<float>, label: int",
    ).withColumn("bucket", bucket_expr(F.col("embedding"), planes))
    n_files_before = len(
        _glob.glob(_os.path.join(idx, "bucket=*", "*.parquet"))
    )
    poison.write.mode("append").partitionBy("bucket").parquet(idx)
    n_files_after = len(
        _glob.glob(_os.path.join(idx, "bucket=*", "*.parquet"))
    )
    assert n_files_after > n_files_before, "poison injection was vacuous"

    # phase 2: the odd half arrives; restart from the SAME checkpoint
    pq.write_table(
        tbl.filter(pc.invert(even)), str(d / "embeddings_b.parquet")
    )
    streamed = jobs.stream_index_append(spark, str(d)).collect()

    # exactly-once content: every corpus row once, orphans invisible
    got_ids = sorted(
        r["vec_id"]
        for r in spark.read.parquet(idx).select("vec_id").collect()
    )
    want_ids = sorted(v.as_py() for v in tbl["vec_id"])
    assert got_ids == want_ids, (
        f"recovered index holds {len(got_ids)} rows vs corpus "
        f"{len(want_ids)} (dup, loss, or orphan visibility)"
    )

    # search through the recovered index == batch index over the corpus
    assert all(r["vec_id"] < 9_000_000 for r in streamed), (
        "uncommitted poison rows surfaced in search results"
    )
    emb_all = spark.read.schema(emb_a.schema).parquet(str(d))
    batch = search_lsh(build_lsh(emb_all, planes), planes, qvec, k=10)
    assert [(r["vec_id"], r["dist"]) for r in streamed] == [
        (r["vec_id"], r["dist"]) for r in batch.collect()
    ]


def test_cdc_apply_multibatch_equals_batch(
    spark, sf_smoke, tmp_path, monkeypatch
):
    """stream_cdc_apply over a TIME-SPLIT two-file source drained one file
    per micro-batch: the merged state table must equal the one-shot batch
    CDC result — last-writer-wins merges must be associative across
    micro-batch boundaries (a user whose upsert lands in batch 1 and
    delete in batch 2, or vice versa, must resolve by timestamp, not by
    arrival)."""
    import os as _os
    import shutil as _sh

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from vector_search_playground_spark.streaming import jobs

    d = tmp_path / "ev"
    d.mkdir()
    tbl = pq.read_table(_os.path.join(sf_smoke, "events.parquet"))
    mid = pc.quantile(tbl["ts"].cast("int64"), 0.5)[0].as_py()
    early, late = str(d / "events_a.parquet"), str(d / "events_b.parquet")
    keep = pc.less(tbl["ts"].cast("int64"), mid)
    pq.write_table(tbl.filter(keep), early)
    pq.write_table(tbl.filter(pc.invert(keep)), late)
    now = _os.stat(late).st_mtime
    _os.utime(early, (now - 60, now - 60))
    monkeypatch.setattr(jobs, "_MAX_FILES_PER_TRIGGER", 1)

    got = {
        r["user_id"]: (r["last_us"], r["last_value_cents"], r["n_changes"])
        for r in jobs.stream_cdc_apply(spark, str(d)).collect()
    }

    # batch reference over the SAME two-file dir
    from pyspark.sql import functions as F

    ev = spark.read.parquet(str(d)).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp_ntz").cast("timestamp"))
        .alias("t"),
        "user_id",
        "event_type",
        "value",
    )
    last = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.struct("t", "event_id", "event_type", "value")).alias(
                "m"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("m.event_type") != "error")
        .select(
            "user_id",
            F.col("m.t").alias("last_us"),
            F.floor(F.col("m.value") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            "n",
        )
    )
    want = {
        r["user_id"]: (r["last_us"], r["cents"], r["n"])
        for r in last.collect()
    }
    assert got == want


def test_stream_moments_exact_across_batches(
    spark, sf_smoke, tmp_path, monkeypatch
):
    """stream_moments over a two-file source drained one file per
    micro-batch: integer moment state is associative, so the drained
    snapshot must EXACTLY equal the batch sums — not approximately, the
    way float Welford state would drift with arrival order."""
    import math as _math
    import os as _os
    import shutil as _sh

    from vector_search_playground_spark.streaming import jobs

    d = tmp_path / "ev"
    d.mkdir()
    src = _os.path.join(sf_smoke, "events.parquet")
    _sh.copy(src, d / "events_a.parquet")
    _sh.copy(src, d / "events_b.parquet")
    monkeypatch.setattr(jobs, "_MAX_FILES_PER_TRIGGER", 1)

    got = {
        r["user_id"]: (r["n"], r["sum_cents"], r["sumsq_cents"])
        for r in jobs.stream_moments(spark, str(d)).collect()
    }
    import duckdb as _duck

    ref = _duck.connect().execute(
        f"""
        SELECT user_id, count(*), sum(c), sum(c * c)
        FROM (SELECT user_id,
                     CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
              FROM '{src}')
        GROUP BY user_id
        """
    ).fetchall()
    want = {u: (2 * n, 2 * s, 2 * ss) for u, n, s, ss in ref}
    assert got == want


def test_stateful_crash_recovery_reloads_committed_state_version(
    spark, scratch
):
    """r10: crash-recovery certificate for the STATE-STORE path — the
    third pillar beside the foreachBatch table (stream_cdc_apply) and
    the file sink (stream_index_append). Drives the EXACT production
    state function (jobs.running_totals_fn, the one stream_stateful
    runs) through a restartable foreachBatch sink: batch 0 commits its
    state-store version; batch 1 is killed by an injected executor
    crash on a marker user present only in file B; the restart against
    the same checkpoint must reload the batch-0 store version and
    replay batch 1 in full. Per-user counts then equal the batch
    group-by exactly — they double if batch 0's state is reapplied
    (version not rolled back) and undercount if it is lost (version
    not reloaded)."""
    import pytest as _pytest
    from pyspark.sql.streaming.state import GroupStateTimeout

    from vector_search_playground_spark.streaming import jobs

    src = os.path.join(scratch, "src")
    ckpt = os.path.join(scratch, "ckpt")
    upd = os.path.join(scratch, "updates")
    marker_user = 999_999

    def write_file(rows):
        """One events file of (event_id, user_id, value) rows."""
        data = [
            (eid, BASE_US + eid * HOUR_US, uid, "click", val, "{}")
            for eid, uid, val in rows
        ]
        spark.createDataFrame(data, schemas.EVENTS_RAW).coalesce(
            1
        ).write.mode("append").parquet(src)

    def drain(fail_user):
        out = _stream(spark, src).groupBy("user_id").applyInPandasWithState(
            jobs.running_totals_fn(fail_user),
            outputStructType=(
                "user_id long, n_events long, sum_value double"
            ),
            stateStructType="cnt long, tot double",
            outputMode="Update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        q = (
            out.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(upd)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # phase 1: batch 0 (file A) drains cleanly and commits its state
    write_file([(1, 1, 1.0), (2, 2, 2.0)])
    drain(fail_user=None)
    assert os.path.exists(os.path.join(ckpt, "commits", "0"))

    # phase 2: file B arrives (user 2 spans both batches — the sharp
    # cross-batch state edge; the marker user exists only here) and the
    # injected crash kills batch 1 mid-flight
    write_file([(3, 2, 3.0), (4, 3, 4.0), (5, marker_user, 1.0)])
    with _pytest.raises(Exception) as ei:
        drain(fail_user=marker_user)
    assert "injected crash" in str(ei.value)
    assert not os.path.exists(os.path.join(ckpt, "commits", "1")), (
        "the crashed batch must not have committed"
    )

    # phase 3: restart against the same checkpoint; batch 1 replays in
    # full on top of the RELOADED batch-0 state version
    drain(fail_user=None)
    assert os.path.exists(os.path.join(ckpt, "commits", "1"))

    # latest update per user across all committed batches (n_events is
    # strictly increasing per user, so max_by picks the final total)
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(upd)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    want = {
        1: (1, 1.0),
        2: (2, 5.0),  # 3 if batch 0's state is reapplied, 1 if lost
        3: (1, 4.0),
        marker_user: (1, 1.0),
    }
    assert got == want, got


def test_cdc_apply_crash_recovery_from_checkpoint(
    spark, sf_smoke, tmp_path, monkeypatch
):
    """r9 crash-recovery certificate: kill stream_cdc_apply mid-stream
    AFTER its first micro-batch committed (injected failure at batch 1,
    before any state write), restart from the same checkpoint, and the
    drained state must equal the one-shot batch CDC result. The
    n_changes counter is the sharp edge: if recovery re-applied the
    committed batch 0, every batch-0 user's count would double; if it
    skipped the uncommitted batch 1, those changes would be missing —
    either way the comparison breaks."""
    import os as _os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import pytest as _pytest

    from vector_search_playground_spark.streaming import jobs

    # time-split two-file source, one file per micro-batch
    d = tmp_path / "ev"
    d.mkdir()
    tbl = pq.read_table(_os.path.join(sf_smoke, "events.parquet"))
    mid = pc.quantile(tbl["ts"].cast("int64"), 0.5)[0].as_py()
    early, late = str(d / "events_a.parquet"), str(d / "events_b.parquet")
    keep = pc.less(tbl["ts"].cast("int64"), mid)
    pq.write_table(tbl.filter(keep), early)
    pq.write_table(tbl.filter(pc.invert(keep)), late)
    now = _os.stat(late).st_mtime
    _os.utime(early, (now - 60, now - 60))
    monkeypatch.setattr(jobs, "_MAX_FILES_PER_TRIGGER", 1)

    # phase 1: crash at batch 1 (batch 0 has committed by then)
    monkeypatch.setattr(jobs, "_CDC_FAIL_AT_BATCH", 1)
    with _pytest.raises(Exception) as ei:
        jobs.stream_cdc_apply(spark, str(d))
    assert "injected crash" in str(ei.value)
    ckpt = _os.path.join(jobs.SCRATCH, "ckpt_s_cdc_apply")
    assert _os.path.exists(_os.path.join(ckpt, "commits", "0")), (
        "batch 0 must have committed before the injected crash"
    )
    assert not _os.path.exists(_os.path.join(ckpt, "commits", "1"))
    state_dir = _os.path.join(jobs.SCRATCH, "cdc_state")
    import glob as _glob

    assert _glob.glob(_os.path.join(state_dir, "bucket=*")), (
        "batch 0's state write must survive the crash"
    )

    # phase 2: restart against the SAME checkpoint + state table
    monkeypatch.setattr(jobs, "_CDC_FAIL_AT_BATCH", None)
    monkeypatch.setattr(jobs, "_CDC_KEEP_STATE", True)
    got = {
        r["user_id"]: (r["last_us"], r["last_value_cents"], r["n_changes"])
        for r in jobs.stream_cdc_apply(spark, str(d)).collect()
    }

    # batch reference over the same two-file dir (the cdc oracle shape)
    from pyspark.sql import functions as F

    ev = spark.read.parquet(str(d)).select(
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp_ntz").cast("timestamp"))
        .alias("t"),
        "user_id",
        "event_type",
        "value",
    )
    last = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.struct("t", "event_id", "event_type", "value")).alias(
                "m"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("m.event_type") != "error")
        .select(
            "user_id",
            F.col("m.t").alias("last_us"),
            F.floor(F.col("m.value") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
            "n",
        )
    )
    want = {
        r["user_id"]: (r["last_us"], r["cents"], r["n"])
        for r in last.collect()
    }
    assert got == want, "recovered state diverged from the batch CDC oracle"
