"""Parquet table loaders for the fixture star schema.

Single choke point for every scan: explicit schema (no inference), and the
events timestamp normalization happens here so downstream
operators see a clean surface.

At 100 TB the same loaders work unchanged — ``sf_dir`` becomes an object-store
prefix with thousands of files per table; explicit schemas avoid the
footer-sampling job schema inference would otherwise trigger on every read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_search_playground_spark import schemas

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


def normalize_events(df: DataFrame) -> DataFrame:
    """Derive the two time columns every events consumer uses:

    - ``ts``   — TIMESTAMP_NTZ at microsecond precision (Spark's native
      precision). Use for windows / date functions.
    - ``ts_us`` — the exact epoch-microsecond int64 from disk. Use for
      integer time arithmetic that must match the DuckDB oracle's
      ``epoch_us(ts)`` bit-for-bit (session islands, range buckets).

    The fixture stores ``ts`` as parquet ``timestamp[us]``; reading it
    under the declared LongType schema yields the raw epoch-µs int64
    (verified with pyarrow against /root/testdata/sf*/events.parquet).

    Shared by the batch loader below and the streaming source
    (streaming/jobs.py) so both surfaces see one schema.
    """
    # NTZ via pure integer arithmetic on an NTZ literal — NOT
    # timestamp_micros(..).cast("timestamp_ntz"): timestamp_micros yields
    # TIMESTAMP_LTZ and the LTZ→NTZ cast renders the instant in the
    # SESSION timezone, so a driver session running America/New_York would
    # shift every event wall-clock by -5h (caught by the vanilla-session
    # oracle check; the engine must not require its own session factory).
    return (
        df.withColumnRenamed("ts", "ts_us")
        .withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts_us,"
                " timestamp_ntz'1970-01-01 00:00:00')"
            ),
        )
        .select(
            "event_id", "ts", "ts_us", "user_id", "event_type", "value", "props"
        )
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its declared schema (events get the
    ``normalize_events`` treatment)."""
    if name not in schemas.TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(schemas.TABLES[name]).parquet(path)
    if name == "events":
        df = normalize_events(df)
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Spread ``df`` across the session's full parallelism when its scan
    yields fewer splits than cores.

    Python-heavy stages (Arrow kernels, codec decode) and explosive
    per-row expansions inherit the SCAN's partitioning: a small fixture
    is one parquet row group → one split → the whole stage runs on one
    core regardless of cluster size. The exchange this inserts moves the
    narrow input rows once — trivial next to the per-row work it
    parallelizes — and is a NO-OP whenever the source already has enough
    natural splits, which is exactly the 100 TB case (so production
    plans never pay it).
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def atomic_build(write_to, path: str, *, overwrite: bool = False) -> None:
    """Build a fingerprint-keyed cached artifact directory via
    build-to-temp + atomic rename, so two sessions racing to build the
    SAME cache key never interleave files into one directory (Spark
    jobs from different JVMs share the destination's ``_temporary``
    staging dir — observed as TASK_WRITE_FAILED when a warm-up session
    and the test suite both built ``lsh_index_sf0.001_*``). The rename
    is the commit point: the loser's finished build is discarded and
    the winner's — byte-equivalent, the build is deterministic per
    key — serves both. Same discipline as the avro sink's
    attempt-suffixed temp files, one level up.

    ``overwrite=True`` is for REBUILD callers (same path, possibly new
    content — e.g. an index rebuilt over a different corpus): the
    existing artifact is renamed aside, the new build renamed in, and
    only then is the old one deleted — a reader never observes a
    missing or half-written directory, and a failed swap restores the
    original.

    Only a rename that failed because a complete artifact already sits
    at ``path`` is treated as "lost the race"; any other failure
    (permissions, EXDEV, a stale non-directory) re-raises so a broken
    build surfaces HERE, not later as a confusing read error.

    ``write_to(tmp_path)`` must produce the complete directory at
    ``tmp_path``.
    """
    import errno
    import shutil
    import uuid

    tmp = f"{path}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    write_to(tmp)
    if overwrite:
        old = None
        if os.path.exists(path):
            old = f"{path}.old-{os.getpid()}-{uuid.uuid4().hex[:8]}"
            os.rename(path, old)
        try:
            os.rename(tmp, path)
        except OSError as exc:
            race = exc.errno in (
                errno.EEXIST, errno.ENOTEMPTY, errno.EISDIR
            )
            if race and os.path.isdir(path) and os.listdir(path):
                # a racing rebuild of the same key won between our
                # displace and our rename — its artifact serves both
                # (rebuild paths are fingerprint-keyed, so same key ⇒
                # same content); our displaced copy is now garbage
                if old is not None:
                    shutil.rmtree(old, ignore_errors=True)
                shutil.rmtree(tmp, ignore_errors=True)
                return
            if old is not None and not os.path.exists(path):
                os.rename(old, path)  # restore the displaced artifact
                old = None
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        if old is not None:
            shutil.rmtree(old, ignore_errors=True)
        return
    try:
        os.rename(tmp, path)
    except OSError as exc:
        lost_race = exc.errno in (
            errno.EEXIST,
            errno.ENOTEMPTY,
            errno.EISDIR,
        )
        # verify the winner actually left a complete artifact: a
        # non-empty directory (Spark writes _SUCCESS last for static
        # writes; dynamic partition overwrite leaves only data dirs,
        # so "non-empty" is the portable completeness floor)
        if lost_race and os.path.isdir(path) and os.listdir(path):
            shutil.rmtree(tmp, ignore_errors=True)
            return
        shutil.rmtree(tmp, ignore_errors=True)
        raise


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view; returns the DataFrames.

    Mirrors the DuckDB oracle environment, where the same ten names are
    pre-registered views — so engine-side ``spark.sql`` text and oracle SQL
    can share table names.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
