"""SparkSession factory with the engine's standard configuration.

The reference delegates all execution to a single Postgres 16 instance
(`/root/reference/docker-compose.yaml:3-10`); our execution substrate is a
Spark cluster, so session-level knobs are where the "deployment envelope"
lives. Every knob below is chosen for 100 TB-scale behavior and documented.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test box; on a real cluster these are
# overridden by spark-submit conf. shuffle.partitions is intentionally NOT
# hardcoded to a huge number: AQE coalesces post-shuffle partitions at
# runtime, so the static value only caps initial parallelism.
_DEFAULTS: dict[str, str] = {
    # --- memory envelope ---
    # In local mode one JVM is driver + all executors; Spark's 1g default
    # heap OOMs once a long session accumulates block-manager state
    # (persists, localCheckpoints) across many queries — observed killing
    # a full 135-query bench run mid-flight. 16g = 16× that envelope.
    # NOT larger: an A/B showed a 64g heap costs 2.7× on the
    # allocation-heavy PPJoin (G1 large-heap young collections), while
    # 8g/16g match the 1g latency profile. On a real cluster spark-submit
    # overrides this per executor. Only honored when this factory CREATES
    # the JVM (first session in the process).
    "spark.driver.memory": "16g",
    # --- correctness-critical ---
    # Fixture events.parquet stores timestamp[us]; we read it under an
    # explicit LongType schema as the raw epoch-µs int64 and convert
    # explicitly (sources/tables.py). nanosAsLong stays on defensively: if a
    # fixture ever ships TIMESTAMP(NANOS), the read surfaces the int64
    # instead of failing (normalize_events would then need a unit probe).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # One timezone everywhere so timestamp math matches the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # --- scale posture ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dim tables (region/nation/supplier/part at small SF) should always
    # broadcast; 64 MB is a safe executor-memory fraction at 100 TB scale.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for every pandas UDF / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Vectorized parquet reader + predicate pushdown are on by default;
    # pinned here so a cluster-side override can't silently regress scans.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
}


def get_spark(
    app_name: str = "vector_search_playground_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]`` — on a real cluster, leave it None and let spark-submit
    supply the master.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None and not os.environ.get("SPARK_MASTER"):
        master = "local[*]"
    if master:
        builder = builder.master(master)

    conf = dict(_DEFAULTS)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
