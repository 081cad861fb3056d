"""Multi-format source/sink surface: parquet, ORC, CSV, JSON(-lines).

The reference's only "format" is a Postgres table; a Spark engine at
100 TB meets data in whatever the upstream produced. One rule governs
everything here: **the schema is always pinned** — `inferSchema`/sampling
on CSV/JSON is a full extra pass over the data (and type-unstable across
samples), so readers take an explicit StructType, exactly like
`sources/tables.py` does for parquet.

Scale posture per format:
- parquet/ORC: columnar, splittable, predicate-pushdown-capable — the
  storage formats. Writers default to snappy/zlib block compression.
- CSV/JSON: interchange formats — row-oriented, no pushdown (every query
  reads every byte), but splittable uncompressed (or with bzip2), so they
  parallelize as sources. Timestamps are written as ISO-8601 with
  microsecond precision to survive the text roundtrip losslessly.
- Gzip is deliberately NOT the default anywhere: a .gz file is ONE split —
  a single 10 GB gzip CSV serializes onto one task and stalls the stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

_TEXT_OPTIONS = {
    "timestampFormat": TS_FMT,
    "timestampNTZFormat": TS_FMT,
}


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write ``df`` at ``path`` in ``fmt`` (parquet | orc | csv | json)."""
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.options(header=True, **_TEXT_OPTIONS)
    elif fmt == "json":
        w = w.options(**_TEXT_OPTIONS)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    w.format(fmt).save(path)


def read_table(
    spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet"
) -> DataFrame:
    """Schema-pinned read of ``path`` in ``fmt`` — never a sampling pass."""
    r = spark.read.schema(schema)
    if fmt == "csv":
        r = r.options(header=True, **_TEXT_OPTIONS)
    elif fmt == "json":
        r = r.options(**_TEXT_OPTIONS)
    elif fmt not in ("parquet", "orc"):
        raise ValueError(f"unsupported format {fmt!r}")
    return r.format(fmt).load(path)
