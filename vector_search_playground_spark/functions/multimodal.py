"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Driver north-star surface (BASELINE.json): a 100 TB training-data
pipeline carries media columns through the same engine as text and
vectors. The design keeps Spark-side concerns real — schema, partition
behavior, UDF signature, batch shape — while the codec boundary is
STUBBED: this container has no image/audio libraries, so ``decode_media``
either raises ``NotImplementedError`` (strict mode, the production seam
where Pillow/ffmpeg/torchaudio plug in) or produces a deterministic fake
decode derived from the payload bytes (test mode, reproducible
end-to-end).

Scale shape: every stage here is a pure map over Arrow record batches —
no shuffle, no driver collection; media rows stay on their input
partitions, and per-batch vectorization amortizes the Python boundary
exactly like ``embed_batch`` (functions/embed.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

KINDS = ("image", "audio", "video")

MEDIA_META = StructType(
    [
        StructField("format", StringType(), False),
        StructField("width", IntegerType(), True),       # image/video
        StructField("height", IntegerType(), True),      # image/video
        StructField("sample_rate", IntegerType(), True), # audio
        StructField("n_frames", IntegerType(), True),    # video
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("meta", MEDIA_META, False),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", IntegerType(), False),
        StructField("features", ArrayType(FloatType(), False), False),
        StructField("sampled_frames", ArrayType(IntegerType(), False), True),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from ``documents`` — the
    fixtures ship no binary columns, so the payload is MD5-chained bytes
    of the text (stable across runs/partitionings) with metadata assigned
    by id. Entirely JVM-side expressions; the Python boundary starts at
    feature extraction."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payload = F.concat(
        *[F.unhex(F.md5(F.concat(F.lit(str(i)), F.col("text")))) for i in range(4)]
    )
    meta = F.struct(
        F.when(kind == "image", F.lit("png"))
        .when(kind == "audio", F.lit("wav"))
        .otherwise(F.lit("mp4"))
        .alias("format"),
        F.when(kind != "audio", (F.col("doc_id") % 8 + 1).cast("int") * 64)
        .alias("width"),
        F.when(kind != "audio", (F.col("doc_id") % 4 + 1).cast("int") * 64)
        .alias("height"),
        F.when(kind == "audio", F.lit(16000)).alias("sample_rate"),
        F.when(kind == "video", (F.col("doc_id") % 100 + 10).cast("int"))
        .alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def decode_media(kind: str, payload: bytes, meta: dict[str, Any], *,
                 fake: bool = True) -> bytes:
    """THE CODEC SEAM — stubbed.

    Production: swap in Pillow (image), soundfile/torchaudio (audio),
    pyav/ffmpeg (video); the call sites and schemas do not change. This
    container ships none of those, so ``fake=False`` raises and
    ``fake=True`` returns a deterministic pseudo-decode (BLAKE2b stream
    keyed by the payload) so downstream logic is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            f"real {kind} decode requires a codec library not present in "
            "this environment; wire Pillow/ffmpeg/torchaudio here"
        )
    return hashlib.blake2b(payload, digest_size=32).digest()


def sample_frame_indices(n_frames: int, k: int = 4) -> list[int]:
    """Evenly-spaced frame sampling (video): k indices in [0, n_frames)."""
    if n_frames <= 0:
        return []
    k = min(k, n_frames)
    return [int(i * n_frames / k) for i in range(k)]


def _features_from(decoded: bytes) -> list[float]:
    """Deterministic fake feature vector standing in for a model forward
    pass — unit-scaled floats from the decoded byte stream."""
    h = hashlib.blake2b(decoded, digest_size=FEATURE_DIM * 4).digest()
    return [
        int.from_bytes(h[4 * i : 4 * i + 4], "little") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """decode → (frame-sample for video) → featurize, as one
    ``mapInPandas`` stage: Arrow delivers columnar batches, the loop body
    touches each payload once, output schema is declared up front. This
    is the pattern a real model-inference stage inherits unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload_bytes": pdf["payload"].map(len).astype("int32"),
                "features": [
                    _features_from(
                        decode_media(k, p, m, fake=fake)
                    )
                    for k, p, m in zip(
                        pdf["kind"], pdf["payload"], pdf["meta"]
                    )
                ],
                "sampled_frames": [
                    sample_frame_indices(m["n_frames"])
                    if k == "video" else None
                    for k, m in zip(pdf["kind"], pdf["meta"])
                ],
            }
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FEATURES_SCHEMA)
