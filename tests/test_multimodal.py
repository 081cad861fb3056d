"""Multimodal plumbing tests: stable schema, deterministic features
independent of partitioning, honest decode stub, correct frame sampling."""

from __future__ import annotations

import pytest

from vector_search_playground_spark.functions.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frame_indices,
    synthesize_media,
)
from vector_search_playground_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    return synthesize_media(docs)


def test_media_schema_and_kinds(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "payload", "meta",
    ]
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.where("kind = 'video'").first()
    assert row["meta"]["n_frames"] > 0
    assert isinstance(row["payload"], (bytes, bytearray))
    assert len(row["payload"]) == 64  # 4 chained MD5 digests


def test_features_deterministic_across_partitionings(media):
    a = extract_features(media).collect()
    b = extract_features(media.repartition(7)).collect()
    key = lambda r: r["media_id"]  # noqa: E731
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra["features"] == rb["features"]
        assert len(ra["features"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in ra["features"])


def test_video_frame_sampling(media):
    rows = extract_features(media).where("kind = 'video'").collect()
    assert rows
    for r in rows:
        assert r["sampled_frames"] is not None
        assert sorted(r["sampled_frames"]) == r["sampled_frames"]
        assert len(r["sampled_frames"]) <= 4
    non_video = extract_features(media).where("kind <> 'video'").first()
    assert non_video["sampled_frames"] is None


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_media("image", b"\x00" * 16, {"format": "png"}, fake=False)
    d1 = decode_media("image", b"\x00" * 16, {"format": "png"}, fake=True)
    d2 = decode_media("image", b"\x00" * 16, {"format": "png"}, fake=True)
    assert d1 == d2


def test_frame_index_maths():
    assert sample_frame_indices(100) == [0, 25, 50, 75]
    assert sample_frame_indices(3) == [0, 1, 2]
    assert sample_frame_indices(0) == []
