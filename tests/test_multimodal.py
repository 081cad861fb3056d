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


# --- real codecs -----------------------------------------------------------


def test_wav_roundtrip_is_exact():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    t = np.arange(800) / 16000.0
    samples = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    payload = encode_wav(samples, 16000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    out, sr = decode_wav(payload)
    assert sr == 16000 and len(out) == 800
    # PCM16 quantization: exact to 1/32768
    assert np.max(np.abs(out - samples)) <= 1.0 / 32768


def test_ppm_roundtrip_is_exact():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_ppm,
        encode_ppm,
    )

    px = (np.arange(48 * 32 * 3).reshape(32, 48, 3) % 256).astype(np.uint8)
    payload = encode_ppm(px)
    assert payload.startswith(b"P6\n48 32\n255\n")
    assert np.array_equal(decode_ppm(payload), px)
    # comments in the header are legal PPM — the parser must skip them
    commented = b"P6\n# a comment\n48 32\n255\n" + payload[13:]
    assert np.array_equal(decode_ppm(commented), px)


def test_y4m_roundtrip_is_exact():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_y4m,
        encode_y4m,
    )

    frames = ((np.arange(5 * 16 * 32).reshape(5, 16, 32)) % 256).astype(
        np.uint8
    )
    payload = encode_y4m(frames)
    assert payload.startswith(b"YUV4MPEG2 W32 H16 ")
    out, (w, h) = decode_y4m(payload)
    assert (w, h) == (32, 16)
    assert np.array_equal(out, frames)


def test_real_pipeline_decodes_and_is_partition_invariant(spark, sf_smoke):
    from vector_search_playground_spark.functions.multimodal import (
        synthesize_real_media,
    )
    from vector_search_playground_spark.functions.multimodal import (
        extract_features as ef,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = synthesize_real_media(docs)
    a = ef(media, fake=False).collect()
    b = ef(media.repartition(7), fake=False).collect()
    key = lambda r: r["media_id"]  # noqa: E731
    assert len(a) == 60
    for ra, rb in zip(sorted(a, key=key), sorted(b, key=key)):
        assert ra["features"] == rb["features"]
        assert len(ra["features"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in ra["features"])
    # audio rows carry a real spectral centroid (slot 3) — a pure tone at
    # 100-880 Hz lands well below half of Nyquist
    audio = [r for r in a if r["kind"] == "audio"]
    assert audio and all(0.0 < r["features"][3] < 0.5 for r in audio)
    # video rows sampled real frames out of the decoded Y4M stream
    video = [r for r in a if r["kind"] == "video"]
    assert video and all(
        r["sampled_frames"] and len(r["sampled_frames"]) <= 4 for r in video
    )


def test_compressed_formats_remain_a_seam():
    with pytest.raises(NotImplementedError):
        decode_media("image", b"\x89PNG", {"format": "png"}, fake=False)
