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
    # webm stays behind the library seam (png graduated in round 5, gif in
    # round 6, flac + baseline jpeg + the mp4 container in round 7)
    with pytest.raises(NotImplementedError):
        decode_media("video", b"\x00" * 16, {"format": "webm"}, fake=False)
    # jpeg/mp4 now have real decoders: garbage is a parse error, not a seam
    for kind, fmt in (("image", "jpeg"), ("video", "mp4")):
        with pytest.raises(ValueError):
            decode_media(kind, b"\x00" * 16, {"format": fmt}, fake=False)
    d1 = decode_media("video", b"\x00" * 16, {"format": "webm"}, fake=True)
    d2 = decode_media("video", b"\x00" * 16, {"format": "webm"}, fake=True)
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
    # the dispatch-level seam: formats with no built-in codec raise at
    # decode_media; the in-container seam (avc1 inside a parsed mp4) is
    # asserted in the mp4 codec tests
    for kind, fmt in (("video", "webm"), ("video", "h264")):
        with pytest.raises(NotImplementedError):
            decode_media(kind, b"\x00\x00", {"format": fmt}, fake=False)


# --- png codec (round 5) ---------------------------------------------------


def test_png_roundtrip_all_filters():
    """Every scanline filter type (None/Sub/Up/Average/Paeth) must
    reconstruct exactly: 'mixed' mode cycles filters per row."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(425)
    for shape in [(1, 1, 3), (5, 7, 3), (64, 200, 3), (33, 17)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for mode in ("none", "mixed"):
            got = decode_png(encode_png(px, filter_mode=mode))
            assert got.shape == px.shape and (got == px).all(), (shape, mode)
    # smooth gradient: the content filters were designed for (Sub/Paeth
    # residuals near zero) — catches sign/modulo slips random data hides
    g = (
        np.add.outer(np.arange(100), np.arange(200))[..., None]
        .repeat(3, -1) % 256
    ).astype(np.uint8)
    assert (decode_png(encode_png(g, filter_mode="mixed")) == g).all()


def test_png_golden_bytes():
    """Golden-file check against a byte-literal PNG built from the spec
    by hand (not by our encoder): 2×2 RGB, Sub filter on row 0, Up on
    row 1. Guards the decoder against self-consistent encode/decode bugs
    that a round-trip can't see."""
    import struct
    import zlib

    import numpy as np

    from vector_search_playground_spark.functions.multimodal import decode_png

    # pixels: [[(10,20,30),(11,22,33)], [(13,24,35),(15,27,39)]]
    # row0 Sub(1): 10,20,30 then 11-10,22-20,33-30 = 1,2,3
    # row1 Up(2):  13-10,24-20,35-30 = 3,4,5 then 15-11,27-22,39-33 = 4,5,6
    scanlines = bytes([1, 10, 20, 30, 1, 2, 3]) + bytes([2, 3, 4, 5, 4, 5, 6])

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )
    want = np.array(
        [[[10, 20, 30], [11, 22, 33]], [[13, 24, 35], [15, 27, 39]]],
        dtype=np.uint8,
    )
    assert (decode_png(png) == want).all()


def test_png_rejects_corrupt_crc():
    import numpy as np
    import pytest

    from vector_search_playground_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    payload = bytearray(
        encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    )
    payload[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError):
        decode_png(bytes(payload))


def test_media_pipeline_carries_png(spark, sf_smoke):
    """The registered real-media pipeline must ship BOTH image containers
    (alternating png/ppm) and featurize them identically to a direct
    decode."""
    from pyspark.sql import functions as F

    from vector_search_playground_spark.functions.multimodal import (
        extract_features,
        synthesize_real_media,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = synthesize_real_media(docs)
    fmts = {
        r["fmt"]
        for r in media.where(F.col("kind") == "image")
        .select(F.col("meta.format").alias("fmt"))
        .distinct()
        .collect()
    }
    assert fmts == {"png", "ppm", "gif", "jpeg"}
    feats = extract_features(media, fake=False)
    img = feats.where(F.col("kind") == "image")
    assert img.count() > 0
    assert img.where(F.size("features") == 0).count() == 0


def test_gif_roundtrip_exact():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(6)
    yy, xx = np.mgrid[0:16, 0:32]
    gradient = np.stack(
        [(3 * xx + 5 * yy + 11 * c) % 256 for c in range(3)], axis=-1
    ).astype(np.uint8)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    big_random = pal[rng.integers(0, 256, (128, 128))]
    checker = np.stack(
        [(np.indices((64, 64)).sum(0) % 2) * 255] * 3, axis=-1
    ).astype(np.uint8)
    for px in (gradient, big_random, checker):
        back = decode_gif(encode_gif(px))
        assert (back == px).all()
    # LZW genuinely compresses structure
    assert len(encode_gif(checker)) < checker.nbytes // 10


def test_gif_rejects_garbage_and_wide_palettes():
    import numpy as np
    import pytest as _pytest

    from vector_search_playground_spark.functions.multimodal import (
        decode_gif,
        encode_gif,
    )

    with _pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + b"\x00" * 30)
    rng = np.random.default_rng(1)
    wide = rng.integers(0, 256, (32, 64, 3), dtype=np.uint8)
    with _pytest.raises(NotImplementedError):
        encode_gif(wide)  # ~2k distinct colors > 256


def test_gif_payloads_flow_through_pipeline(spark, sf_smoke):
    from pyspark.sql import functions as F

    from vector_search_playground_spark.functions.multimodal import (
        extract_features,
        synthesize_real_media,
    )
    from vector_search_playground_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = synthesize_real_media(docs)
    gifs = media.where(
        F.col("meta.format") == "gif"
    )
    n_gif = gifs.count()
    assert n_gif > 0, "rotation must produce gif payloads"
    feats = extract_features(media, fake=False).where(
        F.col("kind") == "image"
    )
    rows = feats.select("payload_bytes", "features").collect()
    assert rows and all(len(r["features"]) > 0 for r in rows)


# --- flac codec (round 7) ----------------------------------------------------


def _int16_ref(s):
    import numpy as np

    ref = np.clip(np.asarray(s, np.float64), -1.0, 1.0 - 2**-15)
    return (ref * 32768.0).astype(np.int16).astype(np.float64) / 32768.0


def test_flac_roundtrip_exact_across_signal_shapes():
    """Bit-exact reconstruction for every subframe family the encoder can
    pick: CONSTANT (const/zeros), FIXED low order (sine/ramp), the
    Rice-escape path (uniform noise), multi-frame streams (> block_size),
    and the degenerate empty/one-sample streams."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(7)
    t = np.arange(800) / 16000.0
    cases = {
        "sine": 0.5 * np.sin(2 * np.pi * 220 * t),
        "const": np.full(500, 0.25),
        "zeros": np.zeros(300),
        "noise": rng.uniform(-1, 1, 1000),
        "multi_frame": np.sin(2 * np.pi * 50 * np.arange(9000) / 16000.0)
        * 0.3
        + 0.05 * rng.randn(9000),
        "empty": np.zeros(0),
        "one": np.array([0.5]),
        "clip": np.array([-2.0, 2.0, -1.0, 0.999]),
    }
    for name, s in cases.items():
        for po in (0, 2):
            out, sr = decode_flac(encode_flac(s, 16000, partition_order=po))
            assert sr == 16000
            assert np.array_equal(out, _int16_ref(s)), (name, po)


def test_flac_stereo_and_lpc_roundtrip_exact():
    """Round-8 coverage closure: stereo streams reconstruct bit-exactly
    through every channel assignment the encoder can pick (independent /
    left-side / right-side / mid-side — identical channels force
    mid/side, independent noise forces L/R), and LPC subframes both
    shrink tonal audio below the fixed-predictor encoding and invert
    exactly (integer recurrence, lossless for any coefficients)."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(11)
    t = np.arange(800) / 16000.0
    L = 0.6 * np.sin(2 * np.pi * 100 * t)
    cases = {
        "phase_shift": np.stack(
            [L, 0.54 * np.sin(2 * np.pi * 100 * t + 0.2)], axis=-1
        ),
        "identical": np.stack([L, L], axis=-1),
        "independent_noise": rng.uniform(-1, 1, (300, 2)),
        "const_stereo": np.full((7, 2), -0.5),
        "multi_block": np.stack(
            [
                np.sin(2 * np.pi * 50 * np.arange(9000) / 16000.0),
                np.cos(2 * np.pi * 75 * np.arange(9000) / 16000.0),
            ],
            axis=-1,
        )
        * 0.7,
    }
    for name, s in cases.items():
        out, sr = decode_flac(encode_flac(s, 16000))
        assert sr == 16000 and out.shape == s.shape, name
        assert np.array_equal(out, _int16_ref(s)), name
    # mid/side must beat independent coding on near-identical channels
    same = encode_flac(cases["identical"], 16000)
    indep = encode_flac(
        np.stack([L, rng.uniform(-1, 1, 800)], axis=-1), 16000
    )
    assert len(same) < 0.75 * len(indep)
    # LPC: tonal mono audio must encode smaller than fixed-only, and
    # the stream must actually carry an LPC subframe (types 0b100000+)
    mono = 0.5 * np.sin(2 * np.pi * 120 * t) + 0.25 * np.sin(
        2 * np.pi * 240 * t
    )
    with_lpc = encode_flac(mono, 16000)
    fixed_only = encode_flac(mono, 16000, lpc_order=0)
    assert len(with_lpc) < len(fixed_only)
    out, _ = decode_flac(with_lpc)
    assert np.array_equal(out, _int16_ref(mono))


def test_flac_actually_compresses_tonal_audio():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        encode_flac,
        encode_wav,
    )

    t = np.arange(4000) / 16000.0
    s = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.25 * np.sin(2 * np.pi * 440 * t)
    flac, wav = encode_flac(s, 16000), encode_wav(s, 16000)
    assert len(flac) < 0.5 * len(wav), (len(flac), len(wav))


def test_flac_rejects_corrupt_streams():
    """Integrity is enforced at three layers: header CRC-8, frame CRC-16,
    and the STREAMINFO audio MD5 — flipping bits anywhere in the stream
    must fail loudly, never return wrong samples."""
    import numpy as np
    import pytest as _pytest

    from vector_search_playground_spark.functions.multimodal import (
        decode_flac,
        encode_flac,
    )

    t = np.arange(800) / 16000.0
    good = bytearray(encode_flac(0.5 * np.sin(2 * np.pi * 220 * t), 16000))
    with _pytest.raises(ValueError):
        decode_flac(b"NOTFLAC" + bytes(good))
    # corrupt one payload byte in the middle of the first frame
    for at in (len(good) - 10, 60, len(good) - 2):
        bad = bytearray(good)
        bad[at] ^= 0x40
        with _pytest.raises((ValueError, NotImplementedError)):
            decode_flac(bytes(bad))
    # truncation
    with _pytest.raises(ValueError):
        decode_flac(bytes(good[: len(good) - 6]))


def test_flac_payloads_flow_through_pipeline(spark, sf_smoke):
    from pyspark.sql import functions as F

    from vector_search_playground_spark.functions.multimodal import (
        extract_features,
        synthesize_real_media,
    )
    from vector_search_playground_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(60)
    media = synthesize_real_media(docs)
    n_flac = media.where(F.col("meta.format") == "flac").count()
    assert n_flac > 0, "rotation must produce flac payloads"
    feats = extract_features(media, fake=False).where(
        F.col("kind") == "audio"
    )
    rows = feats.select("payload_bytes", "features").collect()
    assert rows and all(0.0 < r["features"][3] < 0.5 for r in rows)


def test_flac_wav_same_signal_same_features():
    """The two audio containers must be content-transparent: featurizing
    the SAME signal through wav and flac yields identical statistics."""
    from vector_search_playground_spark.functions.multimodal import (
        _audio_features,
        decode_flac,
        decode_wav,
        _audio_payload,
    )

    # even steps carry the same mono signal through both containers;
    # odd steps are stereo flac by design (rotation of channel layouts)
    for step in (0, 8, 38):
        w, _ = decode_wav(_audio_payload(step, "wav"))
        f, _ = decode_flac(_audio_payload(step, "flac"))
        assert _audio_features(w, 16000) == _audio_features(f, 16000)
    for step in (7, 39):
        f, _ = decode_flac(_audio_payload(step, "flac"))
        assert f.ndim == 2 and f.shape[1] == 2, "odd steps must be stereo"
        feats = _audio_features(f, 16000)
        assert len(feats) == len(_audio_features(f[:, 0], 16000))


# --- jpeg codec (round 7) ---------------------------------------------------


def _psnr(a, b) -> float:
    import numpy as np

    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_jpeg_roundtrip_psnr_and_quality_monotone():
    """Lossy codec contract: shape-exact, deterministic, PSNR-bounded,
    and distortion must fall as quality rises."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = np.stack(
        [
            127
            + 100
            * np.sin(2 * np.pi * (xx / w + c / 3))
            * np.cos(2 * np.pi * yy / h)
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.uint8)
    psnrs = []
    for q in (50, 85, 95):
        enc = encode_jpeg(smooth, q)
        assert enc.startswith(b"\xff\xd8") and enc.endswith(b"\xff\xd9")
        dec = decode_jpeg(enc)
        assert dec.shape == smooth.shape and dec.dtype == np.uint8
        psnrs.append(_psnr(dec, smooth))
    assert psnrs == sorted(psnrs), "higher quality must not hurt PSNR"
    assert psnrs[-1] > 40.0, f"q=95 smooth-content PSNR too low: {psnrs}"
    assert encode_jpeg(smooth, 85) == encode_jpeg(smooth, 85)


def test_jpeg_gray_and_odd_dimensions():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    yy, xx = np.mgrid[0:45, 0:61]
    gray = ((2 * xx + yy) % 200).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, 90))
    assert dec.shape == (45, 61)
    assert _psnr(dec, gray) > 30.0
    rgb = np.stack([gray, 255 - gray, gray // 2], axis=-1).astype(np.uint8)
    dec3 = decode_jpeg(encode_jpeg(rgb, 90))
    assert dec3.shape == (45, 61, 3)


def test_jpeg_constant_color_is_exact():
    """A flat image is pure DC — lossy only through rounding, so the
    round-trip must be exact (the color-transform sanity anchor)."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.full((16, 24, 3), (200, 30, 90), np.uint8)
    assert (decode_jpeg(encode_jpeg(img, 95)) == img).all()


def test_jpeg_mp4_degenerate_extremes():
    """Sub-block images (1x1, 3x5) exercise the right/bottom edge
    replication for every pixel, and a single 1x1 mp4 frame exercises the
    minimal sample table (one chunk, one sample, one stts run)."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_jpeg,
        decode_mp4,
        encode_jpeg,
        encode_mp4,
    )

    for shape in [(1, 1, 3), (3, 5, 3), (1, 1), (8, 8)]:
        img = (np.arange(np.prod(shape)).reshape(shape) % 256).astype(np.uint8)
        dec = decode_jpeg(encode_jpeg(img, 90))
        assert dec.shape == img.shape
        assert int(np.max(np.abs(dec.astype(int) - img.astype(int)))) <= 2
    frame = np.zeros((1, 1, 1), np.uint8)
    out, (w, h) = decode_mp4(encode_mp4(frame))
    assert out.shape == (1, 1, 1) and (w, h) == (1, 1)


def test_jpeg_420_roundtrip_and_stream_shape():
    """4:2:0 contract: SOF declares 2x2 luma sampling, the stream is
    smaller than 4:4:4 on chroma-rich content, round-trip PSNR is
    bounded, and chroma-flat content decodes as well as 4:4:4 (2x2
    box-mean of constant chroma is lossless)."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    noisy = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    e420 = encode_jpeg(noisy, 90, subsampling="420")
    e444 = encode_jpeg(noisy, 90, subsampling="444")
    sof = e420.find(b"\xff\xc0")
    assert e420[sof + 11] == 0x22 and e420[sof + 14] == 0x11
    assert len(e420) < len(e444), "subsampling must shrink chroma noise"
    dec = decode_jpeg(e420)
    assert dec.shape == noisy.shape and dec.dtype == np.uint8
    assert _psnr(dec, noisy) > 10.0
    # chroma-flat: gray-valued RGB loses nothing to subsampling
    yy, xx = np.mgrid[0:33, 0:47]
    g = ((3 * xx + 5 * yy) % 256).astype(np.uint8)
    flat = np.stack([g, g, g], axis=-1)
    d420 = decode_jpeg(encode_jpeg(flat, 90, subsampling="420"))
    d444 = decode_jpeg(encode_jpeg(flat, 90, subsampling="444"))
    assert abs(_psnr(d420, flat) - _psnr(d444, flat)) < 1.0
    # sub-MCU and odd shapes exercise the 16-multiple padding + crop
    for shape in [(1, 1, 3), (5, 3, 3), (17, 23, 3), (16, 16, 3)]:
        img = (np.arange(np.prod(shape)).reshape(shape) % 256).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
        assert out.shape == img.shape
    # deterministic
    assert encode_jpeg(noisy, 90, subsampling="420") == e420


def test_mp4_mjpeg_track_roundtrip():
    """MJPEG-in-MP4: the container carries per-sample baseline 4:2:0
    JPEGs (variable stsz), so a genuinely compressed entropy-coded
    bitstream flows through the ISO-BMFF walk end-to-end."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_mp4,
        encode_mp4,
    )

    nf, h, w = 5, 16, 32
    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    frames = ((xx + 2 * yy + 17 * ff) % 256).astype(np.uint8)
    enc = encode_mp4(frames, codec="mjpeg")
    assert b"jpeg" in enc[: enc.find(b"mdat") + 10_000]
    raw = encode_mp4(frames, codec="v308")
    assert len(enc) < len(raw), "mjpeg track must beat uncompressed"
    dec, (ww, hh) = decode_mp4(enc)
    assert dec.shape == frames.shape and (ww, hh) == (w, h)
    assert _psnr(dec, frames) > 35.0
    # every sample is a standalone JPEG: SOI markers count == n_frames
    assert enc.count(b"\xff\xd8\xff") == nf
    # degenerate single 1x1 frame through the variable-size table
    one = np.zeros((1, 1, 1), np.uint8)
    out, (w1, h1) = decode_mp4(encode_mp4(one, codec="mjpeg"))
    assert out.shape == (1, 1, 1) and (w1, h1) == (1, 1)
    assert encode_mp4(frames, codec="mjpeg") == enc  # deterministic


def test_jpeg_rejects_corrupt_and_unsupported_streams():
    import numpy as np
    import pytest

    from vector_search_playground_spark.functions.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.zeros((16, 16, 3), np.uint8)
    enc = bytearray(encode_jpeg(img, 85))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG not a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(bytes(enc[: len(enc) // 2]))  # truncated mid-stream
    # flip SOF0 -> SOF2 (progressive): must hit the documented seam
    sof_at = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:sof_at]) + b"\xff\xc2" + bytes(enc[sof_at + 2 :])
    with pytest.raises(NotImplementedError):
        decode_jpeg(prog)
    # claim 4x4 luma subsampling: the decoder supports 1x/2x component
    # ratios (4:4:4 / 4:2:0 / 4:2:2 / 4:4:0) — exotic layouts raise.
    # SOF0 layout: marker(2) len(2) precision(1) h(2) w(2) nc(1) then
    # per-component [id, sampling, tq] — comp0 sampling sits at +11
    sub = bytearray(enc)
    assert sub[sof_at + 11] == 0x11
    sub[sof_at + 11] = 0x44
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(sub))


def test_jpeg_entropy_stream_has_no_bare_ff():
    """Byte-stuffing check: between SOS and EOI every 0xFF must be
    followed by 0x00 (no markers are emitted mid-scan)."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.uint8)
    enc = encode_jpeg(img, 75)
    sos = enc.find(b"\xff\xda")
    seglen = int.from_bytes(enc[sos + 2 : sos + 4], "big")
    body = enc[sos + 2 + seglen : -2]
    i = 0
    while i < len(body):
        if body[i] == 0xFF:
            assert body[i + 1] == 0x00, f"bare 0xFF at {i}"
            i += 2
        else:
            i += 1


def test_jpeg_payloads_flow_through_pipeline(spark, sf_smoke):
    from pyspark.sql import functions as F

    from vector_search_playground_spark.functions.multimodal import (
        extract_features,
        synthesize_real_media,
    )
    from vector_search_playground_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(80)
    media = synthesize_real_media(docs)
    n_jpeg = media.where(F.col("meta.format") == "jpeg").count()
    assert n_jpeg > 0, "rotation must produce jpeg payloads"
    feats = extract_features(media, fake=False).where(
        F.col("kind") == "image"
    )
    rows = feats.select("payload_bytes", "features").collect()
    assert rows and all(len(r["features"]) > 0 for r in rows)


# --- mp4 container (round 7) ------------------------------------------------


def test_mp4_roundtrip_exact():
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_mp4,
        encode_mp4,
    )

    ff, yy, xx = np.mgrid[0:7, 0:16, 0:32]
    frames = ((xx + 2 * yy + 17 * ff) % 256).astype(np.uint8)
    enc = encode_mp4(frames)
    assert enc[4:8] == b"ftyp"
    out, (w, h) = decode_mp4(enc)
    assert (w, h) == (32, 16)
    assert np.array_equal(out, frames), "v308 track is uncompressed: exact"


def test_mp4_rejects_corrupt_and_unsupported():
    import numpy as np
    import pytest

    from vector_search_playground_spark.functions.multimodal import (
        decode_mp4,
        encode_mp4,
    )

    frames = np.zeros((3, 8, 8), np.uint8)
    enc = encode_mp4(frames)
    with pytest.raises(ValueError):
        decode_mp4(b"\x00\x00\x00\x08free")  # no ftyp
    with pytest.raises(ValueError):
        decode_mp4(enc[: len(enc) // 3])  # truncated: malformed box
    # compressed sample entry: the seam INSIDE the parsed container
    bad = bytearray(enc)
    i = bad.find(b"v308")
    bad[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        decode_mp4(bytes(bad))


def test_mp4_y4m_same_signal_same_features():
    """The two video containers must be content-transparent: featurizing
    the SAME luma stream through y4m and mp4 yields identical stats."""
    from vector_search_playground_spark.functions.multimodal import (
        _video_features,
        _video_payload,
        decode_mp4,
        decode_y4m,
        sample_frame_indices,
    )

    for nf, phase in ((2, 0), (7, 41), (11, 200)):
        fy, (w1, h1) = decode_y4m(_video_payload(nf, phase, "y4m"))
        fm, (w2, h2) = decode_mp4(_video_payload(nf, phase, "mp4"))
        assert (w1, h1) == (w2, h2)
        idxs = sample_frame_indices(nf)
        assert _video_features(fy, idxs, w1, h1) == _video_features(
            fm, idxs, w2, h2
        )


def test_mp4_payloads_flow_through_pipeline(spark, sf_smoke):
    from pyspark.sql import functions as F

    from vector_search_playground_spark.functions.multimodal import (
        extract_features,
        synthesize_real_media,
    )
    from vector_search_playground_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(80)
    media = synthesize_real_media(docs)
    n_mp4 = media.where(F.col("meta.format") == "mp4").count()
    assert n_mp4 > 0, "rotation must produce mp4 payloads"
    feats = extract_features(media, fake=False).where(
        F.col("kind") == "video"
    )
    rows = feats.select("features", "sampled_frames").collect()
    assert rows and all(
        r["sampled_frames"] and len(r["features"]) > 0 for r in rows
    )


def test_flac_plan_cost_matches_emitted_bits_at_partition_order():
    """The subframe planner must price residual sections with the SAME
    per-partition Rice/escape scan _write_residuals performs (ADVICE r8:
    a whole-block estimate mis-ranked subframe/stereo candidates when
    partition_order > 0). Certificate: _residual_cost == the exact bit
    count a _BitWriter records for the same residuals, across partition
    orders and residual shapes."""
    import numpy as np

    from vector_search_playground_spark.functions import multimodal as M

    rng = np.random.RandomState(11)
    cases = [
        rng.randint(-5, 6, 4096),                     # small uniform
        (rng.randn(4096) * 2000).astype(np.int64),    # wide gaussian
        np.concatenate([                              # regime change:
            rng.randint(-2, 3, 2048),                 # per-partition k
            (rng.randn(2048) * 30000).astype(np.int64),  # must differ
        ]),
        np.zeros(4096, dtype=np.int64),
    ]
    for res_full in cases:
        for order in (0, 2):
            res = res_full[order:]
            for po in (0, 1, 3):
                w = M._BitWriter()
                M._write_residuals(w, res, len(res_full), order, po)
                emitted = len(w.buf) * 8 + w.n
                planned = M._residual_cost(res, len(res_full), order, po)
                assert planned == emitted, (order, po)


def test_flac_partitioned_rice_beats_whole_block_on_regime_change():
    """With per-partition Rice parameters priced exactly, a signal whose
    residual magnitude jumps mid-block must encode no larger at
    partition_order 3 than at 0 — and the round-trip stays lossless."""
    import numpy as np

    from vector_search_playground_spark.functions.multimodal import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(3)
    quiet = 0.001 * rng.randn(2048)
    loud = 0.6 * rng.uniform(-1, 1, 2048)
    s = np.concatenate([quiet, loud])
    b0 = encode_flac(s, 16000, partition_order=0)
    b3 = encode_flac(s, 16000, partition_order=3)
    out0, _ = decode_flac(b0)
    out3, _ = decode_flac(b3)
    assert np.array_equal(out0, out3), "lossless regardless of knob"
    assert len(b3) <= len(b0), "partitioned Rice must not lose to whole-block"


def test_fused_matches_unfused(spark, sf_smoke):
    """r14 optimization guard: the fused synth→featurize kernel
    (one Arrow crossing) must be row-identical to the two-stage
    pipeline it replaced in multimodal_features."""
    from vector_search_playground_spark.functions.multimodal import (
        extract_features,
        synthesize_and_featurize_real,
        synthesize_real_media,
    )

    docs = load_table(spark, sf_smoke, "documents").limit(90)
    old = extract_features(synthesize_real_media(docs), fake=False).collect()
    new = synthesize_and_featurize_real(docs).collect()
    key = lambda r: r["media_id"]  # noqa: E731
    assert len(old) == len(new) > 0
    for ra, rb in zip(sorted(old, key=key), sorted(new, key=key)):
        assert ra.asDict() == rb.asDict()
