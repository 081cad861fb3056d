"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

Driver north-star surface (BASELINE.json): a 100 TB training-data
pipeline carries media columns through the same engine as text and
vectors. Two codec tiers:

- **Real decoders (zero extra deps)** for three genuine public formats:
  WAV/RIFF PCM16 (stdlib ``wave``), binary PPM "P6" images (raw RGB,
  header + ``numpy.frombuffer``), and Y4M video (YUV4MPEG2, the
  mjpegtools/ffmpeg uncompressed interchange format — ASCII header,
  ``FRAME`` markers, raw planes). ``synthesize_real_media`` emits true
  bytestreams in these formats and ``decode_media(..., fake=False)``
  parses them back, so the registered pipeline exercises an actual
  decode → frame-sample → featurize path, not a hash stub. Features are
  real signal statistics (RMS / zero-crossing / spectral centroid for
  audio, per-channel moments for images, per-sampled-frame luma for
  video).
- **The library seam stays, now at the honest boundary**: formats with
  no built-in codec (webm; compressed video bitstreams like avc1/hevc
  inside the natively-parsed MP4 container) raise
  ``NotImplementedError`` at the same call site where
  Pillow/ffmpeg/torchaudio would plug in, and ``fake=True`` keeps the
  deterministic BLAKE2b pseudo-decode for tests that only need the
  plumbing. PNG (r5), GIF (r6), FLAC, baseline JPEG, and the
  MP4/ISO-BMFF container (r7) graduated from the seam to real built-in
  codecs.

Scale shape: every stage here is a pure map over Arrow record batches —
no shuffle, no driver collection; media rows stay on their input
partitions, and per-batch vectorization amortizes the Python boundary
exactly like ``embed_batch`` (functions/embed.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from functools import lru_cache as _lru_cache
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


# ---------------------------------------------------------------------------
# Real codecs — three genuine public formats decodable with stdlib + numpy.
# WAV (RIFF PCM16): stdlib `wave`. PPM "P6": netpbm binary RGB. Y4M
# (YUV4MPEG2): the mjpegtools/ffmpeg uncompressed video interchange format.
# ---------------------------------------------------------------------------


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """PCM16 mono RIFF/WAVE bytes via stdlib ``wave`` — spec-conformant
    (any audio tool opens it). ``samples``: float array in [-1, 1)."""
    import io
    import wave

    import numpy as np

    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0 - 2**-15)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes((pcm * 32768.0).astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """(samples float64 in [-1,1), sample_rate) from PCM16 mono WAV."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("only PCM16 mono supported by the built-in codec")
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0, sr


def encode_ppm(pixels) -> bytes:
    """Binary netpbm "P6": ASCII header, then raw RGB rows.
    ``pixels``: (h, w, 3) uint8."""
    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(payload: bytes):
    """(h, w, 3) uint8 from a binary P6 PPM (comments handled per spec)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    idx, tokens = 2, []
    while len(tokens) < 3:
        while payload[idx : idx + 1].isspace():
            idx += 1
        if payload[idx : idx + 1] == b"#":
            idx = payload.index(b"\n", idx) + 1
            continue
        start = idx
        while not payload[idx : idx + 1].isspace():
            idx += 1
        tokens.append(int(payload[start:idx]))
    idx += 1  # exactly one whitespace byte after maxval, per spec
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    return np.frombuffer(payload, np.uint8, count=h * w * 3, offset=idx).reshape(
        h, w, 3
    )


def encode_y4m(frames) -> bytes:
    """YUV4MPEG2 C444 bytes from (n_frames, h, w) uint8 luma (chroma set
    to neutral 128) — a real Y4M stream ffmpeg/mpv would play."""
    import numpy as np

    fr = np.ascontiguousarray(frames, dtype=np.uint8)
    n, h, w = fr.shape
    uv = np.full((h, w), 128, np.uint8).tobytes()
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h)]
    for f in fr:
        out.append(b"FRAME\n")
        out.append(f.tobytes())
        out.append(uv)
        out.append(uv)
    return b"".join(out)


def decode_y4m(payload: bytes):
    """(frames (n, h, w) uint8 luma, (w, h)) from a C444 Y4M stream."""
    import numpy as np

    nl = payload.index(b"\n")
    parts = payload[:nl].decode("ascii").split()
    if parts[0] != "YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    params = {p[0]: p[1:] for p in parts[1:]}
    w, h = int(params["W"]), int(params["H"])
    if params.get("C", "420") != "444":
        raise ValueError("only C444 supported by the built-in codec")
    frames = []
    idx = nl + 1
    while idx < len(payload):
        if payload[idx : idx + 5] != b"FRAME":
            raise ValueError("missing FRAME marker")
        idx = payload.index(b"\n", idx) + 1
        frames.append(
            np.frombuffer(payload, np.uint8, count=h * w, offset=idx).reshape(h, w)
        )
        idx += 3 * h * w  # Y plane consumed above + U + V
    return np.stack(frames), (w, h)


def encode_png(pixels, *, filter_mode: str = "none") -> bytes:
    """Spec-conformant PNG from (h, w, 3) uint8 RGB or (h, w) uint8 gray:
    signature + IHDR + one zlib IDAT + IEND, stdlib only. ``filter_mode``
    "none" emits filter byte 0 per scanline (fastest); "fast" cycles the
    vectorizable filters 0-2 (None/Sub/Up — what the media pipeline
    uses, both directions stay numpy-whole-row); "mixed" cycles all five
    filter types 0-4 per row — used by tests to exercise the
    Average/Paeth unfilter paths, whose left-pixel dependency forces a
    sequential walk on decode."""
    import struct
    import zlib

    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    ch = 1 if gray else px.shape[2]
    if ch not in (1, 3):
        raise ValueError("only gray or RGB supported by the built-in codec")
    rows = px.reshape(h, w * ch).astype(np.int16)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))

    out = bytearray()
    prev = np.zeros(w * ch, np.int16)
    for y in range(h):
        raw = rows[y]
        if filter_mode == "none":
            ft = 0
        elif filter_mode == "fast":
            ft = y % 3
        else:
            ft = y % 5
        left = np.concatenate([np.zeros(ch, np.int16), raw[:-ch]])
        ul = np.concatenate([np.zeros(ch, np.int16), prev[:-ch]])
        if ft == 0:
            filt = raw
        elif ft == 1:
            filt = raw - left
        elif ft == 2:
            filt = raw - prev
        elif ft == 3:
            filt = raw - (left + prev) // 2
        else:
            filt = raw - paeth(left, prev, ul)
        out.append(ft)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = raw

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if gray else 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(out)))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """uint8 pixel array ((h, w, 3) RGB or (h, w) gray) from an 8-bit
    non-interlaced PNG — stdlib ``zlib`` inflate + numpy unfiltering.
    All five scanline filters (None/Sub/Up/Average/Paeth) are handled;
    Sub/Up are vectorized per row, Average/Paeth walk pixels (their left
    dependency is inherently sequential). CRCs are verified. Palette,
    16-bit, alpha, and Adam7 interlace raise — they belong to the
    library seam (Pillow plugs in at ``decode_media``)."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(b"\x89PNG\r\n\x1a\n"):
        raise ValueError("not a PNG")
    idx, ihdr, idat = 8, None, bytearray()
    while idx < len(payload):
        (ln,) = struct.unpack(">I", payload[idx : idx + 4])
        tag = payload[idx + 4 : idx + 8]
        body = payload[idx + 8 : idx + 8 + ln]
        (crc,) = struct.unpack(">I", payload[idx + 8 + ln : idx + 12 + ln])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        idx += 12 + ln
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in (0, 2) or interlace != 0:
        raise NotImplementedError(
            "only 8-bit gray/RGB non-interlaced PNG supported by the "
            "built-in codec; wire Pillow here for the rest"
        )
    ch = 1 if color == 0 else 3
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    data = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    fts, rows = data[:, 0], data[:, 1:].astype(np.int16)
    recon = np.zeros((h, stride), np.int16)
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        r, ft = rows[y].copy(), int(fts[y])
        if ft == 0:
            pass
        elif ft == 1:  # Sub: per-channel cumulative sum along the row
            r = (
                (r.reshape(w, ch).astype(np.int64).cumsum(axis=0) % 256)
                .astype(np.int16)
                .reshape(stride)
            )
        elif ft == 2:
            r = r + prev
        elif ft in (3, 4):  # left-dependent: walk pixels
            for x in range(0, stride, ch):
                a = r[x - ch : x] if x else np.zeros(ch, np.int16)
                b = prev[x : x + ch]
                if ft == 3:
                    r[x : x + ch] = (r[x : x + ch] + (a + b) // 2) % 256
                else:
                    c = prev[x - ch : x] if x else np.zeros(ch, np.int16)
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    r[x : x + ch] = (r[x : x + ch] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        prev = r % 256
        recon[y] = prev
    px = recon.astype(np.uint8)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, 3)


def encode_gif(pixels) -> bytes:
    """Spec-conformant GIF87a from (h, w, 3) uint8 RGB with at most 256
    distinct colors: global color table + LZW-compressed index stream
    (variable code width 3..12 bits, LSB-first packing, clear-code dict
    reset at 4096 entries, 255-byte sub-blocks). A real COMPRESSED
    container like PNG's zlib path — LZW is the round-6 codec
    graduation; >256-color inputs raise (quantization is a modeling
    choice, not a codec concern)."""
    import struct

    import numpy as np

    px = np.asarray(pixels, np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("expected (h, w, 3) RGB")
    h, w = px.shape[:2]
    flat = px.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise NotImplementedError(
            "GIF needs a <=256-color palette; quantize upstream"
        )
    # palette size 2^(n+1); min code size >= 2 per spec
    n = 0
    while (2 << n) < max(len(colors), 2):
        n += 1
    table_size = 2 << n
    mcs = max(2, n + 1)

    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out.append(0x80 | ((mcs - 1) << 4) | n)  # GCT flag, color res, size
    out += b"\x00\x00"  # bg color, aspect
    gct = bytearray()
    for c in colors:
        gct += bytes(int(v) for v in c)
    gct += b"\x00" * (3 * table_size - len(gct))
    out += gct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(mcs)

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes: list[int] = [clear]
    table: dict[tuple, int] = {}
    next_code = eoi + 1
    prefix: tuple = ()
    for sym in idx.tolist():
        cand = prefix + (sym,)
        # root (single-symbol) codes are implicit; only multi-symbol
        # sequences live in the dict
        if len(cand) == 1 or cand in table:
            prefix = cand
            continue
        codes.append(table[prefix] if len(prefix) > 1 else prefix[0])
        if next_code <= 4095:
            table[cand] = next_code
            next_code += 1
        else:
            # 12-bit code space exhausted: clear and restart the dict
            codes.append(clear)
            table.clear()
            next_code = eoi + 1
        prefix = (sym,)
    if prefix:
        codes.append(table[prefix] if len(prefix) > 1 else prefix[0])
    codes.append(eoi)

    # re-walk the code stream to assign the width each code is WRITTEN
    # at by simulating the DECODER's table: it grows one entry per code
    # except the first after a clear, bumps width when it fills 2^width
    # (capped at 12), and resets on clear — both sides derive the width
    # schedule from the same code stream, so they cannot drift
    bits = bytearray()
    acc = cur = 0
    width = mcs + 1
    dec_size = eoi + 1
    fresh = True
    for code in codes:
        acc |= code << cur
        cur += width
        while cur >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            cur -= 8
        if code == clear:
            width, dec_size, fresh = mcs + 1, eoi + 1, True
        elif code != eoi:
            if not fresh and dec_size < 4096:
                dec_size += 1
                if dec_size == (1 << width) and width < 12:
                    width += 1
            fresh = False
    if cur:
        bits.append(acc & 0xFF)
    for i in range(0, len(bits), 255):
        block = bits[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes):
    """(h, w, 3) uint8 RGB from a GIF87a/89a with a global color table:
    LZW decode (variable width, clear/EOI, deferred-clear tolerant) of
    the first image descriptor. Extensions are skipped; local color
    tables and interlace raise."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    palette = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        palette = np.frombuffer(
            payload[pos : pos + 3 * size], np.uint8
        ).reshape(size, 3)
        pos += 3 * size
    while True:
        b0 = payload[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif b0 == 0x2C:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    _, _, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
    iflags = payload[pos + 9]
    if iflags & 0x80:
        raise NotImplementedError("local color tables unsupported")
    if iflags & 0x40:
        raise NotImplementedError("interlaced GIF unsupported")
    if palette is None:
        raise ValueError("missing global color table")
    pos += 10
    mcs = payload[pos]
    pos += 1
    data = bytearray()
    while payload[pos] != 0:
        ln = payload[pos]
        data += payload[pos + 1 : pos + 1 + ln]
        pos += 1 + ln

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    table: list[bytes] = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    out = bytearray()
    acc = cur = 0
    prev: bytes | None = None
    bi = 0
    while True:
        while cur < width and bi < len(data):
            acc |= data[bi] << cur
            bi += 1
            cur += 8
        if cur < width:
            break
        code = acc & ((1 << width) - 1)
        acc >>= width
        cur -= width
        if code == clear:
            table = table[: (1 << mcs) + 2]
            width, prev = mcs + 1, None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and prev is not None and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) != iw * ih:
        raise ValueError("pixel count mismatch")
    return palette[np.frombuffer(bytes(out), np.uint8)].reshape(ih, iw, 3)


# --- FLAC (16-bit mono/stereo, fixed + LPC predictors, Rice residuals) ------
# Round-7 codec graduation (the VERDICT-nominated seam retirement),
# completed round 8: a spec-conformant FLAC encoder/decoder built from
# the public format description (RFC 9639 / xiph.org FLAC format) —
# STREAMINFO with audio MD5, frame sync + CRC-8 header / CRC-16 frame,
# UTF-8-coded frame numbers, the full subframe family (CONSTANT /
# VERBATIM / FIXED(0..4) / LPC with quantized Levinson-Durbin
# coefficients), Rice-coded residuals with arbitrary partition order and
# the 5-bit escape, and all four stereo channel assignments (independent,
# left/side, right/side, mid/side) chosen per block by measured bit cost.
# 16-bit only (the WAV codec's posture); higher depths are a constant,
# not a structure.

_CRC8_POLY, _CRC16_POLY = 0x07, 0x8005


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC16_POLY) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _BitWriter:
    """MSB-first bit accumulator (FLAC's bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.n += bits
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write(0, 8 - self.n)


# fixed-predictor coefficients: residual r[i] = sum(c_j * x[i-1-j]) form,
# derived from successive differencing (order o => o-th forward diff)
_FIXED_COEF = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _fixed_residual(x, order: int):
    import numpy as np

    r = np.asarray(x, dtype=np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _lpc_coefs(x, order: int):
    """Levinson-Durbin LPC coefficients from the block's autocorrelation
    (float); None when the signal is degenerate (zero energy /
    singular)."""
    import numpy as np

    xf = np.asarray(x, np.float64)
    n = len(xf)
    if n <= order:
        return None
    # Welch window tames edge leakage (standard encoder practice)
    w = 1.0 - (2.0 * np.arange(n) / (n - 1) - 1.0) ** 2 if n > 1 else None
    xw = xf * w if w is not None else xf
    ac = np.array(
        [np.dot(xw[: n - k], xw[k:]) for k in range(order + 1)]
    )
    if ac[0] <= 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - sum(a[j] * ac[i - j] for j in range(i))
        k = acc / err
        new = a.copy()
        new[i] = k
        for j in range(i):
            new[j] = a[j] - k * a[i - 1 - j]
        a = new
        err *= 1.0 - k * k
        if err <= 0:
            return None
    return a


def _lpc_quantize(coefs, precision: int):
    """(int coefficients, right-shift) for the float LPC vector: shift
    scales the largest coefficient into [2^(p-2), 2^(p-1)); rounding
    uses error feedback so quantization noise does not accumulate
    (libFLAC's scheme). Returns None if the vector cannot fit."""
    import math

    cmax = max(abs(float(c)) for c in coefs)
    if cmax <= 0:
        return None
    lg = math.frexp(cmax)[1]  # cmax in [2^(lg-1), 2^lg)
    shift = precision - 1 - lg
    shift = max(0, min(15, shift))
    lim = 1 << (precision - 1)
    q = []
    err = 0.0
    for c in coefs:
        v = float(c) * (1 << shift) + err
        iv = int(math.floor(v + 0.5))
        iv = max(-lim, min(lim - 1, iv))
        err = v - iv
        q.append(iv)
    return q, shift


def _lpc_residual(x, qcoefs, shift: int):
    """Exact integer LPC residual: res[i] = x[i] − (Σ c_j·x[i−1−j] >>
    shift) — the arithmetic shift makes the round-trip lossless for ANY
    coefficient choice (coefficient quality only changes residual
    magnitude, never correctness)."""
    import numpy as np

    xi = np.asarray(x, np.int64)
    order = len(qcoefs)
    n = len(xi)
    pred = np.zeros(n - order, np.int64)
    for j, c in enumerate(qcoefs):
        pred += int(c) * xi[order - 1 - j : n - 1 - j]
    return xi[order:] - (pred >> shift)


def _residual_cost(res, blocksize: int, order: int,
                   partition_order: int) -> int:
    """EXACT bit cost of the residual section _write_residuals will
    emit — same partition split, same per-partition Rice parameter
    choice, same raw-escape alternative. The planner and the writer
    pricing the same bits is what makes the subframe/stereo-mode
    chooser exact (ADVICE r8: a whole-block Rice estimate mis-ranked
    candidates whenever partition_order > 0)."""
    import numpy as np

    nparts = 1 << partition_order
    cost = 2 + 4  # residual method + partition order
    pos = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = np.asarray(res[pos : pos + n], dtype=np.int64)
        pos += n
        u = (part << 1) ^ (part >> 63)
        raw_bits = max(int(u.max()).bit_length() + 1, 1) if n else 1
        rice = min(_rice_cost(u, k) for k in range(15))
        cost += 4 + min(rice, n * raw_bits + 5)
    return cost


def _plan_subframe(blk, bps: int, partition_order: int, lpc_order: int):
    """(kind, cost_bits, payload) for one channel's subframe, picked by
    measured bit cost among CONSTANT / VERBATIM / FIXED(0..4) /
    LPC(lpc_order) — the full subframe-type family of the format. The
    SINGLE source of both the stereo-mode cost comparison and the bits
    the writer emits, so the chooser can never disagree with the
    stream (and the expensive LPC fit / Rice scans run once)."""
    import numpy as np

    blk = np.asarray(blk, np.int64)
    n = len(blk)
    if np.all(blk == blk[0]):
        return ("constant", 8 + bps, None)
    nparts = 1 << partition_order
    best = ("verbatim", 8 + n * bps, None)
    max_fixed = min(4, n - 1)
    for o in range(max_fixed + 1):
        if n % nparts or n // nparts <= o:
            continue
        res = _fixed_residual(blk, o)
        cost = 8 + o * bps + _residual_cost(res, n, o, partition_order)
        if cost < best[1]:
            best = ("fixed", cost, (o, res))
    if lpc_order and n > 2 * lpc_order and n % nparts == 0 \
            and n // nparts > lpc_order:
        fl = _lpc_coefs(blk, lpc_order)
        qz = _lpc_quantize(fl, 12) if fl is not None else None
        if qz is not None:
            qc, shift = qz
            res = _lpc_residual(blk, qc, shift)
            cost = (
                8 + lpc_order * bps + 4 + 5 + lpc_order * 12
                + _residual_cost(res, n, lpc_order, partition_order)
            )
            if cost < best[1]:
                best = ("lpc", cost, (qc, shift, res))
    return best


def _write_subframe(frame: _BitWriter, blk, bps: int,
                    partition_order: int, lpc_order: int,
                    plan=None) -> None:
    """Emit one channel's subframe; ``plan`` reuses a _plan_subframe
    result (the stereo path already computed it for mode selection)."""
    import numpy as np

    blk = np.asarray(blk, np.int64)
    n = len(blk)
    kind, _cost, payload = plan or _plan_subframe(
        blk, bps, partition_order, lpc_order
    )
    frame.write(0, 1)
    if kind == "constant":
        frame.write(0, 6)
        frame.write(0, 1)
        frame.write(int(blk[0]), bps)
    elif kind == "verbatim":
        frame.write(1, 6)
        frame.write(0, 1)
        for v in blk:
            frame.write(int(v), bps)
    elif kind == "fixed":
        o, res = payload
        frame.write(0b001000 | o, 6)
        frame.write(0, 1)
        for v in blk[:o]:
            frame.write(int(v), bps)
        _write_residuals(frame, res, n, o, partition_order)
    else:  # lpc
        qc, shift, res = payload
        o = len(qc)
        frame.write(0b100000 | (o - 1), 6)
        frame.write(0, 1)
        for v in blk[:o]:
            frame.write(int(v), bps)
        frame.write(12 - 1, 4)  # coefficient precision
        frame.write(shift, 5)
        for c in qc:
            frame.write(int(c), 12)
        _write_residuals(frame, res, n, o, partition_order)


def _utf8_code(n: int) -> bytes:
    """FLAC's UTF-8-style variable-length number (frame numbers)."""
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (5 * nbytes + 1)) and nbytes < 7:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    lead = (0xFF00 >> nbytes) & 0xFF
    out.append(lead | (n >> (6 * (nbytes - 1))))
    return bytes(reversed(out))


def _rice_cost(u, k: int) -> int:
    import numpy as np

    return int(len(u) * (1 + k) + np.sum(u >> k))


def _write_residuals(w: _BitWriter, res, blocksize: int, order: int,
                     partition_order: int) -> None:
    import numpy as np

    w.write(0, 2)  # residual method 0: 4-bit Rice parameters
    w.write(partition_order, 4)
    nparts = 1 << partition_order
    if blocksize % nparts or blocksize // nparts <= order:
        raise ValueError("invalid partition order for this block")
    pos = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = np.asarray(res[pos : pos + n], dtype=np.int64)
        pos += n
        u = (part << 1) ^ (part >> 63)  # zigzag
        raw_bits = max(int(u.max()).bit_length() + 1, 1) if n else 1
        best_k = min(range(15), key=lambda k: _rice_cost(u, k))
        if _rice_cost(u, best_k) > n * raw_bits + 5:
            w.write(0xF, 4)  # escape: raw two's-complement residuals
            w.write(raw_bits, 5)
            for v in part:
                w.write(int(v), raw_bits)
        else:
            w.write(best_k, 4)
            for q, rem in zip(u >> best_k, u & ((1 << best_k) - 1)):
                w.write(1, int(q) + 1)  # q zeros then a 1 == value 1 in q+1 bits
                if best_k:
                    w.write(int(rem), best_k)


def encode_flac(samples, sample_rate: int = 16000, *,
                block_size: int = 4096, partition_order: int = 0,
                lpc_order: int = 8) -> bytes:
    """FLAC bytes from float samples in [-1, 1) — 16-bit, mono (n,) or
    stereo (n, 2). Subframes chosen per block/channel by measured bit
    cost among CONSTANT / FIXED(0..4) / VERBATIM / LPC(8) (quantized
    Levinson-Durbin coefficients, precision 12); stereo frames pick the
    cheapest of independent / left-side / right-side / mid-side
    decorrelation per block — the format's full channel-assignment
    family. Rice partition order stays a knob (pipeline default 0)."""
    import hashlib as _hashlib
    import struct

    import numpy as np

    pcm = np.clip(
        np.asarray(samples, dtype=np.float64), -1.0, 1.0 - 2**-15
    )
    if pcm.ndim == 1:
        ch = 1
    elif pcm.ndim == 2 and pcm.shape[1] in (1, 2):
        ch = pcm.shape[1]
        if ch == 1:
            pcm = pcm[:, 0]
    else:
        raise ValueError("expected (n,) mono or (n, 2) stereo samples")
    x = (pcm * 32768.0).astype(np.int16).astype(np.int64)
    total = len(x)
    md5 = _hashlib.md5(
        x.astype("<i2").tobytes()  # interleaved for stereo (row-major)
    ).digest()

    head = bytearray(b"fLaC")
    head.append(0x80)  # last metadata block, type 0 = STREAMINFO
    head += (34).to_bytes(3, "big")
    si = _BitWriter()
    si.write(min(block_size, total) if total else block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(15, 5)  # bits per sample - 1
    si.write(total, 36)
    si.align()
    head += si.buf + md5

    out = bytearray(head)
    for fi, start in enumerate(range(0, max(total, 1), block_size)):
        blk = x[start : start + block_size]
        n = len(blk)
        if n == 0:
            break
        if ch == 1:
            chan_code = 0
            subs = [(blk, 16, None)]
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            mid = (left + right) >> 1
            # four UNIQUE channel signals across the four candidate
            # assignments — plan each once; the chosen plans are handed
            # to the writer, so chooser and stream cannot disagree and
            # the LPC fits / Rice scans are never recomputed
            plans = {
                ("left", 16): _plan_subframe(
                    left, 16, partition_order, lpc_order),
                ("right", 16): _plan_subframe(
                    right, 16, partition_order, lpc_order),
                ("side", 17): _plan_subframe(
                    side, 17, partition_order, lpc_order),
                ("mid", 16): _plan_subframe(
                    mid, 16, partition_order, lpc_order),
            }
            cands = {
                0b0001: [("left", 16, left), ("right", 16, right)],
                0b1000: [("left", 16, left), ("side", 17, side)],
                0b1001: [("side", 17, side), ("right", 16, right)],
                0b1010: [("mid", 16, mid), ("side", 17, side)],
            }
            chan_code = min(
                cands,
                key=lambda c: sum(
                    plans[(nm, w)][1] for nm, w, _ in cands[c]
                ),
            )
            subs = [
                (arr, w, plans[(nm, w)]) for nm, w, arr in cands[chan_code]
            ]
        hdr = _BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize strategy
        hdr.write(0b0111, 4)  # blocksize: 16-bit value at header end
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        hdr.write(chan_code, 4)
        hdr.write(0b100, 3)  # 16-bit samples
        hdr.write(0, 1)  # reserved
        hdr.align()
        hdr_bytes = bytes(hdr.buf) + _utf8_code(fi) + struct.pack(">H", n - 1)
        frame = _BitWriter()
        frame.buf = bytearray(hdr_bytes)
        frame.buf.append(_crc8(hdr_bytes))
        for sub_blk, sub_bps, sub_plan in subs:
            _write_subframe(
                frame, sub_blk, sub_bps, partition_order, lpc_order,
                plan=sub_plan,
            )
        frame.align()
        frame.buf += struct.pack(">H", _crc16(bytes(frame.buf)))
        out += frame.buf
    return bytes(out)


class _BitReader:
    """MSB-first reader over a numpy bit array; Rice-optimized via the
    precomputed set-bit position index (terminator scan is a sorted
    lookup, not a per-bit loop)."""

    def __init__(self, data: bytes):
        import numpy as np

        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = 0
        self._op = 0  # monotone cursor into self.ones

    def read(self, nbits: int) -> int:
        import numpy as np

        if self.pos + nbits > len(self.bits):
            raise ValueError("truncated FLAC stream")
        sl = self.bits[self.pos : self.pos + nbits]
        self.pos += nbits
        return int(
            np.dot(sl.astype(np.int64), 1 << np.arange(nbits - 1, -1, -1))
        ) if nbits else 0

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def next_one(self) -> int:
        """Index of the first set bit at/after pos (unary terminator)."""
        import numpy as np

        ones = self.ones
        i = self._op
        if i >= len(ones) or ones[i] < self.pos:
            i = int(np.searchsorted(ones, self.pos))
        if i >= len(ones):
            raise ValueError("truncated FLAC stream (unary run past end)")
        self._op = i
        return int(ones[i])

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _read_residuals(r: _BitReader, blocksize: int, order: int):
    import numpy as np

    method = r.read(2)
    if method not in (0, 1):
        raise ValueError("reserved residual method")
    kbits = 4 if method == 0 else 5
    escape = (1 << kbits) - 1
    po = r.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise ValueError("partition order does not divide block size")
    out = []
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("predictor order exceeds first partition")
        k = r.read(kbits)
        if k == escape:
            raw = r.read(5)
            out.append(
                np.array([r.read_signed(raw) for _ in range(n)], np.int64)
            )
            continue
        vals = np.empty(n, dtype=np.int64)
        for i in range(n):
            t = r.next_one()
            q = t - r.pos
            r.pos = t + 1
            u = (q << k) | (r.read(k) if k else 0)
            vals[i] = (u >> 1) ^ -(u & 1)  # un-zigzag
        out.append(vals)
    return np.concatenate(out) if out else np.empty(0, np.int64)


def _read_subframe(r: "_BitReader", n: int, bps: int):
    """One channel's subframe at `bps` bits (17 for a stereo side
    channel): CONSTANT / VERBATIM / FIXED(0..4) / LPC(1..32)."""
    import numpy as np

    if r.read(1):
        raise ValueError("bad subframe padding bit")
    stype = r.read(6)
    if r.read(1):
        raise NotImplementedError("wasted bits unsupported")
    if stype == 0:
        return np.full(n, r.read_signed(bps), dtype=np.int64)
    if stype == 1:
        return np.array(
            [r.read_signed(bps) for _ in range(n)], dtype=np.int64
        )
    if 8 <= stype <= 12:
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _read_residuals(r, n, order)
        # invert o rounds of differencing: repeated prefix integration
        heads = []
        cur = np.array(warm, dtype=np.int64)
        for _ in range(order):
            heads.append(int(cur[0]))
            cur = np.diff(cur)
        blk = res
        for h in reversed(heads):
            blk = np.concatenate(([h], h + np.cumsum(blk, dtype=np.int64)))
        return blk
    if stype >= 32:
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        prec_code = r.read(4)
        if prec_code == 15:
            raise ValueError("invalid LPC coefficient precision")
        prec = prec_code + 1
        shift = r.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _read_residuals(r, n, order)
        # exact integer recurrence: x[i] = res + (Σ c_j·x[i−1−j] >> shift)
        x = list(map(int, warm)) + [0] * (n - order)
        for i in range(order, n):
            pred = 0
            for j in range(order):
                pred += coefs[j] * x[i - 1 - j]
            x[i] = int(res[i - order]) + (pred >> shift)
        return np.array(x, dtype=np.int64)
    raise ValueError("reserved subframe type")


def _read_utf8_code(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    while b0 & (0x80 >> nbytes):
        nbytes += 1
    if nbytes < 2 or nbytes > 7:
        raise ValueError("bad UTF-8-coded number")
    val = b0 & (0x7F >> nbytes)
    for _ in range(nbytes - 1):
        b = r.read(8)
        if b & 0xC0 != 0x80:
            raise ValueError("bad UTF-8 continuation")
        val = (val << 6) | (b & 0x3F)
    return val


def decode_flac(payload: bytes):
    """(samples float64 in [-1,1), sample_rate) from 16-bit FLAC — mono
    (returns (n,)) or stereo (returns (n, 2)), all four channel
    assignments (independent, left/side, right/side, mid/side) and all
    subframe types including LPC. Verifies the frame-header CRC-8,
    whole-frame CRC-16, and the STREAMINFO audio MD5 — a corrupted
    stream cannot round-trip."""
    import hashlib as _hashlib

    import numpy as np

    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sr = total = None
    md5 = b""
    while True:  # metadata blocks
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:
            if ln != 34:
                raise ValueError("bad STREAMINFO length")
            sr = (body[10] << 12) | (body[11] << 4) | (body[12] >> 4)
            ch = ((body[12] >> 1) & 0x7) + 1
            bps = (((body[12] & 1) << 4) | (body[13] >> 4)) + 1
            if ch not in (1, 2) or bps != 16:
                raise NotImplementedError(
                    "only mono/stereo 16-bit FLAC supported by the"
                    " built-in codec"
                )
            total = ((body[13] & 0x0F) << 32) | int.from_bytes(
                body[14:18], "big"
            )
            md5 = body[18:34]
        pos += 4 + ln
        if last:
            break
    if sr is None:
        raise ValueError("missing STREAMINFO")

    chunks = []
    got = 0
    while got < total:
        r = _BitReader(payload[pos:])
        if r.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        r.read(1)
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        sr_code = r.read(4)
        chan = r.read(4)
        ss_code = r.read(3)
        r.read(1)
        if chan not in (0b0000, 0b0001, 0b1000, 0b1001, 0b1010):
            raise NotImplementedError(
                "only mono / 2-channel frame assignments supported"
            )
        if ss_code != 0b100:
            raise NotImplementedError("only 16-bit frames supported")
        _read_utf8_code(r)
        if bs_code == 0b0110:
            n = r.read(8) + 1
        elif bs_code == 0b0111:
            n = r.read(16) + 1
        elif bs_code == 0b0001:
            n = 192
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError("reserved block size code")
        if sr_code == 0b1100:
            r.read(8)
        elif sr_code in (0b1101, 0b1110):
            r.read(16)
        elif sr_code == 0b1111:
            raise ValueError("invalid sample rate code")
        crc_hdr = r.read(8)
        if _crc8(payload[pos : pos + (r.pos - 8) // 8]) != crc_hdr:
            raise ValueError("frame header CRC mismatch")

        if chan == 0b0000:
            blk = _read_subframe(r, n, 16)
        else:
            # per-channel bps: a side channel carries one extra bit
            if chan == 0b0001:
                widths = (16, 16)
            elif chan == 0b1000:  # left/side
                widths = (16, 17)
            elif chan == 0b1001:  # side/right
                widths = (17, 16)
            else:  # mid/side
                widths = (16, 17)
            c0 = _read_subframe(r, n, widths[0])
            c1 = _read_subframe(r, n, widths[1])
            if chan == 0b0001:
                left, right = c0, c1
            elif chan == 0b1000:
                left, right = c0, c0 - c1
            elif chan == 0b1001:
                left, right = c0 + c1, c1
            else:  # mid/side (libFLAC reconstruction)
                mid2 = (c0 << 1) | (c1 & 1)
                left = (mid2 + c1) >> 1
                right = (mid2 - c1) >> 1
            blk = np.stack([left, right], axis=-1)
        r.align()
        crc_frame = r.read(16)
        if _crc16(payload[pos : pos + r.pos // 8 - 2]) != crc_frame:
            raise ValueError("frame CRC-16 mismatch")
        pos += r.pos // 8
        chunks.append(blk)
        got += n
    x = (
        np.concatenate(chunks)[:total]
        if chunks
        else np.empty(0, np.int64)
    )
    if md5 != b"\x00" * 16:
        if _hashlib.md5(x.astype("<i2").tobytes()).digest() != md5:
            raise ValueError("audio MD5 mismatch")
    return x.astype(np.float64) / 32768.0, sr


# --- JPEG (baseline sequential DCT, 4:4:4 / grayscale) ----------------------
# ITU-T T.81 baseline: level shift, 8x8 DCT-II, Annex-K-scaled quantization,
# zigzag, DC differential + run-length AC, canonical Huffman entropy coding
# with byte stuffing. The encoder computes OPTIMAL per-image Huffman tables
# (libjpeg's jpeg_gen_optimal_table algorithm) and writes them as DHT
# segments, so decoder correctness never depends on the Annex K constant
# tables; the decoder handles any conformant baseline 4:4:4 / gray stream.
# The first LOSSY codec in the family: round-trip tests assert PSNR bounds
# and quality monotonicity instead of byte equality.

_JPEG_ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# Annex K base quantization tables (luma, chroma), natural order
_JPEG_QL = (
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
)
_JPEG_QC = (
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
)


def _jpeg_dct_matrix():
    import numpy as np

    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    c = 0.5 * np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] /= np.sqrt(2)
    return c


def _jpeg_scaled_tables(quality: int):
    """libjpeg quality scaling: 5000/q below 50, 200-2q above."""
    import numpy as np

    q = max(1, min(100, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = []
    for t in (_JPEG_QL, _JPEG_QC):
        tq = np.floor((np.array(t, np.float64) * scale + 50) / 100)
        out.append(np.clip(tq, 1, 255))
    return out


def _jpeg_gen_huff_table(freq257):
    """Optimal length-limited Huffman table (libjpeg
    jpeg_gen_optimal_table): code sizes via least-frequent pair merging
    over a parent chain, Annex K.2 adjustment down to 16 bits, then the
    (bits[16], huffval) DHT representation. Symbol 256 is the reserved
    sentinel guaranteeing no real symbol is assigned the all-ones code."""
    freq = list(freq257)
    freq[256] = 1
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = c2 = -1
        v1 = v2 = 1 << 60
        for i in range(257):
            if freq[i] > 0:
                if freq[i] <= v1:
                    v2, c2 = v1, c1
                    v1, c1 = freq[i], i
                elif freq[i] <= v2:
                    v2, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    huffval = [
        s for size in range(1, 17) for s in range(256) if codesize[s] == size
    ]
    return bits[1:17], huffval


def _jpeg_canonical_codes(bits16, huffval):
    """symbol -> (length, code) under JPEG's canonical assignment — the
    same derivation the decoder applies to a DHT segment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits16[length - 1]):
            codes[huffval[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _JpegBitWriter:
    """MSB-first bit packer with 0xFF 0x00 byte stuffing (entropy data
    may never contain a bare 0xFF)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _jpeg_mag_bits(v: int):
    """(magnitude category, value bits): negatives use one's-complement
    offset per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return (s, v if v > 0 else v + (1 << s) - 1)


def _jpeg_blocks(plane):
    """(n_blocks, 8, 8) float64 view of an edge-padded plane, raster
    block order."""
    import numpy as np

    h, w = plane.shape
    p = np.pad(plane, ((0, -h % 8), (0, -w % 8)), mode="edge").astype(
        np.float64
    )
    hh, ww = p.shape
    return (
        p.reshape(hh // 8, 8, ww // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


def encode_jpeg(pixels, quality: int = 85, subsampling: str = "444") -> bytes:
    """Baseline JFIF JPEG from (h, w, 3) uint8 RGB or (h, w) uint8 gray.
    SOI + APP0 + DQT + SOF0 + DHT (optimal per-image tables) + SOS +
    entropy data + EOI. ``subsampling`` picks the chroma layout:
    ``"444"`` (1x1, every component full resolution) or ``"420"`` (2x2
    luma sampling — the mode nearly every real JPEG uses: Cb/Cr box-
    averaged 2x2, MCU = 16x16 px carrying four Y blocks then one Cb and
    one Cr). All DCT / quantization math is vectorized numpy over every
    block at once; only the entropy serialization walks symbols."""
    import struct

    import numpy as np

    px = np.asarray(pixels, np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if not gray and (px.ndim != 3 or px.shape[2] != 3):
        raise ValueError("expected (h, w, 3) RGB or (h, w) gray")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and not gray
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    if sub420:
        # pad to a 16-multiple (one full MCU) with edge replication,
        # then box-average chroma 2x2 — the canonical decimation filter
        yp = np.pad(
            planes[0], ((0, -h % 16), (0, -w % 16)), mode="edge"
        )
        hh16, ww16 = yp.shape
        sub = []
        for c in planes[1:]:
            cp = np.pad(c, ((0, -h % 16), (0, -w % 16)), mode="edge")
            sub.append(
                cp.reshape(hh16 // 2, 2, ww16 // 2, 2).mean(axis=(1, 3))
            )
        planes = [yp] + sub
    ncomp = len(planes)
    qtabs = _jpeg_scaled_tables(quality)
    dctm = _jpeg_dct_matrix()
    zz_idx = np.array(_JPEG_ZIGZAG)

    comp_codes = []
    for ci, plane in enumerate(planes):
        blocks = _jpeg_blocks(plane) - 128.0
        coef = np.einsum("km,bmn,ln->bkl", dctm, blocks, dctm)
        qt = qtabs[0 if ci == 0 else 1].reshape(8, 8)
        qc = np.round(coef / qt).astype(np.int32)
        comp_codes.append(qc.reshape(-1, 64)[:, zz_idx])

    # Block schedule: the exact interleaved MCU order of the scan, as
    # (component, raster block index) pairs. 4:4:4 visits one block per
    # component per 8x8 MCU; 4:2:0 visits Y's 2x2 sub-grid then Cb, Cr
    # per 16x16 MCU (T.81 A.2.3 data-unit ordering).
    if sub420:
        mcy, mcx = planes[0].shape[0] // 16, planes[0].shape[1] // 16
        ybw, cbw = mcx * 2, mcx
        schedule = []
        for my in range(mcy):
            for mx in range(mcx):
                for by in (0, 1):
                    for bx in (0, 1):
                        schedule.append(
                            (0, (2 * my + by) * ybw + 2 * mx + bx)
                        )
                schedule.append((1, my * cbw + mx))
                schedule.append((2, my * cbw + mx))
    else:
        n_mcu = ((w + 7) // 8) * ((h + 7) // 8)
        schedule = [
            (ci, m) for m in range(n_mcu) for ci in range(ncomp)
        ]
    ntab = 1 if gray else 2
    dc_freq = [[0] * 257 for _ in range(ntab)]
    ac_freq = [[0] * 257 for _ in range(ntab)]
    pred = [0] * ncomp
    sym_stream = []  # (table, is_dc, symbol, value_bits, value_len)
    for ci, m in schedule:
        t = 0 if ci == 0 else 1
        zz = comp_codes[ci][m]
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s, vb = _jpeg_mag_bits(diff)
        dc_freq[t][s] += 1
        sym_stream.append((t, True, s, vb, s))
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = int(nz[-1]) + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:  # ZRL
                ac_freq[t][0xF0] += 1
                sym_stream.append((t, False, 0xF0, 0, 0))
                run -= 16
            s, vb = _jpeg_mag_bits(v)
            sym = (run << 4) | s
            ac_freq[t][sym] += 1
            sym_stream.append((t, False, sym, vb, s))
            run = 0
        if last < 63:  # EOB
            ac_freq[t][0x00] += 1
            sym_stream.append((t, False, 0x00, 0, 0))

    dc_tabs = [_jpeg_gen_huff_table(f) for f in dc_freq]
    ac_tabs = [_jpeg_gen_huff_table(f) for f in ac_freq]
    dc_codes = [_jpeg_canonical_codes(*t) for t in dc_tabs]
    ac_codes = [_jpeg_canonical_codes(*t) for t in ac_tabs]

    wtr = _JpegBitWriter()
    for t, is_dc, sym, vb, vlen in sym_stream:
        length, code = (dc_codes if is_dc else ac_codes)[t][sym]
        wtr.write(code, length)
        if vlen:
            wtr.write(vb, vlen)
    wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    app0 = (
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1)
        + bytes([0, 0])
    )
    out += b"\xff\xe0" + struct.pack(">H", 2 + len(app0)) + app0
    for ti in range(ntab):
        body = bytes([ti]) + qtabs[ti].astype(np.uint8)[zz_idx].tobytes()
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        samp = 0x22 if (sub420 and ci == 0) else 0x11
        sof += bytes([ci + 1, samp, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for ti, (bits16, huffval) in enumerate(tabs):
            body = bytes([(cls << 4) | ti]) + bytes(bits16) + bytes(huffval)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += wtr.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(payload: bytes):
    """uint8 pixel array ((h, w, 3) RGB or (h, w) gray) from a baseline
    sequential JPEG — any conformant stream, not just this module's
    encoder output (tables are read from DQT/DHT). Handles the common
    sampling layouts natively: 4:4:4, 4:2:0 (the mode nearly every real
    JPEG uses), 4:2:2, and 4:4:0 — any per-component integer 1x/2x
    ratio; chroma planes decode at their stored resolution and
    replicate up (nearest-neighbor, the conformant baseline since T.81
    leaves the upsampling filter unspecified). Dequantization happens
    in zigzag (entropy) space with the table exactly as stored, then
    coefficients un-zigzag and every block IDCTs in one vectorized
    einsum. Progressive (SOF2), 12-bit, arithmetic-coded, exotic-
    sampling, and restart-interval streams raise — they belong to the
    library seam (Pillow plugs in at ``decode_media``)."""
    import struct

    import numpy as np

    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG")
    pos = 2
    qtabs = {}
    htabs = {}
    sof = None
    comps = None
    scan = None
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            bpos = 0
            while bpos < len(body):
                pq, tq = body[bpos] >> 4, body[bpos] & 0xF
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables unsupported"
                    )
                # keep ZIGZAG order (as stored): dequantization happens
                # in entropy space, before un-zigzagging
                qtabs[tq] = np.frombuffer(
                    body[bpos + 1 : bpos + 65], np.uint8
                ).astype(np.float64)
                bpos += 65
        elif marker == 0xC4:  # DHT
            bpos = 0
            while bpos < len(body):
                tc, th = body[bpos] >> 4, body[bpos] & 0xF
                bits16 = list(body[bpos + 1 : bpos + 17])
                nsym = sum(bits16)
                huffval = list(body[bpos + 17 : bpos + 17 + nsym])
                # T.81 F.2.2.3 DECODE tables: per code length l the valid
                # canonical codes form the range [mincode[l], maxcode[l]]
                # and index huffval at valptr[l] — no per-probe hashing
                mincode = [0] * 17
                maxcode = [-1] * 17
                valptr = [0] * 17
                code = 0
                k = 0
                for length in range(1, 17):
                    if bits16[length - 1]:
                        valptr[length] = k
                        mincode[length] = code
                        code += bits16[length - 1]
                        k += bits16[length - 1]
                        maxcode[length] = code - 1
                    else:
                        maxcode[length] = -1
                    code <<= 1
                htabs[(tc, th)] = (mincode, maxcode, valptr, huffval)
                bpos += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline sequential
            if body[0] != 8:
                raise NotImplementedError("only 8-bit precision supported")
            hh, ww = struct.unpack(">HH", body[1:5])
            nc = body[5]
            comps = []
            for i in range(nc):
                cid, samp, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
            sof = (hh, ww, nc)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) supported"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack(">H", body[:2])
            if ri != 0:
                raise NotImplementedError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            scan = [
                (body[1 + 2 * i], body[2 + 2 * i] >> 4, body[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            pos += seglen
            break
        pos += seglen
    if sof is None or scan is None:
        raise ValueError("missing SOF/SOS segment")
    h, w, nc = sof
    if len(scan) != nc:
        raise NotImplementedError("multi-scan streams unsupported")

    # Un-stuff the entropy segment once (0xFF 0x00 -> 0xFF); any real
    # marker terminates the scan data (EOI legitimately follows the last
    # MCU — running out of bits before then is a hard truncation error).
    data = payload[pos:]
    clean = bytearray()
    i = 0
    nd = len(data)
    while i < nd:
        b = data[i]
        if b == 0xFF:
            if i + 1 >= nd:
                break
            nxt = data[i + 1]
            if nxt == 0x00:
                clean.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                raise NotImplementedError("restart markers unsupported")
            break  # EOI / next segment ends the entropy data
        clean.append(b)
        i += 1

    # Sampling geometry (T.81 A.1.1/A.2.3). A single-component scan is
    # non-interleaved by definition: its data unit is one block in
    # raster order regardless of declared factors. Interleaved scans
    # support any factor layout whose per-component upsampling ratio
    # (hmax/hi, vmax/vi) is an integer in {1, 2} — i.e. 4:4:4, 4:2:0,
    # 4:2:2, 4:4:0; anything rarer stays behind the library seam.
    if nc == 1:
        factors = [(1, 1)]
    else:
        factors = [(comps[ci][1], comps[ci][2]) for ci in range(nc)]
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    for hi, vi in factors:
        if (
            hi < 1 or vi < 1 or hmax % hi or vmax % vi
            or hmax // hi > 2 or vmax // vi > 2 or hmax > 2 or vmax > 2
        ):
            raise NotImplementedError(
                f"sampling layout {factors} unsupported (only integer"
                " 1x/2x component ratios); wire Pillow here for exotic"
                " subsampling"
            )
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    comp_geom = []  # (block-grid width, block-grid height) per component
    for hi, vi in factors:
        comp_geom.append((mcx * hi, mcy * vi))
    # interleaved data-unit order, as (component, raster block) pairs
    schedule = []
    for my in range(mcy):
        for mx in range(mcx):
            for ci in range(nc):
                hi, vi = factors[ci]
                bwc = comp_geom[ci][0]
                for by in range(vi):
                    for bx in range(hi):
                        schedule.append(
                            (ci, (my * vi + by) * bwc + mx * hi + bx)
                        )
    comp_q = [qtabs[comps[ci][3]] for ci in range(nc)]
    comp_dc = [htabs[(0, scan[ci][1])] for ci in range(nc)]
    comp_ac = [htabs[(1, scan[ci][2])] for ci in range(nc)]
    coefs = [
        np.zeros((comp_geom[ci][0] * comp_geom[ci][1], 64), np.float64)
        for ci in range(nc)
    ]
    pred = [0] * nc
    # Inlined T.81 F.2.2 entropy decode: a local-variable bit cursor
    # (acc/nbits/p) and range-table Huffman decode — this loop runs once
    # per coefficient, so per-bit method calls would dominate decode time
    # (measured ~3x on the media pipeline).
    acc = 0
    nbits = 0
    p = 0
    ncl = len(clean)
    zz = np.zeros(64, np.float64)
    for ci, m in schedule:
        dc_min, dc_max, dc_ptr, dc_val = comp_dc[ci]
        ac_min, ac_max, ac_ptr, ac_val = comp_ac[ci]
        zz[:] = 0.0
        k = 0
        while True:  # one DC symbol, then AC symbols until EOB/63
            if k == 0:
                tmin, tmax, tptr, tval = dc_min, dc_max, dc_ptr, dc_val
            else:
                tmin, tmax, tptr, tval = ac_min, ac_max, ac_ptr, ac_val
            code = 0
            length = 0
            while True:
                if nbits == 0:
                    if p >= ncl:
                        raise ValueError(
                            "truncated JPEG entropy stream"
                        )
                    acc = clean[p]
                    p += 1
                    nbits = 8
                nbits -= 1
                code = (code << 1) | ((acc >> nbits) & 1)
                length += 1
                if code <= tmax[length]:
                    sym = tval[tptr[length] + code - tmin[length]]
                    break
                if length >= 16:
                    raise ValueError("invalid Huffman code")
            if k == 0:
                s = sym
            else:
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r == 15:  # ZRL
                        k += 16
                        if k > 63:
                            raise ValueError(
                                "AC coefficient index overflow"
                            )
                        continue
                    break  # EOB
                k += r
                if k > 63:
                    raise ValueError("AC coefficient index overflow")
            # read s magnitude bits (chunked from the byte cursor)
            v = 0
            need = s
            while need:
                if nbits == 0:
                    if p >= ncl:
                        raise ValueError(
                            "truncated JPEG entropy stream"
                        )
                    acc = clean[p]
                    p += 1
                    nbits = 8
                take = need if need < nbits else nbits
                nbits -= take
                v = (v << take) | ((acc >> nbits) & ((1 << take) - 1))
                need -= take
            if s and v < (1 << (s - 1)):  # EXTEND (T.81 F.2.2.1)
                v -= (1 << s) - 1
            if k == 0:
                pred[ci] += v
                zz[0] = pred[ci]
                k = 1
            else:
                zz[k] = v
                k += 1
                if k > 63:
                    break
        coefs[ci][m] = zz * comp_q[ci]

    dctm = _jpeg_dct_matrix()
    zz_idx = np.array(_JPEG_ZIGZAG)
    planes = []
    for ci in range(nc):
        bwc, bhc = comp_geom[ci]
        hi, vi = factors[ci]
        blk = np.zeros((bwc * bhc, 64), np.float64)
        blk[:, zz_idx] = coefs[ci]
        blk = blk.reshape(-1, 8, 8)
        spatial = np.einsum("mk,bkl,nl->bmn", dctm.T, blk, dctm.T) + 128.0
        grid = spatial.reshape(bhc, bwc, 8, 8).transpose(0, 2, 1, 3)
        plane = grid.reshape(bhc * 8, bwc * 8)
        # crop to the component's true extent, then replicate up to full
        # resolution (T.81 leaves the upsampling filter unspecified;
        # nearest-neighbor is the conformant baseline choice)
        cw = (w * hi + hmax - 1) // hmax
        ch = (h * vi + vmax - 1) // vmax
        plane = plane[:ch, :cw]
        if hi != hmax or vi != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )
        planes.append(plane[:h, :w])
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - 128.0),
            y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0),
            y + 1.772 * (cb - 128.0),
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- MP4 / ISO BMFF (uncompressed 'v308' video track) -----------------------
# The container graduated in round 7; the compressed video BITSTREAM
# (avc1/hev1 ...) is the honest remaining seam — decode_mp4 walks
# ftyp/moov/trak/stbl natively and raises NotImplementedError exactly at
# the sample-entry codec dispatch, where a library decoder plugs in.


def _mp4_box(tag: bytes, *payloads: bytes) -> bytes:
    import struct

    body = b"".join(payloads)
    return struct.pack(">I", 8 + len(body)) + tag + body


def _mp4_full(tag: bytes, version: int, flags: int,
              *payloads: bytes) -> bytes:
    import struct

    return _mp4_box(
        tag, struct.pack(">I", (version << 24) | flags), *payloads
    )


def _mp4_matrix() -> bytes:
    import struct

    return struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4(frames, fps: int = 25, codec: str = "v308",
               quality: int = 90) -> bytes:
    """ISO BMFF (MP4) bytes from (n_frames, h, w) uint8 luma: one video
    track with a complete sample table (stsd/stts/stsc/stsz/stco) — a
    conformant file an mp4box/ffprobe walks. ``codec`` picks the track
    payload:

    - ``"v308"`` — uncompressed 8-bit 4:4:4 YCbCr (per-pixel Cr/Y/Cb),
      chroma neutral 128 matching the Y4M encoder's convention, so the
      two raw video containers are content-transparent for the same
      luma stream; constant sample size.
    - ``"mjpeg"`` — Motion JPEG: every sample is a complete baseline
      4:2:0 JPEG from this module's own encoder (``jpeg`` sample
      entry, the QuickTime-lineage MJPEG signaling), so the container
      carries a genuinely compressed entropy-coded bitstream
      end-to-end; per-sample sizes in stsz.
    """
    import struct

    import numpy as np

    fr = np.ascontiguousarray(frames, np.uint8)
    n, h, w = fr.shape
    if codec == "mjpeg":
        jpegs = [
            encode_jpeg(
                np.repeat(f[..., None], 3, axis=-1), quality,
                subsampling="420",
            )
            for f in fr
        ]
        sizes = [len(j) for j in jpegs]
        frame_size = 0  # per-sample table
        mdat_payload = b"".join(jpegs)
    elif codec == "v308":
        sample = np.empty((n, h, w, 3), np.uint8)
        sample[..., 0] = 128  # Cr
        sample[..., 1] = fr   # Y
        sample[..., 2] = 128  # Cb
        frame_size = h * w * 3
        sizes = None
        mdat_payload = sample.reshape(n, -1).tobytes()
    else:
        raise ValueError("codec must be 'v308' or 'mjpeg'")

    ftyp = _mp4_box(
        b"ftyp", b"isom", struct.pack(">I", 512), b"isom", b"mp42"
    )
    mdat = _mp4_box(b"mdat", mdat_payload)
    first_sample_off = len(ftyp) + 8  # mdat header

    timescale, duration = fps, n
    mvhd = _mp4_full(
        b"mvhd", 0, 0,
        struct.pack(">II", 0, 0),
        struct.pack(">II", timescale, duration),
        struct.pack(">I", 0x00010000),
        struct.pack(">H", 0x0100),
        b"\x00" * 10,
        _mp4_matrix(),
        b"\x00" * 24,
        struct.pack(">I", 2),
    )
    tkhd = _mp4_full(
        b"tkhd", 0, 7,
        struct.pack(">II", 0, 0),
        struct.pack(">I", 1),
        b"\x00" * 4,
        struct.pack(">I", duration),
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),
        _mp4_matrix(),
        struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _mp4_full(
        b"mdhd", 0, 0,
        struct.pack(">II", 0, 0),
        struct.pack(">II", timescale, duration),
        struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _mp4_full(
        b"hdlr", 0, 0,
        b"\x00" * 4, b"vide", b"\x00" * 12, b"VideoHandler\x00",
    )
    vmhd = _mp4_full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _mp4_full(
        b"dref", 0, 0, struct.pack(">I", 1), _mp4_full(b"url ", 0, 1)
    )
    entry = _mp4_box(
        b"jpeg" if codec == "mjpeg" else b"v308",
        b"\x00" * 6,
        struct.pack(">H", 1),
        b"\x00" * 16,
        struct.pack(">HH", w, h),
        struct.pack(">II", 0x00480000, 0x00480000),
        b"\x00" * 4,
        struct.pack(">H", 1),
        b"\x00" * 32,
        struct.pack(">Hh", 24, -1),
    )
    stsd = _mp4_full(b"stsd", 0, 0, struct.pack(">I", 1), entry)
    stts = _mp4_full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _mp4_full(
        b"stsc", 0, 0, struct.pack(">I", 1), struct.pack(">III", 1, n, 1)
    )
    if sizes is None:
        stsz = _mp4_full(b"stsz", 0, 0, struct.pack(">II", frame_size, n))
    else:
        stsz = _mp4_full(
            b"stsz", 0, 0, struct.pack(">II", 0, n),
            struct.pack(f">{n}I", *sizes),
        )
    stco = _mp4_full(
        b"stco", 0, 0, struct.pack(">I", 1),
        struct.pack(">I", first_sample_off),
    )
    stbl = _mp4_box(b"stbl", stsd, stts, stsc, stsz, stco)
    minf = _mp4_box(b"minf", vmhd, _mp4_box(b"dinf", dref), stbl)
    mdia = _mp4_box(b"mdia", mdhd, hdlr, minf)
    trak = _mp4_box(b"trak", tkhd, mdia)
    moov = _mp4_box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


def _mp4_walk(data: bytes, start: int, end: int):
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if size == 1:
            raise NotImplementedError("64-bit (co64-style) boxes unsupported")
        if size < 8 or pos + size > end:
            raise ValueError(f"malformed box {tag!r}")
        yield tag, pos + 8, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, tag: bytes):
    for t, s, e in _mp4_walk(data, start, end):
        if t == tag:
            return s, e
    raise ValueError(f"missing {tag.decode()} box")


def decode_mp4(payload: bytes):
    """(frames (n, h, w) uint8 luma, (w, h)) — full decode of every
    sample; see :func:`_decode_mp4`."""
    frames, wh, _n = _decode_mp4(payload, None)
    return frames, wh


def decode_mp4_sampled(payload: bytes, k: int = 4):
    """(sampled frames (k, h, w), (w, h), n_samples): decodes ONLY the
    k evenly-spaced sampled frames. For the Motion-JPEG track this
    skips the entropy decode of every unsampled frame — per-sample
    independence is MJPEG's defining property, and at pipeline scale
    (featurize 4 frames of an n-frame clip) it makes decode cost
    O(k), not O(n). The sample table walk itself is metadata-only."""
    return _decode_mp4(payload, lambda n: sample_frame_indices(n, k))


def _decode_mp4(payload: bytes, picker):
    """(frames (m, h, w) uint8 luma, (w, h), n_samples) from an ISO BMFF
    file; ``picker`` maps n_samples → the sample indices to decode
    (None = all). The file may carry an uncompressed ``v308`` track or
    a Motion-JPEG ``jpeg`` track (every sample a complete baseline
    JPEG, decoded by this
    module's own entropy decoder — a genuinely compressed bitstream
    end-to-end) — the same contract as ``decode_y4m``. The box walker
    handles general stsc/stsz/stco sample layouts, not just this
    module's single-chunk output; inter-frame-predicted sample entries
    (avc1/hev1 ...) raise at the seam INSIDE the container — that
    bitstream decoder is what a library provides, the container walk
    is native. 64-bit offsets and fragmented (moof) files also
    raise."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF / MP4 stream")
    moov_s, moov_e = _mp4_find(payload, 0, len(payload), b"moov")
    video = None
    for t, s, e in _mp4_walk(payload, moov_s, moov_e):
        if t != b"trak":
            continue
        mdia_s, mdia_e = _mp4_find(payload, s, e, b"mdia")
        hdlr_s, _ = _mp4_find(payload, mdia_s, mdia_e, b"hdlr")
        if payload[hdlr_s + 8 : hdlr_s + 12] == b"vide":
            video = (mdia_s, mdia_e)
            break
    if video is None:
        raise ValueError("no video track")
    mdia_s, mdia_e = video
    minf_s, minf_e = _mp4_find(payload, mdia_s, mdia_e, b"minf")
    stbl_s, stbl_e = _mp4_find(payload, minf_s, minf_e, b"stbl")

    stsd_s, _ = _mp4_find(payload, stbl_s, stbl_e, b"stsd")
    entry_tag = payload[stsd_s + 12 : stsd_s + 16]
    if entry_tag not in (b"v308", b"jpeg"):
        raise NotImplementedError(
            f"compressed video codec {entry_tag!r} requires a library"
            " decoder; the container is parsed, the bitstream is the seam"
        )
    mjpeg = entry_tag == b"jpeg"
    ent = stsd_s + 8  # past version/flags + entry_count
    w, h = struct.unpack(">HH", payload[ent + 32 : ent + 36])

    stsz_s, _ = _mp4_find(payload, stbl_s, stbl_e, b"stsz")
    sample_size, n_samples = struct.unpack(
        ">II", payload[stsz_s + 4 : stsz_s + 12]
    )
    if sample_size == 0:
        sizes = list(
            struct.unpack(
                f">{n_samples}I",
                payload[stsz_s + 12 : stsz_s + 12 + 4 * n_samples],
            )
        )
    else:
        sizes = [sample_size] * n_samples

    stco_s, _ = _mp4_find(payload, stbl_s, stbl_e, b"stco")
    (n_chunks,) = struct.unpack(">I", payload[stco_s + 4 : stco_s + 8])
    offsets = struct.unpack(
        f">{n_chunks}I", payload[stco_s + 8 : stco_s + 8 + 4 * n_chunks]
    )

    stsc_s, _ = _mp4_find(payload, stbl_s, stbl_e, b"stsc")
    (n_stsc,) = struct.unpack(">I", payload[stsc_s + 4 : stsc_s + 8])
    stsc_rows = [
        struct.unpack(
            ">III", payload[stsc_s + 8 + 12 * i : stsc_s + 20 + 12 * i]
        )
        for i in range(n_stsc)
    ]
    per_chunk = []
    for ci in range(n_chunks):
        spc = 1
        for first, count, _ in stsc_rows:
            if ci + 1 >= first:
                spc = count
        per_chunk.append(spc)

    # materialize every sample's (offset, size) from the chunk walk —
    # pure metadata, no payload bytes touched yet
    spans = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci]):
            if si >= n_samples:
                break
            spans.append((pos, sizes[si]))
            pos += sizes[si]
            si += 1
    if si != n_samples:
        raise ValueError("sample count mismatch")

    expect = h * w * 3
    pick = range(n_samples) if picker is None else picker(n_samples)
    frames = []
    for i in pick:
        pos, size = spans[i]
        raw = payload[pos : pos + size]
        if len(raw) != size:
            raise ValueError("truncated mdat")
        if mjpeg:
            px = decode_jpeg(bytes(raw))
            if px.shape[:2] != (h, w):
                raise ValueError("mjpeg sample dimension mismatch")
            if px.ndim == 3:  # BT.601 luma of the reconstructed RGB
                px = np.clip(
                    np.round(
                        0.299 * px[..., 0]
                        + 0.587 * px[..., 1]
                        + 0.114 * px[..., 2]
                    ),
                    0,
                    255,
                ).astype(np.uint8)
            frames.append(px)
        else:
            if size != expect:
                raise ValueError("v308 sample size mismatch")
            px = np.frombuffer(raw, np.uint8).reshape(h, w, 3)
            frames.append(px[..., 1].copy())  # Y of (Cr, Y, Cb)
    return np.stack(frames), (w, h), n_samples


_REAL_DECODERS = {
    "wav": decode_wav,
    "ppm": decode_ppm,
    "y4m": decode_y4m,
    "png": decode_png,
    "gif": decode_gif,
    "flac": decode_flac,
    "jpeg": decode_jpeg,
    "mp4": decode_mp4,
}


def decode_media(kind: str, payload: bytes, meta: dict[str, Any], *,
                 fake: bool = True):
    """THE CODEC SEAM.

    ``fake=True``: deterministic pseudo-decode (BLAKE2b stream keyed by
    the payload) so plumbing is testable independent of any codec.
    ``fake=False``: real decode for every format this engine ships codecs
    for (wav/ppm/y4m raw; png/gif/flac/jpeg compressed; mp4 container);
    formats with no built-in codec (webm, raw h264/hevc bitstreams …)
    raise ``NotImplementedError`` here, the exact call site where
    Pillow / soundfile / pyav plug in without any schema or call-site
    change. PNG graduated from this seam in round 5 (stdlib zlib +
    numpy unfiltering, ``decode_png``); GIF87a/LZW graduated in round 6
    (variable-width LZW with clear-code resets, ``decode_gif``); FLAC,
    baseline JPEG, and the MP4/ISO-BMFF container graduated in round 7
    (``decode_flac``; ``decode_jpeg`` — the first lossy member;
    ``decode_mp4`` — compressed sample entries like avc1 still raise at
    the in-container codec dispatch).
    """
    if fake:
        return hashlib.blake2b(payload, digest_size=32).digest()
    fmt = meta["format"]
    dec = _REAL_DECODERS.get(fmt)
    if dec is None:
        raise NotImplementedError(
            f"{fmt!r} decode requires a codec library not present in this "
            "environment; wire Pillow/ffmpeg/torchaudio here"
        )
    return dec(payload)


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


# --- memoized payload builders for synthesize_real_media -------------------
# The arithmetic content is periodic in the id — image pixels depend only on
# (w, h, 7·mid mod 256), audio samples on mid mod 40, video frames on
# (n_frames, mid mod 256) — so the encoded payload for each distinct content
# key is built ONCE per Python worker and reused byte-identically. This is
# fixture synthesis, not the measured decode path: memoizing it keeps the
# generator from dominating the bench (round-3: 8.4 s at sf0.1, mostly
# mgrid/sin/encode re-run per row) while every downstream byte stays exactly
# what the uncached loop produced. Module-level (not closures) so
# cloudpickle ships them by reference and the cache lives per worker.


@_lru_cache(maxsize=None)  # ≤ 32·256 image + 40 audio + 10·256 video keys
def _image_payload(w: int, h: int, phase: int, fmt: str = "ppm") -> bytes:
    import numpy as np

    yy, xx = np.mgrid[0:h, 0:w]
    px = np.stack(
        [(3 * xx + 5 * yy + phase + 11 * c) % 256 for c in range(3)],
        axis=-1,
    ).astype(np.uint8)
    if fmt == "png":
        # cycle the vectorizable filters (None/Sub/Up) so the pipeline
        # exercises real unfiltering at numpy speed; the sequential
        # Average/Paeth paths are covered by unit round-trip + golden
        # tests, not paid per-row in the hot pipeline
        return encode_png(px, filter_mode="fast")
    if fmt == "gif":
        # the gradient uses <=256 distinct colors by construction
        # (each pixel's RGB is determined by (3x+5y+phase) mod 256)
        return encode_gif(px)
    if fmt == "jpeg":
        # the lossy member of the rotation: downstream features are
        # computed from the DECODED (reconstructed) pixels, which the
        # deterministic codec makes identical on every executor;
        # alternate chroma layouts so both sampling decoders run
        sub = ("444", "420")[(phase // 2) % 2]
        return encode_jpeg(px, quality=85, subsampling=sub)
    return encode_ppm(px)


@_lru_cache(maxsize=None)
def _audio_payload(step: int, fmt: str = "wav") -> bytes:
    import numpy as np

    sr, n = 16000, 800
    t = np.arange(n) / sr
    freq = 100.0 + step * 20.0
    samples = 0.5 * np.sin(2 * np.pi * freq * t) + 0.25 * np.sin(
        2 * np.pi * 2 * freq * t
    )
    if fmt == "flac":
        # alternate mono and stereo (phase-shifted right channel) so
        # both channel layouts — and with them the mid/side and LPC
        # paths — execute inside the registered pipeline
        if step % 2:
            right = 0.5 * np.sin(2 * np.pi * freq * t + 0.3)
            samples = np.stack([samples, right], axis=-1)
        return encode_flac(samples, sr)
    return encode_wav(samples, sr)


@_lru_cache(maxsize=None)
def _video_payload(nf: int, phase: int, fmt: str = "y4m") -> bytes:
    import numpy as np

    h, w = 16, 32
    ff, yy, xx = np.mgrid[0:nf, 0:h, 0:w]
    frames = ((xx + 2 * yy + 17 * ff + phase) % 256).astype(np.uint8)
    if fmt == "mp4":
        return encode_mp4(frames)
    if fmt == "mjpeg":
        return encode_mp4(frames, codec="mjpeg")
    return encode_y4m(frames)


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table with REAL payloads: each doc becomes a
    genuine WAV / PPM / Y4M bytestream (arithmetic content keyed by id —
    sine tones, gradients, moving patterns), so the decode path below
    parses actual container formats. Same kind assignment as
    :func:`synthesize_media` (id % 3). Generation first fans the narrow
    id projection across the session's full parallelism: payload
    synthesis and codec encode are Python-bound, and a small fixture
    arrives as ONE parquet split (a 5000-row file is a single row
    group), which would serialize the whole Arrow stage on one core.
    The exchange moves only 8-byte ids — negligible against the payload
    work it parallelizes; at real scale the scan has natural splits and
    the repartition cost stays proportionally irrelevant."""
    from vector_search_playground_spark.sources import fan_out

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _synth_row(int(mid)) for mid in pdf["doc_id"].astype("int64")
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "meta"]
            )

    return fan_out(docs.select("doc_id")).mapInPandas(gen, MEDIA_SCHEMA)


def _synth_row(mid: int) -> tuple:
    """One synthesized media row (media_id, kind, payload, meta) —
    shared by the standalone media table and the fused featurize path,
    so the two can never drift."""
    kind = KINDS[mid % 3]
    if kind == "image":
        w, h = (mid % 8 + 1) * 16, (mid % 4 + 1) * 16
        # rotate raw/compressed containers per id so all four image
        # codecs run inside the registered pipeline (ppm raw, png
        # zlib, gif LZW, jpeg DCT)
        fmt = ("png", "ppm", "gif", "jpeg")[(mid // 3) % 4]
        return (mid, kind, _image_payload(w, h, (7 * mid) % 256, fmt),
                {"format": fmt, "width": w, "height": h,
                 "sample_rate": None, "n_frames": None})
    if kind == "audio":
        # rotate raw/compressed audio containers per id so both codecs
        # run inside the registered pipeline (wav PCM, flac
        # fixed-predictor + Rice)
        afmt = ("wav", "flac")[(mid // 3) % 2]
        return (mid, kind, _audio_payload(mid % 40, afmt),
                {"format": afmt, "width": None, "height": None,
                 "sample_rate": 16000, "n_frames": None})
    nf = mid % 10 + 2
    # rotate the raw interchange container (y4m) with the ISO BMFF
    # container in both track flavors: uncompressed v308 and
    # Motion-JPEG (per-sample baseline 4:2:0 JPEGs — a genuinely
    # compressed bitstream inside the container)
    vfmt = ("y4m", "mp4", "mjpeg")[(mid // 3) % 3]
    return (mid, kind, _video_payload(nf, mid % 256, vfmt),
            {"format": "mp4" if vfmt == "mjpeg" else vfmt,
             "width": 32, "height": 16,
             "sample_rate": None, "n_frames": nf})


def synthesize_and_featurize_real(docs: DataFrame) -> DataFrame:
    """Fused synthesize → real-decode → featurize in ONE ``mapInPandas``
    stage. Row-identical to ``extract_features(synthesize_real_media(
    docs), fake=False)`` — both sides call the same ``_synth_row`` /
    ``_featurize_real`` helpers — but the multi-KB payload column never
    crosses the Arrow boundary: the unfused form ships every payload
    JVM→Python (synth output) and Python→JVM→Python again (featurize
    input), three serialized passes over the heaviest column for zero
    relational work in between. Only 8-byte ids enter the stage and
    only fixed-width feature rows leave it."""
    from vector_search_playground_spark.sources import fan_out

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, nbytes, features, sampled = [], [], [], [], []
            for mid in pdf["doc_id"].astype("int64"):
                mid, kind, payload, meta = _synth_row(int(mid))
                f, s = _featurize_real(kind, payload, meta)
                ids.append(mid)
                kinds.append(kind)
                nbytes.append(len(payload))
                features.append(f)
                sampled.append(s)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "kind": kinds,
                    "payload_bytes": pd.Series(nbytes, dtype="int32"),
                    "features": features,
                    "sampled_frames": sampled,
                }
            )

    return fan_out(docs.select("doc_id")).mapInPandas(run, FEATURES_SCHEMA)


def _audio_features(samples, sr: int) -> list[float]:
    """Real DSP statistics, each scaled into [0, 1]: duration, RMS,
    zero-crossing rate, normalized spectral centroid, peak, mean |x|,
    normalized sample rate, and a constant validity bit."""
    import numpy as np

    samples = np.asarray(samples)
    if samples.ndim == 2:  # stereo: feature over the mono downmix
        samples = samples.mean(axis=1)
    n = len(samples)
    if n == 0:
        return [0.0] * FEATURE_DIM
    rms = float(np.sqrt(np.mean(samples**2)))
    zcr = float(np.mean(np.signbit(samples[1:]) != np.signbit(samples[:-1])))
    mag = np.abs(np.fft.rfft(samples))
    freqs = np.fft.rfftfreq(n, 1.0 / sr)
    centroid = float((freqs * mag).sum() / mag.sum()) if mag.sum() > 0 else 0.0
    return [
        min(n / sr / 10.0, 1.0),
        min(rms, 1.0),
        zcr,
        min(centroid / (sr / 2.0), 1.0),
        float(np.max(np.abs(samples))),
        float(np.mean(np.abs(samples))),
        min(sr / 48000.0, 1.0),
        1.0,
    ]


def _image_features(px) -> list[float]:
    """Per-channel means, gray extremes/σ, and normalized dimensions."""
    import numpy as np

    h, w = px.shape[:2]
    gray = px.mean(axis=-1)
    return [
        float(px[..., 0].mean()) / 255.0,
        float(px[..., 1].mean()) / 255.0,
        float(px[..., 2].mean()) / 255.0,
        float(gray.std()) / 255.0,
        float(gray.min()) / 255.0,
        float(gray.max()) / 255.0,
        min(w / 1024.0, 1.0),
        min(h / 1024.0, 1.0),
    ]


def _video_features(frames, idxs: list[int], w: int, h: int,
                    n_total: int | None = None) -> list[float]:
    """Mean luma of each sampled frame (padded to 4), frame count and
    dimensions normalized, σ across the sampled lumas. ``n_total``
    carries the clip's full frame count when ``frames`` holds only the
    sampled subset (the selective mp4 decode path)."""
    import numpy as np

    lumas = [float(frames[i].mean()) / 255.0 for i in idxs]
    padded = (lumas + [0.0] * 4)[:4]
    spread = float(np.std(lumas)) if lumas else 0.0
    n = len(frames) if n_total is None else n_total
    return padded + [min(n / 256.0, 1.0), min(w / 1024.0, 1.0),
                     min(h / 1024.0, 1.0), spread]


def _featurize_real(kind: str, payload: bytes, meta: dict[str, Any]):
    """(features, sampled_frames) through the real decoders."""
    if kind == "video" and meta.get("format") == "mp4":
        # selective decode: only the sampled frames are reconstructed —
        # for the MJPEG track that skips the entropy decode of every
        # unsampled frame (decode cost O(k), not O(n_frames))
        sub, (w, h), n_total = decode_mp4_sampled(payload)
        idxs = sample_frame_indices(n_total)
        feats = _video_features(
            sub, list(range(len(sub))), w, h, n_total=n_total
        )
        return feats, idxs
    obj = decode_media(kind, payload, meta, fake=False)
    if kind == "audio":
        samples, sr = obj
        return _audio_features(samples, sr), None
    if kind == "image":
        return _image_features(obj), None
    frames, (w, h) = obj
    idxs = sample_frame_indices(len(frames))
    return _video_features(frames, idxs, w, h), idxs


def extract_features(media: DataFrame, *, fake: bool = True) -> DataFrame:
    """decode → (frame-sample for video) → featurize, as one
    ``mapInPandas`` stage: Arrow delivers columnar batches, the loop body
    touches each payload once, output schema is declared up front. This
    is the pattern a real model-inference stage inherits unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                features = [
                    _features_from(decode_media(k, p, m, fake=True))
                    for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
                ]
                sampled = [
                    sample_frame_indices(m["n_frames"])
                    if k == "video" else None
                    for k, m in zip(pdf["kind"], pdf["meta"])
                ]
            else:
                pairs = [
                    _featurize_real(k, p, m)
                    for k, p, m in zip(pdf["kind"], pdf["payload"], pdf["meta"])
                ]
                features = [f for f, _ in pairs]
                sampled = [s for _, s in pairs]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": features,
                    "sampled_frames": sampled,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)
