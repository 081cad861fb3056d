"""From-scratch Apache Avro Object Container File (OCF) writer + reader.

The Spark distribution in this container ships the Avro *core* jars
(avro-1.12.1) but NOT the ``spark-avro`` external data-source module, so
``spark.read.format("avro")`` fails with "Failed to find data source" and
no jar is fetchable offline. Rather than documenting a blocker, this module
implements the container format itself from the public specification
(https://avro.apache.org/docs/1.11.1/specification/ — magic, header
metadata map, sync markers, deflate-codec data blocks, zigzag-varint
binary encoding), the same from-scratch-codec posture as
``functions/multimodal.py``'s PNG/JPEG/FLAC/MP4 tier.

Scope (honestly stated): records whose fields are primitives
(long / int / string / bytes / double / boolean) or 2-branch
``["null", <prim>]`` unions — the relational-table shape. The reader is
driven by the ``avro.schema`` JSON embedded in each file's header (it
decodes what the file declares, not what the caller assumes); unsupported
schema shapes raise, they are never silently skipped.

Scale posture:
- The WRITER runs inside ``mapInPandas`` — one OCF file per Spark
  partition, streamed block-by-block (BLOCK_ROWS rows per Avro block, raw
  RFC-1951 deflate per block as the spec requires), so executor memory is
  bounded by one block, never the partition. On a real cluster the target
  directory is shared storage; the task writes to a temp name and renames,
  so speculative/retried tasks never interleave bytes.
- The READER has two scan paths. ``scan_avro_dataset`` ingests via
  Spark's ``binaryFile`` source (whole-file parallelism) and decodes in
  ``mapInPandas``, yielding ONE pandas batch per Avro block — so the
  DECODED side is block-sized, but the raw payload is file-sized
  (``binaryFile`` materializes each file as one row, hard 2 GB cap):
  right for the writer's own many-moderate-files layout.
  ``scan_avro_dataset_split`` (round 9) removes the
  one-file-one-task boundary: the driver parses only each file's
  HEADER, plans byte ranges, and each task seeks into its range and
  resynchronizes on the 16-byte sync marker — the same split
  discipline Hadoop's AvroInputFormat implements JVM-side, here as
  seek+scan in the Python decode task. Task memory is one block
  (direct block-by-block reads, never the whole range), so one
  multi-GB OCF fans out across the cluster.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from collections.abc import Iterator

MAGIC = b"Obj\x01"
BLOCK_ROWS = 1000
# Byte-bound companion to the row bound: 1000 rows of megabyte texts
# would otherwise make one block (and the decoder's per-block batch)
# arbitrarily large — whichever bound trips first flushes. 16 MiB keeps
# the decode-side pandas batch comfortably inside executor memory.
BLOCK_BYTES = 16 * 1024 * 1024
_RAW_DEFLATE = -15  # zlib wbits: RFC 1951 stream, no zlib header/checksum


# --- binary encoding (Avro spec §"Binary Encoding") -------------------------


def _w_long(out: bytearray, n: int) -> None:
    """Zigzag + base-128 varint, little-endian groups (spec: int/long)."""
    u = (n << 1) ^ (n >> 63)
    u &= (1 << 64) - 1
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _w_bytes(out: bytearray, b: bytes) -> None:
    _w_long(out, len(b))
    out.extend(b)


def _w_str(out: bytearray, s: str) -> None:
    _w_bytes(out, s.encode("utf-8"))


class _Reader:
    """Cursor over one OCF byte string."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def r_long(self) -> int:
        u = 0
        shift = 0
        buf = self.buf
        end = len(buf)
        while True:
            # bounds + continuation caps: a truncated or malformed file
            # must fail with the same loud error style as r_bytes/r_raw,
            # never a bare IndexError or an unbounded shift (a valid
            # zigzag long is at most 10 base-128 groups: shift <= 63)
            if self.pos >= end:
                raise ValueError("truncated avro varint")
            if shift > 63:
                raise ValueError("overlong avro varint (> 10 bytes)")
            b = buf[self.pos]
            self.pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1)

    def r_bytes(self) -> bytes:
        n = self.r_long()
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated avro bytes value")
        self.pos += n
        return b

    def r_str(self) -> str:
        return self.r_bytes().decode("utf-8")

    def r_raw(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("truncated avro block")
        self.pos += n
        return b


# --- schema-driven field codecs ----------------------------------------------

_PRIMS = {"long", "int", "string", "bytes", "double", "float", "boolean"}


def _encode_value(out: bytearray, typ: str, v) -> None:
    if typ in ("long", "int"):
        _w_long(out, int(v))
    elif typ == "string":
        _w_str(out, str(v))
    elif typ == "bytes":
        _w_bytes(out, bytes(v))
    elif typ == "double":
        out.extend(struct.pack("<d", float(v)))
    elif typ == "float":
        out.extend(struct.pack("<f", float(v)))
    elif typ == "boolean":
        out.append(1 if v else 0)
    else:  # pragma: no cover - writer only emits _PRIMS
        raise ValueError(f"unsupported avro type {typ!r}")


def _decode_value(r: _Reader, typ: str):
    if typ in ("long", "int"):
        return r.r_long()
    if typ == "string":
        return r.r_str()
    if typ == "bytes":
        return r.r_bytes()
    if typ == "double":
        (v,) = struct.unpack_from("<d", r.buf, r.pos)
        r.pos += 8
        return v
    if typ == "float":
        (v,) = struct.unpack_from("<f", r.buf, r.pos)
        r.pos += 4
        return v
    if typ == "boolean":
        b = r.buf[r.pos]
        r.pos += 1
        return bool(b)
    raise ValueError(f"unsupported avro type {typ!r}")


def _field_types(schema: dict) -> list[tuple[str, str, bool]]:
    """(name, prim_type, nullable) per record field; raise on shapes
    outside the supported record-of-primitives subset."""
    if schema.get("type") != "record":
        raise ValueError("only record top-level schemas are supported")
    out: list[tuple[str, str, bool]] = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, list):
            if len(t) != 2 or "null" not in t:
                raise ValueError(f"unsupported union {t!r}")
            prim = t[0] if t[1] == "null" else t[1]
            if prim not in _PRIMS:
                raise ValueError(f"unsupported union branch {prim!r}")
            out.append((f["name"], prim, True))
        elif isinstance(t, str) and t in _PRIMS:
            out.append((f["name"], t, False))
        else:
            raise ValueError(f"unsupported field type {t!r}")
    return out


def make_schema(name: str, fields: list[tuple[str, str]]) -> dict:
    """Record schema with every field as the 2-branch ``[type, "null"]``
    union (value branch first; parquet columns here are OPTIONAL, so
    every field is nullable). Branch ORDER is a per-file declaration,
    not a format constant — the reader resolves null's index from each
    file's own embedded schema, and the writer honors whatever order
    the schema it was handed declares (the JVM writer's convention is
    the opposite ``["null", type]``; both round-trip)."""
    return {
        "type": "record",
        "name": name,
        "fields": [{"name": n, "type": [t, "null"]} for n, t in fields],
    }


# --- container file ----------------------------------------------------------


def write_ocf(
    path: str,
    schema: dict,
    rows: Iterator[tuple],
    sync: bytes,
    codec: str = "deflate",
    tmp_suffix: str = "",
) -> tuple[int, int]:
    """Write one OCF file; returns (n_rows, n_bytes). ``rows`` are tuples
    in schema field order; None encodes the union's null branch.
    ``tmp_suffix`` disambiguates the in-progress temp name per task
    ATTEMPT — two speculative/retried attempts of the same partition
    must never share a temp file, or their blocks interleave."""
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    fields = _field_types(schema)
    # union branch indices come from the schema AS DECLARED — hardcoding
    # [type, "null"] would silently mis-encode a caller-supplied
    # ["null", type] schema (the JVM writer's convention)
    null_idx: dict[str, int] = {}
    for f in schema["fields"]:
        if isinstance(f["type"], list):
            null_idx[f["name"]] = f["type"].index("null")
    header = bytearray()
    header.extend(MAGIC)
    # file metadata: a map<bytes> written as one block then a 0 count
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    _w_long(header, len(meta))
    for k, v in sorted(meta.items()):
        _w_str(header, k)
        _w_bytes(header, v)
    _w_long(header, 0)
    header.extend(sync)

    n_rows = 0
    tmp = f"{path}.inprogress{tmp_suffix}"
    with open(tmp, "wb") as fh:
        fh.write(header)
        block = bytearray()
        block_n = 0

        def flush() -> None:
            nonlocal block, block_n
            if not block_n:
                return
            payload = bytes(block)
            if codec == "deflate":
                co = zlib.compressobj(6, zlib.DEFLATED, _RAW_DEFLATE)
                payload = co.compress(payload) + co.flush()
            out = bytearray()
            _w_long(out, block_n)
            _w_long(out, len(payload))
            out.extend(payload)
            out.extend(sync)
            fh.write(out)
            block = bytearray()
            block_n = 0

        for row in rows:
            for (name, typ, nullable), v in zip(fields, row, strict=True):
                if nullable:
                    ni = null_idx[name]
                    if v is None:
                        _w_long(block, ni)
                        continue
                    _w_long(block, 1 - ni)
                elif v is None:
                    raise ValueError(f"null in non-nullable field {name}")
                _encode_value(block, typ, v)
            block_n += 1
            n_rows += 1
            if block_n >= BLOCK_ROWS or len(block) >= BLOCK_BYTES:
                flush()
        flush()
    os.rename(tmp, path)
    return n_rows, os.path.getsize(path)


# --- Spark integration -------------------------------------------------------


def write_avro_dataset(
    df,
    path: str,
    record_name: str,
    fields: list[tuple[str, str]],
    n_files: int = 4,
):
    """Distributed Avro sink: hash-repartition ``df`` on its first column,
    then each partition streams itself into ONE OCF file under ``path``
    via ``mapInPandas`` (attempt-suffixed temp name + rename, so
    speculative/retried tasks never interleave bytes — the rename is the
    commit point, last attempt wins atomically). Returns after the write
    action completes and the ``_SUCCESS`` marker is down. The collect is
    bounded: one stats row per output file.

    Integer columns cross the Arrow→pandas boundary as STRINGS: a batch
    of int64s containing one null arrives in pandas as float64, which
    silently rounds any value ≥ 2^53 — a decimal-text round trip is
    exact for the full int64 range and costs only the from-scratch
    sink's already-Python-bound encode pass.

    Double/float columns ride with a COMPANION VALIDITY column
    (``isnull(col)`` computed JVM-side, stripped before encoding):
    Arrow→pandas renders both SQL NULL and a genuine NaN as float64
    NaN, so without the mask a real NaN would silently take the
    union's null branch and round-trip as NULL. With it, NULL encodes
    as the null branch and NaN as the IEEE NaN payload — lossless both
    ways (the scan side keeps them distinct via pandas' nullable
    Float64 dtype)."""
    import pandas as pd

    schema = make_schema(record_name, fields)
    names = [n for n, _ in fields]
    int_pos = [i for i, (_, t) in enumerate(fields) if t in ("long", "int")]
    float_pos = [
        i for i, (_, t) in enumerate(fields) if t in ("double", "float")
    ]
    mask_names = [f"__isnull_{i}" for i in float_pos]

    def _write(batches) -> Iterator["pd.DataFrame"]:
        import hashlib

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        sync = hashlib.blake2b(
            f"{record_name}|{pid}".encode(), digest_size=16
        ).digest()

        def rows() -> Iterator[tuple]:
            for pdf in batches:
                yield from pdf[names + mask_names].itertuples(
                    index=False, name=None
                )

        # itertuples hands numpy scalars / decimal-text ints (see the
        # sink docstring). Float columns: the trailing validity masks
        # decide null vs genuine NaN (both look like NaN here); other
        # columns arrive as None when null (object dtype).
        nf = len(names)

        def norm(it: Iterator[tuple]) -> Iterator[tuple]:
            for row in it:
                vals = [None if v is None else v for v in row[:nf]]
                for j, i in enumerate(float_pos):
                    if row[nf + j]:
                        vals[i] = None
                for i in int_pos:
                    if vals[i] is not None:
                        vals[i] = int(vals[i])
                yield tuple(vals)

        n_rows, n_bytes = write_ocf(
            fname, schema, norm(rows()), sync,
            tmp_suffix=f".{ctx.taskAttemptId()}",
        )
        yield pd.DataFrame(
            {"path": [fname], "n_rows": [n_rows], "n_bytes": [n_bytes]}
        )

    os.makedirs(path, exist_ok=True)
    sel = [
        f"CAST(`{n}` AS STRING) AS `{n}`" if i in int_pos else f"`{n}`"
        for i, n in enumerate(names)
    ] + [
        f"(`{names[i]}` IS NULL) AS `__isnull_{i}`" for i in float_pos
    ]
    stats = (
        df.selectExpr(*sel)
        .repartition(n_files, names[0])
        .mapInPandas(_write, "path string, n_rows long, n_bytes long")
    )
    stats.collect()
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass


def scan_avro_dataset(spark, path: str, result_schema: str):
    """Distributed Avro scan: ``binaryFile`` lists and parallelizes
    whole files; ``mapInPandas`` decodes each, yielding one Arrow batch
    per Avro BLOCK (the decoded side never holds the whole file; the
    raw payload is file-sized — see the module docstring's sharding
    contract), columns resolved by name from the schema each file
    embeds in its own header."""
    import pandas as pd

    cols = [c.strip().split() for c in result_schema.split(",")]
    want = [c[0] for c in cols]
    # int columns get pandas' NULLABLE Int64 dtype: a plain constructor
    # would infer float64 for any list containing None and silently
    # round values >= 2^53 before Arrow ever sees them
    int_cols = {c[0] for c in cols if c[1].lower() in ("long", "int",
                                                       "bigint")}
    # float columns get the NULLABLE Float64 dtype: a plain constructor
    # folds decoded None into NaN, so a genuine NaN payload and a null
    # branch would reach Spark as the same value — the masked dtype
    # keeps NULL a null and NaN a NaN across the Arrow boundary
    float_cols = {c[0] for c in cols if c[1].lower() in ("double",
                                                         "float")}

    def _col(c: str, vals: list):
        if c in int_cols:
            return pd.array(vals, dtype="Int64")
        if c in float_cols:
            # NOT pd.array(dtype="Float64"): that constructor folds a
            # genuine NaN value into <NA>, re-conflating what the
            # explicit (values, mask) form keeps apart
            import numpy as np

            mask = np.array([v is None for v in vals], dtype=bool)
            data = np.array(
                [0.0 if v is None else float(v) for v in vals],
                dtype=np.float64,
            )
            return pd.arrays.FloatingArray(data, mask)
        return vals

    def _decode(batches) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for content in pdf["content"]:
                names, blocks = read_ocf(bytes(content))
                idx = {n: i for i, n in enumerate(names)}
                missing = [c for c in want if c not in idx]
                if missing:
                    raise ValueError(f"avro file lacks fields {missing}")
                for rows in blocks:
                    yield pd.DataFrame(
                        {
                            c: _col(c, [row[idx[c]] for row in rows])
                            for c in want
                        }
                    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(_decode, result_schema)


def read_header(path: str) -> tuple[dict, bytes, str, int]:
    """Parse ONE OCF header from the file's first bytes without reading
    the data section: returns (schema, sync, codec, header_end_offset).
    Reads 64 KiB chunks and retries on 'truncated' only while the file
    still has bytes, so a genuinely corrupt header stays loud."""
    with open(path, "rb") as fh:
        buf = fh.read(65536)
        while True:
            try:
                r = _Reader(buf)
                if r.r_raw(4) != MAGIC:
                    raise ValueError(
                        "not an avro object container file"
                    ) from None
                meta: dict[str, bytes] = {}
                while True:
                    n = r.r_long()
                    if n == 0:
                        break
                    if n < 0:
                        n = -n
                        r.r_long()
                    for _ in range(n):
                        key = r.r_str()
                        meta[key] = r.r_bytes()
                sync = r.r_raw(16)
                break
            except ValueError as exc:
                if "truncated" not in str(exc):
                    raise
                more = fh.read(65536)
                if not more:
                    raise
                buf += more
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    return schema, sync, codec, r.pos


def _plan_ranges(
    header_end: int, size: int, split_bytes: int
) -> list[tuple[int, int]]:
    """Byte ranges tiling [header_end, size) — pure arithmetic, no I/O,
    so a distributed header pass can plan splits from collected
    (header_end, size) metadata without touching the files again."""
    if split_bytes <= 0:
        raise ValueError("split_bytes must be positive")
    return [
        (s, min(s + split_bytes, size))
        for s in range(header_end, size, split_bytes)
    ]


def plan_avro_splits(path: str, split_bytes: int) -> list[tuple[int, int]]:
    """Byte ranges [(start, end), ...] covering one OCF's data section.
    Ranges are arbitrary byte offsets — ownership of blocks is resolved
    at read time by sync-marker resynchronization (``_decode_range``),
    so the plan needs only the header length and the file size."""
    _, _, _, header_end = read_header(path)
    return _plan_ranges(header_end, os.path.getsize(path), split_bytes)


def _header_tuple(fpath: str) -> tuple[str, str, str, str, int, int]:
    """One file's split-planning metadata: (path, schema_json, sync_hex,
    codec, header_end, size) — the avro analogue of a parquet footer."""
    schema, sync, codec, header_end = read_header(fpath)
    return (
        fpath,
        json.dumps(schema, separators=(",", ":")),
        sync.hex(),
        codec,
        header_end,
        os.path.getsize(fpath),
    )


# Below this file count the header pass runs serially on the driver (a
# Spark job costs more than a handful of 64 KiB reads); at or above it
# the pass fans out so a 100k-file dataset never serializes 100k opens
# through the driver — the parquet footer-pass shape.
_HEADER_FANOUT_MIN = 33


def _read_headers_distributed(spark, files: list[str]):
    """Header pass as a Spark job over the file list: executors read the
    headers, and only one metadata-scale row per file (schema/sync/
    codec/header_end/size) comes back to the driver."""
    import pandas as pd

    def _read(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                [_header_tuple(p) for p in pdf["path"]],
                columns=[
                    "path", "schema_json", "sync_hex", "codec",
                    "header_end", "size",
                ],
            )

    p = spark.sparkContext.defaultParallelism
    fdf = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), p))
    rows = fdf.mapInPandas(
        _read,
        "path string, schema_json string, sync_hex string, codec string, "
        "header_end long, size long",
    ).collect()
    rows.sort(key=lambda r: r["path"])
    return [
        (r["path"], r["schema_json"], r["sync_hex"], r["codec"],
         r["header_end"], r["size"])
        for r in rows
    ]


def _decode_range(
    path: str,
    start: int,
    end: int,
    fields: list[tuple[str, str, bool]],
    null_branch: dict[str, int],
    sync: bytes,
    codec: str,
) -> Iterator[list[tuple]]:
    """Decode every block OWNED by byte range [start, end) of one OCF.

    Ownership rule (Hadoop's): a block belongs to the range containing
    its first byte. Block starts sit immediately after a sync marker
    (the header's trailing sync for block 0), so the task searches
    [start-16, end-16) for the sync pattern, takes the first match, and
    decodes sequential blocks while their start offset stays < end —
    the LAST owned block may extend past ``end`` (read to completion),
    and a block starting exactly AT ``end`` belongs to the next range,
    whose own search window begins at end-16. Every block is decoded
    exactly once, with no coordination between tasks. Memory: one
    block's prologue+payload at a time, never the range."""
    with open(path, "rb") as fh:
        # resynchronize: find the first block start p with start <= p < end.
        # The search scans [start-16, end-1) INCREMENTALLY — 1 MiB chunks
        # with a 15-byte carry so a sync straddling a chunk edge is still
        # seen — and stops at the first match, so task memory is one chunk
        # (then one block), never the range. A sync STARTING at absolute
        # offset a puts a block at p = a+16; p ≥ start is guaranteed by
        # the window's left edge, p < end is tested below (the trailing
        # 15-byte slack past end-16 lets a sync straddling the cutoff be
        # seen and REJECTED by that test, mirroring the next range's own
        # left edge at end-16). The sync byte pattern recurring inside a
        # compressed payload would surface as a loud sync-mismatch error,
        # at probability 2^-128 per offset — the same exposure Hadoop's
        # AvroInputFormat accepts.
        lo = max(0, start - 16)
        next_abs = lo  # absolute offset of the next unread byte
        remaining = max(0, (end - 1) - lo)
        carry = b""
        a = -1
        fh.seek(lo)
        while remaining > 0:
            chunk = fh.read(min(1 << 20, remaining))
            if not chunk:
                break  # data section ends before the window does
            remaining -= len(chunk)
            buf = carry + chunk
            j = buf.find(sync)
            if j != -1:
                a = next_abs - len(carry) + j
                break
            carry = buf[-15:]
            next_abs += len(chunk)
        if a < 0 or a + 16 >= end:
            return  # no block starts inside this range
        pos = a + 16
        while pos < end:
            fh.seek(pos)
            head = fh.read(24)  # two varints: <=10 bytes each + slack
            if not head:
                return  # clean EOF: previous block was the file's last
            hr = _Reader(head)
            try:
                n_obj = hr.r_long()
                n_bytes = hr.r_long()
            except ValueError as exc:
                # a valid OCF is header + whole blocks: any bytes after
                # the last sync that don't parse as a prologue are
                # corruption, not slack
                raise ValueError(
                    "truncated avro block prologue"
                ) from exc
            body_at = pos + hr.pos
            fh.seek(body_at)
            payload = fh.read(n_bytes)
            if len(payload) != n_bytes:
                raise ValueError("truncated avro block")
            if fh.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            if codec == "deflate":
                payload = zlib.decompressobj(_RAW_DEFLATE).decompress(
                    payload
                )
            br = _Reader(payload)
            rows: list[tuple] = []
            for _ in range(n_obj):
                vals = []
                for name, typ, nullable in fields:
                    if nullable and br.r_long() == null_branch[name]:
                        vals.append(None)
                    else:
                        vals.append(_decode_value(br, typ))
                rows.append(tuple(vals))
            yield rows
            pos = body_at + n_bytes + 16


def scan_avro_dataset_split(
    spark,
    path: str,
    result_schema: str,
    split_bytes: int = 128 * 1024 * 1024,
):
    """Distributed Avro scan WITHOUT the one-file-one-task boundary:
    the driver reads only each file's header (schema/sync/codec + a
    stat), plans ``split_bytes`` ranges, and ships (file, start, end)
    rows to executors; each task seeks into its range, resynchronizes
    on the sync marker, and decodes exactly the blocks whose first
    byte it owns — so ONE multi-GB OCF parallelizes like parquet
    row-groups instead of serializing through a single 2 GB-capped
    binaryFile row. The header pass is metadata-scale, like a parquet
    footer pass — serial on the driver for small file counts, fanned
    out as a Spark job from ``_HEADER_FANOUT_MIN`` files up (only one
    small metadata row per file returns to the driver)."""
    import pandas as pd

    cols = [c.strip().split() for c in result_schema.split(",")]
    want = [c[0] for c in cols]
    int_cols = {c[0] for c in cols if c[1].lower() in ("long", "int",
                                                       "bigint")}
    float_cols = {c[0] for c in cols if c[1].lower() in ("double",
                                                         "float")}

    def _col(c: str, vals: list):
        if c in int_cols:
            return pd.array(vals, dtype="Int64")
        if c in float_cols:
            import numpy as np

            mask = np.array([v is None for v in vals], dtype=bool)
            data = np.array(
                [0.0 if v is None else float(v) for v in vals],
                dtype=np.float64,
            )
            return pd.arrays.FloatingArray(data, mask)
        return vals

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".avro")
    )
    if not files:
        raise ValueError(f"no .avro files under {path}")
    if len(files) >= _HEADER_FANOUT_MIN:
        headers = _read_headers_distributed(spark, files)
    else:
        headers = [_header_tuple(f) for f in files]
    ranges: list[tuple[str, int, int, str, str, str]] = []
    for fpath, sjson, sync_hex, codec, header_end, size in headers:
        for s, e in _plan_ranges(header_end, size, split_bytes):
            ranges.append((fpath, s, e, sjson, sync_hex, codec))
    if not ranges:
        # header-only files (zero rows): a valid empty dataset, not an
        # error — surface it as an empty relation of the asked schema
        return spark.createDataFrame([], result_schema)

    def _decode(batches) -> Iterator["pd.DataFrame"]:
        # schema_json is identical for every range of one file (and
        # usually across files) — parse once per distinct schema, not
        # per range row
        parsed: dict[str, tuple] = {}
        for pdf in batches:
            for _, r in pdf.iterrows():
                sj = r["schema_json"]
                if sj not in parsed:
                    schema = json.loads(sj)
                    fields = _field_types(schema)
                    null_branch = {
                        f["name"]: f["type"].index("null")
                        for f in schema["fields"]
                        if isinstance(f["type"], list)
                    }
                    idx = {n: i for i, (n, _, _) in enumerate(fields)}
                    missing = [c for c in want if c not in idx]
                    if missing:
                        raise ValueError(
                            f"avro file lacks fields {missing}"
                        )
                    parsed[sj] = (fields, null_branch, idx)
                fields, null_branch, idx = parsed[sj]
                for rows in _decode_range(
                    r["path"], int(r["start"]), int(r["end"]),
                    fields, null_branch,
                    bytes.fromhex(r["sync_hex"]), r["codec"],
                ):
                    yield pd.DataFrame(
                        {
                            c: _col(c, [row[idx[c]] for row in rows])
                            for c in want
                        }
                    )

    rdf = spark.createDataFrame(
        ranges,
        "path string, start long, end long, schema_json string, "
        "sync_hex string, codec string",
    ).repartition(len(ranges))
    return rdf.mapInPandas(_decode, result_schema)


def read_ocf(content: bytes) -> tuple[list[str], Iterator[list[tuple]]]:
    """Decode one OCF byte string → (field_names, iterator of per-block
    row lists). Schema is taken from the file header, not the caller."""
    r = _Reader(content)
    if r.r_raw(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = r.r_long()
        if n == 0:
            break
        if n < 0:  # spec: negative count is followed by a byte size
            n = -n
            r.r_long()
        for _ in range(n):
            # key MUST be read before the value (RHS-first evaluation
            # order would swap the reads if this were one statement)
            key = r.r_str()
            meta[key] = r.r_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    fields = _field_types(schema)
    sync = r.r_raw(16)
    # union branch order varies by writer; resolve null's index per field
    null_branch: dict[str, int] = {}
    for f in schema["fields"]:
        if isinstance(f["type"], list):
            null_branch[f["name"]] = f["type"].index("null")

    def blocks() -> Iterator[list[tuple]]:
        while r.pos < len(r.buf):
            n_obj = r.r_long()
            n_bytes = r.r_long()
            payload = r.r_raw(n_bytes)
            if codec == "deflate":
                payload = zlib.decompressobj(_RAW_DEFLATE).decompress(
                    payload
                )
            if r.r_raw(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            br = _Reader(payload)
            rows: list[tuple] = []
            for _ in range(n_obj):
                vals = []
                for name, typ, nullable in fields:
                    if nullable and br.r_long() == null_branch[name]:
                        vals.append(None)
                    else:
                        vals.append(_decode_value(br, typ))
                rows.append(tuple(vals))
            yield rows

    return [f[0] for f in fields], blocks()
