"""Multi-format source/sink roundtrips: a format change must never change
values — including timestamp microseconds through the text formats."""

from __future__ import annotations

import os

import pytest

from vector_search_playground_spark.sources import load_table
from vector_search_playground_spark.sources.formats import (
    read_table,
    write_table,
)

SCRATCH = "/root/repo/.scratch/formats"


def _roundtrip(spark, df, fmt):
    path = os.path.join(SCRATCH, f"rt_{fmt}")
    write_table(df, path, fmt=fmt)
    return read_table(spark, path, df.schema, fmt=fmt)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_orders_roundtrip_exact(spark, sf_smoke, fmt):
    """orders carries BIGINT keys, doubles, strings, and a timestamp —
    every format must return the identical row multiset."""
    orders = load_table(spark, sf_smoke, "orders")
    got = _roundtrip(spark, orders, fmt)
    assert got.schema == orders.schema
    a = sorted(map(tuple, orders.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b, fmt


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_documents_text_column_survives_text_formats(spark, sf_smoke, fmt):
    """Free-text columns (quoting/escaping territory for CSV) roundtrip
    byte-identically."""
    docs = load_table(spark, sf_smoke, "documents")
    got = _roundtrip(spark, docs, fmt)
    a = {r["doc_id"]: r["text"] for r in docs.collect()}
    b = {r["doc_id"]: r["text"] for r in got.collect()}
    assert a == b, fmt


def test_unsupported_format_is_loud(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    with pytest.raises(ValueError):
        write_table(docs, os.path.join(SCRATCH, "x"), fmt="avro")
    with pytest.raises(ValueError):
        read_table(spark, SCRATCH, docs.schema, fmt="xml")


# --- avro (from-scratch OCF codec, sources/avro.py) --------------------------


def test_avro_ocf_python_roundtrip():
    """Pure-Python write→read over every supported primitive, nulls in
    every field, and multi-block files (rows > BLOCK_ROWS)."""
    from vector_search_playground_spark.sources import avro as A

    schema = A.make_schema(
        "t",
        [
            ("i", "long"),
            ("s", "string"),
            ("d", "double"),
            ("b", "boolean"),
            ("raw", "bytes"),
        ],
    )
    rows = [
        (1, "héllo wörld €", 3.5, True, b"\xff\x00"),
        (None, None, None, None, None),
        (-(2**62), "", -0.0, False, b""),
    ] * 700  # 2100 rows → 3 blocks at BLOCK_ROWS=1000
    path = os.path.join(SCRATCH, "ocf_rt.avro")
    os.makedirs(SCRATCH, exist_ok=True)
    n, _ = A.write_ocf(path, schema, iter(rows), sync=b"0123456789abcdef")
    assert n == len(rows)
    with open(path, "rb") as fh:
        names, blocks = A.read_ocf(fh.read())
    assert names == ["i", "s", "d", "b", "raw"]
    got = [r for blk in blocks for r in blk]
    assert got == rows


def test_avro_ocf_readable_by_jvm_avro():
    """Interop certificate: the OFFICIAL org.apache.avro DataFileReader
    (avro-1.12.1.jar, on Spark's classpath) decodes our bytes — our
    writer emits spec-true OCF, not a private dialect. Needs a JVM, so
    it borrows the test session's gateway."""
    from vector_search_playground_spark.sources import avro as A

    schema = A.make_schema("jt", [("doc_id", "long"), ("text", "string")])
    rows = [(7, "alpha"), (None, None), (-3, "β unicode")]
    path = os.path.join(SCRATCH, "ocf_jvm.avro")
    os.makedirs(SCRATCH, exist_ok=True)
    A.write_ocf(path, schema, iter(rows), sync=b"fedcba9876543210")

    from vector_search_playground_spark.session import get_spark

    jvm = get_spark(master="local[4]")._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    got = []
    while reader.hasNext():
        rec = reader.next()
        did = rec.get("doc_id")
        txt = rec.get("text")
        got.append(
            (
                None if did is None else int(did),
                None if txt is None else str(txt),
            )
        )
    reader.close()
    assert got == rows


def test_avro_jvm_written_file_readable_by_us(tmp_path):
    """Reverse interop: a file written by the OFFICIAL JVM avro writer
    (deflate codec, null-first union — the opposite branch order from
    ours) decodes correctly through read_ocf."""
    from vector_search_playground_spark.sources import avro as A
    from vector_search_playground_spark.session import get_spark

    jvm = get_spark(master="local[4]")._jvm
    sch_json = (
        '{"type":"record","name":"jw","fields":['
        '{"name":"doc_id","type":["null","long"]},'
        '{"name":"text","type":["null","string"]}]}'
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    path = str(tmp_path / "jvm_written.avro")
    writer.create(schema, jvm.java.io.File(path))
    rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
    # py4j maps small Python ints to Integer (and auto-unboxes any
    # java.lang.Long back to a Python int), which the JVM writer rejects
    # for a ["null","long"] union — so use a value py4j itself must send
    # as a long (> 2^31)
    rec.put("doc_id", 2**40 + 11)
    rec.put("text", "from the jvm")
    writer.append(rec)
    rec2 = jvm.org.apache.avro.generic.GenericData.Record(schema)
    writer.append(rec2)  # both fields null
    writer.close()
    with open(path, "rb") as fh:
        names, blocks = A.read_ocf(fh.read())
    assert names == ["doc_id", "text"]
    assert [r for blk in blocks for r in blk] == [
        (2**40 + 11, "from the jvm"),
        (None, None),
    ]


def test_avro_unsupported_schema_is_loud():
    from vector_search_playground_spark.sources import avro as A

    with pytest.raises(ValueError):
        A._field_types({"type": "record", "fields": [
            {"name": "m", "type": {"type": "map", "values": "long"}}
        ]})
    with pytest.raises(ValueError):
        A._field_types({"type": "enum"})


def test_avro_distributed_roundtrip(spark, sf_smoke, tmp_path):
    """write_avro_dataset → scan_avro_dataset returns the identical
    multiset, across multiple files and blocks."""
    from vector_search_playground_spark.sources.avro import (
        scan_avro_dataset,
        write_avro_dataset,
    )

    docs = load_table(spark, sf_smoke, "documents")
    base = str(tmp_path / "docs_avro")
    fields = [
        ("doc_id", "long"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "long"),
    ]
    write_avro_dataset(docs, base, "document", fields, n_files=3)
    assert os.path.exists(os.path.join(base, "_SUCCESS"))
    assert len([f for f in os.listdir(base) if f.endswith(".avro")]) == 3
    got = scan_avro_dataset(
        spark,
        base,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    a = sorted(map(tuple, docs.collect()))
    b = sorted(map(tuple, got.collect()))
    assert a == b


def test_avro_nullable_long_keeps_full_int64_precision(spark, tmp_path):
    """A long column containing a NULL makes Arrow→pandas deliver the
    whole batch as float64, which silently rounds values >= 2^53 — the
    sink must round-trip such values exactly (it transports integer
    columns as decimal text for this reason)."""
    from vector_search_playground_spark.sources.avro import (
        scan_avro_dataset,
        write_avro_dataset,
    )

    big = 9007199254740993  # 2^53 + 1: unrepresentable as float64
    rows = [(1, big), (2, None), (3, -big - 12345)]
    df = spark.createDataFrame(rows, "id long, val long")
    base = str(tmp_path / "bigint_avro")
    write_avro_dataset(df, base, "bigint_case", [("id", "long"),
                                                 ("val", "long")],
                       n_files=1)
    got = scan_avro_dataset(spark, base, "id long, val long")
    assert sorted(map(tuple, got.collect())) == sorted(rows)


def test_avro_double_nan_distinct_from_null(spark, tmp_path):
    """A genuine NaN in a double column must round-trip as NaN and a SQL
    NULL as NULL — Arrow→pandas renders both as float64 NaN, so the sink
    carries a JVM-side validity mask per float column and the scan keeps
    them apart with an explicit (values, mask) FloatingArray (the
    dtype-string constructor would fold NaN back into NA)."""
    import math

    from pyspark.sql import functions as F

    from vector_search_playground_spark.sources.avro import (
        scan_avro_dataset,
        write_avro_dataset,
    )

    df = spark.createDataFrame(
        [(1, 1.5), (2, None), (3, None), (4, -0.0)], "id long, val double"
    ).withColumn(
        "val",
        F.when(F.col("id") == 3, F.lit(float("nan"))).otherwise(
            F.col("val")
        ),
    )
    base = str(tmp_path / "nan_avro")
    write_avro_dataset(
        df, base, "nan_case", [("id", "long"), ("val", "double")], n_files=1
    )
    got = {r["id"]: r["val"] for r in scan_avro_dataset(
        spark, base, "id long, val double"
    ).collect()}
    assert got[1] == 1.5
    assert got[2] is None, "SQL NULL must stay NULL"
    assert got[3] is not None and math.isnan(got[3]), "NaN must stay NaN"
    assert got[4] == 0.0 and math.copysign(1.0, got[4]) == -1.0, "-0.0 sign"
    # the mask companion columns are transport-only: never in the output
    assert set(got) == {1, 2, 3, 4}


def test_avro_truncated_varint_is_loud():
    """A malformed/truncated varint must raise the reader's explicit
    error style, not a bare IndexError (ADVICE r8: r_long had no bounds
    or continuation cap)."""
    from vector_search_playground_spark.sources import avro as A

    r = A._Reader(b"\xff\xff\xff")  # every byte continues, buffer ends
    with pytest.raises(ValueError, match="truncated avro varint"):
        r.r_long()
    r = A._Reader(b"\xff" * 11 + b"\x01")  # 11 continuation groups
    with pytest.raises(ValueError, match="overlong avro varint"):
        r.r_long()


def test_avro_writer_honors_null_first_branch_order():
    """write_ocf must emit union indices per the schema AS DECLARED:
    a caller-supplied ["null", type] schema (the JVM convention) must
    round-trip — the null branch is index 0 there, not 1."""
    from vector_search_playground_spark.sources import avro as A

    schema = {
        "type": "record",
        "name": "nf",
        "fields": [
            {"name": "i", "type": ["null", "long"]},
            {"name": "s", "type": ["string", "null"]},  # mixed orders
        ],
    }
    rows = [(5, "x"), (None, None), (-7, "")]
    path = os.path.join(SCRATCH, "ocf_nullfirst.avro")
    os.makedirs(SCRATCH, exist_ok=True)
    A.write_ocf(path, schema, iter(rows), sync=b"abcdef0123456789")
    with open(path, "rb") as fh:
        names, blocks = A.read_ocf(fh.read())
    assert names == ["i", "s"]
    assert [r for blk in blocks for r in blk] == rows


def _one_big_ocf(tmp_path, n_rows=20000, codec="deflate"):
    """One multi-block OCF with nulls, a huge int64, and NaN/NULL
    doubles — the worst-case payload for a byte-range scan."""
    from vector_search_playground_spark.sources import avro as A

    schema = A.make_schema(
        "big", [("i", "long"), ("s", "string"), ("d", "double")]
    )
    rows = []
    for k in range(n_rows):
        if k % 997 == 0:
            rows.append((None, None, None))
        elif k % 613 == 0:
            rows.append((9007199254740993 + k, "x" * 40, float("nan")))
        else:
            rows.append((k, f"row {k} {'pad' * (k % 7)}", k / 3.0))
    d = tmp_path / "bigavro"
    d.mkdir(parents=True)
    path = str(d / "part-00000.avro")
    A.write_ocf(path, schema, iter(rows), sync=b"SYNCsyncSYNCsync",
                codec=codec)
    return str(d), path, rows


def test_avro_split_scan_equals_whole_file(spark, tmp_path):
    """scan_avro_dataset_split over ONE big OCF cut into many byte
    ranges must return exactly the rows of the file — every block
    decoded once (no loss at range boundaries, no double-decode where
    a block straddles a cut), across both codecs and with a split size
    smaller than, comparable to, and larger than the file."""
    import math

    from vector_search_playground_spark.sources import avro as A

    for codec in ("deflate", "null"):
        base, path, rows = _one_big_ocf(
            tmp_path / codec, n_rows=12000, codec=codec
        )
        size = os.path.getsize(path)
        for split_bytes in (size // 13 + 1, size // 3 + 1, size * 2):
            n_splits = len(A.plan_avro_splits(path, split_bytes))
            got = A.scan_avro_dataset_split(
                spark, base, "i long, s string, d double",
                split_bytes=split_bytes,
            ).collect()
            assert len(got) == len(rows), (codec, split_bytes, n_splits)

            def key(t):
                i, s, d = t
                return (
                    i if i is not None else -1,
                    s or "",
                    "nan" if (d is not None and math.isnan(d))
                    else d,
                )

            assert sorted(map(key, ((r["i"], r["s"], r["d"]) for r in got))) \
                == sorted(map(key, rows)), (codec, split_bytes)
        assert len(A.plan_avro_splits(path, size // 13 + 1)) >= 10, (
            "small split size must actually fan out"
        )


def test_avro_split_plan_covers_data_section_exactly(tmp_path):
    """Ranges tile [header_end, file_size) with no gap or overlap."""
    from vector_search_playground_spark.sources import avro as A

    _, path, _ = _one_big_ocf(tmp_path, n_rows=5000)
    _, _, _, header_end = A.read_header(path)
    splits = A.plan_avro_splits(path, 10000)
    assert splits[0][0] == header_end
    assert splits[-1][1] == os.path.getsize(path)
    for (s0, e0), (s1, e1) in zip(splits, splits[1:]):
        assert e0 == s1
        assert s0 < e0


def test_avro_split_block_bigger_than_split_not_duplicated(spark, tmp_path):
    """A block larger than split_bytes spans several ranges: only the
    range owning its first byte may decode it, the others must come up
    empty — row counts expose any double-decode instantly."""
    from vector_search_playground_spark.sources import avro as A

    base, path, rows = _one_big_ocf(tmp_path, n_rows=3000, codec="null")
    # BLOCK_ROWS=1000 → 3 blocks; uncompressed blocks are tens of KB,
    # so a 4 KiB split is far below one block
    got = A.scan_avro_dataset_split(
        spark, base, "i long, s string, d double", split_bytes=4096
    )
    assert got.count() == len(rows)


def test_avro_split_scan_empty_dataset_is_empty_not_error(spark, tmp_path):
    """Header-only OCFs (a legitimately empty write) must scan as an
    empty relation through the split path, not a 'no files' error."""
    from vector_search_playground_spark.sources import avro as A

    d = tmp_path / "empty_avro"
    d.mkdir()
    schema = A.make_schema("e", [("i", "long")])
    A.write_ocf(str(d / "part-00000.avro"), schema, iter([]),
                sync=b"0123456789abcdef")
    got = A.scan_avro_dataset_split(spark, str(d), "i long")
    assert got.count() == 0
    assert got.columns == ["i"]


def test_avro_range_ownership_exact_at_every_block_boundary(tmp_path):
    """Adversarial certificate for _decode_range's ownership rule: for
    cut points exactly AT each block start, one byte before, one byte
    after, and mid-sync, the two ranges [(header_end, cut), (cut, size)]
    must decode every block exactly once — no loss, no double-decode.
    Driven directly (no Spark) so every boundary is exercised."""
    from vector_search_playground_spark.sources import avro as A

    d = tmp_path / "bnd"
    d.mkdir()
    schema = A.make_schema("b", [("i", "long"), ("s", "string")])
    rows = [(k, f"v{k}" * (1 + k % 5)) for k in range(5000)]  # 5 blocks
    path = str(d / "f.avro")
    sync = b"0123456789abcdef"
    A.write_ocf(path, schema, iter(rows), sync=sync, codec="null")
    size = os.path.getsize(path)
    schema_r, sync_r, codec, header_end = A.read_header(path)
    fields = A._field_types(schema_r)
    null_branch = {
        f["name"]: f["type"].index("null")
        for f in schema_r["fields"]
        if isinstance(f["type"], list)
    }
    # locate true block starts: positions right after each sync
    blob = open(path, "rb").read()
    starts = []
    p = blob.find(sync, 4)  # header's trailing sync
    while p != -1:
        if p + 16 < size:
            starts.append(p + 16)
        p = blob.find(sync, p + 1)
    assert len(starts) == 5, "expected 5 block starts"

    def run(s, e):
        return [
            r
            for blk in A._decode_range(
                path, s, e, fields, null_branch, sync_r, codec
            )
            for r in blk
        ]

    total = run(header_end, size)
    assert total == rows, "single full range must decode everything"
    cuts = {header_end, size}
    for b in starts:
        cuts.update((b - 17, b - 16, b - 1, b, b + 1, b + 7))
    for cut in sorted(cuts):
        cut = min(max(cut, header_end), size)
        got = run(header_end, cut) + run(cut, size)
        assert len(got) == len(rows), f"cut at {cut}: {len(got)} rows"
        assert got == rows, f"cut at {cut}: wrong rows"
    # three-way cuts across two adjacent boundaries
    got = (
        run(header_end, starts[2])
        + run(starts[2], starts[3] + 1)
        + run(starts[3] + 1, size)
    )
    assert got == rows


def test_avro_split_scan_reads_jvm_written_multiblock_file(spark, tmp_path):
    """Cross-implementation certificate for the SPLIT path (r9 verdict
    #3): a multi-block deflate OCF written by the OFFICIAL
    org.apache.avro DataFileWriter — null-FIRST unions and the JVM's
    deflate, the opposite conventions from our writer — read through
    scan_avro_dataset_split with split_bytes cutting mid-file must
    equal both the whole-file scan and the appended records."""
    from vector_search_playground_spark.sources import avro as A

    jvm = spark._jvm
    sch_json = (
        '{"type":"record","name":"jsplit","fields":['
        '{"name":"doc_id","type":["null","long"]},'
        '{"name":"text","type":["null","string"]},'
        '{"name":"val","type":["null","double"]}]}'
    )
    schema = jvm.org.apache.avro.Schema.Parser().parse(sch_json)
    writer = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter()
    )
    writer.setCodec(jvm.org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.setSyncInterval(512)  # tiny blocks → many real boundaries
    d = tmp_path / "jvm_split"
    d.mkdir()
    path = str(d / "part-00000.avro")
    writer.create(schema, jvm.java.io.File(path))
    expected = []
    for k in range(800):
        rec = jvm.org.apache.avro.generic.GenericData.Record(schema)
        if k % 97 == 0:
            expected.append((None, None, None))  # all-null row
        else:
            did = 2**40 + k  # > 2^31 so py4j ships a java.lang.Long
            txt = f"jvm row {k} " + "pad" * (k % 5)
            val = k / 7.0
            rec.put("doc_id", did)
            rec.put("text", txt)
            rec.put("val", val)
            expected.append((did, txt, val))
        writer.append(rec)
    writer.close()

    size = os.path.getsize(path)
    splits = A.plan_avro_splits(path, size // 7 + 1)
    assert len(splits) == 7, "split size must cut mid-file"

    def key(t):
        i, s, v = t
        return (i if i is not None else -1, s or "", v)

    got = A.scan_avro_dataset_split(
        spark, str(d), "doc_id long, text string, val double",
        split_bytes=size // 7 + 1,
    ).collect()
    assert sorted(key((r["doc_id"], r["text"], r["val"])) for r in got) \
        == sorted(map(key, expected))
    whole = A.scan_avro_dataset(
        spark, str(d), "doc_id long, text string, val double"
    ).collect()
    assert sorted(key((r["doc_id"], r["text"], r["val"])) for r in got) \
        == sorted(key((r["doc_id"], r["text"], r["val"])) for r in whole)


def test_avro_split_scan_many_files_distributed_header_pass(spark, tmp_path):
    """At ≥ _HEADER_FANOUT_MIN files the header pass runs as a Spark job
    (r9 verdict #7 — the driver must not serialize 100k header opens);
    the result must equal the serial path's, across mixed codecs, a
    header-only file, and ranges cutting inside blocks."""
    from vector_search_playground_spark.sources import avro as A

    d = tmp_path / "many"
    d.mkdir()
    schema = A.make_schema("m", [("i", "long"), ("s", "string")])
    expected: list[tuple] = []
    n_files = max(40, A._HEADER_FANOUT_MIN + 7)
    for f in range(n_files):
        rows = [] if f == 3 else [
            (f * 1000 + k, f"r{f}_{k}" * (1 + k % 3)) for k in range(50)
        ]
        A.write_ocf(
            str(d / f"part-{f:05d}.avro"), schema, iter(rows),
            sync=bytes([f % 256]) * 16,
            codec="deflate" if f % 2 else "null",
        )
        expected += rows
    got = A.scan_avro_dataset_split(
        spark, str(d), "i long, s string", split_bytes=700
    ).collect()
    assert sorted((r["i"], r["s"]) for r in got) == sorted(expected)


def test_avro_block_flush_is_byte_bounded(tmp_path):
    """A handful of huge rows must flush by BYTES, not wait for
    BLOCK_ROWS — otherwise one block (and the decoder's batch) grows
    with row width unboundedly."""
    from vector_search_playground_spark.sources import avro as A

    big = "x" * (4 * 1024 * 1024)  # 4 MiB per row, BLOCK_BYTES = 16 MiB
    rows = [(k, big) for k in range(12)]
    path = str(tmp_path / "big_rows.avro")
    schema = A.make_schema("w", [("i", "long"), ("s", "string")])
    A.write_ocf(path, schema, iter(rows), sync=b"fedcba9876543210",
                codec="null")
    with open(path, "rb") as fh:
        names, blocks = A.read_ocf(fh.read())
    sizes = [len(blk) for blk in blocks]
    assert sum(sizes) == 12
    assert max(sizes) <= 4, f"block of {max(sizes)} huge rows never flushed"
