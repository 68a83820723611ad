"""Dependency-free Avro object-container codec (sources/avro_py.py).

No Avro implementation exists in this container (no fastavro, no
avro-python3, no spark-avro jar, no duckdb avro extension), so these
tests anchor the codec to the PUBLIC spec directly: hand-computed
byte-layout pins for the zigzag varints and the container framing
(the same discipline as the BMP/WAV codec tests), plus roundtrips
over every supported type, both codecs, multi-block files, and the
distributed Spark faces. Data fidelity through the whole
encode -> container -> decode path is additionally held to the
driver's hash gate by the ``avro_customer_agg`` registry row (oracle
reads the parquet original).
"""

from __future__ import annotations

import datetime
import io
import json
import zlib

import pytest

from datafusion_uba_spark.sources.avro_py import (
    MAGIC,
    avro_schema_for,
    decode_container,
    encode_container,
    read_avro_py,
    write_avro_py,
    zigzag_decode,
    zigzag_encode,
)


def test_zigzag_spec_bytes():
    """Spec examples (Avro 1.11 'Binary Encoding'): 0->00, -1->01,
    1->02, -2->03, 2->04; varint continuation at the 7-bit boundary."""
    assert zigzag_encode(0) == b"\x00"
    assert zigzag_encode(-1) == b"\x01"
    assert zigzag_encode(1) == b"\x02"
    assert zigzag_encode(-2) == b"\x03"
    assert zigzag_encode(2) == b"\x04"
    assert zigzag_encode(-64) == b"\x7f"
    assert zigzag_encode(64) == b"\x80\x01"
    for n in (0, 1, -1, 63, -64, 64, 2**31 - 1, -(2**31), 2**62, -(2**63)):
        assert zigzag_decode(io.BytesIO(zigzag_encode(n))) == n
    with pytest.raises(ValueError):
        zigzag_decode(io.BytesIO(b"\x80"))  # truncated continuation


def test_container_framing_bytes():
    """Byte-level container pin, null codec, fixed sync: magic, the
    metadata map entries, then the one-row block <count=1, size=1,
    payload=zigzag(1), sync>."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "a", "type": "long"}],
    }
    sync = bytes(range(16))
    data = encode_container([(1,)], schema, codec="null", sync=sync)
    assert data[:4] == MAGIC == b"Obj\x01"
    buf = io.BytesIO(data[4:])
    assert zigzag_decode(buf) == 2  # meta map: one block of 2 entries
    meta = {}
    for _ in range(2):
        k = buf.read(zigzag_decode(buf)).decode()
        meta[k] = buf.read(zigzag_decode(buf))
    assert zigzag_decode(buf) == 0  # map terminator
    assert json.loads(meta["avro.schema"]) == schema
    assert meta["avro.codec"] == b"null"
    assert buf.read(16) == sync
    # data block: count=1 (\x02), size=1 (\x02), value 1 (\x02), sync
    assert buf.read() == b"\x02\x02\x02" + sync


def test_deflate_is_raw_rfc1951():
    """The deflate codec must be a RAW deflate stream (no zlib header/
    checksum) — wbits=-15 inflates it, wbits=15 must NOT."""
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "s", "type": "string"}],
    }
    sync = b"\x07" * 16
    data = encode_container([("xyz" * 50,)], schema, codec="deflate", sync=sync)
    # block starts right after header: locate via the sync marker
    body = data.split(sync, 1)[1]
    buf = io.BytesIO(body)
    assert zigzag_decode(buf) == 1
    size = zigzag_decode(buf)
    payload = buf.read(size)
    assert zlib.decompress(payload, wbits=-15)  # raw stream inflates
    with pytest.raises(zlib.error):
        zlib.decompress(payload)  # a zlib-wrapped stream it is NOT


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_all_types_roundtrip_multiblock(codec):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "b", "type": "boolean"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "f", "type": "float"},
            {"name": "d", "type": "double"},
            {"name": "by", "type": "bytes"},
            {"name": "s", "type": "string"},
            {"name": "dt", "type": {"type": "int", "logicalType": "date"}},
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            },
            {"name": "opt", "type": ["null", "long"]},
        ],
    }
    rows = [
        (
            True,
            -(2**31),
            2**62,
            0.5,
            -1.25e300,
            b"\x00\xff",
            "héllo ☃",
            datetime.date(1969, 12, 31),
            datetime.datetime(2024, 2, 29, 23, 59, 59, 250000),
            None,
        ),
        (
            False,
            7,
            -7,
            1.0,
            float("inf"),
            b"",
            "",
            datetime.date(2024, 1, 1),
            datetime.datetime(1970, 1, 1, 0, 0, 0),
            42,
        ),
        (False, 0, 0, 0.0, 0.0, b"z", "x", datetime.date(1970, 1, 1),
         datetime.datetime(2000, 6, 1, 12, 0, 0), -1),
    ]
    data = encode_container(rows, schema, codec=codec, block_rows=2)
    got_schema, got = decode_container(data)
    assert got_schema == schema
    assert got == rows


def test_corruption_raises():
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "a", "type": "long"}],
    }
    data = encode_container([(1,), (2,)], schema, codec="null")
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"PAR1" + data[4:])
    with pytest.raises(ValueError, match="sync"):
        decode_container(data[:-1] + bytes([data[-1] ^ 0xFF]))
    with pytest.raises(ValueError, match="null in non-nullable"):
        encode_container([(None,)], schema)
    with pytest.raises(ValueError, match="unions"):
        encode_container([(1,)], {
            "type": "record",
            "name": "row",
            "fields": [{"name": "a", "type": ["long", "string"]}],
        })


def test_spark_faces_roundtrip(spark, tmp_path):
    """write_avro_py (one container per partition) -> read_avro_py
    (binaryFile + mapInPandas decode): values, types, and NULLs
    survive; schema inference from the embedded writer schema matches
    the explicit-schema read."""
    df = spark.createDataFrame(
        [
            (1, "a", 1.5, True, None),
            (2, None, -0.25, False, 10),
            (3, "c", 0.0, None, -5),
        ],
        "id long, name string, score double, flag boolean, opt int",
    ).repartition(2)
    out = str(tmp_path / "avro_out")
    n_files = write_avro_py(df, out)
    assert n_files == 2  # one container file per non-empty partition

    explicit = read_avro_py(
        spark, out, "id long, name string, score double, flag boolean, opt int"
    )
    inferred = read_avro_py(spark, out)
    want = {tuple(r) for r in df.collect()}
    assert {tuple(r) for r in explicit.collect()} == want
    assert {tuple(r) for r in inferred.collect()} == want
    assert dict(inferred.dtypes) == dict(df.dtypes)


def test_ntz_round_trip_local_timestamp_micros(spark, tmp_path):
    """TimestampNTZType round-trips through the spec's zone-less
    logical type: the writer emits local-timestamp-micros (Avro
    >= 1.10), the reader accepts it AND plain timestamp-micros, and
    naive values survive bit-exact regardless of session zone."""
    df = spark.createDataFrame(
        [(1,)], "id long"
    ).selectExpr(
        "id", "timestamp_ntz'2024-02-29 23:59:59.25' as ts"
    )
    assert avro_schema_for(df)["fields"][1]["type"] == {
        "type": "long",
        "logicalType": "local-timestamp-micros",
    }
    out = str(tmp_path / "avro_ntz")
    write_avro_py(df, out)
    back = read_avro_py(spark, out)
    assert dict(back.dtypes) == {"id": "bigint", "ts": "timestamp_ntz"}
    assert back.collect() == df.collect()

    # plain timestamp-micros containers (older writers) also decode
    import datetime

    legacy = {
        "type": "record",
        "name": "row",
        "fields": [
            {
                "name": "ts",
                "type": {"type": "long", "logicalType": "timestamp-micros"},
            }
        ],
    }
    blob = encode_container(
        [(datetime.datetime(2024, 1, 2, 3, 4, 5),)], legacy
    )
    _, rows = decode_container(blob)
    assert rows == [(datetime.datetime(2024, 1, 2, 3, 4, 5),)]


def test_avro_schema_for_still_rejects_structs_and_nonstring_map_keys(spark):
    """r17 verdict #6 turned array/map into decoded types; nested
    records (structs) and non-string map keys stay LOUD rejections
    per the documented subset."""
    df = spark.createDataFrame([((1, 2),)], "s struct<a:int,b:int>")
    with pytest.raises(ValueError, match="no avro mapping"):
        avro_schema_for(df)
    df2 = spark.createDataFrame(
        [({1: "a"},)], "m map<int,string>"
    )
    with pytest.raises(ValueError, match="map keys are strings"):
        avro_schema_for(df2)


def test_avro_complex_types_spark_round_trip(spark, tmp_path):
    """r17 verdict #6: array and map columns round-trip through the
    container write→read faces with dtypes intact (array<bigint>,
    array with null elements, map<string,double>)."""
    df = spark.createDataFrame(
        [
            (1, [1, 2, 3], ["a", None], {"x": 1.5}),
            (2, [], [None], {}),
            (3, [7], ["b"], {"y": -2.0, "z": 0.25}),
        ],
        "id long, xs array<bigint>, tags array<string>, "
        "m map<string,double>",
    )
    out = str(tmp_path / "avro_complex")
    write_avro_py(df, out)
    back = read_avro_py(spark, out)
    assert dict(back.dtypes) == dict(df.dtypes)
    want = {
        (r.id, tuple(r.xs), tuple(r.tags), tuple(sorted(r.m.items())))
        for r in df.collect()
    }
    got = {
        (r.id, tuple(r.xs), tuple(r.tags), tuple(sorted(r.m.items())))
        for r in back.collect()
    }
    assert got == want


def test_avro_enum_fixed_and_nested_array_decode():
    """Foreign-writer kinds with no Spark write source: enum decodes
    to its symbol string (out-of-range index raises), fixed to exactly
    size bytes (truncation raises), and array<array<long>> recurses;
    the skippable negative-count block form is honored."""
    import io as _io

    from datafusion_uba_spark.sources.avro_py import (
        _decode_value,
        _field_type,
        zigzag_encode,
    )

    kind, nullable = _field_type(
        {"type": "enum", "name": "color", "symbols": ["RED", "GREEN"]}
    )
    assert not nullable
    assert _decode_value(_io.BytesIO(zigzag_encode(1)), kind) == "GREEN"
    with pytest.raises(ValueError, match="enum index"):
        _decode_value(_io.BytesIO(zigzag_encode(5)), kind)

    fkind, _ = _field_type({"type": "fixed", "name": "f8", "size": 4})
    assert _decode_value(_io.BytesIO(b"abcd"), fkind) == b"abcd"
    with pytest.raises(ValueError, match="truncated fixed"):
        _decode_value(_io.BytesIO(b"ab"), fkind)

    akind, _ = _field_type(
        {"type": "array", "items": {"type": "array", "items": "long"}}
    )
    # outer: one block of 1 item; inner uses the NEGATIVE-count form
    # (abs(count) items after a block byte size) per the spec
    inner = zigzag_encode(-2) + zigzag_encode(2) + zigzag_encode(4) + (
        zigzag_encode(5)
    ) + zigzag_encode(0)
    wire = zigzag_encode(1) + inner + zigzag_encode(0)
    assert _decode_value(_io.BytesIO(wire), akind) == [[4, 5]]


def test_avro_null_second_union_rejected():
    """The wire indexes the union's branch list and this decoder maps
    branch 0 to null — silently accepting ['T', 'null'] would decode
    values as nulls, so the reversed spelling is a loud error."""
    from datafusion_uba_spark.sources.avro_py import _field_type

    assert _field_type(["null", "long"]) == ("long", True)
    with pytest.raises(ValueError, match="null second"):
        _field_type(["long", "null"])


def _multiblock_container(n_rows=53, block_rows=5, codec="deflate"):
    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    rows = [(i, f"value-{i}") for i in range(n_rows)]
    return (
        encode_container(rows, schema, codec=codec, block_rows=block_rows),
        rows,
    )


def test_avro_split_partition_is_exact():
    """The split ownership rule (a block belongs to the split
    containing the START of its preceding sync marker) partitions a
    file's blocks EXACTLY: for many split widths, the union of
    per-split decodes equals the whole file's rows — no duplication,
    no loss — including widths that land mid-sync, mid-varint, and
    mid-payload."""
    from datafusion_uba_spark.sources.avro_py import iter_split_rows

    for codec in ("null", "deflate"):
        blob, want = _multiblock_container(codec=codec)
        for width in (37, 64, 101, 250, len(blob), len(blob) + 999):
            got = []
            for s0 in range(0, len(blob), width):
                f = io.BytesIO(blob)
                got.extend(
                    iter_split_rows(f, s0, min(s0 + width, len(blob)))
                )
            assert got == want, f"codec={codec} width={width}"


def test_avro_split_reader_schema_evolution():
    """Schema resolution applies per split exactly as per file."""
    from datafusion_uba_spark.sources.avro_py import iter_split_rows

    blob, want = _multiblock_container()
    reader = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "id", "type": "long"},
            {"name": "added", "type": "long", "default": 9},
        ],
    }
    got = []
    for s0 in range(0, len(blob), 80):
        got.extend(
            iter_split_rows(
                io.BytesIO(blob), s0, min(s0 + 80, len(blob)), reader
            )
        )
    assert got == [(s, i, 9) for i, s in want]


def test_avro_split_read_spark_face(spark, tmp_path):
    """read_avro_py(split_size=...) fans one file into many tasks and
    returns exactly the whole-file rows — the 100 TB shape: a foreign
    multi-GB container no longer binds one task to the whole file."""
    import os

    blob, want = _multiblock_container(n_rows=200, block_rows=7)
    d = tmp_path / "avro_split"
    d.mkdir()
    (d / "part-a.avro").write_bytes(blob)
    got_whole = read_avro_py(spark, str(d))
    df = read_avro_py(spark, str(d), split_size=256)
    n_splits = -(-os.path.getsize(d / "part-a.avro") // 256)
    assert df.rdd.getNumPartitions() == n_splits > 3
    rows = {tuple(r) for r in df.collect()}
    assert rows == {tuple(r) for r in got_whole.collect()} == set(want)
    assert dict(df.dtypes) == dict(got_whole.dtypes)
    # degenerate widths: one giant split == whole file
    one = read_avro_py(spark, str(d), split_size=1 << 30)
    assert {tuple(r) for r in one.collect()} == set(want)
    with pytest.raises(ValueError, match="positive"):
        read_avro_py(spark, str(d), split_size=0)


def test_avro_s3_split_scan(spark):
    """read_avro_s3_py: jar-less Avro over S3 — sync-marker splits
    through S3RangedFile + chunked read-ahead. Rows equal the local
    decode; fan-out is one task per split; wire accounting stays
    bounded (read-ahead chunks are capped by split width, so total
    bytes served stay within a small multiple of the corpus)."""
    from datafusion_uba_spark.sources.avro_py import read_avro_s3_py
    from datafusion_uba_spark.sources.s3_local import LocalS3Server

    from datafusion_uba_spark.sources.s3_py import S3Client

    blob_a, want_a = _multiblock_container(n_rows=120, block_rows=6)
    blob_b, want_b = _multiblock_container(n_rows=80, block_rows=6)
    want_b = [(i + 1000, s.replace("value-", "other-")) for i, s in want_b]
    schema_b = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    blob_b = encode_container(want_b, schema_b, block_rows=6)

    srv = LocalS3Server()
    try:
        c = S3Client(srv.endpoint, srv.access_key, srv.secret_key)
        c.put_object("uba", "av/a.avro", blob_a)
        c.put_object("uba", "av/b.avro", blob_b)
        c.put_object("uba", "av/decoy.txt", b"not avro")
        srv.stats.update(bytes_served=0, get_requests=0)
        df = read_avro_s3_py(
            spark, srv.endpoint, "uba", "av/",
            srv.access_key, srv.secret_key, split_size=300,
        )
        n_splits = -(-len(blob_a) // 300) + (-(-len(blob_b) // 300))
        assert df.rdd.getNumPartitions() == n_splits > 4
        got = {tuple(r) for r in df.collect()}
        assert got == set(want_a) | set(want_b)
        assert dict(df.dtypes) == {"id": "bigint", "s": "string"}
        # wire bound: per-split header + capped data chunks. On this
        # deliberately pathological geometry (300-byte splits over
        # ~KB files, so every split re-reads a header comparable to
        # the whole file) the measured ratio is ~6-7x; at real
        # geometry (128 MB splits, KB headers) it converges to ~1x.
        # The bound pins the ORDER: a chunking regression to
        # corpus-x-splits or GET-per-byte would blow far past it.
        corpus = len(blob_a) + len(blob_b)
        assert srv.stats["bytes_served"] < 12 * corpus

        # reader-schema evolution through the S3 face
        reader = {
            "type": "record",
            "name": "row",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "added", "type": "string", "default": "d"},
            ],
        }
        ev = read_avro_s3_py(
            spark, srv.endpoint, "uba", "av/",
            srv.access_key, srv.secret_key, split_size=300,
            reader_schema=reader,
        )
        assert {tuple(r) for r in ev.collect()} == {
            (i, "d") for i, _ in want_a + want_b
        }

        with pytest.raises(ValueError, match="no '.avro' objects"):
            read_avro_s3_py(
                spark, srv.endpoint, "uba", "nothing/",
                srv.access_key, srv.secret_key,
            )
    finally:
        srv.close()


def test_avro_complex_types_property_roundtrip():
    """Hypothesis: arbitrary nested array/map/enum/fixed values
    round-trip byte-exact through encode_container/decode_container —
    including empty containers, None elements under [null, T] item
    unions, and nested array<array<T>>."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "xs", "type": {"type": "array", "items": "long"}},
            {
                "name": "tags",
                "type": {"type": "array", "items": ["null", "string"]},
            },
            {
                "name": "nest",
                "type": {
                    "type": "array",
                    "items": {"type": "array", "items": "long"},
                },
            },
            {"name": "m", "type": {"type": "map", "values": "double"}},
            {
                "name": "col",
                "type": {
                    "type": "enum",
                    "name": "color",
                    "symbols": ["R", "G", "B"],
                },
            },
            {
                "name": "fx",
                "type": {"type": "fixed", "name": "f4", "size": 4},
            },
        ],
    }
    txt = st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
        max_size=8,
    )
    row = st.tuples(
        st.lists(st.integers(-(2**62), 2**62), max_size=5),
        st.lists(st.one_of(st.none(), txt), max_size=4),
        st.lists(
            st.lists(st.integers(-100, 100), max_size=3), max_size=3
        ),
        st.dictionaries(txt, st.floats(allow_nan=False), max_size=4),
        st.sampled_from(["R", "G", "B"]),
        st.binary(min_size=4, max_size=4),
    )

    @settings(max_examples=40, deadline=None)
    @given(rows=st.lists(row, max_size=6))
    def check(rows):
        for codec in ("null", "deflate"):
            blob = encode_container(rows, schema, codec=codec, block_rows=2)
            _, got = decode_container(blob)
            assert got == rows

    check()


def test_avro_truncated_numerics_raise_valueerror():
    """r17 second review: the corruption contract is uniform — a
    truncated float/double raises the documented ValueError, not
    struct.error."""
    import io as _io

    from datafusion_uba_spark.sources.avro_py import _decode_value

    with pytest.raises(ValueError, match="truncated float"):
        _decode_value(_io.BytesIO(b"\x00\x00"), "float")
    with pytest.raises(ValueError, match="truncated double"):
        _decode_value(_io.BytesIO(b"\x00\x00\x00"), "double")
    with pytest.raises(ValueError, match="truncated varint"):
        _decode_value(_io.BytesIO(b"\xff"), "long")


def test_jar_reader_cross_reads_py_written_files(spark, tmp_path):
    """Env-gated cross-implementation check (the test_s3a.py pattern):
    in any deployment that vendors the spark-avro jar, Spark's own
    reader must decode avro_py-written containers byte-for-byte. This
    sandbox ships no jar, so it skips with that reason — the
    in-sandbox fidelity proof is the avro_customer_agg hash gate."""
    df = spark.createDataFrame(
        [(1, "a", 2.5, None), (2, None, -1.0, 7)],
        "id long, name string, score double, opt int",
    )
    out = str(tmp_path / "avro_cross")
    write_avro_py(df, out)
    try:
        got = spark.read.format("avro").load(out)
        rows = {tuple(r) for r in got.collect()}
    except Exception:
        pytest.skip(
            "spark-avro not on the classpath (pyspark ships without it "
            "and this container has no network to add it); runs in "
            "deployments that vendor the jar"
        )
    assert rows == {tuple(r) for r in df.collect()}


def test_schema_resolution_evolution():
    """The spec's Schema Resolution rules over the flat-record
    subset: reader fields match writer fields BY NAME (reordering is
    transparent), reader-only fields fill from their default (or null
    for nullable unions), writer-only fields are decoded and
    discarded, and a reader field with neither writer value nor
    default is a resolution error."""
    from datafusion_uba_spark.sources.avro_py import resolve_reader_schema

    writer = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "legacy", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    }
    rows = [(1, "a", 0.5), (2, "b", -1.0)]
    data = encode_container(rows, writer, codec="null")

    reader = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "score", "type": "double"},       # reordered
            {"name": "id", "type": "long"},
            {"name": "lang", "type": "string", "default": "en"},  # added
            {"name": "opt", "type": ["null", "long"]},  # added nullable
            # "legacy" dropped
        ],
    }
    got_schema, got = decode_container(data, reader_schema=reader)
    assert got_schema == reader
    assert got == [(0.5, 1, "en", None), (-1.0, 2, "en", None)]

    bad = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "missing", "type": "long"}],
    }
    with pytest.raises(ValueError, match="resolution error"):
        resolve_reader_schema(writer, bad)


def test_schema_resolution_promotions():
    """The spec's promotion lattice: int->long/float/double,
    long->float/double, float->double, string<->bytes — and the
    resolution ERRORS the r16 plan silently missed (ADVICE): a writer
    type outside the lattice, and a nullable writer under a
    non-nullable reader."""
    from datafusion_uba_spark.sources.avro_py import resolve_reader_schema

    writer = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "i", "type": "int"},
            {"name": "f", "type": "float"},
            {"name": "s", "type": "string"},
            {"name": "by", "type": "bytes"},
            {"name": "opt", "type": ["null", "long"]},
        ],
    }
    rows = [(7, 0.5, "héllo", b"h\xc3\xa9", 3), (-1, 2.0, "", b"", None)]
    data = encode_container(rows, writer, codec="null")
    reader = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "i", "type": "double"},
            {"name": "f", "type": "double"},
            {"name": "s", "type": "bytes"},
            {"name": "by", "type": "string"},  # valid UTF-8 here
            {"name": "opt", "type": ["null", "double"]},
        ],
    }
    _, got = decode_container(data, reader_schema=reader)
    assert got == [
        (7.0, 0.5, "héllo".encode(), "hé", 3.0),
        (-1.0, 2.0, b"", "", None),
    ]
    # writer string under reader long: not in the lattice
    with pytest.raises(ValueError, match="does not resolve"):
        resolve_reader_schema(writer, {
            "type": "record", "name": "row",
            "fields": [{"name": "s", "type": "long"}],
        })
    # nullable writer under non-nullable reader: resolution error
    with pytest.raises(ValueError, match="non-nullable reader"):
        resolve_reader_schema(writer, {
            "type": "record", "name": "row",
            "fields": [{"name": "opt", "type": "long"}],
        })


def test_truncated_boolean_raises():
    """A boolean at EOF must surface as corruption, not decode to
    False (ADVICE): a block claiming one row but carrying zero payload
    bytes hits EOF on the boolean and must raise."""
    import io as _io

    from datafusion_uba_spark.sources.avro_py import (
        _decode_value,
        zigzag_encode,
    )

    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "b", "type": "boolean"}],
    }
    sync = b"\x05" * 16
    data = encode_container([(True,)], schema, codec="null", sync=sync)
    head = data[: data.index(sync) + 16]  # header ends at first sync
    corrupt = head + zigzag_encode(1) + zigzag_encode(0) + sync
    with pytest.raises(ValueError, match="truncated boolean"):
        decode_container(corrupt)
    with pytest.raises(ValueError, match="truncated boolean"):
        _decode_value(_io.BytesIO(b""), "boolean")


def test_truncated_and_negative_length_strings_raise():
    """Review fix: a corrupt block whose string/bytes length runs past
    the payload (or is negative) raises instead of silently yielding
    truncated values — the same contract as the boolean guard."""
    import io as _io

    from datafusion_uba_spark.sources.avro_py import (
        _decode_value,
        zigzag_encode,
    )

    with pytest.raises(ValueError, match="truncated string"):
        _decode_value(
            _io.BytesIO(zigzag_encode(100) + b"abc"), "string"
        )
    with pytest.raises(ValueError, match="truncated bytes"):
        _decode_value(_io.BytesIO(zigzag_encode(5) + b"ab"), "bytes")
    with pytest.raises(ValueError, match="negative string length"):
        _decode_value(_io.BytesIO(zigzag_encode(-3)), "string")

    # container-level: shrink a one-string block's payload
    schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "s", "type": "string"}],
    }
    sync = b"\x06" * 16
    data = encode_container([("hello world",)], schema, codec="null", sync=sync)
    head = data[: data.index(sync) + 16]
    # count=1, size=3, payload = length-prefix 11 + only 2 chars
    corrupt = (
        head + zigzag_encode(1) + zigzag_encode(3)
        + zigzag_encode(11) + b"he" + sync
    )
    with pytest.raises(ValueError, match="truncated string"):
        decode_container(corrupt)


def test_avro_schema_for_rejects_tz_timestamp(spark):
    """TimestampType (instant) must be rejected NTZ-only (ADVICE):
    silently writing it would read back as TimestampNTZType with
    session-zone-dependent values."""
    df = spark.createDataFrame(
        [(1,)], "id long"
    ).selectExpr("timestamp'2024-01-01 00:00:00' as ts")
    assert df.schema.fields[0].dataType.simpleString() == "timestamp"
    with pytest.raises(ValueError, match="timestamp_ntz"):
        avro_schema_for(df)


def test_spark_face_long_reader_over_int_writer(spark, tmp_path):
    """Mixed-writer promotion end to end (the realistic evolution: a
    column widened int->long mid-stream): old files written int, new
    files written long, one long reader — one bigint frame."""
    import os

    out = str(tmp_path / "avro_promote")
    os.makedirs(out)
    int_writer = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "int"}],
    }
    long_writer = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "long"}],
    }
    with open(f"{out}/old.avro", "wb") as f:
        f.write(encode_container([(1,), (2,)], int_writer))
    with open(f"{out}/new.avro", "wb") as f:
        f.write(encode_container([(2**40,)], long_writer))

    got = read_avro_py(spark, out, reader_schema=long_writer)
    assert dict(got.dtypes) == {"id": "bigint"}
    assert {r.id for r in got.collect()} == {1, 2, 2**40}


def test_spark_face_reads_mixed_writer_schemas(spark, tmp_path):
    """Evolution end to end through the Spark face: files written
    under the OLD schema (no 'lang' column) and the NEW schema land in
    one frame under the reader schema — old rows get the default."""
    import os

    from datafusion_uba_spark.sources.avro_py import encode_container

    out = str(tmp_path / "avro_evolve")
    os.makedirs(out)
    old_schema = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "id", "type": "long"}],
    }
    new_schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "lang", "type": "string", "default": "en"},
        ],
    }
    with open(f"{out}/old.avro", "wb") as f:
        f.write(encode_container([(1,), (2,)], old_schema))
    with open(f"{out}/new.avro", "wb") as f:
        f.write(encode_container([(3, "fr")], new_schema))

    got = read_avro_py(spark, out, reader_schema=new_schema)
    assert {tuple(r) for r in got.collect()} == {
        (1, "en"), (2, "en"), (3, "fr"),
    }
    assert dict(got.dtypes) == {"id": "bigint", "lang": "string"}
