"""Dependency-free Apache Avro object-container codec + Spark plumbing.

The reference feature-gates an Avro source (tests/sqllogictests/src/
setup.rs:33-62); Spark's native path needs the spark-avro jar, which
this container cannot install — so through r15 the capability was
env-gated code with no executable test (SURVEY §2 S6, "partial"). But
the Avro object container file format is a small, fully public
specification (Apache Avro 1.11 spec, "Object Container Files"), and
the repo already ships dependency-free codecs for BMP/PPM/WAV
(operators.imagecodec / audiocodec) on exactly this rationale: real
byte-level format work, decoded executor-side through Arrow
``mapInPandas``. This module completes the source list the same way:

- ``encode_container`` / ``decode_container``: the container format
  itself — magic ``Obj\\x01``, the metadata map (``avro.schema`` JSON +
  ``avro.codec``), 16-byte sync marker, then data blocks of
  ``<count, byte-size, payload, sync>`` with null or deflate
  (raw RFC-1951, zlib wbits=-15) codecs.
- Binary encoding of the supported type subset (flat tabular records —
  what a table source needs): null, boolean, int, long (zigzag
  varints), float, double (IEEE LE), bytes, string (length-prefixed),
  logical date (int days) and timestamp-micros (long), and
  two-branch ``[null, T]`` unions for nullable columns.
- ``write_avro_py(df, path)`` / ``read_avro_py(spark, path)``: the
  distributed faces. The writer maps each partition to one container
  file under ``path`` (executors write — the path must be shared
  storage on a real cluster, same contract as any file sink); the
  reader scans ``binaryFile`` (so listing/filter behavior matches the
  other sources) and decodes file-at-a-time in Arrow-batched Python.
  Python-side decode is the documented slow path — the jar-backed
  ``sources.read_avro`` remains the fast path when the classpath has
  it — but it is REAL and testable here, and the registry row
  ``avro_customer_agg`` holds it to the driver's hash gate against
  the parquet oracle.

Scale shape: one container file per input partition, decoded
independently (file = unit of parallelism, like the multimodal
decoders); no shuffle anywhere in either direction.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

# --- varints -----------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """Avro int/long: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63) if n < 0 else (n << 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")
    return (acc >> 1) ^ -(acc & 1)


# --- schema ------------------------------------------------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def _field_type(t) -> tuple[object, bool]:
    """Normalize a field's schema to (kind, nullable). A kind is a
    primitive/logical name string, or for the spec's complex types a
    tuple: ``("array", item_kind)``, ``("map", value_kind)``,
    ``("enum", (symbols...))``, ``("fixed", size)``; item/value kinds
    recurse and wrap their own ``["null", T]`` unions as
    ``("union_null", inner_kind)`` (so array<array<long>>, maps of
    nullable values, etc. all resolve). Accepts 'long',
    {'type': 'int', 'logicalType': 'date'}, and ['null', T] unions.

    Unions must spell null FIRST (the canonical order every
    mainstream writer emits): the wire format indexes the union's
    branch LIST, and this decoder maps branch 0 to null — silently
    accepting ['T', 'null'] would decode values as nulls and nulls as
    garbage, so the reversed order is a loud error instead."""
    nullable = False
    if isinstance(t, list):
        branches = [b for b in t if b != "null"]
        if len(t) != 2 or len(branches) != 1:
            raise ValueError(f"only [null, T] unions supported, got {t}")
        if t[0] != "null":
            raise ValueError(
                f"union {t} spells null second; branch indexes would "
                "mis-decode (this subset requires ['null', T])"
            )
        nullable = True
        t = branches[0]
    if isinstance(t, dict):
        lt = t.get("logicalType")
        base = t["type"]
        if lt == "date" and base == "int":
            return "date", nullable
        # local-timestamp-micros (Avro >= 1.10) is the zone-less
        # twin of timestamp-micros; both decode to the same naive
        # micros here, so they normalize to one kind
        if lt in ("timestamp-micros", "local-timestamp-micros") and (
            base == "long"
        ):
            return "timestamp-micros", nullable
        if base == "array":
            return ("array", _item_type(t["items"])), nullable
        if base == "map":
            return ("map", _item_type(t["values"])), nullable
        if base == "enum":
            syms = tuple(t["symbols"])
            if not syms:
                raise ValueError("enum with no symbols")
            return ("enum", syms), nullable
        if base == "fixed":
            size = int(t["size"])
            if size < 0:
                raise ValueError(f"negative fixed size {size}")
            return ("fixed", size), nullable
        if base == "record":
            raise ValueError(
                "nested records are unsupported (flatten upstream; "
                "array/map/enum/fixed ARE decoded)"
            )
        t = base
    if t not in _PRIMITIVES:
        raise ValueError(f"unsupported avro type {t!r}")
    return t, nullable


def _item_type(s) -> object:
    """Kind for an array-item / map-value schema: recurse through
    ``_field_type`` and wrap a ``["null", T]`` union as
    ``("union_null", inner)`` so element nullability survives inside
    the kind itself (fields carry nullability separately; elements
    cannot)."""
    kind, nullable = _field_type(s)
    return ("union_null", kind) if nullable else kind


def _parse_record_schema(schema: dict) -> list[tuple[str, str, bool]]:
    if schema.get("type") != "record":
        raise ValueError("container schema must be a record")
    return [
        (f["name"], *_field_type(f["type"])) for f in schema["fields"]
    ]


# --- value encode/decode -------------------------------------------------------

_EPOCH_ORD = 719163  # datetime.date(1970, 1, 1).toordinal()


def _encode_value(out: bytearray, kind, v) -> None:
    if isinstance(kind, tuple):
        tag = kind[0]
        if tag == "union_null":
            if v is None:
                out += zigzag_encode(0)
            else:
                out += zigzag_encode(1)
                _encode_value(out, kind[1], v)
        elif tag == "array":
            # one block per array (spec allows any blocking);
            # zero-length arrays are just the terminator
            items = list(v)
            if items:
                out += zigzag_encode(len(items))
                for item in items:
                    _encode_value(out, kind[1], item)
            out += zigzag_encode(0)
        elif tag == "map":
            entries = dict(v)
            if entries:
                out += zigzag_encode(len(entries))
                for mk, mv in entries.items():
                    _encode_value(out, "string", mk)
                    _encode_value(out, kind[1], mv)
            out += zigzag_encode(0)
        elif tag == "enum":
            try:
                out += zigzag_encode(kind[1].index(v))
            except ValueError:
                raise ValueError(
                    f"value {v!r} is not an enum symbol of {kind[1]}"
                ) from None
        elif tag == "fixed":
            b = bytes(v)
            if len(b) != kind[1]:
                raise ValueError(
                    f"fixed({kind[1]}) got {len(b)} bytes"
                )
            out += b
        else:  # pragma: no cover - _field_type already validated
            raise ValueError(f"unsupported kind {kind}")
        return
    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if v else 0)
    elif kind in ("int", "long"):
        out += zigzag_encode(int(v))
    elif kind == "float":
        out += struct.pack("<f", float(v))
    elif kind == "double":
        out += struct.pack("<d", float(v))
    elif kind == "bytes":
        b = bytes(v)
        out += zigzag_encode(len(b)) + b
    elif kind == "string":
        b = str(v).encode("utf-8")
        out += zigzag_encode(len(b)) + b
    elif kind == "date":
        # logical date: days since unix epoch as int
        out += zigzag_encode(v.toordinal() - _EPOCH_ORD)
    elif kind == "timestamp-micros":
        import calendar

        us = calendar.timegm(v.timetuple()) * 1_000_000 + v.microsecond
        out += zigzag_encode(us)
    else:  # pragma: no cover - _field_type already validated
        raise ValueError(f"unsupported kind {kind}")


def _decode_value(buf: io.BytesIO, kind):
    if isinstance(kind, tuple):
        tag = kind[0]
        if tag == "union_null":
            idx = zigzag_decode(buf)
            if idx == 0:
                return None
            if idx != 1:
                raise ValueError(
                    f"union branch index {idx} out of range (corrupt "
                    "block or non-[null, T] union)"
                )
            return _decode_value(buf, kind[1])
        if tag == "array":
            arr = []
            while True:
                n = zigzag_decode(buf)
                if n == 0:
                    return arr
                if n < 0:
                    # spec: negative count is followed by the block's
                    # byte size (skippable-block form; unused when
                    # reading sequentially)
                    n = -n
                    zigzag_decode(buf)
                for _ in range(n):
                    arr.append(_decode_value(buf, kind[1]))
        if tag == "map":
            m = {}
            while True:
                n = zigzag_decode(buf)
                if n == 0:
                    return m
                if n < 0:
                    n = -n
                    zigzag_decode(buf)
                for _ in range(n):
                    mk = _decode_value(buf, "string")
                    m[mk] = _decode_value(buf, kind[1])
        if tag == "enum":
            i = zigzag_decode(buf)
            if not 0 <= i < len(kind[1]):
                raise ValueError(
                    f"enum index {i} out of range for {kind[1]} "
                    "(corrupt block or evolved writer enum)"
                )
            return kind[1][i]
        if tag == "fixed":
            b = buf.read(kind[1])
            if len(b) != kind[1]:
                raise ValueError(
                    f"truncated fixed: wanted {kind[1]} bytes, "
                    f"got {len(b)}"
                )
            return b
        raise ValueError(f"unsupported kind {kind}")  # pragma: no cover
    if kind == "null":
        return None
    if kind == "boolean":
        raw = buf.read(1)
        if not raw:
            raise ValueError("truncated boolean")
        return raw == b"\x01"
    if kind in ("int", "long"):
        return zigzag_decode(buf)
    if kind == "float":
        raw = buf.read(4)
        if len(raw) != 4:
            # uniform corruption contract (r17 second review): a short
            # buffer raises the documented ValueError, not struct.error
            raise ValueError(
                f"truncated float: wanted 4 bytes, got {len(raw)}"
            )
        return struct.unpack("<f", raw)[0]
    if kind == "double":
        raw = buf.read(8)
        if len(raw) != 8:
            raise ValueError(
                f"truncated double: wanted 8 bytes, got {len(raw)}"
            )
        return struct.unpack("<d", raw)[0]
    if kind in ("bytes", "string"):
        ln = zigzag_decode(buf)
        if ln < 0:
            raise ValueError(f"negative {kind} length {ln} (corrupt block)")
        b = buf.read(ln)
        if len(b) != ln:
            raise ValueError(
                f"truncated {kind}: wanted {ln} bytes, got {len(b)}"
            )
        return b if kind == "bytes" else b.decode("utf-8")
    if kind == "date":
        import datetime

        return datetime.date.fromordinal(zigzag_decode(buf) + _EPOCH_ORD)
    if kind == "timestamp-micros":
        import datetime

        us = zigzag_decode(buf)
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=us
        )
    raise ValueError(f"unsupported kind {kind}")  # pragma: no cover


# --- container ----------------------------------------------------------------

MAGIC = b"Obj\x01"


def _write_meta_map(out: bytearray, meta: dict[str, bytes]) -> None:
    if meta:
        out += zigzag_encode(len(meta))
        for k, v in meta.items():
            kb = k.encode("utf-8")
            out += zigzag_encode(len(kb)) + kb
            out += zigzag_encode(len(v)) + v
    out += zigzag_encode(0)


def _read_meta_map(buf: io.BytesIO) -> dict[str, bytes]:
    meta: dict[str, bytes] = {}
    while True:
        n = zigzag_decode(buf)
        if n == 0:
            return meta
        if n < 0:
            # spec: a negative count is followed by the block's byte
            # size (which we don't need when reading sequentially)
            zigzag_decode(buf)
            n = -n
        for _ in range(n):
            k = buf.read(zigzag_decode(buf)).decode("utf-8")
            meta[k] = buf.read(zigzag_decode(buf))


def encode_container(
    rows,
    schema: dict,
    codec: str = "deflate",
    block_rows: int = 1000,
    sync: bytes | None = None,
) -> bytes:
    """Rows (sequences aligned with the record schema's field order)
    -> one Avro object-container file as bytes."""
    fields = _parse_record_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be null or deflate, got {codec!r}")
    if sync is None:
        # deterministic sync (spec only requires the marker to match
        # between header and blocks): hash of the schema JSON
        import hashlib

        sync = hashlib.md5(json.dumps(schema).encode()).digest()
    if len(sync) != 16:
        raise ValueError("sync marker must be 16 bytes")
    out = bytearray(MAGIC)
    _write_meta_map(
        out,
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
        },
    )
    out += sync

    block = bytearray()
    n_in_block = 0

    def flush():
        nonlocal block, n_in_block
        if not n_in_block:
            return
        payload = bytes(block)
        if codec == "deflate":
            # raw RFC-1951 stream (no zlib header/checksum), per spec
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        out.extend(zigzag_encode(n_in_block))
        out.extend(zigzag_encode(len(payload)))
        out.extend(payload)
        out.extend(sync)
        block = bytearray()
        n_in_block = 0

    for row in rows:
        for (name, kind, nullable), v in zip(fields, row, strict=True):
            if nullable:
                if v is None:
                    block += zigzag_encode(0)  # union branch 0 = null
                    continue
                block += zigzag_encode(1)
            elif v is None:
                raise ValueError(f"null in non-nullable field {name!r}")
            _encode_value(block, kind, v)
        n_in_block += 1
        if n_in_block >= block_rows:
            flush()
    flush()
    return bytes(out)


# the spec's numeric/byte promotion lattice ("Schema Resolution"):
# writer kind -> reader kind it may be promoted to, with the value
# converter (None = identity once decoded into Python)
_PROMOTIONS: dict[tuple[str, str], object] = {
    ("int", "long"): None,
    ("int", "float"): float,
    ("int", "double"): float,
    ("long", "float"): float,
    ("long", "double"): float,
    ("float", "double"): None,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def resolve_reader_schema(
    writer: dict, reader: dict
) -> list[tuple[int | None, object, object]]:
    """Avro schema-resolution plan (the spec's 'Schema Resolution'
    rules for the flat-record subset): for each READER field, a
    ``(writer_index, default, convert)`` entry — either the index of
    the writer field with the same name (plus the promotion converter
    when the types differ), or ``(None, default, None)`` when the
    writer never wrote it. The evolution cases a table source meets:
    columns added (reader default fills), columns dropped (writer
    values decoded then discarded), columns reordered (name match,
    not position), and the spec's type promotions
    (int->long/float/double, long->float/double, float->double,
    string<->bytes). Mismatches outside the lattice — including a
    nullable writer under a non-nullable reader — raise the spec's
    resolution error; a non-nullable writer under a nullable reader
    is fine. A reader field that is neither written nor defaulted
    (and not nullable) is also a resolution error."""
    w_fields = {f["name"]: i for i, f in enumerate(writer["fields"])}
    plan: list[tuple[int | None, object, object]] = []
    for f in reader["fields"]:
        name = f["name"]
        if name in w_fields:
            idx = w_fields[name]
            r_kind, r_null = _field_type(f["type"])
            w_kind, w_null = _field_type(writer["fields"][idx]["type"])
            if w_null and not r_null:
                raise ValueError(
                    f"field {name!r}: nullable writer type cannot "
                    "resolve to a non-nullable reader field "
                    "(Avro resolution error)"
                )
            if w_kind == r_kind:
                conv = None
            elif (w_kind, r_kind) in _PROMOTIONS:
                conv = _PROMOTIONS[(w_kind, r_kind)]
            else:
                raise ValueError(
                    f"field {name!r}: writer type {w_kind!r} does not "
                    f"resolve to reader type {r_kind!r} "
                    "(Avro resolution error)"
                )
            plan.append((idx, None, conv))
            continue
        if "default" in f:
            plan.append((None, f["default"], None))
        elif _field_type(f["type"])[1]:  # nullable union defaults null
            plan.append((None, None, None))
        else:
            raise ValueError(
                f"reader field {name!r} is not in the writer "
                "schema and has no default (Avro resolution error)"
            )
    return plan


def _read_header(buf) -> tuple[dict, list, str, bytes, int]:
    """Parse a container header from any seekable binary file-like
    positioned at 0: (writer schema dict, parsed fields, codec, sync
    marker, header-end offset). The header-end offset is the start of
    the first data block — equivalently, 16 past the START offset of
    the header's trailing sync marker."""
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container (bad magic)")
    meta = _read_meta_map(buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro.codec {codec!r}")
    fields = _parse_record_schema(schema)
    sync = buf.read(16)
    if len(sync) != 16:
        raise ValueError("truncated header (no sync marker)")
    return schema, fields, codec, sync, buf.tell()


def _decode_block_rows(
    payload: bytes, n: int, fields, codec: str, plan
) -> list[tuple]:
    """Decode one block's ``n`` rows from its (possibly compressed)
    payload — the shared core of the whole-file and split readers."""
    if codec == "deflate":
        payload = zlib.decompress(payload, wbits=-15)
    b = io.BytesIO(payload)
    rows: list[tuple] = []
    for _ in range(n):
        vals = []
        for _name, kind, nullable in fields:
            if nullable and zigzag_decode(b) == 0:
                vals.append(None)
                continue
            vals.append(_decode_value(b, kind))
        if plan is not None:
            vals = [
                dflt
                if idx is None
                else (
                    conv(vals[idx])
                    if conv is not None and vals[idx] is not None
                    else vals[idx]
                )
                for idx, dflt, conv in plan
            ]
        rows.append(tuple(vals))
    return rows


def decode_container(
    data: bytes, reader_schema: dict | None = None
) -> tuple[dict, list[tuple]]:
    """One container file -> (schema dict, rows as tuples in field
    order). Verifies magic and every block's sync marker.

    ``reader_schema``: apply the spec's schema-resolution rules —
    rows come back in READER field order, added fields filled from
    defaults, dropped writer fields discarded. The returned schema is
    then the reader schema."""
    buf = io.BytesIO(data)
    schema, fields, codec, sync, _ = _read_header(buf)
    plan = (
        resolve_reader_schema(schema, reader_schema)
        if reader_schema is not None
        else None
    )
    rows: list[tuple] = []
    while True:
        head = buf.read(1)
        if not head:
            break  # clean EOF at a block boundary
        buf.seek(-1, 1)
        n = zigzag_decode(buf)
        size = zigzag_decode(buf)
        payload = buf.read(size)
        if len(payload) != size:
            raise ValueError("truncated block")
        rows.extend(_decode_block_rows(payload, n, fields, codec, plan))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return (reader_schema if reader_schema is not None else schema), rows


def _scan_for_sync(f, start: int, sync: bytes, chunk: int = 1 << 20):
    """First absolute offset >= ``start`` where the 16-byte sync
    marker BEGINS, scanning forward in chunks with a 15-byte overlap;
    None past EOF. This is the container spec's own splittability
    mechanism (the same scan Hadoop's Avro input format performs): a
    payload-internal byte string equal to the sync can false-anchor a
    reader — probability ~2^-128 per position — in which case block
    decode fails LOUDLY at the trailing-sync check rather than
    returning wrong rows."""
    f.seek(start)
    base = start
    tail = b""
    while True:
        data = f.read(chunk)
        if not data:
            return None
        hay = tail + data
        i = hay.find(sync)
        if i != -1:
            return base - len(tail) + i
        tail = hay[-15:]
        base += len(data)


def iter_split_rows(
    f,
    start: int,
    end: int,
    reader_schema: dict | None = None,
    header: tuple | None = None,
):
    """Yield row tuples for the blocks of ONE byte-range split of a
    container file — the task-side half of the splittable read.

    Ownership rule (exact partition, Hadoop input-split semantics): a
    block belongs to the split [start, end) that contains the START
    offset of its preceding sync marker. The header's trailing sync
    anchors the first block, so the split containing it needs no
    special casing. After the first anchor the reader follows
    block-chained syncs directly (no re-scan); every block's trailing
    marker is verified."""
    f.seek(0)
    schema, fields, codec, sync, _hdr_end = (
        header if header is not None else _read_header(f)
    )
    plan = (
        resolve_reader_schema(schema, reader_schema)
        if reader_schema is not None
        else None
    )
    o = _scan_for_sync(f, start, sync)
    while o is not None and o < end:
        f.seek(o + 16)
        head = f.read(1)
        if not head:
            return  # final sync of the file — clean EOF
        f.seek(-1, 1)
        n = zigzag_decode(f)
        size = zigzag_decode(f)
        payload = f.read(size)
        if len(payload) != size:
            raise ValueError("truncated block")
        nxt = f.read(16)
        if nxt != sync:
            raise ValueError(
                "sync marker mismatch (corrupt block or false sync "
                f"anchor at offset {o})"
            )
        yield from _decode_block_rows(payload, n, fields, codec, plan)
        o = f.tell() - 16  # the marker just consumed anchors the next


# --- Spark faces ----------------------------------------------------------------

_SPARK_TO_AVRO = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    # NTZ emits the spec's zone-LESS logical type (Avro >= 1.10);
    # plain timestamp-micros (an instant) is still accepted on read
    "timestamp_ntz": {"type": "long", "logicalType": "local-timestamp-micros"},
}


def avro_schema_for(df, name: str = "row") -> dict:
    """Derive the Avro record schema for a flat DataFrame.

    Timestamps are NTZ-only: TimestampType (an instant displayed in
    the session zone) is rejected rather than silently round-tripping
    back as TimestampNTZType with session-dependent instants — cast
    to ``timestamp_ntz`` first (the same explicit-rejection contract
    as nested records). Array and map columns (string keys, per the
    Avro spec) map to the spec's complex types, recursing through
    nested element types; element nullability becomes a
    ``["null", T]`` item union."""
    from pyspark.sql import types as T

    def _avro_type(dt, colname: str):
        simple = dt.simpleString()
        if simple == "timestamp":
            raise ValueError(
                f"column {colname!r}: TimestampType (tz-aware instant) "
                "would read back as TimestampNTZType with "
                "session-zone-dependent values; cast to timestamp_ntz "
                "before write_avro_py"
            )
        if isinstance(dt, T.ArrayType):
            item = _avro_type(dt.elementType, colname)
            return {
                "type": "array",
                "items": ["null", item] if dt.containsNull else item,
            }
        if isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError(
                    f"column {colname!r}: avro map keys are strings; "
                    f"got {dt.keyType.simpleString()!r} keys"
                )
            val = _avro_type(dt.valueType, colname)
            return {
                "type": "map",
                "values": ["null", val] if dt.valueContainsNull else val,
            }
        t = _SPARK_TO_AVRO.get(simple)
        if t is None:
            raise ValueError(
                f"column {colname!r}: no avro mapping for spark type "
                f"{simple!r}"
            )
        return t

    fields = []
    for f in df.schema.fields:
        t = _avro_type(f.dataType, f.name)
        fields.append(
            {"name": f.name, "type": ["null", t] if f.nullable else t}
        )
    return {"type": "record", "name": name, "fields": fields}


def spark_schema_for_avro(avro_schema: dict):
    """Avro record schema dict -> Spark StructType (the read-side
    inverse of ``avro_schema_for``'s subset). Complex kinds (r17
    verdict #6): arrays/maps recurse, element nullability comes from
    the union_null wrapper; enum -> string (symbols are just names),
    fixed -> binary."""
    from pyspark.sql import types as T

    prim = {
        "long": T.LongType(),
        "int": T.IntegerType(),
        "double": T.DoubleType(),
        "float": T.FloatType(),
        "string": T.StringType(),
        "boolean": T.BooleanType(),
        "bytes": T.BinaryType(),
        "date": T.DateType(),
        "timestamp-micros": T.TimestampNTZType(),
    }

    def _to_spark(kind):
        if isinstance(kind, tuple):
            tag = kind[0]
            if tag == "union_null":
                return _to_spark(kind[1])
            inner_null = (
                isinstance(kind[1], tuple) and kind[1][0] == "union_null"
                if tag in ("array", "map")
                else False
            )
            if tag == "array":
                return T.ArrayType(_to_spark(kind[1]), inner_null)
            if tag == "map":
                return T.MapType(
                    T.StringType(), _to_spark(kind[1]), inner_null
                )
            if tag == "enum":
                return T.StringType()
            if tag == "fixed":
                return T.BinaryType()
        return prim[kind]

    return T.StructType(
        [
            T.StructField(name, _to_spark(kind), nullable)
            for name, kind, nullable in _parse_record_schema(avro_schema)
        ]
    )


def write_avro_py(df, path: str, codec: str = "deflate") -> int:
    """Write ``df`` as one Avro container file per partition under
    ``path`` (created if missing). Executors write — on a real cluster
    ``path`` must be shared storage, the standard sink contract.
    Returns the number of files written."""
    import os

    schema = avro_schema_for(df)
    cols = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    def _write(batches):
        import pandas as pd
        from pyspark import TaskContext

        def _scalar_null(v):
            # pd.isna on a list/ndarray (array/map columns) returns an
            # elementwise array — only scalars get the NaN->None map
            if isinstance(v, (list, tuple, dict)) or getattr(
                v, "ndim", 0
            ):
                return v
            return None if pd.isna(v) else v

        rows: list[tuple] = []
        for pdf in batches:
            for t in pdf.itertuples(index=False):
                rows.append(tuple(_scalar_null(v) for v in t))
        if not rows:
            return
        # deterministic per-partition name: a retried task REPLACES
        # its own file (atomic rename over the same name) instead of
        # leaving a duplicate a reader would double-count
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        tmp = f"{fname}.tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(encode_container(rows, schema, codec=codec))
        os.replace(tmp, fname)
        yield pd.DataFrame({"path": [fname], "n_rows": [len(rows)]})

    manifest = df.select(*cols).mapInPandas(_write, "path string, n_rows long")
    return manifest.count()


class _ReadAhead:
    """Chunked read-ahead over a seekable raw source (S3RangedFile):
    the decoder's byte-at-a-time varint reads would otherwise issue
    one ranged GET PER BYTE. Serves reads from a ``chunk``-sized
    buffer refilled with max(n, chunk) raw reads — wire cost becomes
    ~1 GET per chunk instead of per call; the raw source never pads,
    so total bytes moved stay <= split + one block overrun."""

    def __init__(self, raw, chunk: int = 1 << 20):
        self._raw = raw
        self._chunk = chunk
        self._pos = 0
        self._buf = b""
        self._buf_start = 0

    def tell(self) -> int:
        return self._pos

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        else:
            raise ValueError("whence 2 unsupported")
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            self._raw.seek(self._pos)
            data = self._raw.read()
            self._pos += len(data)
            return data
        out = []
        while n > 0:
            if not (
                self._buf_start
                <= self._pos
                < self._buf_start + len(self._buf)
            ):
                self._raw.seek(self._pos)
                self._buf = self._raw.read(max(n, self._chunk))
                self._buf_start = self._pos
                if not self._buf:
                    break
            i = self._pos - self._buf_start
            take = self._buf[i : i + n]
            out.append(take)
            self._pos += len(take)
            n -= len(take)
        return b"".join(out)


def read_avro_s3_py(
    spark,
    endpoint: str,
    bucket: str,
    prefix: str,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    schema=None,
    reader_schema: dict | None = None,
    split_size: int = 128 * 1024 * 1024,
    suffix: str = ".avro",
):
    """Jar-less Avro scan over S3: ListObjectsV2 + the sync-marker
    byte-range splits of ``iter_split_rows`` over ``S3RangedFile`` —
    the composition of the two public-spec faces. Each task decodes
    only the blocks anchored inside its split, reading through a
    chunked read-ahead so wire cost is ~1 ranged GET per MiB, and the
    bytes of blocks anchored in OTHER splits never cross the wire
    (proven by server wire accounting in tests/test_avro_py.py).
    Schema/evolution semantics identical to ``read_avro_py``."""
    from pyspark.sql import types as T

    from datafusion_uba_spark.sources.s3_py import S3Client, S3RangedFile

    client = S3Client(endpoint, access_key, secret_key, region)
    objs = [
        (k, sz)
        for k, sz in client.list_objects(bucket, prefix)
        if k.endswith(suffix)
    ]
    if not objs:
        raise ValueError(
            f"no {suffix!r} objects under s3://{bucket}/{prefix} "
            f"at {endpoint}"
        )
    if split_size <= 0:
        raise ValueError(f"split_size must be positive, got {split_size}")
    if schema is None:
        if reader_schema is not None:
            avro_schema = reader_schema
        else:
            k0, sz0 = objs[0]
            f0 = _ReadAhead(
                S3RangedFile(client, bucket, k0, sz0), chunk=64 * 1024
            )
            avro_schema = _read_header(f0)[0]
        schema = spark_schema_for_avro(avro_schema)
    elif isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    splits = [
        (k, sz, s0, min(s0 + split_size, sz))
        for k, sz in objs
        for s0 in range(0, sz, split_size)
    ]
    sdf = spark.createDataFrame(
        splits, "key string, size long, start long, end long"
    ).repartition(len(splits))
    out_cols = [f.name for f in schema.fields]
    ep, ak, sk, rg, bkt = endpoint, access_key, secret_key, region, bucket

    def _decode_splits(batches):
        import pandas as pd

        c = S3Client(ep, ak, sk, rg)
        for pdf in batches:
            for key, sz, s0, e0 in zip(
                pdf["key"], pdf["size"], pdf["start"], pdf["end"]
            ):
                # header via a SMALL-chunk reader (a few KB on the
                # wire), then the data pass with MiB chunks — a split
                # never pays a MiB fetch just to parse the header
                hf = _ReadAhead(
                    S3RangedFile(c, bkt, key, int(sz)), chunk=16 * 1024
                )
                hdr = _read_header(hf)
                # data chunk capped by the split's own width so the
                # read-ahead can't overshoot a small split by a full
                # MiB-scale buffer (overrun stays O(split))
                f = _ReadAhead(
                    S3RangedFile(c, bkt, key, int(sz)),
                    chunk=min(4 << 20, max(64 * 1024, int(e0 - s0))),
                )
                rows = list(
                    iter_split_rows(
                        f, int(s0), int(e0), reader_schema, header=hdr
                    )
                )
                yield pd.DataFrame.from_records(rows, columns=out_cols)

    return sdf.mapInPandas(_decode_splits, schema)


def read_avro_py(
    spark,
    path: str,
    schema=None,
    reader_schema: dict | None = None,
    split_size: int | None = None,
):
    """Read a directory of Avro container files without the spark-avro
    jar: ``binaryFile`` scan -> per-file Arrow-batched Python decode.

    ``schema`` is the SPARK schema (StructType or DDL string) to
    produce; when None it is derived from the first file's embedded
    Avro schema (one driver-side file read — pass it explicitly in
    production, same advice as read_jsonl).

    ``reader_schema`` (an Avro record dict) applies the spec's schema
    resolution per file — the evolution case: old files written before
    a column existed read back with the reader's default filled in,
    dropped columns are discarded, reordered fields match by name,
    and the spec's type promotions apply (int->long/float/double,
    long->float/double, float->double, string<->bytes). Files written
    under DIFFERENT writer schemas thus land in one uniform frame.

    Memory shape: by default ``binaryFile`` hands each task ONE WHOLE
    container file, so a task transiently holds that file's bytes plus
    its decoded rows. Self-written twins are bounded (write_avro_py
    emits one file per input partition); for a FOREIGN directory with
    multi-GB files pass ``split_size`` instead.

    ``split_size`` (bytes) activates the SPLITTABLE read — the
    container spec's own mechanism, the same one Hadoop's Avro input
    format uses: each file fans out into byte-range splits; a task
    seeks to its range, scans forward to the next 16-byte sync
    marker, and decodes exactly the blocks whose preceding sync
    STARTS inside its range (an exact partition of the file's blocks,
    so a 10 GB file becomes ~80 parallel 128 MB tasks instead of one
    10 GB task, and per-task memory is bounded by split + one block).
    Files must be reachable from executors by path (shared storage —
    the same contract the write face states)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if split_size is not None:
        if split_size <= 0:
            raise ValueError(f"split_size must be positive, got {split_size}")
        import glob as _glob
        import os as _os

        files = sorted(_glob.glob(_os.path.join(path, "*.avro")))
        if not files:
            raise ValueError(f"no .avro files under {path!r}")
        if schema is None:
            if reader_schema is not None:
                avro_schema = reader_schema
            else:
                with open(files[0], "rb") as fh:
                    avro_schema = _read_header(fh)[0]
            schema = spark_schema_for_avro(avro_schema)
        elif isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        splits = []
        for p in files:
            size = _os.path.getsize(p)
            s0 = 0
            while s0 < size:
                splits.append((p, s0, min(s0 + split_size, size)))
                s0 += split_size
        sdf = spark.createDataFrame(
            splits, "path string, start long, end long"
        ).repartition(len(splits))
        out_cols = [f.name for f in schema.fields]

        def _decode_splits(batches):
            import pandas as pd

            for pdf in batches:
                for p, s0, e0 in zip(
                    pdf["path"], pdf["start"], pdf["end"]
                ):
                    with open(p, "rb") as fh:
                        rows = list(
                            iter_split_rows(
                                fh, int(s0), int(e0), reader_schema
                            )
                        )
                    yield pd.DataFrame.from_records(
                        rows, columns=out_cols
                    )

        return sdf.mapInPandas(_decode_splits, schema)

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
    )
    if schema is None:
        if reader_schema is not None:
            avro_schema = reader_schema
        else:
            head = bf.select("content").head()
            if head is None:
                raise ValueError(f"no .avro files under {path!r}")
            avro_schema, _ = decode_container(bytes(head[0]))
        schema = spark_schema_for_avro(avro_schema)

    def _decode(batches):
        import pandas as pd

        for pdf in batches:
            for blob in pdf["content"]:
                _, rows = decode_container(
                    bytes(blob), reader_schema=reader_schema
                )
                yield pd.DataFrame.from_records(
                    rows,
                    columns=[f.name for f in schema.fields]
                    if not isinstance(schema, str)
                    else None,
                )

    return bf.select(F.col("content")).mapInPandas(_decode, schema)
