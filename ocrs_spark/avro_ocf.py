"""From-spec Apache Avro binary encoding + Object Container Files.

The sandbox has no Python Avro library, but the Iceberg table format
(``ocrs_spark.iceberg``) stores its manifest lists and manifest files
as Avro OCF, so this module implements the needed subset of the Avro
1.12 specification (https://avro.apache.org/docs/1.12.0/specification/)
directly:

- binary encoding for null / boolean / int / long (zigzag varint),
  float / double (little-endian IEEE), bytes / string (length-prefixed),
  fixed, record, array, map, and union;
- Object Container Files (magic ``Obj\\x01``, file-metadata map with
  ``avro.schema`` / ``avro.codec``, 16-byte sync marker, length-prefixed
  data blocks) with the ``null`` and ``deflate`` codecs.

Schemas are the standard JSON form, kept verbatim (including extra
attributes like Iceberg's ``field-id``) so files written here carry
exactly the metadata real Iceberg readers expect. Generic data maps to
plain Python values (dict per record, list per array, bytes, int, str).

Correctness is cross-validated in ``tests/test_avro_ocf.py`` against the
*Java* Avro library bundled with Spark (``avro-1.12.1.jar``) through the
py4j gateway: files written here are read back with
``org.apache.avro.file.DataFileReader`` and files written by
``org.apache.avro.file.DataFileWriter`` are read back here, field by
field — an independent implementation agreeing on the bytes.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC_SIZE = 16

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------


class SchemaError(ValueError):
    pass


def _resolve(schema, names):
    """Normalize a parsed-JSON schema node; register/resolve named types."""
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in names:
            return names[schema]
        raise SchemaError(f"unknown type name {schema!r}")
    if isinstance(schema, list):  # union
        return ["union", [_resolve(b, names) for b in schema]]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in _PRIMITIVES and len(schema) == 1:
            return t
        if t == "record":
            node = ["record", schema.get("name"), []]
            if schema.get("name"):
                names[schema["name"]] = node
            fields = [
                (f["name"], _resolve(f["type"], names), f)
                for f in schema.get("fields", [])
            ]
            node[2].extend(fields)
            return node
        if t == "array":
            return ["array", _resolve(schema["items"], names)]
        if t == "map":
            return ["map", _resolve(schema["values"], names)]
        if t == "fixed":
            node = ["fixed", int(schema["size"])]
            if schema.get("name"):
                names[schema["name"]] = node
            return node
        if t == "enum":
            node = ["enum", list(schema["symbols"])]
            if schema.get("name"):
                names[schema["name"]] = node
            return node
        if t in _PRIMITIVES:  # e.g. {"type": "long", "logicalType": ...}
            return t
        if isinstance(t, (dict, list)):
            return _resolve(t, names)
    raise SchemaError(f"unsupported schema node: {schema!r}")


def parse_schema(schema_json: str | dict):
    """Parse an Avro JSON schema into the internal normalized form."""
    node = schema_json if isinstance(schema_json, dict) else json.loads(schema_json)
    return _resolve(node, {})


# ---------------------------------------------------------------------------
# binary encoding
# ---------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(out: io.BytesIO, n: int) -> None:
    z = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7
        if shift > 70:
            raise SchemaError("varint too long")


def _union_branch(branches, value):
    """Pick the union branch for a Python value (null-first heuristics
    cover the ["null", T] / [T, "null"] shapes Iceberg uses)."""
    for i, b in enumerate(branches):
        if b == "null" and value is None:
            return i
    for i, b in enumerate(branches):
        if b == "null":
            continue
        if b == "boolean" and isinstance(value, bool):
            return i
        if b in ("int", "long") and isinstance(value, int) and not isinstance(value, bool):
            return i
        if b in ("float", "double") and isinstance(value, float):
            return i
        if b == "string" and isinstance(value, str):
            return i
        if b == "bytes" and isinstance(value, (bytes, bytearray)):
            return i
        if isinstance(b, list):
            kind = b[0]
            if kind == "record" and isinstance(value, dict):
                return i
            if kind == "array" and isinstance(value, list):
                return i
            if kind == "map" and isinstance(value, dict):
                return i
            if kind == "fixed" and isinstance(value, (bytes, bytearray)):
                return i
            if kind == "enum" and isinstance(value, str):
                return i
    raise SchemaError(f"no union branch for {type(value).__name__}")


def write_datum(out: io.BytesIO, schema, value) -> None:
    if schema == "null":
        if value is not None:
            raise SchemaError("non-null value for null schema")
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        write_long(out, int(value))
        return
    if schema == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        data = bytes(value)
        write_long(out, len(data))
        out.write(data)
        return
    if schema == "string":
        data = value.encode("utf-8")
        write_long(out, len(data))
        out.write(data)
        return
    kind = schema[0]
    if kind == "union":
        idx = _union_branch(schema[1], value)
        write_long(out, idx)
        write_datum(out, schema[1][idx], value)
        return
    if kind == "record":
        for name, ftype, _meta in schema[2]:
            if name not in value:
                raise SchemaError(f"missing record field {name!r}")
            write_datum(out, ftype, value[name])
        return
    if kind == "array":
        if value:
            write_long(out, len(value))
            for item in value:
                write_datum(out, schema[1], item)
        write_long(out, 0)
        return
    if kind == "map":
        if value:
            write_long(out, len(value))
            for k, v in value.items():
                write_datum(out, "string", k)
                write_datum(out, schema[1], v)
        write_long(out, 0)
        return
    if kind == "fixed":
        data = bytes(value)
        if len(data) != schema[1]:
            raise SchemaError("fixed size mismatch")
        out.write(data)
        return
    if kind == "enum":
        write_long(out, schema[1].index(value))
        return
    raise SchemaError(f"unsupported schema {schema!r}")


def read_datum(buf: io.BytesIO, schema):
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return buf.read(read_long(buf))
    if schema == "string":
        return buf.read(read_long(buf)).decode("utf-8")
    kind = schema[0]
    if kind == "union":
        return read_datum(buf, schema[1][read_long(buf)])
    if kind == "record":
        return {name: read_datum(buf, ftype) for name, ftype, _meta in schema[2]}
    if kind == "array":
        out = []
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:  # block with byte-size prefix
                count = -count
                read_long(buf)
            for _ in range(count):
                out.append(read_datum(buf, schema[1]))
    if kind == "map":
        out = {}
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:
                count = -count
                read_long(buf)
            for _ in range(count):
                k = read_datum(buf, "string")
                out[k] = read_datum(buf, schema[1])
    if kind == "fixed":
        return buf.read(schema[1])
    if kind == "enum":
        return schema[1][read_long(buf)]
    raise SchemaError(f"unsupported schema {schema!r}")


# ---------------------------------------------------------------------------
# Object Container Files
# ---------------------------------------------------------------------------

_META_SCHEMA = ["map", "bytes"]


def write_ocf(
    path: str,
    schema_json: str | dict,
    records,
    codec: str = "deflate",
    metadata: dict[str, bytes] | None = None,
    sync: bytes | None = None,
) -> None:
    """Write records to an Avro Object Container File at ``path``."""
    if codec not in ("null", "deflate"):
        raise SchemaError(f"unsupported codec {codec!r}")
    schema_str = (
        schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    )
    schema = parse_schema(schema_str)
    sync = sync or os.urandom(SYNC_SIZE)
    meta = {
        "avro.schema": schema_str.encode("utf-8"),
        "avro.codec": codec.encode("ascii"),
    }
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode("utf-8")

    body = io.BytesIO()
    count = 0
    for rec in records:
        write_datum(body, schema, rec)
        count += 1
    payload = body.getvalue()
    if codec == "deflate":  # raw deflate, no zlib wrapper (per the spec)
        payload = zlib.compress(payload)[2:-4]

    out = io.BytesIO()
    out.write(MAGIC)
    write_datum(out, _META_SCHEMA, meta)
    out.write(sync)
    if count:
        write_long(out, count)
        write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)


def read_ocf(path: str):
    """Read an Avro OCF; returns (records: list, metadata: dict[str, bytes])."""
    with open(path, "rb") as f:
        buf = io.BytesIO(f.read())
    if buf.read(4) != MAGIC:
        raise SchemaError(f"{path}: not an Avro object container file")
    meta = read_datum(buf, _META_SCHEMA)
    codec = meta.get("avro.codec", b"null").decode("ascii")
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    sync = buf.read(SYNC_SIZE)
    records = []
    while True:
        try:
            count = read_long(buf)
        except EOFError:
            break
        size = read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        elif codec != "null":
            raise SchemaError(f"unsupported codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(count):
            records.append(read_datum(block, schema))
        if buf.read(SYNC_SIZE) != sync:
            raise SchemaError(f"{path}: sync marker mismatch (corrupt block)")
    return records, meta
