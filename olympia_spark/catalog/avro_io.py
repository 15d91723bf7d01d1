"""Minimal Avro Object Container File (OCF) reader/writer.

Iceberg persists its manifest lists and manifest files as Avro OCF
(Iceberg spec "Manifests" / "Manifest Lists"; reference adoption path
core/.../iceberg/OlympiaIcebergTableOperations.java reads them through
the Iceberg library). The catalog plane is driver-side Python, the files
are KB–MB metadata, and no Avro package ships in this environment — so
this module implements the subset of the public Avro 1.11 specification
(https://avro.apache.org/docs/1.11.1/specification/) that container
metadata needs:

- binary encoding for null / boolean / int / long (zigzag varint) /
  float / double / bytes / string / fixed / enum / record / array /
  map / union;
- OCF framing (magic ``Obj\\x01``, file-metadata map, sync markers,
  object blocks) with ``null`` and ``deflate`` codecs;
- generic decoding driven by the writer schema embedded in the header
  (logical types are returned as their physical representation — the
  Iceberg layer interprets them).

The writer exists for fixtures and tests; production adoption only reads.
It is NOT a general Avro implementation: no schema resolution against a
reader schema, no snappy/zstandard codecs, no aliases.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"

# --- primitive binary codec (spec "Binary Encoding") ------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag_encode(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes([b | 0x80]))
        else:
            buf.write(bytes([b]))
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
            return _zigzag_decode(acc)
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _read_n(buf: io.BytesIO, n: int) -> bytes:
    data = buf.read(n)
    if len(data) != n:
        raise EOFError(f"expected {n} bytes, got {len(data)}")
    return data


# --- schema-driven generic encode/decode ------------------------------------


class _Names:
    """Registry of named types so later references resolve (spec
    "Names"). Keyed by full name; namespaces are honored but optional."""

    def __init__(self):
        self.types: dict[str, dict] = {}

    def define(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            full = f"{ns}.{name}" if ns and "." not in name else name
            self.types[full] = schema
            self.types[name] = schema

    def resolve(self, schema):
        if isinstance(schema, str) and schema in self.types:
            return self.types[schema]
        return schema


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "bytes", "string"}


def _schema_type(schema, names: _Names):
    schema = names.resolve(schema)
    if isinstance(schema, str):
        return schema, schema
    if isinstance(schema, list):
        return "union", schema
    names.define(schema)
    return schema["type"], schema


def encode(buf: io.BytesIO, schema, value, names: _Names | None = None):
    names = names or _Names()
    kind, schema = _schema_type(schema, names)
    if kind == "null":
        return
    if kind == "boolean":
        buf.write(b"\x01" if value else b"\x00")
    elif kind in ("int", "long"):
        write_long(buf, int(value))
    elif kind == "float":
        buf.write(struct.pack("<f", float(value)))
    elif kind == "double":
        buf.write(struct.pack("<d", float(value)))
    elif kind in ("bytes", "string"):
        data = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        write_long(buf, len(data))
        buf.write(data)
    elif kind == "fixed":
        data = bytes(value)
        if len(data) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(data)} != "
                             f"{schema['size']}")
        buf.write(data)
    elif kind == "enum":
        write_long(buf, schema["symbols"].index(value))
    elif kind == "record":
        for f in schema["fields"]:
            encode(buf, f["type"], value.get(f["name"]), names)
    elif kind == "array":
        items = list(value or [])
        if items:
            write_long(buf, len(items))
            for item in items:
                encode(buf, schema["items"], item, names)
        write_long(buf, 0)
    elif kind == "map":
        entries = dict(value or {})
        if entries:
            write_long(buf, len(entries))
            for k, v in entries.items():
                encode(buf, "string", k, names)
                encode(buf, schema["values"], v, names)
        write_long(buf, 0)
    elif kind == "union":
        idx = _union_branch(schema, value, names)
        write_long(buf, idx)
        encode(buf, schema[idx], value, names)
    else:
        raise ValueError(f"unsupported avro type: {kind}")


def _union_branch(branches: list, value, names: _Names) -> int:
    for i, b in enumerate(branches):
        kind, _ = _schema_type(b, names)
        if value is None and kind == "null":
            return i
    for i, b in enumerate(branches):
        kind, _ = _schema_type(b, names)
        if kind != "null" and value is not None:
            return i
    raise ValueError(f"no union branch for {type(value)} in {branches}")


def decode(buf: io.BytesIO, schema, names: _Names | None = None):
    names = names or _Names()
    kind, schema = _schema_type(schema, names)
    if kind == "null":
        return None
    if kind == "boolean":
        return _read_n(buf, 1) != b"\x00"
    if kind in ("int", "long"):
        return read_long(buf)
    if kind == "float":
        return struct.unpack("<f", _read_n(buf, 4))[0]
    if kind == "double":
        return struct.unpack("<d", _read_n(buf, 8))[0]
    if kind == "bytes":
        return _read_n(buf, read_long(buf))
    if kind == "string":
        return _read_n(buf, read_long(buf)).decode("utf-8")
    if kind == "fixed":
        return _read_n(buf, schema["size"])
    if kind == "enum":
        return schema["symbols"][read_long(buf)]
    if kind == "record":
        return {f["name"]: decode(buf, f["type"], names)
                for f in schema["fields"]}
    if kind == "array":
        out = []
        while True:
            count = read_long(buf)
            if count == 0:
                return out
            if count < 0:          # spec: negative count → byte size follows
                count = -count
                read_long(buf)
            for _ in range(count):
                out.append(decode(buf, schema["items"], names))
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
                k = _read_n(buf, read_long(buf)).decode("utf-8")
                out[k] = decode(buf, schema["values"], names)
    if kind == "union":
        return decode(buf, schema[read_long(buf)], names)
    raise ValueError(f"unsupported avro type: {kind}")


# --- object container files (spec "Object Container Files") -----------------


def read_ocf(data: bytes) -> tuple[dict, list]:
    """Decode an OCF; returns (file metadata as str→bytes, records)."""
    buf = io.BytesIO(data)
    if _read_n(buf, 4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = read_long(buf)
        if count == 0:
            break
        if count < 0:
            count = -count
            read_long(buf)
        for _ in range(count):
            k = _read_n(buf, read_long(buf)).decode("utf-8")
            meta[k] = _read_n(buf, read_long(buf))
    sync = _read_n(buf, 16)
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    records = []
    while buf.tell() < len(data):
        n_objects = read_long(buf)
        block = _read_n(buf, read_long(buf))
        if codec == "deflate":       # raw DEFLATE, no zlib wrapper
            block = zlib.decompress(block, -15)
        bbuf = io.BytesIO(block)
        names = _Names()
        for _ in range(n_objects):
            records.append(decode(bbuf, schema, names))
        if _read_n(buf, 16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return meta, records


def write_ocf(schema, records: list, *, codec: str = "deflate",
              metadata: dict[str, bytes] | None = None) -> bytes:
    """Encode records into an OCF (single block; metadata-scale files)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    names = _Names()
    body = io.BytesIO()
    for rec in records:
        encode(body, schema, rec, names)
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    meta = {"avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    meta.update(metadata or {})
    sync = os.urandom(16)
    out = io.BytesIO()
    out.write(MAGIC)
    write_long(out, len(meta))
    for k, v in meta.items():
        kb = k.encode("utf-8")
        write_long(out, len(kb))
        out.write(kb)
        write_long(out, len(v))
        out.write(v)
    write_long(out, 0)
    out.write(sync)
    write_long(out, len(records))
    write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()
