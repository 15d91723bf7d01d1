"""Reference-format protobuf def-file codec (round 11, VERDICT r10 #4).

The reference serializes object definitions as proto3 messages into
``def/…/<uuid>[-name].binpb`` files (proto/objects.proto:24-153,
ObjectDefinitions.java:52-207, FileLocations.java:43
``PROTOBUF_BINARY_FILE_SUFFIX``).  This module is a ZERO-DEPENDENCY
proto3 wire codec — varint + length-delimited only, the same
hand-rolled discipline as :mod:`olympia_spark.catalog.avro_io` — so a
catalog written by the Java reference is readable in place and a
catalog written here is parseable by any conforming proto3 runtime.

Wire-format essentials implemented (proto3 encoding spec):

* tag = ``(field_number << 3) | wire_type``; wire types used: 0
  (varint: uint32/uint64/bool/enum) and 2 (length-delimited: string/
  bytes/embedded message/map entry).  Types 1/5 (fixed64/fixed32) are
  skipped correctly when encountered from foreign writers.
* proto3 scalar fields at their default value (0 / "" / false / empty)
  are NOT serialized; absent fields decode to defaults.
* ``map<string,string>`` is a repeated embedded message with key=1,
  value=2.
* unknown fields are skipped on read (forward compatibility) — and the
  DistributedTransactionDef encoder USES one deliberately: pending
  action payloads ride in field 100 (unknown to the reference's
  ``objects.proto:89-96``, ignored by its parser) so a resumed
  transaction keeps replay payloads without breaking interop.

Interop mapping (proto message ↔ :mod:`olympia_spark.catalog.defs`):

* ``CatalogDef``/``NamespaceDef``/``DistributedTransactionDef`` map
  field-for-field.
* proto ``TableDef`` (objects.proto:58-69) is an Iceberg POINTER —
  id + format enum + properties + metadata locations.  A def written
  by the reference decodes to ``TableDef(format="ICEBERG",
  metadata_location=…)`` with no tracked files; the catalog hydrates
  it from the Iceberg metadata at read time (``describe_table``).  Our
  native extras (tracked files, schema, constraints, …) ride in ONE
  properties entry ``olympia-spark.table_ext`` (a properties map is
  the proto-sanctioned extension point), so a native table survives a
  binpb round-trip losslessly while staying a well-formed reference
  def.
* proto ``ViewDef`` stores a Substrait plan we cannot execute; its
  bytes are preserved base64 in properties
  (``olympia-spark.substrait_read_rel_b64``) and our SQL-text payload
  rides in ``olympia-spark.view_ext`` — same deviation defs.py
  documents for the JSON lane.
"""

from __future__ import annotations

import base64
import json

from olympia_spark.catalog.defs import (CatalogDef, DataFile,
                                        DistTransactionDef, NamespaceDef,
                                        TableDef, ViewDef,
                                        olympia_type_to_spark)

# --- low-level wire encoding --------------------------------------------------


def _varint(n: int) -> bytes:
    if n < 0:
        # proto3 int64 negatives sign-extend to 10 bytes; none of the
        # objects.proto fields are signed, so refuse loudly instead of
        # writing something another runtime reads differently
        raise ValueError("negative varint not supported by objects.proto")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


# --- message field specs (proto/objects.proto) --------------------------------
# field number -> (name, kind); kinds: uint (varint: uint32/uint64/bool/
# enum), str, bytes, map (map<string,string>), msg:<M> (singular
# embedded), rep_msg:<M> (repeated embedded)

_SPECS: dict[str, dict[int, tuple[str, str]]] = {
    "CatalogDef": {                       # objects.proto:39-51
        1: ("id", "str"),
        2: ("major_version", "uint"),
        3: ("order", "uint"),
        4: ("namespace_name_max_size_bytes", "uint"),
        5: ("table_name_max_size_bytes", "uint"),
        6: ("view_name_max_size_bytes", "uint"),
        7: ("node_file_max_size_bytes", "uint"),
        8: ("properties", "map"),
        9: ("txn_ttl_millis", "uint"),
        10: ("txn_isolation_level", "uint"),
        11: ("exported_snapshots", "map"),
    },
    "NamespaceDef": {                     # objects.proto:53-56
        1: ("id", "str"),
        2: ("properties", "map"),
    },
    "TableDef": {                         # objects.proto:58-69
        1: ("id", "str"),
        2: ("table_format", "uint"),
        3: ("properties", "map"),
        4: ("iceberg_metadata_location", "str"),
        5: ("iceberg_previous_metadata_location", "str"),
    },
    "ViewDef": {                          # objects.proto:71-85
        1: ("id", "str"),
        2: ("view_format", "uint"),
        3: ("schema_binding", "uint"),
        4: ("schema", "msg:Schema"),
        5: ("default_namespace_name", "str"),
        6: ("referenced_object_full_names",
            "rep_msg:NamespaceObjectFullName"),
        7: ("properties", "map"),
        8: ("substrait_read_rel", "bytes"),
    },
    "DistributedTransactionDef": {        # objects.proto:89-96
        1: ("id", "str"),
        2: ("isolation_level", "uint"),
        3: ("beginning_root_node_file_path", "str"),
        4: ("running_root_node_file_path", "str"),
        5: ("began_at_millis", "uint"),
        6: ("expire_at_millis", "uint"),
        # NOT in objects.proto — our replay payloads as a skipped-by-
        # the-reference unknown field (see module docstring)
        100: ("x_actions_json", "bytes"),
    },
    "NamespaceObjectFullName": {          # objects.proto:98-101
        1: ("namespace_name", "str"),
        2: ("name", "str"),
    },
    "Schema": {                           # objects.proto:103-105
        1: ("columns", "rep_msg:Column"),
    },
    "Column": {                           # objects.proto:107-148
        1: ("id", "uint"),
        2: ("name", "str"),
        3: ("type", "uint"),
        4: ("nullable", "uint"),
        5: ("properties", "map"),
        6: ("struct_fields", "rep_msg:Column"),
        7: ("map_key", "msg:Column"),
        8: ("map_value", "msg:Column"),
        9: ("list_element", "msg:Column"),
    },
}

# Column.DataType enum (objects.proto:111-139) — names in declared order
_COLUMN_TYPES = [
    "BOOLEAN", "INT2", "INT4", "INT8", "DECIMAL", "FLOAT4", "FLOAT8",
    "CHAR", "VARCHAR", "DATE", "TIME3", "TIME6", "TIME9", "TIMETZ3",
    "TIMETZ6", "TIMETZ9", "TIMESTAMP3", "TIMESTAMP6", "TIMESTAMP9",
    "TIMESTAMPTZ3", "TIMESTAMPTZ6", "TIMESTAMPTZ9", "FIXED", "BINARY",
    "STRUCT", "MAP", "LIST",
]
_COLUMN_TYPE_NUM = {n: i for i, n in enumerate(_COLUMN_TYPES)}

# IsolationLevel enum (objects.proto:150-153)
_ISOLATION = ["SNAPSHOT", "SERIALIZABLE"]


def encode_message(msg_name: str, values: dict,
                   specs: dict | None = None) -> bytes:
    """Encode a field-name→value dict as the named proto message.
    Values at proto3 defaults are omitted; fields are emitted in
    ascending field-number order (the canonical serialization both
    protobuf-java and protobuf-python produce). ``specs`` defaults to
    the objects.proto tables; catalog/substrait.py passes its own."""
    specs = _SPECS if specs is None else specs
    spec = specs[msg_name]
    out = bytearray()
    for num in sorted(spec):
        fname, kind = spec[num]
        v = values.get(fname)
        if v is None:
            continue
        if kind == "uint":
            v = int(v)
            if v != 0:
                out += _tag(num, 0) + _varint(v)
        elif kind == "str":
            if v != "":
                out += _len_delim(num, v.encode("utf-8"))
        elif kind == "bytes":
            if v != b"":
                out += _len_delim(num, v)
        elif kind == "map":
            for k in v:       # insertion order, like protobuf-java
                entry = (_len_delim(1, k.encode("utf-8"))
                         + _len_delim(2, v[k].encode("utf-8")))
                out += _len_delim(num, entry)
        elif kind == "rep_str":
            for item in v:
                out += _len_delim(num, item.encode("utf-8"))
        elif kind.startswith("rep_msg:"):
            sub = kind.split(":", 1)[1]
            for item in v:
                out += _len_delim(num, encode_message(sub, item, specs))
        elif kind.startswith("msg:"):
            sub = kind.split(":", 1)[1]
            out += _len_delim(num, encode_message(sub, v, specs))
        else:  # pragma: no cover — spec table is closed
            raise ValueError(kind)
    return bytes(out)


def decode_message(msg_name: str, data: bytes,
                   specs: dict | None = None) -> dict:
    """Decode proto message bytes into a field-name→value dict.
    Unknown fields are skipped per their wire type; absent fields are
    simply missing from the dict (callers apply proto3 defaults)."""
    specs = _SPECS if specs is None else specs
    spec = specs[msg_name]
    out: dict = {}
    pos = 0
    while pos < len(data):
        key, pos = _read_varint(data, pos)
        num, wire = key >> 3, key & 0x7
        field = spec.get(num)
        if wire == 0:
            val, pos = _read_varint(data, pos)
            if field and field[1] == "uint":
                out[field[0]] = val
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("truncated length-delimited field")
            payload = bytes(data[pos:pos + ln])
            pos += ln
            if not field:
                continue
            fname, kind = field
            if kind == "str":
                out[fname] = payload.decode("utf-8")
            elif kind == "bytes":
                out[fname] = payload
            elif kind == "map":
                entry = decode_message("NamespaceObjectFullName", payload)
                # map entries share the {1: str, 2: str} shape
                out.setdefault(fname, {})[
                    entry.get("namespace_name", "")] = entry.get("name", "")
            elif kind == "rep_str":
                out.setdefault(fname, []).append(payload.decode("utf-8"))
            elif kind.startswith("rep_msg:"):
                sub = kind.split(":", 1)[1]
                out.setdefault(fname, []).append(
                    decode_message(sub, payload, specs))
            elif kind.startswith("msg:"):
                sub = kind.split(":", 1)[1]
                out[fname] = decode_message(sub, payload, specs)
        elif wire == 1:           # fixed64 from a foreign writer: skip
            pos += 8
        elif wire == 5:           # fixed32: skip
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


# --- dataclass ↔ proto conversion ---------------------------------------------

_EXT_TABLE = "olympia-spark.table_ext"
_EXT_VIEW = "olympia-spark.view_ext"
_EXT_CATALOG = "olympia-spark.catalog_ext"
_EXT_SUBSTRAIT = "olympia-spark.substrait_read_rel_b64"


def _iso_num(level: str) -> int:
    return _ISOLATION.index(level) if level in _ISOLATION else 0


def _iso_name(num: int) -> str:
    # proto3 enums are OPEN: a foreign/newer writer may serialize a
    # value we don't know — fall back to the 0-default instead of
    # crashing the whole def read (review r11 finding)
    return _ISOLATION[num] if 0 <= num < len(_ISOLATION) else _ISOLATION[0]


def encode_catalog_def(d: CatalogDef) -> bytes:
    props = dict(d.properties)
    if d.name:
        props[_EXT_CATALOG] = json.dumps({"name": d.name})
    return encode_message("CatalogDef", {
        "id": d.id, "major_version": d.major_version, "order": d.order,
        "namespace_name_max_size_bytes": d.namespace_name_max_size_bytes,
        "table_name_max_size_bytes": d.table_name_max_size_bytes,
        "view_name_max_size_bytes": d.view_name_max_size_bytes,
        "node_file_max_size_bytes": d.node_file_max_size_bytes,
        "properties": props, "txn_ttl_millis": d.txn_ttl_millis,
        "txn_isolation_level": _iso_num(d.txn_isolation_level),
        "exported_snapshots": d.exported_snapshots,
    })


def decode_catalog_def(data: bytes) -> CatalogDef:
    from olympia_spark.catalog.defs import (
        CATALOG_ORDER_DEFAULT, NAME_MAX_SIZE_BYTES_DEFAULT,
        NODE_FILE_MAX_SIZE_BYTES_DEFAULT, TXN_TTL_MILLIS_DEFAULT)
    m = decode_message("CatalogDef", data)
    props = m.get("properties", {})
    ext = json.loads(props.pop(_EXT_CATALOG, "{}"))
    # absent (or zero — proto3 can't tell them apart) sizing fields
    # take the reference's documented defaults
    # (ObjectDefinitions.java:33-49): a 0 order/name-max/node-max is
    # unusable by construction, so a writer omitting them meant the
    # defaults, not a broken catalog (review r11 finding)
    return CatalogDef(
        id=m.get("id", ""), name=ext.get("name", ""),
        major_version=m.get("major_version", 0),
        order=m.get("order", 0) or CATALOG_ORDER_DEFAULT,
        namespace_name_max_size_bytes=m.get(
            "namespace_name_max_size_bytes", 0)
        or NAME_MAX_SIZE_BYTES_DEFAULT,
        table_name_max_size_bytes=m.get("table_name_max_size_bytes", 0)
        or NAME_MAX_SIZE_BYTES_DEFAULT,
        view_name_max_size_bytes=m.get("view_name_max_size_bytes", 0)
        or NAME_MAX_SIZE_BYTES_DEFAULT,
        node_file_max_size_bytes=m.get("node_file_max_size_bytes", 0)
        or NODE_FILE_MAX_SIZE_BYTES_DEFAULT,
        txn_isolation_level=_iso_name(m.get("txn_isolation_level", 0)),
        txn_ttl_millis=m.get("txn_ttl_millis", 0)
        or TXN_TTL_MILLIS_DEFAULT,
        properties=props,
        exported_snapshots=m.get("exported_snapshots", {}))


def encode_namespace_def(d: NamespaceDef) -> bytes:
    return encode_message("NamespaceDef",
                          {"id": d.id, "properties": d.properties})


def decode_namespace_def(data: bytes) -> NamespaceDef:
    m = decode_message("NamespaceDef", data)
    return NamespaceDef(id=m.get("id", ""),
                        properties=m.get("properties", {}))


def encode_table_def(d: TableDef) -> bytes:
    import dataclasses
    props = dict(d.properties)
    # EVERY field beyond the pure Iceberg-pointer shape rides in the
    # ext property (a pointer def annotated with e.g. bucket_by or
    # constraints must round-trip losslessly too — review r11 finding);
    # a reference-written pointer def has no non-defaults and stays
    # byte-minimal (no ext property at all)
    ext = {k: v for k, v in {
        "format": d.format if d.format != "ICEBERG" else "",
        "schema_json": d.schema_json,
        "data_files": [dataclasses.asdict(f) for f in d.data_files],
        "partition_by": d.partition_by,
        "column_mapping": d.column_mapping,
        "retired_columns": d.retired_columns,
        "constraints": d.constraints,
        "generated_columns": d.generated_columns,
        "bucket_by": d.bucket_by,
    }.items() if v}
    if ext:
        if "format" not in ext:
            ext["format"] = d.format
        props[_EXT_TABLE] = json.dumps(ext, sort_keys=True)
    return encode_message("TableDef", {
        "id": d.id, "table_format": 0,   # ICEBERG — the only enum value
        "properties": props,
        "iceberg_metadata_location": d.metadata_location,
        "iceberg_previous_metadata_location": d.previous_metadata_location,
    })


def decode_table_def(data: bytes) -> TableDef:
    m = decode_message("TableDef", data)
    props = m.get("properties", {})
    ext = json.loads(props.pop(_EXT_TABLE, "{}"))
    return TableDef(
        id=m.get("id", ""),
        format=ext.get("format", "ICEBERG"),
        schema_json=ext.get("schema_json", ""),
        data_files=[DataFile(**f) for f in ext.get("data_files", [])],
        partition_by=ext.get("partition_by", []),
        column_mapping=ext.get("column_mapping", {}),
        retired_columns=ext.get("retired_columns", []),
        constraints=ext.get("constraints", {}),
        generated_columns=ext.get("generated_columns", {}),
        bucket_by=ext.get("bucket_by", {}),
        properties=props,
        metadata_location=m.get("iceberg_metadata_location", ""),
        previous_metadata_location=m.get(
            "iceberg_previous_metadata_location", ""))


def _schema_json_to_proto(schema_json: str) -> dict | None:
    """Spark StructType JSON → proto Schema dict (objects.proto:103-148),
    recursing through STRUCT/MAP/LIST via defs.spark_type_to_olympia."""
    if not schema_json:
        return None
    from pyspark.sql import types as T

    from olympia_spark.catalog.defs import spark_type_to_olympia

    def col(idx: int, name: str, dt, nullable: bool = True) -> dict:
        o = spark_type_to_olympia(dt)
        c: dict = {"id": idx, "name": name,
                   "type": _COLUMN_TYPE_NUM[o["type"]],
                   "nullable": 1 if nullable else 0}
        if o["type"] == "STRUCT":
            c["struct_fields"] = [
                col(i + 1, f.name, f.dataType, f.nullable)
                for i, f in enumerate(dt.fields)]
        elif o["type"] == "MAP":
            c["map_key"] = col(0, "", dt.keyType)
            c["map_value"] = col(0, "", dt.valueType)
        elif o["type"] == "LIST":
            c["list_element"] = col(0, "", dt.elementType)
        return c

    st = T.StructType.fromJson(json.loads(schema_json))
    return {"columns": [col(i + 1, f.name, f.dataType, f.nullable)
                        for i, f in enumerate(st.fields)]}


def _proto_schema_to_json(schema: dict | None) -> str:
    """proto Schema dict → Spark StructType JSON via
    defs.olympia_type_to_spark (handles nesting)."""
    if not schema or not schema.get("columns"):
        return ""
    from pyspark.sql import types as T

    def named(c: dict) -> dict:
        d = {"type": _COLUMN_TYPES[c.get("type", 0)]}
        if "struct_fields" in c:
            d["struct_fields"] = [
                {"name": f.get("name", ""), **named(f)}
                for f in c["struct_fields"]]
        for k in ("map_key", "map_value", "list_element"):
            if k in c:
                d[k] = named(c[k])
        return d

    fields = [T.StructField(c.get("name", ""),
                            olympia_type_to_spark(named(c)),
                            bool(c.get("nullable", 0)))
              for c in schema["columns"]]
    return T.StructType(fields).json()


def encode_view_def(d: ViewDef) -> bytes:
    props = dict(d.properties)
    sub_b64 = props.pop(_EXT_SUBSTRAIT, "")
    ext = {k: v for k, v in
           (("sql_text", d.sql_text), ("plan_ir_json", d.plan_ir_json),
            ("schema_json", d.schema_json))
           if v}
    if ext:
        props[_EXT_VIEW] = json.dumps(ext, sort_keys=True)
    refs = []
    for full in d.referenced_objects:
        ns, _dot, obj = full.partition(".")
        refs.append({"namespace_name": ns, "name": obj})
    return encode_message("ViewDef", {
        "id": d.id, "view_format": 0,    # SUBSTRAIT — the only value
        "schema_binding": 1 if d.schema_binding else 0,
        "schema": _schema_json_to_proto(d.schema_json),
        "default_namespace_name": d.default_namespace,
        "referenced_object_full_names": refs,
        "properties": props,
        "substrait_read_rel": base64.b64decode(sub_b64) if sub_b64
        else b"",
    })


def decode_view_def(data: bytes) -> ViewDef:
    m = decode_message("ViewDef", data)
    props = m.get("properties", {})
    ext = json.loads(props.pop(_EXT_VIEW, "{}"))
    sub = m.get("substrait_read_rel", b"")
    if sub:
        # preserved, not executable — documented deviation (defs.py)
        props[_EXT_SUBSTRAIT] = base64.b64encode(sub).decode()
    return ViewDef(
        id=m.get("id", ""),
        sql_text=ext.get("sql_text", ""),
        plan_ir_json=ext.get("plan_ir_json", ""),
        # exact Spark schema preferred when present: the proto Schema
        # round-trip is LOSSY (DECIMAL collapses to (38,10), timestamp
        # precision to *6, nested nullability to true) and would break
        # schema-bound views (review r11 finding); the proto field is
        # the cross-engine-readable projection, not the contract
        schema_json=ext.get("schema_json")
        or _proto_schema_to_json(m.get("schema")),
        default_namespace=m.get("default_namespace_name", ""),
        referenced_objects=[
            f"{r.get('namespace_name', '')}.{r.get('name', '')}"
            for r in m.get("referenced_object_full_names", [])],
        schema_binding=bool(m.get("schema_binding", 0)),
        properties=props)


def encode_dist_txn_def(d: DistTransactionDef) -> bytes:
    return encode_message("DistributedTransactionDef", {
        "id": d.id, "isolation_level": _iso_num(d.isolation_level),
        "beginning_root_node_file_path": d.beginning_root_path,
        "running_root_node_file_path": d.running_root_path,
        "began_at_millis": d.began_at_millis,
        "expire_at_millis": d.expire_at_millis,
        "x_actions_json": json.dumps(d.actions).encode("utf-8")
        if d.actions else b"",
    })


def decode_dist_txn_def(data: bytes) -> DistTransactionDef:
    m = decode_message("DistributedTransactionDef", data)
    raw = m.get("x_actions_json", b"")
    return DistTransactionDef(
        id=m.get("id", ""),
        isolation_level=_iso_name(m.get("isolation_level", 0)),
        beginning_root_path=m.get("beginning_root_node_file_path", ""),
        running_root_path=m.get("running_root_node_file_path", ""),
        began_at_millis=m.get("began_at_millis", 0),
        expire_at_millis=m.get("expire_at_millis", 0),
        actions=json.loads(raw.decode("utf-8")) if raw else [])


# --- path-dispatched entry points ----------------------------------------------

_BY_DIR = {
    "catalog": (encode_catalog_def, decode_catalog_def, CatalogDef),
    "ns": (encode_namespace_def, decode_namespace_def, NamespaceDef),
    "table": (encode_table_def, decode_table_def, TableDef),
    "view": (encode_view_def, decode_view_def, ViewDef),
    "dtxn": (encode_dist_txn_def, decode_dist_txn_def,
             DistTransactionDef),
}

_BY_TYPE = {cls: enc for enc, _dec, cls in _BY_DIR.values()}


def encode_def(obj) -> bytes:
    """Dataclass → reference .binpb bytes (type-dispatched)."""
    return _BY_TYPE[type(obj)](obj)


def decode_def(data: bytes, path: str):
    """Reference .binpb bytes → dataclass; the def KIND comes from the
    path's def/<kind>/ directory (FileLocations.java:33-41 — the
    reference encodes type in the directory, not the payload)."""
    parts = path.split("/")
    # LAST 'def' segment wins: the def/<kind>/ tail is the reference's
    # contract; an earlier coincidental 'def' directory in the mount
    # prefix (/srv/def/wh/def/table/x.binpb) must not win (ADVICE r11)
    try:
        kind = parts[len(parts) - 1 - parts[::-1].index("def") + 1]
    except (ValueError, IndexError):
        raise ValueError(f"not a def path: {path}") from None
    if kind not in _BY_DIR:
        raise ValueError(f"not a def path: {path}")
    return _BY_DIR[kind][1](data)
