"""Adopt existing Apache Iceberg table metadata into the catalog.

The reference's entire data plane IS Iceberg: a TableDef stores an
``iceberg_metadata_location`` pointer and the Iceberg library resolves it
(proto/objects.proto:58-69; core/.../iceberg/OlympiaIcebergTableOperations
.java:87-189 refresh/commit). Our rebuild is parquet-native by charter
(SURVEY §0), but a user migrating FROM an Iceberg deployment needs a way
to bring their existing tables along without rewriting data. This module
is that bridge: it parses the public Iceberg table spec
(https://iceberg.apache.org/spec/ — ``vN.metadata.json`` → manifest list
→ manifests → data files) with no Iceberg library, and materializes the
selected snapshot as a self-contained TableDef whose tracked file list
points at the Iceberg data files in place.

Scope (documented): copy-on-write tables only — a snapshot whose manifest
list carries live DELETE manifests (merge-on-read position/equality
deletes) is refused with a clear error, because silently ignoring delete
files would resurrect deleted rows. Column resolution is by name (the
spec's field-id indirection matters only after renames, which adoption
does not attempt to replay). Iceberg data files always contain the
partition source columns (spec "Partitioning": values are *derived* from
row data), so reading the parquet files directly with the converted
schema is lossless — no hive-path reconstruction is needed.
"""

from __future__ import annotations

import io
import json
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import types as T

from olympia_spark.catalog import avro_io

# --- Iceberg type → Spark type (spec "Schemas and Data Types") --------------

_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "date": T.DateType(),
    "timestamp": T.TimestampNTZType(),     # no zone ↔ NTZ
    "timestamptz": T.TimestampType(),      # UTC-adjusted ↔ LTZ
    "string": T.StringType(),
    "uuid": T.StringType(),
    "binary": T.BinaryType(),
}


def iceberg_type_to_spark(t) -> T.DataType:
    if isinstance(t, str):
        if t in _PRIMITIVES:
            return _PRIMITIVES[t]
        if t.startswith("decimal("):
            p, s = t[len("decimal("):-1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise ValueError(f"unsupported iceberg type: {t}")
    kind = t["type"]
    if kind == "struct":
        return T.StructType([
            T.StructField(f["name"], iceberg_type_to_spark(f["type"]),
                          nullable=not f.get("required", False))
            for f in t["fields"]])
    if kind == "list":
        return T.ArrayType(iceberg_type_to_spark(t["element"]),
                           containsNull=not t.get("element-required", False))
    if kind == "map":
        return T.MapType(iceberg_type_to_spark(t["key"]),
                         iceberg_type_to_spark(t["value"]),
                         valueContainsNull=not t.get("value-required", False))
    raise ValueError(f"unsupported iceberg type: {kind}")


def iceberg_schema_to_spark(schema: dict) -> T.StructType:
    return iceberg_type_to_spark({"type": "struct",
                                  "fields": schema["fields"]})


# --- metadata traversal -----------------------------------------------------


def _local_path(location: str) -> str:
    """Manifest/data paths in Iceberg metadata are absolute URIs; map
    file: URIs (and plain paths) onto the local filesystem."""
    parsed = urlparse(location)
    if parsed.scheme in ("", "file"):
        return unquote(parsed.path) if parsed.scheme else location
    raise ValueError(
        f"unsupported iceberg file scheme {parsed.scheme!r}: {location} "
        f"(this environment has local storage only)")


def _read_bytes(location: str) -> bytes:
    with open(_local_path(location), "rb") as f:
        return f.read()


def load_table_metadata(metadata_location: str) -> dict:
    meta = json.loads(_read_bytes(metadata_location).decode("utf-8"))
    v = meta.get("format-version")
    if v not in (1, 2):
        raise ValueError(f"unsupported iceberg format-version: {v}")
    return meta


def current_schema(meta: dict) -> dict:
    """v2 stores a schema list + current-schema-id; v1 a single schema."""
    if "schemas" in meta:
        sid = meta["current-schema-id"]
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                return s
        raise ValueError(f"current-schema-id {sid} not in schemas list")
    return meta["schema"]


def select_snapshot(meta: dict, snapshot_id: int | None = None) -> dict:
    snapshots = meta.get("snapshots") or []
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            return {}                     # empty table: no snapshot yet
    for s in snapshots:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"snapshot {snapshot_id} not found in "
                     f"{[s['snapshot-id'] for s in snapshots]}")


def _manifest_paths(snapshot: dict) -> list[tuple[str, int, int]]:
    """Return (manifest_path, content, sequence_number) triples for a
    snapshot. v2 points at a manifest-list avro; v1 may inline the
    manifest path list (no sequence numbers — 0)."""
    if "manifest-list" in snapshot:
        _, entries = avro_io.read_ocf(_read_bytes(snapshot["manifest-list"]))
        return [(e["manifest_path"], e.get("content") or 0,
                 int(e.get("sequence_number") or 0)) for e in entries]
    return [(p, 0, 0) for p in snapshot.get("manifests", [])]


def field_names_by_id(schema: dict) -> dict[int, str]:
    """Top-level field-id → column-name map (resolves a delete file's
    ``equality_ids`` to the columns an equality delete keys on; spec
    "Equality Delete Files" — ids reference the table schema)."""
    return {int(f["id"]): f["name"] for f in schema.get("fields", [])}


def live_files(snapshot: dict) -> tuple[list[dict], list[dict]]:
    """Walk the snapshot's manifests and return ``(data_files,
    delete_files)`` as dicts with file_path / record_count /
    file_size_in_bytes / partition (+ ``content`` on delete files:
    1 = position deletes, 2 = equality deletes).

    Spec semantics: manifest entries with status 0 (EXISTING) or
    1 (ADDED) are live in the snapshot; status 2 (DELETED) records a
    removal and is excluded. Delete files appear in DELETE-content
    manifests (content=1 in the manifest list) or with a non-zero
    ``content`` field on the file itself (spec "Manifests": 1 position
    deletes, 2 equality deletes)."""
    data: list[dict] = []
    deletes: list[dict] = []
    for path, content, mseq in _manifest_paths(snapshot):
        _, entries = avro_io.read_ocf(_read_bytes(path))
        live = [e for e in entries if e.get("status", 1) in (0, 1)]
        for e in live:
            df = e["data_file"]
            fmt = str(df.get("file_format", "")).upper()
            if fmt != "PARQUET":
                raise ValueError(
                    f"unsupported iceberg data file format {fmt!r} "
                    f"(parquet-native engine)")
            fcontent = int(df.get("content") or 0)
            # v2 sequence-number inheritance: a null entry sequence
            # number inherits the manifest's (spec "Sequence Number
            # Inheritance" — ADDED entries are written null and take
            # the manifest-list entry's number)
            seq = e.get("sequence_number")
            rec = {
                "file_path": _local_path(df["file_path"]),
                "record_count": int(df.get("record_count") or -1),
                "file_size_in_bytes": int(df.get("file_size_in_bytes")
                                          or -1),
                "partition": df.get("partition") or {},
                "sequence_number": int(mseq if seq is None else seq),
            }
            if content == 1 or fcontent != 0:
                # a delete manifest entry defaults to position deletes
                # when the file record predates the content field
                rec["content"] = fcontent or 1
                rec["equality_ids"] = [
                    int(i) for i in (df.get("equality_ids") or [])]
                deletes.append(rec)
            else:
                data.append(rec)
    return data, deletes


def resolve_mor_deletes(deletes: list[dict],
                        name_by_id: dict[int, str]) -> list[dict]:
    """Normalize delete-file records for merge-on-read application:
    resolve each equality delete's ``equality_ids`` to column NAMES
    (spec "Equality Delete Files" — ids reference the table schema)
    and refuse unknown/absent ids loudly — a silently-skipped delete
    would resurrect rows. Returns dicts with file_path / content /
    sequence_number / partition / cols."""
    out = []
    for d in deletes:
        if d["content"] not in (1, 2):
            # spec defines 1=position, 2=equality; anything else is a
            # future/unknown kind — applying it as either would be
            # silently wrong (r11 VERDICT #3: keep this refusal)
            raise ValueError(
                f"delete file {d['file_path']} has unknown content "
                f"value {d['content']} — cannot apply")
        cols: tuple = ()
        if d["content"] == 2:
            try:
                cols = tuple(name_by_id[i] for i in d["equality_ids"])
            except (KeyError, TypeError) as e:
                raise ValueError(
                    f"equality delete file {d['file_path']} references "
                    f"unknown field id {e} — cannot apply") from None
            if not cols:
                raise ValueError(
                    f"equality delete file {d['file_path']} records no "
                    f"equality_ids — cannot apply")
        out.append({"file_path": d["file_path"],
                    "content": int(d["content"]),
                    "sequence_number": int(d["sequence_number"]),
                    "partition": d.get("partition") or None,
                    "cols": list(cols)})
    return out


def live_data_files(snapshot: dict) -> list[dict]:
    """Copy-on-write view of :func:`live_files`: returns the data files
    and refuses any snapshot carrying live delete files — callers that
    cannot apply merge-on-read deletes must not resurrect deleted rows."""
    data, deletes = live_files(snapshot)
    if deletes:
        raise ValueError(
            "iceberg table has live delete files (merge-on-read); "
            "this path supports copy-on-write tables only — "
            "rewrite/compact the table to remove deletes first")
    return data


# --- export: native table → Iceberg metadata (the reverse bridge) ----------

_SPARK_TO_ICEBERG = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "date": "date",
    "timestamp_ntz": "timestamp", "timestamp": "timestamptz",
    "string": "string", "binary": "binary",
}


def spark_type_to_iceberg(dt: T.DataType, next_id) -> object:
    name = dt.typeName()
    if name in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[name]
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if isinstance(dt, T.StructType):
        return {"type": "struct", "fields": [
            {"id": next_id(), "name": f.name,
             "required": not f.nullable,
             "type": spark_type_to_iceberg(f.dataType, next_id)}
            for f in dt.fields]}
    if isinstance(dt, T.ArrayType):
        return {"type": "list", "element-id": next_id(),
                "element-required": not dt.containsNull,
                "element": spark_type_to_iceberg(dt.elementType, next_id)}
    if isinstance(dt, T.MapType):
        return {"type": "map", "key-id": next_id(),
                "value-id": next_id(),
                "key": spark_type_to_iceberg(dt.keyType, next_id),
                "value-required": not dt.valueContainsNull,
                "value": spark_type_to_iceberg(dt.valueType, next_id)}
    raise ValueError(f"cannot export spark type {name} to iceberg")


def spark_schema_to_iceberg(schema: T.StructType) -> dict:
    counter = iter(range(1, 1_000_000))

    def next_id() -> int:
        return next(counter)

    fields = [{"id": next_id(), "name": f.name,
               "required": not f.nullable,
               "type": spark_type_to_iceberg(f.dataType, next_id)}
              for f in schema.fields]
    last = fields[-1]["id"] if fields else 0
    # nested ids were assigned after their parent field's id; recompute max
    def _max_id(t, acc):
        if isinstance(t, dict):
            for k in ("element-id", "key-id", "value-id", "id"):
                if k in t:
                    acc = max(acc, t[k])
            for f in t.get("fields", []):
                acc = max(acc, f["id"], _max_id(f["type"], acc))
            for k in ("element", "key", "value"):
                if k in t:
                    acc = _max_id(t[k], acc)
        return acc
    for f in fields:
        last = max(last, _max_id(f["type"], last))
    return {"type": "struct", "schema-id": 0, "fields": fields,
            "_last_column_id": last}


# Iceberg spec "Manifests" / "Manifest Lists" — the subset of fields a
# copy-on-write reader needs; field-id attributes are carried so real
# Iceberg implementations resolve them by id.
MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"],
         "default": None, "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string",
                 "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long",
                 "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
            ]}},
    ]}

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ]}


def _partitioned_entry_schema(part_fields: list[dict]) -> dict:
    """MANIFEST_ENTRY_SCHEMA with a typed partition record (identity
    transforms: avro type mirrors the source column's physical type)."""
    import copy
    schema = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
    part = schema["fields"][4]["type"]["fields"][3]["type"]
    part["fields"] = [
        {"name": f["name"], "type": ["null", f["avro_type"]],
         "default": None, "field-id": f.get("field-id", 1000 + i)}
        for i, f in enumerate(part_fields)]
    return schema


def export_iceberg_metadata(
        table_dir: str, schema: T.StructType,
        data_files: list, *, snapshot_id: int = 1,
        partition_values: dict[str, dict] | None = None,
        partition_avro_types: dict[str, str] | None = None,
        partition_transforms: dict[str, str] | None = None,
        partition_sources: dict[str, str] | None = None,
        delete_files: list[dict] | None = None) -> str:
    """Write Iceberg v2 table metadata (metadata.json + manifest list +
    manifest) describing ``data_files`` in place — the outbound half of
    the bridge: a native table becomes readable by any Iceberg client
    (and by :func:`live_data_files`, which the tests use to round-trip).

    ``data_files`` is a list of objects with ``path`` / ``num_rows`` /
    ``size_bytes`` attributes (the catalog's DataFile). Single snapshot,
    unpartitioned spec unless ``partition_values`` maps file path →
    {field: value} (avro types in ``partition_avro_types``).
    Non-identity specs pass ``partition_transforms`` (field name →
    Iceberg transform string, e.g. ``bucket[16]``/``day``) and
    ``partition_sources`` (field name → SOURCE column name — transform
    fields are partition fields, not schema columns, so source-id must
    resolve to the source column).

    ``delete_files`` makes the snapshot MERGE-ON-READ (v2 row-level
    deletes, spec "Delete Formats"): each dict carries ``path`` /
    ``num_rows`` / ``size_bytes`` / ``content`` (1=position,
    2=equality) / ``equality_ids`` (schema field ids, content=2 only).
    Delete files land in their own DELETE-content manifest at
    sequence number 2, data files stay at 1 — so equality deletes
    apply to every data row (seq 1 < 2) per the spec's
    strictly-greater rule."""
    import time
    import uuid as _uuid

    mdir = os.path.join(table_dir, "metadata")
    os.makedirs(mdir, exist_ok=True)
    part_types = partition_avro_types or {}
    transforms = partition_transforms or {}
    sources = partition_sources or {}
    ice_schema = spark_schema_to_iceberg(schema)
    # source-id must be the SOURCE COLUMN's schema field id, not the
    # enumeration ordinal — a real Iceberg client resolves partition
    # values through it, and an ordinal would attribute them to whatever
    # column happens to carry that id (wrong pruning, wrong row filters)
    field_ids = {f["name"]: f["id"] for f in ice_schema["fields"]}
    missing = sorted(sources.get(n, n) for n in part_types
                     if sources.get(n, n) not in field_ids)
    if missing:
        raise ValueError(f"partition columns not in schema: {missing}")
    spec_fields = [{"name": n, "avro_type": t, "field-id": 1000 + i,
                    "source-id": field_ids[sources.get(n, n)],
                    "transform": transforms.get(n, "identity")}
                   for i, (n, t) in enumerate(sorted(part_types.items()))]
    entry_schema = (_partitioned_entry_schema(spec_fields)
                    if spec_fields else MANIFEST_ENTRY_SCHEMA)
    entries = []
    total_rows = 0
    for f in data_files:
        part = (partition_values or {}).get(f.path, {})
        entries.append({
            "status": 1, "snapshot_id": snapshot_id,
            "sequence_number": 1, "file_sequence_number": 1,
            "data_file": {
                "content": 0,
                # object-store data files arrive as full URIs (s3://...)
                # and must be recorded verbatim — abspath would mangle
                # the scheme by prefixing the cwd
                "file_path": (f.path if "://" in f.path
                              else os.path.abspath(f.path)),
                "file_format": "PARQUET",
                "partition": part,
                "record_count": max(int(f.num_rows), 0),
                "file_size_in_bytes": max(int(f.size_bytes), 0),
            }})
        total_rows += max(int(f.num_rows), 0)
    manifest_path = os.path.join(mdir, f"{_uuid.uuid4()}-m0.avro")
    with open(manifest_path, "wb") as fh:
        fh.write(avro_io.write_ocf(entry_schema, entries))
    mrows = [{
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0, "content": 0,
        "sequence_number": 1, "min_sequence_number": 1,
        "added_snapshot_id": snapshot_id,
        "added_files_count": len(entries),
        "existing_files_count": 0, "deleted_files_count": 0,
        "added_rows_count": total_rows,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    }]
    last_seq = 1
    if delete_files:
        import copy
        del_schema = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
        del_schema["fields"][4]["type"]["fields"].append(
            {"name": "equality_ids",
             "type": ["null", {"type": "array", "items": "int"}],
             "default": None, "field-id": 135})
        del_entries = [{
            "status": 1, "snapshot_id": snapshot_id,
            "sequence_number": 2, "file_sequence_number": 2,
            "data_file": {
                "content": int(d["content"]),
                "file_path": (d["path"] if "://" in d["path"]
                              else os.path.abspath(d["path"])),
                "file_format": "PARQUET", "partition": {},
                "record_count": max(int(d["num_rows"]), 0),
                "file_size_in_bytes": max(int(d["size_bytes"]), 0),
                "equality_ids": ([int(i) for i in d["equality_ids"]]
                                 if d.get("equality_ids") else None),
            }} for d in delete_files]
        del_manifest = os.path.join(mdir, f"{_uuid.uuid4()}-m1.avro")
        with open(del_manifest, "wb") as fh:
            fh.write(avro_io.write_ocf(del_schema, del_entries))
        # deletes are written UNPARTITIONED (global scope): on a
        # partitioned table they must reference an unpartitioned spec
        # — declaring spec 0 with an empty partition struct would make
        # a spec-conforming external reader mis-plan them (review r12
        # pass-2); the extra spec is appended to partition-specs below
        del_spec_id = 1 if spec_fields else 0
        mrows.append({
            "manifest_path": del_manifest,
            "manifest_length": os.path.getsize(del_manifest),
            "partition_spec_id": del_spec_id, "content": 1,
            "sequence_number": 2, "min_sequence_number": 2,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(del_entries),
            "existing_files_count": 0, "deleted_files_count": 0,
            "added_rows_count": 0, "existing_rows_count": 0,
            "deleted_rows_count": sum(
                max(int(d["num_rows"]), 0) for d in delete_files),
        })
        last_seq = 2
    mlist_path = os.path.join(
        mdir, f"snap-{snapshot_id}-1-{_uuid.uuid4()}.avro")
    with open(mlist_path, "wb") as fh:
        fh.write(avro_io.write_ocf(MANIFEST_LIST_SCHEMA, mrows))
    last_column_id = ice_schema.pop("_last_column_id")
    now = int(time.time() * 1000)
    meta = {
        "format-version": 2,
        "table-uuid": str(_uuid.uuid4()),
        "location": os.path.abspath(table_dir),
        "last-sequence-number": last_seq,
        "last-updated-ms": now,
        "last-column-id": last_column_id,
        "current-schema-id": 0,
        "schemas": [ice_schema],
        "default-spec-id": 0,
        "partition-specs": (
            [{"spec-id": 0, "fields": [
                {k: v for k, v in f.items() if k != "avro_type"}
                for f in spec_fields]}]
            # the unpartitioned spec delete manifests reference on a
            # partitioned table (del_spec_id above)
            + ([{"spec-id": 1, "fields": []}]
               if delete_files and spec_fields else [])),
        "last-partition-id": (spec_fields[-1]["field-id"]
                              if spec_fields else 999),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": snapshot_id,
        "snapshots": [{
            "snapshot-id": snapshot_id,
            "sequence-number": last_seq,
            "timestamp-ms": now,
            "manifest-list": mlist_path,
            "summary": {"operation": "append",
                        "added-data-files": str(len(entries)),
                        "added-records": str(total_rows)},
            "schema-id": 0,
        }],
        "snapshot-log": [{"snapshot-id": snapshot_id,
                          "timestamp-ms": now}],
        "metadata-log": [],
    }
    mpath = os.path.join(mdir, "v1.metadata.json")
    with open(mpath, "w", encoding="utf-8") as fh:
        json.dump(meta, fh, indent=1)
    return mpath


def resolve_metadata_location(table_location: str) -> str:
    """Accept either a direct ``*.metadata.json`` path or a table root
    directory, in which case the newest ``metadata/*.metadata.json`` wins
    (Iceberg names them v<N>.metadata.json / <N>-<uuid>.metadata.json —
    both sort correctly by the leading integer)."""
    if table_location.endswith(".metadata.json"):
        return table_location
    mdir = os.path.join(_local_path(table_location), "metadata")
    cands = [f for f in os.listdir(mdir) if f.endswith(".metadata.json")]
    if not cands:
        raise FileNotFoundError(f"no *.metadata.json under {mdir}")

    def _version(name: str) -> int:
        head = name.split(".", 1)[0].lstrip("v").split("-", 1)[0]
        try:
            return int(head)
        except ValueError:
            return -1

    return os.path.join(mdir, max(cands, key=lambda n: (_version(n), n)))


def adopted_files(meta: dict, schema, entries: list) -> tuple[list, str]:
    """DataFile entries (+ the identity-fill column csv) for an Iceberg
    snapshot's live data files — the shared adoption step behind BOTH
    the explicit adopt lane (engine.adopt_iceberg_table, B66) and the
    in-place hydration of reference-written pointer defs
    (catalog.describe_table ← proto_io interop, B112).

    Identity-transform partition values become exact ``[v, v]`` file
    stats so catalog-side predicate pruning works on adopted files too
    — restricted to int/long/string/date source columns (other types
    surface as raw ordinals in the manifest, which would mis-compare
    against predicate literals); date ordinals are converted to the
    ISO strings native hive-partition stats use. The returned csv names
    the identity source columns data files MAY omit (Iceberg spec:
    readers supply the manifest partition value as a per-file
    constant) — the scan coalesce-fills them per file."""
    from olympia_spark.catalog.defs import DataFile

    specs = {s.get("spec-id"): s.get("fields", [])
             for s in meta.get("partition-specs", [])}
    spec_fields = specs.get(meta.get("default-spec-id"),
                            meta.get("partition-spec", []))
    by_name = {f.name: f.dataType.typeName() for f in schema.fields}
    ident_cols = {
        f["name"] for f in spec_fields
        if f.get("transform") == "identity"
        and by_name.get(f["name"]) in ("integer", "long", "string",
                                       "date")}

    def statv(c: str, v):
        if by_name.get(c) == "date" and isinstance(v, int):
            import datetime as _dt
            return (_dt.date(1970, 1, 1) + _dt.timedelta(days=v)).isoformat()
        return v

    files = []
    for e in entries:
        stats = {c: [statv(c, e["partition"][c]),
                     statv(c, e["partition"][c])]
                 for c in ident_cols if c in e["partition"]
                 and e["partition"][c] is not None}
        files.append(DataFile(
            path=e["file_path"], num_rows=e["record_count"],
            size_bytes=e["file_size_in_bytes"], stats=stats))
    return files, ",".join(sorted(ident_cols))
