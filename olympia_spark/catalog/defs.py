"""Object definitions — the payloads behind tree values.

Same information as the reference's protobuf messages
(proto/objects.proto:39-148), serialized as JSON instead of protobuf
binary — a documented deviation: JSON is the Spark-native encoding (the
driver is Python; def files are KB-scale; human-debuggable). Field names
mirror the proto fields so the mapping is line-by-line checkable.

Type system (proto/objects.proto:111-148 ↔ pyspark.sql.types, SURVEY §1.3):
recursive STRUCT/MAP/LIST conversion is fully implemented here — the
reference declared the nested cases but left them TODO
(IcebergToOlympia.java:196-201, OlympiaToIceberg.java:121-122).
"""

from __future__ import annotations

import dataclasses
import json
import uuid as _uuid
from dataclasses import dataclass, field

from pyspark.sql import types as T

# --- defaults (reference ObjectDefinitions.java:33-49) ----------------------

CATALOG_MAJOR_VERSION_DEFAULT = 0
CATALOG_ORDER_DEFAULT = 128
NAME_MAX_SIZE_BYTES_DEFAULT = 100
NODE_FILE_MAX_SIZE_BYTES_DEFAULT = 1_048_576
TXN_TTL_MILLIS_DEFAULT = 3 * 24 * 60 * 60 * 1000  # 3 days
ISOLATION_SNAPSHOT = "SNAPSHOT"
ISOLATION_SERIALIZABLE = "SERIALIZABLE"


def _new_id() -> str:
    return str(_uuid.uuid4())


@dataclass
class CatalogDef:
    """proto/objects.proto:39-51 (CatalogDef)."""
    id: str = field(default_factory=_new_id)
    name: str = ""
    major_version: int = CATALOG_MAJOR_VERSION_DEFAULT
    order: int = CATALOG_ORDER_DEFAULT
    namespace_name_max_size_bytes: int = NAME_MAX_SIZE_BYTES_DEFAULT
    table_name_max_size_bytes: int = NAME_MAX_SIZE_BYTES_DEFAULT
    view_name_max_size_bytes: int = NAME_MAX_SIZE_BYTES_DEFAULT
    node_file_max_size_bytes: int = NODE_FILE_MAX_SIZE_BYTES_DEFAULT
    txn_isolation_level: str = ISOLATION_SNAPSHOT
    txn_ttl_millis: int = TXN_TTL_MILLIS_DEFAULT
    properties: dict = field(default_factory=dict)
    # name -> exported root node path (proto/objects.proto:50)
    exported_snapshots: dict = field(default_factory=dict)


@dataclass
class NamespaceDef:
    """proto/objects.proto:53-56."""
    id: str = field(default_factory=_new_id)
    properties: dict = field(default_factory=dict)


@dataclass
class DataFile:
    """One parquet data file tracked by a TableDef — the Spark-native
    analogue of an Iceberg data-file entry, with the min/max stats that
    make predicate-based file pruning possible for copy-on-write DML."""
    path: str
    num_rows: int = -1
    size_bytes: int = -1
    # column name -> [min, max] as JSON-compatible scalars
    stats: dict = field(default_factory=dict)
    # how many files the write that produced this file's directory
    # emitted into it (-1 = unknown / pre-bucketing def). The bucketed
    # read path uses it as the DIR-COMPLETENESS check: a directory
    # whose tracked-file count equals dir_files still holds exactly
    # one bucketed write's full output, so Spark's bucket-id-from-
    # filename contract is intact and the scan may register it as a
    # bucketed-table partition; a partial dir downgrades to the plain
    # scan (bucket files may be missing → wrong empty-bucket inference)
    dir_files: int = -1


@dataclass
class TableDef:
    """proto/objects.proto:58-69. The reference only points at Iceberg
    metadata (format enum ICEBERG, iceberg_metadata_location); our native
    format enum value is PARQUET with an explicit tracked file list +
    schema — the "metadata location" becomes self-contained."""
    id: str = field(default_factory=_new_id)
    format: str = "PARQUET"                 # reference: "ICEBERG"
    schema_json: str = ""                   # Spark StructType JSON
    data_files: list = field(default_factory=list)   # list[DataFile]
    # hive-style partition columns (data/ns/tbl/<uuid>/col=val/...);
    # partition values land in DataFile.stats for catalog-side pruning
    partition_by: list = field(default_factory=list)
    properties: dict = field(default_factory=dict)
    # logical -> PHYSICAL column name (Iceberg-style column mapping):
    # RENAME COLUMN is metadata-only — parquet files keep their original
    # (physical) names forever; reads map physical->logical, writes map
    # logical->physical, stats lookups go through the mapping
    column_mapping: dict = field(default_factory=dict)
    # PHYSICAL names of dropped columns whose bytes may still sit inside
    # live data files. Name-based parquet resolution would silently bind
    # a same-named ADD COLUMNS to that stale data (resurrection); these
    # tombstones close the namespace: a physical name, once retired,
    # never re-enters the logical schema
    retired_columns: list = field(default_factory=list)
    # CHECK constraints (Delta-style): name -> SQL boolean expression
    # over the table's logical columns. Enforced on EVERY write through
    # the engine's single writer chokepoint; SQL-standard semantics
    # (a NULL/UNKNOWN result passes, only FALSE violates)
    constraints: dict = field(default_factory=dict)
    # GENERATED ALWAYS AS columns: name -> SQL expression over the other
    # logical columns. The engine OWNS these columns — every write
    # recomputes them at the writer chokepoint (so UPDATEs to the source
    # columns keep them consistent for free), and partitioning by one
    # gives Iceberg-style hidden/transform partitioning (e.g.
    # event_date GENERATED ALWAYS AS (CAST(ts AS DATE)))
    generated_columns: dict = field(default_factory=dict)
    # bucketed layout spec (reference: proto/objects.proto:58-69
    # delegates layout to Iceberg, whose bucket transform is the same
    # murmur3 family — here the Spark-native form): {"columns": [...],
    # "num_buckets": N}. Every write hash-distributes on the LOGICAL
    # columns (mapped to physical at the writer) and the read path
    # re-registers complete write dirs as a bucketed session-catalog
    # table, so joins/aggregations on the bucket key plan with ZERO
    # exchange on the bucketed side. Empty dict = unbucketed.
    bucket_by: dict = field(default_factory=dict)
    # mirror of the reference pointer fields for format parity
    metadata_location: str = ""
    previous_metadata_location: str = ""

    def spark_schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def file_paths(self) -> list[str]:
        return [f.path for f in self.data_files]


@dataclass
class ViewDef:
    """proto/objects.proto:71-85. The reference stores a serialized
    substrait ReadRel (the engine-plan IR of the view query); we store
    the SQL text PLUS the Catalyst analyzed-plan JSON captured at
    creation — the Spark-native IR (same role: a resolved, engine-level
    relational tree with the bound schema), since Substrait has no
    stable Spark encoder. SQL text stays authoritative for execution
    (re-resolution picks up fresh table state); the IR is the recorded
    structural contract that schema_binding enforces."""
    id: str = field(default_factory=_new_id)
    sql_text: str = ""                      # reference: substrait_read_rel
    plan_ir_json: str = ""                  # Catalyst analyzed plan (IR)
    schema_json: str = ""
    default_namespace: str = ""
    # ["ns.table", ...] — objects the view reads
    referenced_objects: list = field(default_factory=list)
    schema_binding: bool = False
    properties: dict = field(default_factory=dict)


@dataclass
class DistTransactionDef:
    """proto/objects.proto:89-96 — persisted transaction handle."""
    id: str = field(default_factory=_new_id)
    isolation_level: str = ISOLATION_SNAPSHOT
    beginning_root_path: str = ""
    running_root_path: str = ""
    began_at_millis: int = 0
    expire_at_millis: int = 0
    # serialized pending actions, so another process can resume conflict
    # analysis (reference keeps these on the running root)
    actions: list = field(default_factory=list)


_DEF_TYPES = {cls.__name__: cls for cls in
              (CatalogDef, NamespaceDef, TableDef, ViewDef,
               DistTransactionDef, DataFile)}


def to_json(obj) -> bytes:
    def encode(o):
        if dataclasses.is_dataclass(o):
            d = dataclasses.asdict(o)
            d["__type__"] = type(o).__name__
            return d
        raise TypeError(type(o))
    return json.dumps(obj, default=encode, sort_keys=True).encode()


def from_json(data: bytes):
    def hook(d):
        t = d.pop("__type__", None)
        if t in _DEF_TYPES:
            cls = _DEF_TYPES[t]
            names = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in d.items() if k in names})
        return d
    obj = json.loads(data.decode(), object_hook=hook)
    # dataclasses.asdict flattened nested DataFile entries to dicts
    if isinstance(obj, TableDef):
        obj.data_files = [
            f if isinstance(f, DataFile) else DataFile(**f)
            for f in obj.data_files]
    return obj


# --- suffix-dispatched codec (reference .binpb interop, proto_io.py) ---------

def read_def(data: bytes, path: str):
    """Decode a def file by its path suffix: ``.binpb`` (what the Java
    reference writes — ObjectDefinitions.java, FileLocations.java:43)
    through the hand-rolled proto3 codec, anything else as our JSON
    lane. The ONE read chokepoint, so a reference-written catalog is
    readable in place."""
    if path.endswith(".binpb"):
        from olympia_spark.catalog import proto_io
        return proto_io.decode_def(data, path)
    return from_json(data)


def write_def(obj, path: str) -> bytes:
    """Encode a def for the given target path (suffix-dispatched, the
    inverse of :func:`read_def`)."""
    if path.endswith(".binpb"):
        from olympia_spark.catalog import proto_io
        return proto_io.encode_def(obj)
    return to_json(obj)


# --- type mapping (SURVEY §1.3) ---------------------------------------------

# Olympia Column.DataType name -> constructor of Spark type
_PRIMITIVES = {
    "BOOLEAN": T.BooleanType(),
    "INT2": T.ShortType(),
    "INT4": T.IntegerType(),
    "INT8": T.LongType(),
    "FLOAT4": T.FloatType(),
    "FLOAT8": T.DoubleType(),
    # reference hard-codes DECIMAL(38,10) on load (OlympiaToIceberg.java:118)
    "DECIMAL": T.DecimalType(38, 10),
    "CHAR": T.StringType(),
    "VARCHAR": T.StringType(),
    "DATE": T.DateType(),
    # Spark has no TIME type — documented deviation: micros as LongType
    "TIME3": T.LongType(), "TIME6": T.LongType(), "TIME9": T.LongType(),
    "TIMETZ3": T.LongType(), "TIMETZ6": T.LongType(), "TIMETZ9": T.LongType(),
    "TIMESTAMP3": T.TimestampNTZType(),
    "TIMESTAMP6": T.TimestampNTZType(),
    "TIMESTAMP9": T.TimestampNTZType(),
    "TIMESTAMPTZ3": T.TimestampType(),
    "TIMESTAMPTZ6": T.TimestampType(),
    "TIMESTAMPTZ9": T.TimestampType(),
    "FIXED": T.BinaryType(),
    "BINARY": T.BinaryType(),
}


def olympia_type_to_spark(col: dict) -> T.DataType:
    """Column dict {type, struct_fields?, map_key?, map_value?, list_element?}
    → Spark type, recursing through nested types (proto/objects.proto:141-148;
    the reference's TODO cases implemented)."""
    t = col["type"].upper()
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]
    if t == "STRUCT":
        return T.StructType([
            T.StructField(f["name"], olympia_type_to_spark(f), True)
            for f in col.get("struct_fields", [])])
    if t == "MAP":
        return T.MapType(olympia_type_to_spark(col["map_key"]),
                         olympia_type_to_spark(col["map_value"]), True)
    if t == "LIST":
        return T.ArrayType(olympia_type_to_spark(col["list_element"]), True)
    raise ValueError(f"unknown Olympia type: {t}")


def spark_type_to_olympia(dt: T.DataType) -> dict:
    """Inverse mapping, for storing view/table schemas in def files."""
    if isinstance(dt, T.BooleanType):
        return {"type": "BOOLEAN"}
    if isinstance(dt, T.ShortType):
        return {"type": "INT2"}
    if isinstance(dt, T.IntegerType):
        return {"type": "INT4"}
    if isinstance(dt, T.LongType):
        return {"type": "INT8"}
    if isinstance(dt, T.FloatType):
        return {"type": "FLOAT4"}
    if isinstance(dt, T.DoubleType):
        return {"type": "FLOAT8"}
    if isinstance(dt, T.DecimalType):
        return {"type": "DECIMAL"}
    if isinstance(dt, T.StringType):
        return {"type": "VARCHAR"}
    if isinstance(dt, T.DateType):
        return {"type": "DATE"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "TIMESTAMP6"}
    if isinstance(dt, T.TimestampType):
        return {"type": "TIMESTAMPTZ6"}
    if isinstance(dt, T.BinaryType):
        return {"type": "BINARY"}
    if isinstance(dt, T.StructType):
        return {"type": "STRUCT", "struct_fields": [
            {"name": f.name, **spark_type_to_olympia(f.dataType)}
            for f in dt.fields]}
    if isinstance(dt, T.MapType):
        return {"type": "MAP",
                "map_key": spark_type_to_olympia(dt.keyType),
                "map_value": spark_type_to_olympia(dt.valueType)}
    if isinstance(dt, T.ArrayType):
        return {"type": "LIST",
                "list_element": spark_type_to_olympia(dt.elementType)}
    raise ValueError(f"unsupported Spark type: {dt}")


# --- temporal precision conversion (SURVEY §1.3; proto/objects.proto:111-139)

# Olympia temporal types carry an explicit precision digit (3 = millis,
# 6 = micros, 9 = nanos). Spark's native temporal precision is MICROS, so
# ingesting proto-typed epoch values needs a real scale conversion, not
# just a type mapping: ms → µs multiplies by 1000 exactly; ns → µs is an
# integer floor division (documented truncation — Spark cannot represent
# the sub-microsecond remainder; the same truncation Spark itself applies
# reading parquet TIMESTAMP(NANOS)).
_TEMPORAL_SCALE = {"3": 1000, "6": 1, "9": -1000}   # <0 ⇒ divide


def temporal_to_micros_expr(colname: str, olympia_type: str):
    """Spark Column converting an epoch-integer column (identified by
    NAME — backtick-quoted internally, so spaces/dots are literal) of
    the given Olympia temporal type (TIME3/6/9, TIMETZ…, TIMESTAMP…,
    TIMESTAMPTZ…) to MICROSECONDS. For TIMESTAMP types, cast the result
    with ``timestamp_micros(...)`` to land in Spark's native temporal
    types; TIME types stay integer micros (Spark has no TIME — SURVEY
    §1.3). ns→µs is true FLOOR division (pre-epoch values not divisible
    by 1000 round DOWN — Math.floorDiv, matching Spark's own parquet
    TIMESTAMP(NANOS) conversion), not div's toward-zero truncation."""
    from pyspark.sql import functions as F
    t = olympia_type.upper()
    digit = t[-1]
    if digit not in _TEMPORAL_SCALE or not (
            t.startswith(("TIME", "TIMESTAMP"))):
        raise ValueError(f"not a precision-bearing temporal type: {t}")
    scale = _TEMPORAL_SCALE[digit]
    quoted = "`" + colname.replace("`", "``") + "`"
    x = f"CAST({quoted} AS BIGINT)"
    if scale == 1:
        return F.expr(x)
    if scale > 1:
        return F.expr(f"{x} * {scale}")
    d = -scale
    # floor division on exact int64 arithmetic: toward-zero div, minus 1
    # when the remainder is negative (% follows the dividend's sign)
    return F.expr(f"({x} div {d}) - "
                  f"(CASE WHEN {x} % {d} < 0 THEN 1 ELSE 0 END)")


_DAY_MICROS = 86_400_000_000


def timetz_to_utc_micros_expr(colname: str, olympia_type: str,
                              offset_colname: str):
    """TIMETZ3/6/9 → UTC time-of-day in MICROSECONDS (SURVEY §1.3;
    proto/objects.proto:124-126). The proto declares the type but not a
    payload layout (the reference's own temporal conversion beyond the
    enum is TODO — IcebergToOlympia.java:196-201), so this adopts the
    only widely-used relational encoding (Postgres timetz): the value
    column is the LOCAL wall-clock time-of-day at the stated precision
    and a companion column carries the zone as signed seconds EAST of
    UTC (ISO-8601 sign: ``+02:00`` ⇒ 7200). The result normalizes to
    UTC — local minus offset — and wraps into [0, 24h) so values from
    writers in different zones compare correctly. Precision scaling is
    exactly :func:`temporal_to_micros_expr`'s (ms ×1000 exact, ns true
    floor-div)."""
    from pyspark.sql import functions as F
    t = olympia_type.upper()
    if not t.startswith("TIMETZ") or t[-1] not in _TEMPORAL_SCALE:
        raise ValueError(f"not a TIMETZ type: {olympia_type}")
    micros = temporal_to_micros_expr(colname, "TIME" + t[-1])
    quoted_off = "`" + offset_colname.replace("`", "``") + "`"
    off_us = F.expr(f"CAST({quoted_off} AS BIGINT)") * F.lit(1_000_000)
    day = F.lit(_DAY_MICROS)
    return ((micros - off_us) % day + day) % day
