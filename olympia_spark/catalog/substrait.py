"""Substrait ReadRel view payloads — decode (execute) and encode.

The reference stores a VIEW's definition as a serialized Substrait
``ReadRel`` message (proto/objects.proto:81-85 ``substrait_read_rel``,
core SubstraitUtil.java:26-41).  The payload the reference actually
writes is minimal — a NAMED-TABLE scan plus a base schema
(TestSubstraitUtil.java:31-39 builds exactly
``ReadRel{named_table{names}, base_schema{names}}``; the Iceberg
bridge, OlympiaToIceberg.java:126-134, re-encodes the same bytes
verbatim) — so executing a reference-authored view means: resolve the
named table through the catalog, scan it, and project the base-schema
columns.

This module decodes/encodes that subset with the same zero-dependency
proto3 wire discipline as :mod:`olympia_spark.catalog.proto_io`,
using field numbers from the PUBLIC Substrait protos
(substrait/algebra.proto ``ReadRel``; substrait/type.proto
``NamedStruct``/``Type``):

* ``ReadRel``: common=1, base_schema=2, filter=3, projection=4,
  virtual_table=5, local_files=6, named_table=7, extension_table=8,
  advanced_extension=10, best_effort_filter=11.
* ``ReadRel.NamedTable``: names=1 (repeated string),
  advanced_extension=10.
* ``NamedStruct``: names=1 (repeated string), struct=2 (Type.Struct).
* ``Type.Struct``: types=1 (repeated Type),
  type_variation_reference=2, nullability=3.
* ``Type`` oneof kind (subset): bool=1 i8=2 i16=3 i32=5 i64=7 fp32=10
  fp64=11 string=12 binary=13 timestamp=14 date=16 fixed_char=21
  varchar=22 fixed_binary=23 decimal=24 struct=25 list=27 map=28
  timestamp_tz=29.  Simple kinds carry
  (type_variation_reference=1, nullability=2); parameterized kinds
  follow the public spec (decimal: scale=1 precision=2 variation=3
  nullability=4; varchar/fixed_char: length=1; list: type=1;
  map: key=1 value=2).

Anything BEYOND the reference's subset — a filter, a projection mask,
a non-named-table read type, an advanced extension (whose
``enhancement`` half is semantically load-bearing per the Substrait
spec) — REFUSES loudly rather than executing a silently-wrong scan.
Unknown ``Type`` kinds decode to ``None`` and skip the (best-effort)
type cross-check; column NAMES, not types, are the execution contract.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from olympia_spark.catalog.proto_io import decode_message, encode_message

# presence-only fields decode as raw bytes: key-in-dict == field was on
# the wire (an empty embedded message still writes its tag)
_SPECS: dict[str, dict[int, tuple[str, str]]] = {
    "ReadRel": {
        1: ("common", "msg:RelCommon"),
        2: ("base_schema", "msg:NamedStruct"),
        3: ("filter", "bytes"),
        4: ("projection", "bytes"),
        5: ("virtual_table", "bytes"),
        6: ("local_files", "bytes"),
        7: ("named_table", "msg:NamedTable"),
        8: ("extension_table", "bytes"),
        10: ("advanced_extension", "bytes"),
        11: ("best_effort_filter", "bytes"),
    },
    "NamedTable": {
        1: ("names", "rep_str"),
        10: ("advanced_extension", "bytes"),
    },
    # RelCommon (algebra.proto): direct=1 is the identity emit (safe to
    # ignore), emit=2 REMAPS/DROPS output columns (load-bearing —
    # refuse), hints=3 are optimizer hints (ignorable),
    # advanced_extension=4 may carry required enhancements (refuse)
    "RelCommon": {
        1: ("direct", "bytes"),
        2: ("emit", "bytes"),
        3: ("hints", "bytes"),
        4: ("advanced_extension", "bytes"),
    },
    "NamedStruct": {
        1: ("names", "rep_str"),
        2: ("struct", "msg:TypeStruct"),
    },
    "TypeStruct": {
        1: ("types", "rep_msg:Type"),
        2: ("type_variation_reference", "uint"),
        3: ("nullability", "uint"),
    },
    "Type": {
        1: ("bool", "msg:SimpleType"),
        2: ("i8", "msg:SimpleType"),
        3: ("i16", "msg:SimpleType"),
        5: ("i32", "msg:SimpleType"),
        7: ("i64", "msg:SimpleType"),
        10: ("fp32", "msg:SimpleType"),
        11: ("fp64", "msg:SimpleType"),
        12: ("string", "msg:SimpleType"),
        13: ("binary", "msg:SimpleType"),
        14: ("timestamp", "msg:SimpleType"),
        16: ("date", "msg:SimpleType"),
        21: ("fixed_char", "msg:LengthType"),
        22: ("varchar", "msg:LengthType"),
        23: ("fixed_binary", "msg:LengthType"),
        24: ("decimal", "msg:DecimalType"),
        25: ("struct", "msg:TypeStruct"),
        27: ("list", "msg:ListType"),
        28: ("map", "msg:MapType"),
        29: ("timestamp_tz", "msg:SimpleType"),
    },
    "SimpleType": {
        1: ("type_variation_reference", "uint"),
        2: ("nullability", "uint"),
    },
    "LengthType": {
        1: ("length", "uint"),
        2: ("type_variation_reference", "uint"),
        3: ("nullability", "uint"),
    },
    "DecimalType": {
        1: ("scale", "uint"),
        2: ("precision", "uint"),
        3: ("type_variation_reference", "uint"),
        4: ("nullability", "uint"),
    },
    "ListType": {
        1: ("type", "msg:Type"),
        2: ("type_variation_reference", "uint"),
        3: ("nullability", "uint"),
    },
    "MapType": {
        1: ("key", "msg:Type"),
        2: ("value", "msg:Type"),
        3: ("type_variation_reference", "uint"),
        4: ("nullability", "uint"),
    },
}

# Type oneof kind → Spark simpleString (best-effort cross-check only)
_SIMPLE_SPARK = {
    "bool": "boolean", "i8": "tinyint", "i16": "smallint", "i32": "int",
    "i64": "bigint", "fp32": "float", "fp64": "double", "string": "string",
    "binary": "binary", "timestamp": "timestamp_ntz", "date": "date",
    "fixed_char": "string", "varchar": "string", "fixed_binary": "binary",
    "timestamp_tz": "timestamp",
}


class SubstraitUnsupported(ValueError):
    """The payload uses Substrait features beyond the reference's
    named-table-scan subset; executing it would be silently wrong."""


@dataclass
class ReadRelView:
    """The decoded, executable content of a reference view payload."""
    table_names: list[str]            # qualified name path, e.g. [ns, tbl]
    column_names: list[str] = field(default_factory=list)
    column_types: list[str | None] = field(default_factory=list)


def _spark_type_of(t: dict) -> str | None:
    """Best-effort Spark simpleString for a decoded Type; None for
    kinds outside the table (cross-check is then skipped for that
    column — names remain the contract)."""
    for kind, sub in t.items():
        if kind in _SIMPLE_SPARK:
            return _SIMPLE_SPARK[kind]
        if kind == "decimal":
            return (f"decimal({sub.get('precision', 38)},"
                    f"{sub.get('scale', 0)})")
    return None


def decode_read_rel(data: bytes) -> ReadRelView:
    """Reference ``substrait_read_rel`` bytes → :class:`ReadRelView`,
    refusing every construct past the named-table + base-schema subset
    (SubstraitUtil.java only ever parses and re-serializes these)."""
    m = decode_message("ReadRel", data, _SPECS)
    common = m.get("common") or {}
    if "emit" in common:
        # common.emit REMAPS (reorders/drops) the output columns —
        # ignoring it would serve base-schema order silently wrong
        # (review r12 pass-3); common.direct and hints are the
        # identity/ignorable cases and pass through
        raise SubstraitUnsupported(
            "substrait ReadRel.common carries an emit output-mapping; "
            "only the direct (identity) emit is executable")
    if "advanced_extension" in common:
        raise SubstraitUnsupported(
            "substrait ReadRel.common carries an advanced extension")
    for f, why in (
            ("filter", "a filter expression"),
            ("best_effort_filter", "a best-effort filter"),
            ("projection", "a projection mask"),
            ("advanced_extension", "an advanced extension"),
            ("virtual_table", "a virtual-table read"),
            ("local_files", "a local-files read"),
            ("extension_table", "an extension-table read")):
        if f in m:
            raise SubstraitUnsupported(
                f"substrait ReadRel carries {why}; only the reference's "
                f"named-table + base-schema subset is executable")
    nt = m.get("named_table")
    if not nt or not nt.get("names"):
        raise SubstraitUnsupported(
            "substrait ReadRel has no named_table.names — nothing to "
            "resolve")
    if "advanced_extension" in nt:
        raise SubstraitUnsupported(
            "substrait NamedTable carries an advanced extension")
    base = m.get("base_schema") or {}
    cols = list(base.get("names", []))
    types = [_spark_type_of(t)
             for t in (base.get("struct") or {}).get("types", [])]
    # names may legitimately outnumber types (reference test writes
    # names only); pad so zip in callers stays aligned
    types += [None] * (len(cols) - len(types))
    return ReadRelView(table_names=list(nt["names"]),
                       column_names=cols, column_types=types[:len(cols)])


def encode_read_rel(table_names: list[str],
                    column_names: list[str] | None = None,
                    column_types: list[str | None] | None = None) -> bytes:
    """Build reference-parseable ``ReadRel`` bytes: named-table scan +
    base schema — the exact shape TestSubstraitUtil.java constructs.
    ``column_types`` (Spark simpleStrings) are encoded for the kinds in
    the public subset and skipped otherwise (names-only NamedStruct is
    what the reference itself writes)."""
    vals: dict = {"named_table": {"names": list(table_names)}}
    if column_names:
        base: dict = {"names": list(column_names)}
        types = []
        for t in (column_types or []):
            enc = _encode_type(t)
            if enc is None:
                types = []
                break
            types.append(enc)
        if types and len(types) == len(column_names):
            # NULLABILITY_NULLABLE=1 on the struct itself
            base["struct"] = {"types": types, "nullability": 1}
        vals["base_schema"] = base
    return encode_message("ReadRel", vals, _SPECS)


def _encode_type(spark_simple: str | None) -> dict | None:
    if spark_simple is None:
        return None
    s = spark_simple.lower()
    for kind, simple in _SIMPLE_SPARK.items():
        if simple == s:
            return {kind: {"nullability": 1}}
    if s.startswith("decimal(") and s.endswith(")"):
        p, sc = s[8:-1].split(",")
        return {"decimal": {"scale": int(sc), "precision": int(p),
                            "nullability": 1}}
    return None
