"""Substrait ReadRel view payloads — codec + execution (B124, r12).

The reference stores views as serialized Substrait ReadRel bytes
(proto/objects.proto:81-85; SubstraitUtil.java:26-41 parses them;
TestSubstraitUtil.java:31-39 shows the payload is a named-table scan
plus base-schema names). These tests pin the wire bytes against the
canonical proto3 serialization, exercise the refusal surface, and run
a reference-authored binpb view end to end through Engine.read_view.
"""

import base64
import os

import pytest

from olympia_spark.catalog.proto_io import (_EXT_SUBSTRAIT, _EXT_VIEW,
                                            decode_message, encode_message)
from olympia_spark.catalog.substrait import (_SPECS, ReadRelView,
                                             SubstraitUnsupported,
                                             decode_read_rel,
                                             encode_read_rel)

SF = "/root/testdata/sf0.001"


# --- wire codec ----------------------------------------------------------------


def test_golden_bytes_reference_test_case():
    # ReadRel{named_table{names:["person"]}, base_schema{names:["name"]}}
    # — byte-for-byte what protobuf-java emits for the exact message
    # TestSubstraitUtil.java:31-39 builds (fields ascending: 2 then 7)
    b = encode_read_rel(["person"], ["name"])
    assert b.hex() == "12060a046e616d653a080a06706572736f6e"
    v = decode_read_rel(b)
    assert v == ReadRelView(["person"], ["name"], [None])


def test_roundtrip_with_types():
    b = encode_read_rel(
        ["ref", "customer"],
        ["c_custkey", "c_name", "c_acctbal", "flag", "score"],
        ["bigint", "string", "decimal(12,2)", "boolean", "double"])
    v = decode_read_rel(b)
    assert v.table_names == ["ref", "customer"]
    assert v.column_names == [
        "c_custkey", "c_name", "c_acctbal", "flag", "score"]
    assert v.column_types == [
        "bigint", "string", "decimal(12,2)", "boolean", "double"]


def test_unknown_type_kind_decodes_none_not_error():
    # a Type kind outside our table (e.g. uuid=32) must not break the
    # decode — names stay the execution contract
    t = encode_message("ReadRel", {
        "named_table": {"names": ["t"]},
        "base_schema": {"names": ["a"],
                        "struct": {"types": [{}], "nullability": 1}},
    }, _SPECS)
    v = decode_read_rel(t)
    assert v.column_names == ["a"] and v.column_types == [None]


@pytest.mark.parametrize("extra,msg", [
    ({"filter": b"\x08\x01"}, "filter expression"),
    ({"best_effort_filter": b"\x08\x01"}, "best-effort filter"),
    ({"projection": b"\x08\x01"}, "projection mask"),
    ({"advanced_extension": b"\x08\x01"}, "advanced extension"),
    ({"virtual_table": b"\x08\x01"}, "virtual-table"),
    ({"local_files": b"\x08\x01"}, "local-files"),
    ({"extension_table": b"\x08\x01"}, "extension-table"),
])
def test_beyond_subset_refuses(extra, msg):
    vals = {"named_table": {"names": ["t"]}}
    vals.update(extra)
    data = encode_message("ReadRel", vals, _SPECS)
    with pytest.raises(SubstraitUnsupported, match=msg):
        decode_read_rel(data)


def test_empty_embedded_message_still_counts_as_present():
    # protobuf-java writes tag + len(0) for a SET-but-empty message —
    # presence, not content, is what must refuse (our encoder elides
    # empties, so craft the two bytes by hand: field 3, wire 2, len 0)
    base = encode_message("ReadRel", {"named_table": {"names": ["t"]}},
                          _SPECS)
    with pytest.raises(SubstraitUnsupported, match="filter"):
        decode_read_rel(base + b"\x1a\x00")


def test_no_named_table_refuses():
    with pytest.raises(SubstraitUnsupported, match="named_table"):
        decode_read_rel(encode_message("ReadRel", {}, _SPECS))
    # WriteRel bytes (different field layout) must not execute either:
    # NamedObjectWrite.names happens to share field 1, but WriteRel has
    # no field-7 NamedTable, so the decode refuses on named_table
    write_rel = encode_message("ReadRel", {
        "base_schema": {"names": ["name"]}}, _SPECS)
    with pytest.raises(SubstraitUnsupported):
        decode_read_rel(write_rel)


def test_names_only_padding():
    # more names than types (reference writes names-only) stays aligned
    b = encode_message("ReadRel", {
        "named_table": {"names": ["t"]},
        "base_schema": {"names": ["a", "b", "c"],
                        "struct": {"types": [{"i64": {"nullability": 1}}],
                                   "nullability": 1}},
    }, _SPECS)
    v = decode_read_rel(b)
    assert v.column_types == ["bigint", None, None]


# --- end-to-end execution -------------------------------------------------------


def _binpb_engine_with_view(spark, tmp_path, *, cols=None,
                            schema_binding=False, table="customer",
                            view_names=None):
    """A binpb warehouse holding a native customer table plus a view
    def EXACTLY as the reference writes it: view_format=SUBSTRAIT,
    substrait_read_rel payload, NO SQL-text extension property."""
    from olympia_spark.catalog.catalog import Catalog
    from olympia_spark.catalog.defs import ViewDef
    from olympia_spark.engine import Engine

    wh = str(tmp_path / "wh")
    Catalog.create(wh, def_format="binpb")
    eng = Engine(spark, wh)
    eng.sql("CREATE NAMESPACE ref")
    eng.register_external_table(
        f"ref.{table}", os.path.join(SF, "customer.parquet"))
    schema = eng.read_table(f"ref.{table}").schema
    names = view_names if view_names is not None else ["ref", table]
    payload = encode_read_rel(
        names, cols or [],
        [dict((f.name, f.dataType.simpleString())
              for f in schema.fields).get(c) for c in (cols or [])])
    vdef = ViewDef(
        sql_text="", schema_json="", default_namespace="ref",
        referenced_objects=[f"ref.{table}"],
        schema_binding=schema_binding,
        properties={_EXT_SUBSTRAIT: base64.b64encode(payload).decode()})
    txn = eng.catalog.begin()
    eng.catalog.create_view(txn, "ref", "v", vdef)
    eng.catalog.commit(txn)
    # the stored def must be pure reference shape: substrait bytes set,
    # no olympia-spark.view_ext property
    stored = eng.catalog.describe_view(eng.catalog.begin(read_only=True),
                                       "ref", "v")
    assert stored.properties.get(_EXT_SUBSTRAIT)
    assert not stored.sql_text and _EXT_VIEW not in stored.properties
    return eng


def test_reference_view_executes_full_scan(spark, tmp_path):
    eng = _binpb_engine_with_view(spark, tmp_path)
    got = eng.read_view("ref.v")
    want = eng.read_table("ref.customer")
    assert got.columns == want.columns
    assert got.count() == want.count()


def test_reference_view_projects_base_schema(spark, tmp_path):
    eng = _binpb_engine_with_view(
        spark, tmp_path, cols=["c_custkey", "c_mktsegment"])
    got = eng.read_view("ref.v")
    assert got.columns == ["c_custkey", "c_mktsegment"]
    assert got.count() == eng.read_table("ref.customer").count()
    # and through the SQL front-end (view referenced inside a query)
    n = eng.sql("SELECT COUNT(DISTINCT c_mktsegment) AS n "
                "FROM ref.v").collect()[0]["n"]
    assert n == 5


def test_single_name_resolves_via_default_namespace(spark, tmp_path):
    eng = _binpb_engine_with_view(spark, tmp_path,
                                  view_names=["customer"])
    assert eng.read_view("ref.v").count() > 0


def test_missing_base_schema_column_refuses(spark, tmp_path):
    eng = _binpb_engine_with_view(spark, tmp_path,
                                  cols=["c_custkey", "nope"])
    with pytest.raises(ValueError, match="nope"):
        eng.read_view("ref.v")


def test_view_without_sql_or_payload_refuses(spark, tmp_path):
    from olympia_spark.catalog.catalog import Catalog
    from olympia_spark.catalog.defs import ViewDef
    from olympia_spark.engine import Engine
    wh = str(tmp_path / "wh2")
    Catalog.create(wh, def_format="binpb")
    eng = Engine(spark, wh)
    eng.sql("CREATE NAMESPACE ref")
    txn = eng.catalog.begin()
    eng.catalog.create_view(txn, "ref", "empty", ViewDef(sql_text=""))
    eng.catalog.commit(txn)
    with pytest.raises(ValueError, match="neither SQL text nor"):
        eng.read_view("ref.empty")


# --- outbound lane ---------------------------------------------------------------


def test_simple_view_gets_genuine_readrel_payload(spark, tmp_path):
    from olympia_spark.catalog.catalog import Catalog
    from olympia_spark.engine import Engine
    wh = str(tmp_path / "out")
    Catalog.create(wh, def_format="binpb")
    eng = Engine(spark, wh)
    eng.sql("CREATE NAMESPACE ref")
    eng.register_external_table(
        "ref.customer", os.path.join(SF, "customer.parquet"))
    eng.create_view("ref.simple",
                    "SELECT c_custkey, c_name FROM ref.customer")
    eng.create_view("ref.star", "SELECT * FROM ref.customer")
    eng.create_view(
        "ref.complex",
        "SELECT c_mktsegment, COUNT(*) AS n FROM ref.customer "
        "GROUP BY c_mktsegment")
    ro = eng.catalog.begin(read_only=True)
    simple = eng.catalog.describe_view(ro, "ref", "simple")
    rel = decode_read_rel(
        base64.b64decode(simple.properties[_EXT_SUBSTRAIT]))
    assert rel.table_names == ["ref", "customer"]
    assert rel.column_names == ["c_custkey", "c_name"]
    assert rel.column_types == ["bigint", "string"]
    star = eng.catalog.describe_view(ro, "ref", "star")
    srel = decode_read_rel(
        base64.b64decode(star.properties[_EXT_SUBSTRAIT]))
    assert srel.column_names[0] == "c_custkey" \
        and len(srel.column_names) >= 5   # every customer column
    # aggregation is beyond the ReadRel subset — no payload, SQL only
    cplx = eng.catalog.describe_view(ro, "ref", "complex")
    assert _EXT_SUBSTRAIT not in cplx.properties
    # the on-disk binpb def carries the payload in field 8 proper
    vkey = eng.catalog._view_key("ref", "simple")
    path = eng.catalog.tree.search(ro.running_root, vkey)
    raw = eng.catalog.storage.read(path)
    m = decode_message("ViewDef", raw)
    assert decode_read_rel(m["substrait_read_rel"]).column_names == [
        "c_custkey", "c_name"]


def test_payload_case_normalizes_to_schema(spark, tmp_path):
    """Review r12 pass-2: Spark resolves the view's SELECT case-
    insensitively, but the payload's base-schema names match
    case-SENSITIVELY at execution (ours and the Java reference's) —
    an uppercase SELECT must still emit an executable payload with
    schema-case names and full type info."""
    from olympia_spark.catalog.catalog import Catalog
    from olympia_spark.engine import Engine
    wh = str(tmp_path / "case")
    Catalog.create(wh, def_format="binpb")
    eng = Engine(spark, wh)
    eng.sql("CREATE NAMESPACE ref")
    eng.register_external_table(
        "ref.customer", os.path.join(SF, "customer.parquet"))
    eng.create_view("ref.upper",
                    "SELECT C_CUSTKEY, C_Name FROM ref.customer")
    ro = eng.catalog.begin(read_only=True)
    vdef = eng.catalog.describe_view(ro, "ref", "upper")
    rel = decode_read_rel(
        base64.b64decode(vdef.properties[_EXT_SUBSTRAIT]))
    assert rel.column_names == ["c_custkey", "c_name"]
    assert rel.column_types == ["bigint", "string"]


def test_relcommon_emit_refuses_direct_passes():
    """Review r12 pass-3: ReadRel.common.emit REMAPS output columns —
    executing base-schema order would be silently wrong; the identity
    (direct) emit and plain hints pass through."""
    base = {"named_table": {"names": ["t"]}}
    with pytest.raises(SubstraitUnsupported, match="emit"):
        decode_read_rel(encode_message("ReadRel", {
            **base, "common": {"emit": b"\x08\x02\x08\x00"}}, _SPECS))
    with pytest.raises(SubstraitUnsupported, match="advanced extension"):
        decode_read_rel(encode_message("ReadRel", {
            **base, "common": {"advanced_extension": b"\x0a\x00"}},
            _SPECS))
    ok = decode_read_rel(encode_message("ReadRel", {
        **base, "common": {"direct": b"", "hints": b"\x0a\x00"}},
        _SPECS))
    assert ok.table_names == ["t"]


def test_hypothesis_read_rel_round_trip():
    """Property fuzz: any (table path, column names, supported types)
    combination round-trips through the wire codec exactly — names
    byte-faithful (unicode included), types preserved for the public
    subset, None for unsupported — and decode never misclassifies a
    fuzzed payload as out-of-subset."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    types = st.sampled_from(
        ["boolean", "tinyint", "smallint", "int", "bigint", "float",
         "double", "string", "binary", "date", "timestamp",
         "timestamp_ntz", "decimal(12,2)", "decimal(38,0)"])
    names = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=1, max_size=24)

    @given(st.lists(names, min_size=1, max_size=4),
           st.lists(st.tuples(names, types), min_size=0, max_size=8))
    @settings(max_examples=200, deadline=None)
    def roundtrip(table_path, cols):
        data = encode_read_rel(table_path,
                               [c for c, _t in cols],
                               [t for _c, t in cols])
        v = decode_read_rel(data)
        assert v.table_names == table_path
        assert v.column_names == [c for c, _t in cols]
        assert v.column_types == [t for _c, t in cols]

    roundtrip()


def test_schema_bound_substrait_view_enforces(spark, tmp_path):
    """The reference ALWAYS writes schema_binding for Iceberg-served
    views (IcebergToOlympia.parseViewDef sets it whenever a schema is
    present): a substrait view bound to its creation-time schema keeps
    serving while the shape holds, and a STRUCTURAL drift of the
    underlying table refuses instead of silently changing the view's
    shape."""
    import pyspark.sql.types as T
    eng = _binpb_engine_with_view(
        spark, tmp_path, cols=["c_custkey", "c_mktsegment"],
        schema_binding=True)
    # stamp the bound schema the way the reference's ViewDef carries it
    ro = eng.catalog.begin(read_only=True)
    vdef = eng.catalog.describe_view(ro, "ref", "v")
    assert vdef.schema_binding
    bound = T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType())])
    import dataclasses
    txn = eng.catalog.begin()
    eng.catalog.create_view(
        txn, "ref", "v",
        dataclasses.replace(vdef, schema_json=bound.json()),
        replace=True)
    eng.catalog.commit(txn)
    assert eng.read_view("ref.v").count() > 0

    import glob as _glob
    import pytest as _pt
    from pyspark.sql import functions as F

    def _repoint(df, sub):
        d = str(tmp_path / sub)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = _glob.glob(f"{d}/part-*.parquet")[0]
        eng.sql("DROP TABLE ref.customer")
        eng.register_external_table("ref.customer", part)

    base = eng.read_table("ref.customer")
    # COMPATIBLE drift (the binding block's cast-back lane): c_custkey
    # narrows to INT under the table — int→bigint is losslessly
    # castable, so the bound view keeps serving WITH the bound LongType
    _repoint(base.withColumn("c_custkey",
                             F.col("c_custkey").cast("int")), "inted")
    got = eng.read_view("ref.v")
    assert dict(got.dtypes)["c_custkey"] == "bigint"
    assert got.count() > 0
    # INCOMPATIBLE type drift (the binding block's refusal lane — the
    # substrait base-schema name check passes, both names still exist):
    # c_custkey drifts to STRING, string→bigint is NOT lossless
    _repoint(base.withColumn("c_custkey",
                             F.col("c_custkey").cast("string")), "strd")
    with _pt.raises(ValueError, match="schema-bound"):
        eng.read_view("ref.v").count()
    # structural drift: a schema MISSING a bound column refuses too
    # (this one trips the substrait base-schema check, which runs
    # before the binding block — both layers must refuse, never serve)
    _repoint(base.select("c_custkey", "c_name"), "narrow")
    with _pt.raises(ValueError, match="c_mktsegment"):
        eng.read_view("ref.v").count()
