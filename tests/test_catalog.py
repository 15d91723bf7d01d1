"""Catalog API conformance — port of the reference's storage-parameterized
suite (core/src/test/java/org/format/olympia/OlympiaTests.java:34-396:
create/describe/alter/drop for namespaces/tables/views, cascade vs
restrict, already-exists / not-found errors, root-version assertions)."""

from __future__ import annotations

import json

import pytest

from olympia_spark.catalog import (Catalog, CatalogDef, ObjectAlreadyExistsError,
                                   ObjectNotFoundError, TableDef, ViewDef)
from olympia_spark.catalog.catalog import DropNamespaceBehavior
from olympia_spark.catalog.errors import NamespaceNotEmptyError


@pytest.fixture()
def cat(tmp_path) -> Catalog:
    return Catalog.create(str(tmp_path / "warehouse"))


def _tdef() -> TableDef:
    return TableDef(schema_json=json.dumps(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}]}))


def _commit(cat, txn):
    cat.commit(txn)


def test_create_and_exists(tmp_path):
    path = str(tmp_path / "w")
    assert not Catalog.exists(path)
    Catalog.create(path)
    assert Catalog.exists(path)
    with pytest.raises(ObjectAlreadyExistsError):
        Catalog.create(path)
    cat = Catalog.load(path)
    assert cat.catalog_def.order == 128


def test_namespace_crud(cat):
    txn = cat.begin()
    assert cat.show_namespaces(txn) == []
    assert not cat.namespace_exists(txn, "ns1")
    cat.create_namespace(txn, "ns1", {"owner": "me"})
    assert cat.namespace_exists(txn, "ns1")
    _commit(cat, txn)

    txn = cat.begin()
    assert cat.show_namespaces(txn) == ["ns1"]
    assert cat.describe_namespace(txn, "ns1").properties == {"owner": "me"}
    with pytest.raises(ObjectAlreadyExistsError):
        cat.create_namespace(txn, "ns1")
    with pytest.raises(ObjectNotFoundError):
        cat.describe_namespace(txn, "nope")


def test_namespace_properties(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1", {"a": "1"})
    _commit(cat, txn)
    txn = cat.begin()
    cat.set_namespace_properties(txn, "ns1", {"b": "2"})
    cat.unset_namespace_properties(txn, "ns1", ["a"])
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.describe_namespace(txn, "ns1").properties == {"b": "2"}


def test_drop_namespace_restrict_vs_cascade(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    cat.create_table(txn, "ns1", "t1", _tdef())
    _commit(cat, txn)

    txn = cat.begin()
    with pytest.raises(NamespaceNotEmptyError):
        cat.drop_namespace(txn, "ns1", DropNamespaceBehavior.RESTRICT)

    txn = cat.begin()
    cat.drop_namespace(txn, "ns1", DropNamespaceBehavior.CASCADE)
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.show_namespaces(txn) == []
    assert not cat.table_exists(txn, "ns1", "t1")


def test_table_crud(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    _commit(cat, txn)

    txn = cat.begin()
    with pytest.raises(ObjectNotFoundError):   # namespace must exist
        cat.create_table(txn, "nope", "t1", _tdef())
    txn = cat.begin()
    cat.create_table(txn, "ns1", "t1", _tdef())
    cat.create_table(txn, "ns1", "t2", _tdef())
    _commit(cat, txn)

    txn = cat.begin()
    assert cat.show_tables(txn, "ns1") == ["t1", "t2"]
    assert cat.table_exists(txn, "ns1", "t1")
    assert cat.describe_table(txn, "ns1", "t1").format == "PARQUET"
    with pytest.raises(ObjectAlreadyExistsError):
        cat.create_table(txn, "ns1", "t1", _tdef())
    with pytest.raises(ObjectNotFoundError):
        cat.describe_table(txn, "ns1", "nope")

    txn = cat.begin()
    td = cat.describe_table(txn, "ns1", "t1")
    td.properties["k"] = "v"
    cat.alter_table(txn, "ns1", "t1", td)
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.describe_table(txn, "ns1", "t1").properties == {"k": "v"}

    txn = cat.begin()
    cat.drop_table(txn, "ns1", "t2")
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.show_tables(txn, "ns1") == ["t1"]


def test_rename_table(cat):
    """A18 — not implemented in the reference
    (OlympiaIcebergCatalog.java:539-541); remove+insert in one txn."""
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    cat.create_namespace(txn, "ns2")
    cat.create_table(txn, "ns1", "t1", _tdef())
    _commit(cat, txn)

    txn = cat.begin()
    cat.rename_table(txn, "ns1", "t1", "ns2", "t1renamed")
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.show_tables(txn, "ns1") == []
    assert cat.show_tables(txn, "ns2") == ["t1renamed"]
    # def file survived the rename (same pointer)
    assert cat.describe_table(txn, "ns2", "t1renamed").format == "PARQUET"


def test_view_crud(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    cat.create_view(txn, "ns1", "v1",
                    ViewDef(sql_text="SELECT 1 AS one",
                            referenced_objects=[]))
    _commit(cat, txn)

    txn = cat.begin()
    assert cat.show_views(txn, "ns1") == ["v1"]
    assert cat.view_exists(txn, "ns1", "v1")
    assert cat.describe_view(txn, "ns1", "v1").sql_text == "SELECT 1 AS one"
    with pytest.raises(ObjectAlreadyExistsError):
        cat.create_view(txn, "ns1", "v1", ViewDef(sql_text="x"))

    txn = cat.begin()
    cat.replace_view(txn, "ns1", "v1", ViewDef(sql_text="SELECT 2 AS two"))
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.describe_view(txn, "ns1", "v1").sql_text == "SELECT 2 AS two"

    txn = cat.begin()
    cat.drop_view(txn, "ns1", "v1")
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.show_views(txn, "ns1") == []
    with pytest.raises(ObjectNotFoundError):
        cat.describe_view(txn, "ns1", "v1")


def test_tables_and_views_share_namespace_but_not_names(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    cat.create_table(txn, "ns1", "x", _tdef())
    cat.create_view(txn, "ns1", "x", ViewDef(sql_text="SELECT 1 AS a"))
    _commit(cat, txn)
    txn = cat.begin()
    assert cat.show_tables(txn, "ns1") == ["x"]
    assert cat.show_views(txn, "ns1") == ["x"]


def test_root_version_advances_per_commit(cat):
    """assertTreeRoot analogue (reference OlympiaTests.java:370-379)."""
    assert cat.tree.find_latest_version() == 0
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    _commit(cat, txn)
    assert cat.tree.find_latest_version() == 1
    txn = cat.begin()
    cat.create_table(txn, "ns1", "t1", _tdef())
    _commit(cat, txn)
    assert cat.tree.find_latest_version() == 2
    history = cat.history()
    assert [h["version"] for h in history] == [2, 1, 0]


def test_multi_statement_transaction_is_atomic(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    cat.create_table(txn, "ns1", "t1", _tdef())
    cat.create_table(txn, "ns1", "t2", _tdef())
    # nothing visible before commit
    other = cat.begin()
    assert cat.show_namespaces(other) == []
    _commit(cat, txn)
    # one commit → one version for all three objects
    assert cat.tree.find_latest_version() == 1
    txn2 = cat.begin()
    assert cat.show_tables(txn2, "ns1") == ["t1", "t2"]


def test_actions_recorded_and_persisted(cat):
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    cat.create_table(txn, "ns1", "t1", _tdef())
    _commit(cat, txn)
    root = cat.tree.load_latest_root()
    kinds = [__import__("json").loads(v)["type"] for _, v in root.actions]
    assert "NAMESPACE_CREATE" in kinds and "TABLE_CREATE" in kinds


def test_many_objects_scale_smoke(tmp_path):
    """>order-1 objects: tree splits under catalog load, everything stays
    findable (the 'millions of objects' design claim in miniature)."""
    cat = Catalog.create(str(tmp_path / "w"),
                         CatalogDef(order=8))
    txn = cat.begin()
    cat.create_namespace(txn, "ns1")
    for i in range(60):
        cat.create_table(txn, "ns1", f"t{i:03d}", _tdef())
    cat.commit(txn)
    txn = cat.begin()
    assert len(cat.show_tables(txn, "ns1")) == 60
    assert cat.table_exists(txn, "ns1", "t042")
