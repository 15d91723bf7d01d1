"""Transaction semantics: optimistic CAS, conflict matrix, snapshot
isolation, SERIALIZABLE read-write conflicts, distributed resume —
the contention coverage SURVEY §5 calls out as the reference's weak spot."""

from __future__ import annotations

import json

import pytest

from olympia_spark.catalog import (Catalog, CommitConflictError, TableDef)
from olympia_spark.catalog.actions import (NO_CONFLICT, RESOLVABLE,
                                           UNRESOLVABLE, Action, ActionType,
                                           analyze)
from olympia_spark.catalog.defs import DataFile, ISOLATION_SERIALIZABLE


@pytest.fixture()
def cat(tmp_path) -> Catalog:
    c = Catalog.create(str(tmp_path / "w"))
    txn = c.begin()
    c.create_namespace(txn, "ns1")
    c.create_table(txn, "ns1", "t1", _tdef())
    c.commit(txn)
    return c


def _tdef() -> TableDef:
    return TableDef(schema_json=json.dumps(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}}]}))


# --- conflict matrix unit tests (AnalyzeActionConflicts.java:82-353) --------

K = "C===k"


@pytest.mark.parametrize("committed,pending,verdict", [
    (ActionType.TABLE_INSERT, ActionType.TABLE_INSERT, RESOLVABLE),
    (ActionType.TABLE_INSERT, ActionType.TABLE_UPDATE, RESOLVABLE),
    (ActionType.TABLE_INSERT, ActionType.TABLE_ALTER, RESOLVABLE),
    (ActionType.TABLE_UPDATE, ActionType.TABLE_INSERT, UNRESOLVABLE),
    (ActionType.TABLE_UPDATE, ActionType.TABLE_DELETE, UNRESOLVABLE),
    (ActionType.TABLE_DELETE, ActionType.TABLE_INSERT, RESOLVABLE),
    (ActionType.TABLE_ALTER, ActionType.TABLE_ALTER, UNRESOLVABLE),
    (ActionType.TABLE_ALTER_ADD_COLUMNS, ActionType.TABLE_ALTER,
     UNRESOLVABLE),
    (ActionType.TABLE_DROP, ActionType.TABLE_INSERT, UNRESOLVABLE),
    (ActionType.TABLE_DROP, ActionType.TABLE_ALTER, UNRESOLVABLE),
    (ActionType.TABLE_CREATE, ActionType.TABLE_CREATE, UNRESOLVABLE),
    (ActionType.NAMESPACE_CREATE, ActionType.NAMESPACE_CREATE, UNRESOLVABLE),
    (ActionType.NAMESPACE_ALTER, ActionType.NAMESPACE_ALTER, UNRESOLVABLE),
    (ActionType.VIEW_DROP, ActionType.VIEW_REPLACE, UNRESOLVABLE),
    (ActionType.TABLE_SELECT, ActionType.TABLE_INSERT, NO_CONFLICT),
    (ActionType.TABLE_INSERT, ActionType.TABLE_SELECT, NO_CONFLICT),
])
def test_conflict_matrix_snapshot(committed, pending, verdict):
    assert analyze(Action(pending, K), Action(committed, K),
                   "SNAPSHOT") == verdict


def test_conflict_matrix_different_keys_never_conflict():
    a = Action(ActionType.TABLE_ALTER, "C===a")
    b = Action(ActionType.TABLE_ALTER, "C===b")
    assert analyze(a, b, "SNAPSHOT") == NO_CONFLICT


def test_serializable_read_write_conflict():
    """SURVEY §2 A32: under SERIALIZABLE a committed write invalidates a
    pending read of the same table (left TODO in the reference)."""
    read = Action(ActionType.TABLE_SELECT, K)
    write = Action(ActionType.TABLE_INSERT, K)
    assert analyze(read, write, "SNAPSHOT") == NO_CONFLICT
    assert analyze(read, write, ISOLATION_SERIALIZABLE) == UNRESOLVABLE


# --- CAS loop end-to-end -----------------------------------------------------

def test_concurrent_inserts_merge_file_lists(cat):
    """INSERT ∥ INSERT on one table is resolvable: the loser's retry
    recomputes the def from current state and both file sets survive
    (docs/format.md "Catalog Commit Conflict Resolution")."""
    t1 = cat.begin()
    t2 = cat.begin()
    cat.update_table_files(t1, "ns1", "t1", [DataFile(path="data/a.parquet")],
                          [], ActionType.TABLE_INSERT)
    cat.update_table_files(t2, "ns1", "t1", [DataFile(path="data/b.parquet")],
                          [], ActionType.TABLE_INSERT)
    cat.commit(t1)
    cat.commit(t2)          # loses CAS, resolves, rolls forward
    txn = cat.begin()
    files = {f.path for f in cat.describe_table(txn, "ns1", "t1").data_files}
    assert files == {"data/a.parquet", "data/b.parquet"}
    assert cat.tree.find_latest_version() == 3   # two separate commits


def test_concurrent_alter_alter_is_unresolvable(cat):
    t1 = cat.begin()
    t2 = cat.begin()
    d1 = cat.describe_table(t1, "ns1", "t1")
    d1.properties["a"] = "1"
    cat.alter_table(t1, "ns1", "t1", d1)
    d2 = cat.describe_table(t2, "ns1", "t1")
    d2.properties["b"] = "2"
    cat.alter_table(t2, "ns1", "t1", d2)
    cat.commit(t1)
    with pytest.raises(CommitConflictError):
        cat.commit(t2)


def test_concurrent_drop_vs_insert_is_unresolvable(cat):
    t1 = cat.begin()
    t2 = cat.begin()
    cat.drop_table(t1, "ns1", "t1")
    cat.update_table_files(t2, "ns1", "t1", [DataFile(path="data/x.parquet")],
                          [], ActionType.TABLE_INSERT)
    cat.commit(t1)
    with pytest.raises(CommitConflictError):
        cat.commit(t2)


def test_concurrent_creates_different_objects_both_land(cat):
    t1 = cat.begin()
    t2 = cat.begin()
    cat.create_table(t1, "ns1", "left", _tdef())
    cat.create_table(t2, "ns1", "right", _tdef())
    cat.commit(t1)
    cat.commit(t2)          # no conflict — replays onto new root
    txn = cat.begin()
    assert set(cat.show_tables(txn, "ns1")) == {"left", "right", "t1"}


def test_serializable_txn_read_then_concurrent_write_aborts(cat):
    t1 = cat.begin(isolation_level=ISOLATION_SERIALIZABLE)
    # t1 reads t1's def (records TABLE_SELECT-ish read), then writes ns prop
    cat.describe_table(t1, "ns1", "t1")
    t1.record_read(Action(ActionType.TABLE_SELECT,
                          cat._tbl_key("ns1", "t1")))
    cat.create_table(t1, "ns1", "t_new", _tdef())
    # concurrent writer inserts into the table t1 read
    t2 = cat.begin()
    cat.update_table_files(t2, "ns1", "t1", [DataFile(path="data/z.parquet")],
                          [], ActionType.TABLE_INSERT)
    cat.commit(t2)
    with pytest.raises(CommitConflictError):
        cat.commit(t1)


def test_snapshot_isolation_reader_sees_begin_state(cat):
    reader = cat.begin()
    writer = cat.begin()
    cat.create_table(writer, "ns1", "t_late", _tdef())
    cat.commit(writer)
    # reader still sees its beginning snapshot
    assert cat.show_tables(reader, "ns1") == ["t1"]
    fresh = cat.begin()
    assert set(cat.show_tables(fresh, "ns1")) == {"t1", "t_late"}


def test_rollback_is_discard(cat):
    txn = cat.begin()
    cat.create_table(txn, "ns1", "tx", _tdef())
    del txn                  # ROLLBACK = discard in-memory transaction
    fresh = cat.begin()
    assert cat.show_tables(fresh, "ns1") == ["t1"]


def test_commit_twice_rejected(cat):
    txn = cat.begin()
    cat.create_table(txn, "ns1", "t2", _tdef())
    cat.commit(txn)
    from olympia_spark.catalog.errors import TransactionValueError
    with pytest.raises(TransactionValueError):
        cat.commit(txn)


def test_expired_ttl_rejected(cat):
    txn = cat.begin(ttl_millis=1)
    cat.create_table(txn, "ns1", "t2", _tdef())
    import time
    time.sleep(0.01)
    from olympia_spark.catalog.errors import TransactionValueError
    with pytest.raises(TransactionValueError):
        cat.commit(txn)


# --- distributed transactions (A5) ------------------------------------------

def test_dist_transaction_save_load_commit(cat):
    txn = cat.begin()
    cat.update_table_files(txn, "ns1", "t1",
                          [DataFile(path="data/d1.parquet")], [],
                          ActionType.TABLE_INSERT)
    path = cat.save_dist_transaction(txn)
    assert cat.dist_transaction_exists(txn.id)
    assert txn.id in cat.list_dist_transactions()
    assert path.startswith("def/dtxn/")

    # "another process": reload catalog + txn from storage
    cat2 = Catalog.load(cat.storage.root)
    resumed = cat2.load_dist_transaction(txn.id)
    assert resumed.id == txn.id
    cat2.commit(resumed)
    check = cat2.begin()
    files = {f.path for f in
             cat2.describe_table(check, "ns1", "t1").data_files}
    assert files == {"data/d1.parquet"}


def test_dist_transaction_resume_survives_cas_loss(cat):
    txn = cat.begin()
    cat.update_table_files(txn, "ns1", "t1",
                          [DataFile(path="data/mine.parquet")], [],
                          ActionType.TABLE_INSERT)
    cat.save_dist_transaction(txn)

    # a competing commit lands before the resumed txn commits
    other = cat.begin()
    cat.update_table_files(other, "ns1", "t1",
                          [DataFile(path="data/theirs.parquet")], [],
                          ActionType.TABLE_INSERT)
    cat.commit(other)

    cat2 = Catalog.load(cat.storage.root)
    resumed = cat2.load_dist_transaction(txn.id)
    cat2.commit(resumed)     # payload replay merges the file lists
    check = cat2.begin()
    files = {f.path for f in
             cat2.describe_table(check, "ns1", "t1").data_files}
    assert files == {"data/mine.parquet", "data/theirs.parquet"}
