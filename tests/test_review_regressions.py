"""Regression tests for the round-1 self-review findings — each of these
was a real latent bug (silent DML corruption, catalog wipe after expiry,
literal corruption, API contract breaks)."""

from __future__ import annotations

import pytest

from olympia_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path) -> Engine:
    eng = Engine(spark, str(tmp_path / "warehouse"))
    eng.sql("CREATE NAMESPACE ns1")
    return eng


def test_delete_with_or_predicate_not_pruned_wrong(engine, spark):
    """OR predicates must disable stats pruning: file B (ids 90..110)
    doesn't satisfy id=1, but its id=100 row must still be deleted."""
    engine.sql("CREATE TABLE ns1.t (id BIGINT)")
    engine.write_table(spark.range(1, 51).coalesce(1), "ns1.t")
    engine.write_table(spark.range(90, 111).coalesce(1), "ns1.t")
    engine.sql("DELETE FROM ns1.t WHERE id = 1 OR id = 100")
    ids = {r.id for r in engine.sql("SELECT id FROM ns1.t").collect()}
    assert 1 not in ids and 100 not in ids
    assert len(ids) == 50 + 21 - 2


def test_delete_with_not_predicate(engine, spark):
    engine.sql("CREATE TABLE ns1.t (id BIGINT)")
    engine.write_table(spark.range(0, 10).coalesce(1), "ns1.t")
    engine.write_table(spark.range(10, 20).coalesce(1), "ns1.t")
    engine.sql("DELETE FROM ns1.t WHERE NOT (id = 5)")
    ids = [r.id for r in engine.sql("SELECT id FROM ns1.t").collect()]
    assert ids == [5]


def test_update_simultaneous_assignment_swaps(engine):
    engine.sql("CREATE TABLE ns1.s (a BIGINT, b BIGINT)")
    engine.sql("INSERT INTO ns1.s VALUES (1, 2)")
    engine.sql("UPDATE ns1.s SET a = b, b = a")
    row = engine.sql("SELECT a, b FROM ns1.s").first()
    assert (row.a, row.b) == (2, 1)


def test_string_literal_whitespace_preserved(engine):
    engine.sql("CREATE TABLE ns1.w (v STRING)")
    engine.sql("INSERT INTO ns1.w VALUES ('a  b')")
    assert engine.sql("SELECT v FROM ns1.w").first().v == "a  b"
    assert engine.sql("SELECT COUNT(*) AS n FROM ns1.w "
                      "WHERE v = 'a  b'").first().n == 1


def test_create_table_if_not_exists_idempotent(engine):
    engine.sql("CREATE TABLE ns1.i (x BIGINT)")
    engine.sql("INSERT INTO ns1.i VALUES (1)")
    engine.sql("CREATE TABLE IF NOT EXISTS ns1.i (x BIGINT)")  # no-op
    assert engine.sql("SELECT COUNT(*) AS n FROM ns1.i").first().n == 1


def test_reopen_after_expire_versions(engine, spark):
    """Expiring v0 must not make a fresh Engine re-create an empty
    catalog over the live warehouse."""
    engine.sql("CREATE TABLE ns1.t (id BIGINT)")
    for i in range(4):
        engine.sql(f"INSERT INTO ns1.t VALUES ({i})")
    engine.expire_versions(keep_last=2)
    reopened = Engine(spark, engine.catalog.storage.root)
    assert reopened.sql("SELECT COUNT(*) AS n FROM ns1.t").first().n == 4
    # history stops cleanly at the expiration horizon instead of crashing
    assert len(reopened.catalog.history()) >= 1
    assert reopened.sql("SELECT COUNT(*) AS n FROM ns1.t$history").first().n \
        >= 1


def test_begin_dist_returns_usable_id(engine, spark):
    engine.sql("BEGIN")
    engine.sql("CREATE TABLE ns1.d (x BIGINT)")
    tid = engine.begin_dist()
    assert tid == engine.current_txn.id
    engine.rollback()
    other = Engine(spark, engine.catalog.storage.root)
    other.resume_dist(tid)                  # must accept the return value
    other.sql("COMMIT")
    assert "d" in [r.table for r in
                   other.sql("SHOW TABLES IN ns1").collect()]


def test_orphan_gc_protects_pending_dist_txn_files(engine):
    engine.sql("CREATE TABLE ns1.p (x BIGINT)")
    engine.sql("BEGIN")
    engine.sql("INSERT INTO ns1.p VALUES (1), (2)")   # files written, not
    tid = engine.begin_dist()                         # in any version root
    engine.rollback()
    removed = engine.remove_orphan_files()
    assert removed == []                    # pending files are NOT orphans
    engine.resume_dist(tid)
    engine.sql("COMMIT")
    assert engine.sql("SELECT COUNT(*) AS n FROM ns1.p").first().n == 2


def test_s3_warehouse_rejected_loudly():
    with pytest.raises(NotImplementedError):
        Engine(None, "s3://bucket/warehouse")
