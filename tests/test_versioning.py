"""Catalog versioning: time travel (A27/A28), history (A29), roll-forward
rollback (A30), snapshot export (A31)."""

from __future__ import annotations

import json
import time

import pytest

from olympia_spark.catalog import Catalog, TableDef
from olympia_spark.catalog.errors import TransactionValueError
from olympia_spark.catalog.storage import LocalStorage


def _tdef() -> TableDef:
    return TableDef(schema_json=json.dumps(
        {"type": "struct", "fields": []}))


@pytest.fixture()
def cat(tmp_path) -> Catalog:
    c = Catalog.create(str(tmp_path / "w"))
    for i in range(3):                 # versions 1..3
        txn = c.begin()
        c.create_namespace(txn, f"ns{i}")
        c.commit(txn)
    return c


def test_at_version(cat):
    snap = cat.at_version(1)
    assert cat.show_namespaces(snap) == ["ns0"]
    snap = cat.at_version(3)
    assert cat.show_namespaces(snap) == ["ns0", "ns1", "ns2"]
    snap = cat.at_version(0)
    assert cat.show_namespaces(snap) == []
    with pytest.raises(TransactionValueError):
        cat.at_version(99)


def test_at_version_is_read_only(cat):
    snap = cat.at_version(1)
    with pytest.raises(TransactionValueError):
        cat.create_namespace(snap, "nope")


def test_before_timestamp(cat):
    now = int(time.time() * 1000)
    snap = cat.before_timestamp(now + 60_000)
    assert len(cat.show_namespaces(snap)) == 3   # latest qualifies
    # every root was created after epoch 1 → no root before it
    with pytest.raises(TransactionValueError):
        cat.before_timestamp(1)


def test_history_chain(cat):
    h = cat.history()
    assert [e["version"] for e in h] == [3, 2, 1, 0]
    assert all(e["rollback_from"] is None for e in h)


def test_rollback_is_roll_forward(cat):
    """docs/format.md 'Catalog Rollback': rolling back to v1 commits v4
    that equals v1, with rollback_from_root marking the abandoned head."""
    root = cat.rollback_to(1)
    assert root.version == 4
    txn = cat.begin()
    assert cat.show_namespaces(txn) == ["ns0"]
    h = cat.history()
    assert h[0]["version"] == 4
    assert h[0]["rollback_from"] is not None
    # old head still readable (nothing was deleted)
    snap = cat.at_version(3)
    assert len(cat.show_namespaces(snap)) == 3


def test_commit_after_rollback_continues_chain(cat):
    cat.rollback_to(1)
    txn = cat.begin()
    cat.create_namespace(txn, "after")
    cat.commit(txn)
    assert cat.tree.find_latest_version() == 5
    txn = cat.begin()
    assert cat.show_namespaces(txn) == ["after", "ns0"]


@pytest.mark.parametrize("mode", ["minimal", "partial", "full"])
def test_export_snapshot_modes(cat, tmp_path, mode):
    dest = LocalStorage(str(tmp_path / f"export_{mode}"))
    root_path = cat.export_snapshot(f"snap_{mode}", dest, mode=mode)
    assert dest.exists(root_path)                      # root always copied
    has_defs = any(p.startswith("def/ns") for p in dest.list("def/"))
    assert has_defs == (mode == "full")
    # export recorded on the catalog definition (proto/objects.proto:50)
    reloaded = Catalog.load(cat.storage.root)
    assert reloaded.catalog_def.exported_snapshots[f"snap_{mode}"] == root_path


def test_export_minimal_is_loadable_catalog_root(cat, tmp_path):
    """A minimal export's root still parses; its pointers reference the
    source prefix per spec (retention at the source keeps them live)."""
    dest = LocalStorage(str(tmp_path / "exp"))
    root_path = cat.export_snapshot("m", dest, mode="minimal")
    from olympia_spark.catalog.tree import Tree
    t = Tree(dest)
    root = t.load_root(root_path)
    assert root.catalog_def_path.startswith("def/catalog/")


def test_export_full_opens_as_working_catalog(cat, tmp_path):
    """The 'import' side of A31: a FULL export (root + nodes + defs) must
    open as a functioning catalog at the destination prefix — reads,
    descriptions, and NEW commits all work, with no reference back to the
    source for metadata."""
    txn = cat.begin()
    cat.create_table(txn, "ns0", "t", _tdef())
    cat.commit(txn)
    dest = LocalStorage(str(tmp_path / "full_copy"))
    cat.export_snapshot("f", dest, mode="full")
    c2 = Catalog.load(dest.root)
    txn2 = c2.begin()
    assert c2.show_namespaces(txn2) == ["ns0", "ns1", "ns2"]
    assert c2.table_exists(txn2, "ns0", "t")
    # the copy is independently writable — a commit at the destination
    # must not touch the source
    src_version = cat.tree.find_latest_version()
    txn3 = c2.begin()
    c2.create_namespace(txn3, "dest_only")
    c2.commit(txn3)
    assert c2.show_namespaces(c2.begin()) == [
        "dest_only", "ns0", "ns1", "ns2"]
    assert cat.tree.find_latest_version() == src_version
    assert "dest_only" not in cat.show_namespaces(cat.begin())


def test_second_export_repoints_latest_hint(cat, tmp_path):
    """Review r4: the destination's latest hint must follow the newest
    export — a put-if-absent hint would silently leave the new root
    invisible and the catalog opening at the OLD version."""
    dest = LocalStorage(str(tmp_path / "redo"))
    cat.export_snapshot("first", dest, mode="full")
    txn = cat.begin()
    cat.create_namespace(txn, "later")
    cat.commit(txn)
    cat.export_snapshot("second", dest, mode="full")
    c2 = Catalog.load(dest.root)
    assert "later" in c2.show_namespaces(c2.begin())


def test_export_older_version_does_not_regress_latest_hint(cat, tmp_path):
    """ADVICE r4: exporting an OLDER version to a destination that already
    holds a newer export must not move the latest hint backwards — dest
    roots are sparse, so the upward probe from a regressed hint stops at
    the first gap and the newer export silently vanishes."""
    dest = LocalStorage(str(tmp_path / "mix"))
    cat.export_snapshot("newer", dest, mode="full")            # version 3
    cat.export_snapshot("older", dest, mode="full", version=1)
    c2 = Catalog.load(dest.root)
    ns = c2.show_namespaces(c2.begin())
    assert "ns2" in ns            # still opens at version 3, not 1


def test_tags_lifecycle_and_time_travel(spark, tmp_path):
    """Catalog-wide tags: create/resolve/list/drop, VERSION AS OF '<tag>'
    SQL, replace semantics, expiry protection, and orphan-GC safety."""
    import pytest

    from olympia_spark.catalog import locations as loc
    from olympia_spark.catalog.errors import ObjectNotFoundError
    from olympia_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT)")
    eng.sql("INSERT INTO ns1.t VALUES (1)")
    v_tagged = eng.sql("CREATE TAG stable").first().version
    eng.sql("INSERT INTO ns1.t VALUES (2), (3)")
    # tag resolves to the pinned snapshot, catalog-wide
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.t "
                   "VERSION AS OF 'stable'").first().n == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.t").first().n == 3
    tags = {r.tag: r.version for r in eng.sql("SHOW TAGS").collect()}
    assert tags == {"stable": v_tagged}
    with pytest.raises(ValueError, match="already exists"):
        eng.catalog.create_tag("stable")
    eng.sql("CREATE OR REPLACE TAG stable")       # repoint to latest
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.t "
                   "VERSION AS OF 'stable'").first().n == 3
    # a second tag pinned to the OLD version survives expire_versions
    eng.catalog.create_tag("v_old", version=v_tagged)
    for i in range(5):
        eng.sql(f"INSERT INTO ns1.t VALUES ({10 + i})")
    eng.expire_versions(keep_last=2)
    assert eng.catalog.storage.exists(loc.root_node_path(v_tagged))
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.t "
                   "VERSION AS OF 'v_old'").first().n == 1
    # ... and its data files survive VACUUM even off the truncated chain
    eng.remove_orphan_files()
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.t "
                   "VERSION AS OF 'v_old'").first().n == 1
    # drop removes resolution; unprotected expiry then collects the root
    eng.sql("DROP TAG v_old")
    with pytest.raises(ObjectNotFoundError):
        eng.catalog.resolve_tag("v_old")
    with pytest.raises(ValueError, match="does not exist|expired"):
        eng.catalog.create_tag("bad", version=99)


def test_tag_commit_failure_rolls_back_memory(spark, tmp_path):
    """Round-6 ADVICE: a failed/conflicting tag commit must leave the
    in-memory CatalogDef (and def-path cursor) equal to durable state —
    no phantom tag, no advanced def pointer, and the next attempt works."""
    from olympia_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT)")
    eng.sql("INSERT INTO ns1.t VALUES (1)")
    cat = eng.catalog
    path_before = cat.catalog_def_path
    props_before = dict(cat.catalog_def.properties)

    real_commit = cat.commit

    def boom(txn):
        raise RuntimeError("injected commit failure")

    cat.commit = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            cat.create_tag("ghost")
    finally:
        cat.commit = real_commit
    assert cat.catalog_def.properties == props_before
    assert cat.catalog_def_path == path_before
    assert "ghost" not in cat.list_tags()
    # durable state agrees: a fresh engine sees no tag either
    eng2 = Engine(spark, str(tmp_path / "wh"))
    assert "ghost" not in eng2.catalog.list_tags()
    # drop_tag failure likewise keeps the tag visible
    v = cat.create_tag("kept")
    cat.commit = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            cat.drop_tag("kept")
    finally:
        cat.commit = real_commit
    assert cat.list_tags() == {"kept": v}
    cat.drop_tag("kept")
    assert cat.list_tags() == {}
