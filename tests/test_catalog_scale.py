"""Catalog-at-scale proof (reference claim: point lookups stay O(log n)
node-file reads up to millions of objects, docs/index.md:16-19). Asserted
on STORAGE-READ COUNTERS, not wall-clock — the property that survives a
slow disk is the I/O bound, not a timing."""

from __future__ import annotations

import math

from olympia_spark.catalog import locations as loc
from olympia_spark.catalog.storage import LocalStorage
from olympia_spark.catalog.tree import RootNode, Tree
from olympia_spark.engine import Engine


def _count_reads(storage):
    """Wrap storage.read with a call counter (returned dict mutates)."""
    counter = {"n": 0}
    orig = storage.read

    def read(path):
        counter["n"] += 1
        return orig(path)

    storage.read = read
    return counter


def test_point_lookup_reads_log_files_at_10k_keys(tmp_path):
    """A 10⁴-key order-128 tree is 2 levels; every point lookup must read
    ≤ 1+⌈log₁₂₈ n⌉ node files (root + one per level), independent of n."""
    n = 10_000
    tree = Tree(LocalStorage(str(tmp_path)), order=128)
    root = RootNode(catalog_def_path="def/catalog/x.json", dirty=True)
    for i in range(n):
        tree.set_value(root, f"key{i:05d}", f"val{i}")
    tree.write_root(root, 0)
    bound = 1 + math.ceil(math.log(n, 128))          # = 3
    counter = _count_reads(tree.storage)
    for i in (0, 1, 4_999, 5_000, 9_998, 9_999):     # edges + middle
        counter["n"] = 0
        fresh = tree.load_root(loc.root_node_path(0))   # cold cache
        assert tree.search(fresh, f"key{i:05d}") == f"val{i}"
        assert counter["n"] <= bound, (i, counter["n"])
    # absent keys obey the same bound (descend to one leaf, miss)
    counter["n"] = 0
    fresh = tree.load_root(loc.root_node_path(0))
    assert tree.search(fresh, "key99999x") is None
    assert counter["n"] <= bound


def test_engine_sql_read_count_flat_vs_catalog_size(spark, tmp_path):
    """Resolving + running the same point SELECT must cost the same number
    of storage reads on a 240-table catalog (multi-level tree) as on a
    12-table one, up to one extra read per extra tree level — never
    O(catalog size)."""
    def build(n_tables: int) -> Engine:
        eng = Engine(spark, str(tmp_path / f"wh{n_tables}"))
        eng.sql("CREATE NAMESPACE ns1")
        for i in range(n_tables):
            eng.sql(f"CREATE TABLE ns1.t{i:04d} (x BIGINT)")
        eng.sql("INSERT INTO ns1.t0000 VALUES (1), (2)")
        return eng

    def reads_for_select(eng: Engine) -> int:
        counter = _count_reads(eng.catalog.storage)
        assert eng.sql(
            "SELECT COUNT(*) AS n FROM ns1.t0000").first().n == 2
        return counter["n"]

    small, big = build(12), build(240)
    r_small, r_big = reads_for_select(small), reads_for_select(big)
    # 240 catalog objects with order 128 = one extra tree level at most;
    # allow 2 extra reads of slack (level + a hint probe), nothing near
    # the 20× object-count ratio a linear scan would show
    assert r_big <= r_small + 2, (r_small, r_big)


def test_10k_key_lookup_get_counts_on_s3():
    """Moto contract for the object-store catalog at depth ≥ 2
    (round-7 VERDICT item #6; reference claim docs/index.md:16-19):
    a point lookup on a 10k-key 2-level tree costs at most
    1 (root) + 2 (levels) GETs COLD, and the node levels cost ZERO GETs
    warm — the A42 read-local cache serves immutable node files, only
    the (deliberately uncached) root object is re-fetched."""
    import os
    import shutil
    import uuid

    import pytest

    try:
        import boto3
        from moto import mock_aws
    except ImportError:                  # pragma: no cover
        pytest.skip("moto not installed")

    from olympia_spark.catalog.storage import S3Storage

    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    with mock_aws():
        bucket = f"cat10k-{uuid.uuid4().hex[:10]}"
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=bucket)

        class Counting:
            def __init__(self, inner):
                self._inner = inner
                self.gets = 0

            def get_object(self, **kw):
                self.gets += 1
                return self._inner.get_object(**kw)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        counting = Counting(client)
        storage = S3Storage(bucket, "cat", client=counting)
        shutil.rmtree(storage.cache_dir, ignore_errors=True)
        tree = Tree(storage, order=128)
        root = RootNode(catalog_def_path="def/catalog/x.json", dirty=True)
        n = 10_000
        for i in range(n):
            tree.set_value(root, f"key{i:05d}", f"val{i}")
        tree.write_root(root, 0)

        # COLD: a fresh machine (empty read-local cache)
        shutil.rmtree(storage.cache_dir, ignore_errors=True)
        counting.gets = 0
        fresh = tree.load_root(loc.root_node_path(0))
        assert tree.search(fresh, "key05000") == "val5000"
        assert counting.gets <= 3, counting.gets   # root + ≤2 node levels

        # WARM, same leaf: node files cached — only the root re-fetches
        counting.gets = 0
        fresh = tree.load_root(loc.root_node_path(0))
        assert tree.search(fresh, "key05001") == "val5001"
        assert counting.gets <= 1, counting.gets

        # WARM with the root in hand: zero GETs
        counting.gets = 0
        assert tree.search(fresh, "key05002") == "val5002"
        assert counting.gets == 0, counting.gets

        # a DIFFERENT leaf path warms with ≤ 2 node GETs beyond the root
        counting.gets = 0
        fresh = tree.load_root(loc.root_node_path(0))
        assert tree.search(fresh, "key09999") == "val9999"
        assert counting.gets <= 3, counting.gets


def test_point_lookup_and_dirty_path_commit_at_1m_keys(tmp_path):
    """The reference's core scale claim pinned at 10⁶ objects
    (docs/index.md:16-19; r9 VERDICT #3): an order-128 tree holding 1M
    keys is 3 levels —
    * every point lookup reads ≤ 1+⌈log₁₂₈ n⌉ = 4 node files (root +
      one per level), pinned on STORAGE-READ COUNTERS at the edges and
      middle of the key space;
    * a single-key commit WRITES only the root→leaf dirty path (4 node
      files), never a proportional rewrite — the property that makes a
      billion-object catalog updatable.
    ~1 min: the 10⁶ set_value build dominates; the assertions are I/O
    counters, not timings."""
    n = 1_000_000
    storage = LocalStorage(str(tmp_path))
    tree = Tree(storage, order=128)
    root = RootNode(catalog_def_path="def/catalog/x.json", dirty=True)
    for i in range(n):
        tree.set_value(root, f"key{i:07d}", f"val{i}")
    tree.write_root(root, 0)
    bound = 1 + math.ceil(math.log(n, 128))          # = 4
    counter = _count_reads(storage)
    for i in (0, 1, 499_999, 500_000, 999_998, 999_999):
        counter["n"] = 0
        fresh = tree.load_root(loc.root_node_path(0))   # cold cache
        assert tree.search(fresh, f"key{i:07d}") == f"val{i}"
        assert counter["n"] <= bound, (i, counter["n"])
    counter["n"] = 0
    fresh = tree.load_root(loc.root_node_path(0))
    assert tree.search(fresh, "key9999999x") is None
    assert counter["n"] <= bound
    # single-key commit: count node WRITES — must be the dirty path
    # (leaf + 2 internal + root = 4), not O(n/order) leaves
    fresh = tree.load_root(loc.root_node_path(0))
    wcount = {"n": 0}
    orig_w = storage.write_atomic

    def write_atomic(path, data):
        wcount["n"] += 1
        return orig_w(path, data)

    storage.write_atomic = write_atomic
    tree.set_value(fresh, "key0500000", "UPDATED")
    tree.write_root(fresh, 1)
    assert wcount["n"] <= bound, wcount["n"]
    # and the update is visible through the new root at the same read bound
    counter["n"] = 0
    fresh2 = tree.load_root(loc.root_node_path(1))
    assert tree.search(fresh2, "key0500000") == "UPDATED"
    assert counter["n"] <= bound
