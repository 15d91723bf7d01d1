"""Tree kernel tests (reference TestTreeOperations / TestNodeRowMerger /
TestTreeUtil) + a hypothesis property test against a dict model — the
randomized coverage the reference lacks (SURVEY §5)."""

from __future__ import annotations

import pyarrow.ipc as pa_ipc
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from olympia_spark.catalog import locations as loc
from olympia_spark.catalog.storage import LocalStorage
from olympia_spark.catalog.tree import RootNode, Tree


@pytest.fixture()
def tree(tmp_path):
    return Tree(LocalStorage(str(tmp_path)), order=128)


def _fresh_root() -> RootNode:
    return RootNode(catalog_def_path="def/catalog/x.json", dirty=True)


def test_empty_root_roundtrip(tree):
    root = _fresh_root()
    tree.write_root(root, 0)
    loaded = tree.load_root(loc.root_node_path(0))
    assert loaded.catalog_def_path == "def/catalog/x.json"
    assert loaded.entries == []
    assert list(tree.traverse(loaded)) == []


def test_node_file_is_arrow_ipc_with_3_varchar_columns(tree):
    root = _fresh_root()
    tree.set_value(root, "k1", "v1")
    tree.write_root(root, 0)
    raw = tree.storage.read(loc.root_node_path(0))
    import io
    table = pa_ipc.open_file(io.BytesIO(raw)).read_all()
    assert table.schema.names == ["key", "value", "pnode"]
    assert all(str(f.type) == "string" for f in table.schema)
    keys = table.column(0).to_pylist()
    # system rows, then the NULL pivot row, then k1
    assert loc.CREATED_AT_MILLIS in keys and loc.NUMBER_OF_KEYS in keys
    assert None in keys and "k1" in keys


def test_set_search_remove(tree):
    root = _fresh_root()
    tree.set_value(root, "b", "2")
    tree.set_value(root, "a", "1")
    tree.set_value(root, "c", "3")
    assert tree.search(root, "a") == "1"
    assert tree.search(root, "b") == "2"
    assert tree.search(root, "missing") is None
    tree.set_value(root, "b", "2x")            # in-place update
    assert tree.search(root, "b") == "2x"
    tree.remove_key(root, "a")                 # tombstone
    assert tree.search(root, "a") is None
    assert [k for k, _ in tree.traverse(root)] == ["b", "c"]


def test_persistence_roundtrip_many_keys(tree):
    root = _fresh_root()
    for i in range(200):
        tree.set_value(root, f"key{i:04d}", f"val{i}")
    tree.write_root(root, 0)
    loaded = tree.load_root(loc.root_node_path(0))
    assert tree.search(loaded, "key0150") == "val150"
    assert len(list(tree.traverse(loaded))) == 200
    items = [k for k, _ in tree.traverse(loaded)]
    assert items == sorted(items)


def test_split_structure_small_order(tmp_path):
    # order 4 → max 3 keys per node; 20 keys forces a multi-level tree
    tree = Tree(LocalStorage(str(tmp_path)), order=4)
    root = _fresh_root()
    for i in range(20):
        tree.set_value(root, f"k{i:02d}", str(i))
    assert len(root.entries) < 4               # root stayed within order
    assert root.leftmost is not None           # and did split
    for i in range(20):
        assert tree.search(root, f"k{i:02d}") == str(i)
    assert [k for k, _ in tree.traverse(root)] == [f"k{i:02d}"
                                                   for i in range(20)]


def test_split_persists_and_reloads(tmp_path):
    tree = Tree(LocalStorage(str(tmp_path)), order=4)
    root = _fresh_root()
    for i in range(50):
        tree.set_value(root, f"k{i:03d}", str(i))
    tree.write_root(root, 0)
    # child node files exist under node/
    assert any(True for _ in tree.storage.list("node/"))
    loaded = tree.load_root(loc.root_node_path(0))
    for i in range(50):
        assert tree.search(loaded, f"k{i:03d}") == str(i)
    assert len(list(tree.traverse(loaded))) == 50


def test_copy_on_write_structural_sharing(tmp_path):
    tree = Tree(LocalStorage(str(tmp_path)), order=4)
    root = _fresh_root()
    for i in range(30):
        tree.set_value(root, f"k{i:03d}", str(i))
    tree.write_root(root, 0)
    nodes_v0 = set(tree.storage.list("node/"))
    # one-key change: only the root-to-leaf path should be rewritten
    v1 = tree.load_root(loc.root_node_path(0))
    tree.set_value(v1, "k001", "changed")
    tree.write_root(v1, 1)
    nodes_v1 = set(tree.storage.list("node/"))
    new_files = nodes_v1 - nodes_v0
    assert 1 <= len(new_files) <= 3            # dirty path only, not the tree
    # old version still reads the old value (snapshot isolation)
    v0 = tree.load_root(loc.root_node_path(0))
    assert tree.search(v0, "k001") == "1"
    assert tree.search(v1, "k001") == "changed"


def test_version_chain_and_hints(tree):
    root = _fresh_root()
    tree.write_root(root, 0)
    tree.try_write_latest_hint(0)
    for v in range(1, 4):
        r = tree.load_root(loc.root_node_path(v - 1))
        tree.set_value(r, f"k{v}", str(v))
        r.previous_root_path = loc.root_node_path(v - 1)
        tree.write_root(r, v)
        tree.try_write_latest_hint(v)
    assert tree.find_latest_version() == 3
    latest = tree.load_latest_root()
    versions = [r.version for r in tree.list_roots(latest)]
    assert versions == [3, 2, 1, 0]
    v1 = tree.find_root_for_version(latest, 1)
    assert tree.search(v1, "k1") == "1"
    assert tree.search(v1, "k3") is None


def test_find_latest_with_stale_hint(tree):
    root = _fresh_root()
    tree.write_root(root, 0)
    tree.storage.overwrite(loc.LATEST_HINT_PATH, b"999")  # stale/bogus hint
    assert tree.find_latest_version() == 0


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(
    st.tuples(st.sampled_from(["set", "del"]),
              st.text(alphabet="abcdef", min_size=1, max_size=6),
              st.text(alphabet="xyz", min_size=1, max_size=4)),
    max_size=120))
def test_tree_matches_dict_model(tmp_path_factory, ops):
    """Random op sequences vs a dict — the property the reference's
    example-based tests never establish. Small order to exercise splits."""
    tmp = tmp_path_factory.mktemp("tree")
    tree = Tree(LocalStorage(str(tmp)), order=4)
    root = _fresh_root()
    model: dict[str, str] = {}
    for kind, k, v in ops:
        if kind == "set":
            tree.set_value(root, k, v)
            model[k] = v
        else:
            tree.remove_key(root, k)
            model.pop(k, None)
    assert dict(tree.traverse(root)) == model
    for k, v in model.items():
        assert tree.search(root, k) == v
    # persistence preserves the model
    tree.write_root(root, 0)
    loaded = tree.load_root(loc.root_node_path(0))
    assert dict(tree.traverse(loaded)) == model


# --- slice + pending write-memory model (NodeRowMerger.java:26-172) ----------

def test_loaded_node_stays_zero_copy_on_update(tree):
    """A loaded node keeps its persisted rows as Arrow slices; one update
    buffers O(1) pending state and splits the covering slice — it must NOT
    materialize the other entries into Python objects (the reference's
    bounded-memory write model, SliceRowIterator.java:27-41)."""
    root = _fresh_root()
    for i in range(100):
        tree.set_value(root, f"key{i:04d}", f"val{i}")
    tree.write_root(root, 0)
    loaded = tree.load_root(loc.root_node_path(0))
    assert loaded.pivot is not None and loaded.pivot.num_rows == 100
    assert [(s.start, s.stop) for s in loaded.slices] == [(0, 100)]
    assert loaded.pending == {}
    tree.set_value(loaded, "key0042", "changed")
    # exactly one buffered change; the slice split around the superseded row
    assert set(loaded.pending) == {"key0042"}
    assert [(s.start, s.stop) for s in loaded.slices] == [(0, 42), (43, 100)]
    assert loaded.n_entries == 100
    assert tree.search(loaded, "key0042") == "changed"
    assert tree.search(loaded, "key0041") == "val41"
    # a fresh insert lands in pending without touching the slices
    tree.set_value(loaded, "key0042b", "inserted")
    assert len(loaded.pending) == 2
    assert [(s.start, s.stop) for s in loaded.slices] == [(0, 42), (43, 100)]
    merged = [k for k, _v, _p in loaded.merged_rows()]
    assert merged == sorted(merged) and "key0042b" in merged


def test_insert_more_than_order_keys_through_loaded_slices(tmp_path):
    """Write > order new keys into a RELOADED tree (every node starts as
    pure Arrow slices): splits must cut the slices correctly, zero-copy,
    across multiple levels — then survive another persist/reload."""
    tree = Tree(LocalStorage(str(tmp_path)), order=8)
    root = _fresh_root()
    for i in range(0, 60, 2):                   # evens persisted
        tree.set_value(root, f"k{i:03d}", f"v{i}")
    tree.write_root(root, 0)
    loaded = tree.load_root(loc.root_node_path(0))
    for i in range(1, 60, 2):                   # odds interleave via pending
        tree.set_value(loaded, f"k{i:03d}", f"v{i}")
    for i in range(60, 80):                     # and a sorted tail run
        tree.set_value(loaded, f"k{i:03d}", f"v{i}")
    assert [k for k, _ in tree.traverse(loaded)] == [f"k{i:03d}"
                                                     for i in range(80)]
    loaded.previous_root_path = loc.root_node_path(0)
    tree.write_root(loaded, 1)
    re = tree.load_root(loc.root_node_path(1))
    for i in range(80):
        assert tree.search(re, f"k{i:03d}") == f"v{i}", i
    assert len(list(tree.traverse(re))) == 80


# --- node_file_max_size_bytes enforcement (ObjectDefinitions.java:43) --------

def test_size_budget_splits_nodes_with_large_values(tmp_path):
    """127 large values fit the order bound but blow the 1 MiB node-file
    contract; the tree must split on serialized size so EVERY node file
    stays within budget."""
    import os
    budget = 1024 * 1024
    tree = Tree(LocalStorage(str(tmp_path)), order=128,
                node_file_max_size_bytes=budget)
    root = _fresh_root()
    big = "v" * 20_000                       # 20 KB values
    for i in range(120):
        tree.set_value(root, f"key{i:04d}", f"{big}-{i}")
    tree.write_root(root, 0)
    node_files = [os.path.join(r, f) for r, _d, fs in os.walk(tmp_path)
                  for f in fs if f.endswith(".arrow")]
    assert len(node_files) > 1               # size forced a split
    for p in node_files:
        assert os.path.getsize(p) <= budget, p
    # contents survive the multi-node layout
    loaded = tree.load_root(loc.root_node_path(0))
    for i in range(120):
        assert tree.search(loaded, f"key{i:04d}") == f"{big}-{i}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(st.text(st.characters(min_codepoint=97,
                                                max_codepoint=122),
                                  min_size=1, max_size=8),
                          st.integers(min_value=100, max_value=30_000)),
                min_size=1, max_size=40))
def test_size_budget_property(tmp_path_factory, kvs):
    """Random keys with random-size values: every written node file is
    within budget and the tree equals the dict model."""
    import os
    budget = 64 * 1024                       # small budget → frequent splits
    tmp = tmp_path_factory.mktemp("szprop")
    tree = Tree(LocalStorage(str(tmp)), order=16,
                node_file_max_size_bytes=budget)
    root = _fresh_root()
    model = {}
    for k, vlen in kvs:
        v = k * (vlen // max(len(k), 1) + 1)
        model[k] = v
        tree.set_value(root, k, v)
    tree.write_root(root, 0)
    for r, _d, fs in os.walk(tmp):
        for f in fs:
            if f.endswith(".arrow"):
                assert os.path.getsize(os.path.join(r, f)) <= budget
    loaded = tree.load_root(loc.root_node_path(0))
    assert dict(tree.traverse(loaded)) == model


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=st.lists(
    st.tuples(st.sampled_from(["set", "del", "persist"]),
              st.text(alphabet="abcdef", min_size=1, max_size=6),
              st.text(alphabet="xyz", min_size=1, max_size=4)),
    max_size=100))
def test_tree_matches_dict_model_across_reloads(tmp_path_factory, ops):
    """Like the dict-model property test, but 'persist' ops write the tree
    and CONTINUE ON THE RELOADED ROOT — every later mutation then runs
    against pure Arrow slices (the post-rewrite hot path), interleaving
    slice splits, pending buffers, and node splits across generations."""
    tmp = tmp_path_factory.mktemp("treer")
    tree = Tree(LocalStorage(str(tmp)), order=4)
    root = _fresh_root()
    model: dict[str, str] = {}
    version = 0
    for kind, k, v in ops:
        if kind == "set":
            tree.set_value(root, k, v)
            model[k] = v
        elif kind == "del":
            tree.remove_key(root, k)
            model.pop(k, None)
        else:
            if version:
                root.previous_root_path = loc.root_node_path(version - 1)
            tree.write_root(root, version)
            root = tree.load_root(loc.root_node_path(version))
            version += 1
            assert dict(tree.traverse(root)) == model
    assert dict(tree.traverse(root)) == model
    for k, v in model.items():
        assert tree.search(root, k) == v


def test_write_root_uploads_children_before_root_seal(tmp_path):
    """The commit protocol: every non-root node file must be fully
    uploaded BEFORE the root CAS write — a reader following the sealed
    root must never hit a missing child. Parallel upload order among the
    children themselves is free (fresh uuids, invisible until the seal);
    the recording wrapper asserts only the seal-last invariant and that
    the multi-level tree round-trips."""
    order: list[str] = []

    class Recording(LocalStorage):
        def write_atomic(self, path, data):
            super().write_atomic(path, data)
            order.append(path)

    tree = Tree(Recording(str(tmp_path)), order=4)
    root = _fresh_root()
    for i in range(40):                   # order 4 → multi-level tree
        tree.set_value(root, f"k{i:03d}", f"v{i}")
    tree.write_root(root, 0)
    assert len(order) > 3, order          # really multi-node
    assert order[-1] == loc.root_node_path(0)
    assert all(p.startswith("node/") for p in order[:-1])
    loaded = tree.load_root(loc.root_node_path(0))
    assert [k for k, _ in tree.traverse(loaded)] == \
        [f"k{i:03d}" for i in range(40)]


@given(ops=st.lists(
    st.tuples(st.integers(0, 30), st.text("ab", max_size=40),
              st.booleans()),
    max_size=120))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_incremental_size_estimate_matches_recompute(tmp_path_factory,
                                                     ops):
    """r16: the overflow check's per-node byte estimate is maintained
    INCREMENTALLY (Node.rows_bytes_est) instead of re-walking every
    merged row per set_value — this pins that after any op sequence
    (inserts, updates, tombstones, across splits and reloads) every
    cached estimate equals the from-scratch recompute, so split
    decisions can never drift from the old O(node)-per-insert code."""
    from olympia_spark.catalog.tree import Node
    tree = Tree(LocalStorage(str(tmp_path_factory.mktemp("est"))),
                order=6)   # tiny order → frequent splits
    root = _fresh_root()

    def check(node):
        if node.rows_bytes_est is not None:
            fresh = sum(Node._row_bytes(k, v, p)
                        for k, v, p in node.merged_rows())
            assert node.rows_bytes_est == fresh
        if node.leftmost is not None:
            check(node.leftmost)
        for c in node.children.values():
            check(c)

    for i, (kn, v, delete) in enumerate(ops):
        tree.set_value(root, f"k{kn:02d}", None if delete else v)
        check(root)
    tree.write_root(root, 0)
    loaded = tree.load_root(loc.root_node_path(0))
    # loaded nodes start uncached; one more op populates and must match
    tree.set_value(loaded, "k99", "zz")
    check(loaded)
