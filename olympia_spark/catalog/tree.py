"""Versioned copy-on-write B-tree over Arrow IPC node files (A19-A30).

The whole catalog is one key→value search-tree map; each node is one
Arrow IPC file with three utf8 columns ``key | value | pnode`` at fixed
indices 0/1/2 (reference tree/TreeOperations.java:62-69). A node file is:

1. system rows (non-null keys): ``created_at_millis``, ``n_keys``, and for
   roots ``catalog_def`` / ``previous_root`` / ``rollback_from_root``
   (reference TreeOperations.java:272-307 write order, ObjectKeys.java);
2. the pivot table: one row with NULL key/value carrying the leftmost
   child pointer, then the sorted keys, each value = def-file path, each
   optional pnode = right-child pointer (docs/format.md "Pivot Table");
3. (roots) the action log of the committing transaction, ``n_actions``
   rows of (object key, action JSON) — per docs/format.md "Root Node
   File". The reference left the action-row write commented out
   (TreeOperations.java:306-310); we persist them, which is what makes
   cross-process conflict resolution actually work.

Copy-on-write: mutation marks the root-to-leaf path dirty; on serialize,
every dirty node gets a fresh ``node/<uuid4>.arrow`` path and unchanged
subtrees are referenced by their existing paths (structural sharing —
reference docs/format.md:260-267). Deletion is a tombstone (value=NULL,
reference TreeOperations.java:637-640); traversal skips tombstones.

Scale: a catalog of a billion objects is a 5-level order-128 tree; every
point lookup reads ≤5 node files (O(log₁₂₈ n) I/O), every commit writes
only the dirty path + a single atomic root put.
"""

from __future__ import annotations

import io
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.ipc as pa_ipc

from olympia_spark.catalog import locations as loc
from olympia_spark.catalog.errors import (StorageFileOpenFailureError,
                                          TransactionValueError)
from olympia_spark.catalog.storage import Storage

_NODE_SCHEMA = pa.schema([
    pa.field("key", pa.utf8()),
    pa.field("value", pa.utf8()),
    pa.field("pnode", pa.utf8()),
])


@dataclass
class Entry:
    """One pivot-table row: key, value (def-file path or None=tombstone),
    and the right-child pointer."""
    key: str
    value: str | None
    child_path: str | None = None
    child: "Node | None" = None


@dataclass
class Node:
    path: str | None = None          # persisted location; None = brand new
    dirty: bool = False
    leftmost_path: str | None = None
    leftmost: "Node | None" = None
    entries: list = field(default_factory=list)   # list[Entry], key-sorted

    @property
    def is_leaf(self) -> bool:
        return self.leftmost_path is None and self.leftmost is None and all(
            e.child_path is None and e.child is None for e in self.entries)


@dataclass
class RootNode(Node):
    catalog_def_path: str = ""
    previous_root_path: str | None = None
    rollback_from_root_path: str | None = None
    created_at_millis: int = 0
    actions: list = field(default_factory=list)   # list[(object_key, json)]

    @property
    def version(self) -> int:
        if self.path is None:
            raise TransactionValueError("root not persisted")
        return loc.version_from_root_path(self.path)


class Tree:
    """Tree operations bound to one storage (reference TreeOperations)."""

    def __init__(self, storage: Storage, order: int = 128,
                 node_file_max_size_bytes: int = 1024 * 1024):
        self.storage = storage
        self.order = order
        self.node_file_max_size_bytes = node_file_max_size_bytes

    # --- node file I/O ------------------------------------------------------

    def _read_rows(self, path: str) -> list[tuple]:
        table = pa_ipc.open_file(io.BytesIO(self.storage.read(path))).read_all()
        keys = table.column(0).to_pylist()
        values = table.column(1).to_pylist()
        pnodes = table.column(2).to_pylist()
        return list(zip(keys, values, pnodes))

    def _parse(self, rows: list[tuple], node: Node) -> None:
        """Split rows into system / pivot / action sections (reader protocol:
        system rows run until the first NULL key; pivot = that row + n_keys
        following rows; the rest are action rows)."""
        n_keys = 0
        data_start = None
        for i, (k, v, _p) in enumerate(rows):
            if k is None:
                data_start = i
                break
            if k == loc.NUMBER_OF_KEYS:
                n_keys = int(v)
            elif k == loc.CREATED_AT_MILLIS and isinstance(node, RootNode):
                node.created_at_millis = int(v)
            elif k == loc.CATALOG_DEFINITION and isinstance(node, RootNode):
                node.catalog_def_path = v
            elif k == loc.PREVIOUS_ROOT_NODE and isinstance(node, RootNode):
                node.previous_root_path = v
            elif k == loc.ROLLBACK_FROM_ROOT_NODE and isinstance(node, RootNode):
                node.rollback_from_root_path = v
        if data_start is None:
            return
        null_row = rows[data_start]
        node.leftmost_path = null_row[2]
        for k, v, p in rows[data_start + 1:data_start + 1 + n_keys]:
            node.entries.append(Entry(key=k, value=v, child_path=p))
        if isinstance(node, RootNode):
            node.actions = [(k, v) for k, v, _ in
                            rows[data_start + 1 + n_keys:]]

    def load_root(self, path: str) -> RootNode:
        root = RootNode(path=path)
        self._parse(self._read_rows(path), root)
        return root

    def load_node(self, path: str) -> Node:
        node = Node(path=path)
        self._parse(self._read_rows(path), node)
        return node

    def _serialize_rows(self, node: Node, created_at: int) -> bytes:
        rows: list[tuple] = [
            (loc.CREATED_AT_MILLIS, str(created_at), None),
            (loc.NUMBER_OF_KEYS, str(len(node.entries)), None),
        ]
        if isinstance(node, RootNode):
            rows.append((loc.CATALOG_DEFINITION, node.catalog_def_path, None))
            if node.previous_root_path:
                rows.append((loc.PREVIOUS_ROOT_NODE,
                             node.previous_root_path, None))
            if node.rollback_from_root_path:
                rows.append((loc.ROLLBACK_FROM_ROOT_NODE,
                             node.rollback_from_root_path, None))
            rows.append((loc.NUMBER_OF_ACTIONS, str(len(node.actions)), None))
        rows.append((None, None, node.leftmost_path))
        for e in node.entries:
            rows.append((e.key, e.value, e.child_path))
        if isinstance(node, RootNode):
            rows.extend((k, v, None) for k, v in node.actions)
        table = pa.table({
            "key": [r[0] for r in rows],
            "value": [r[1] for r in rows],
            "pnode": [r[2] for r in rows],
        }, schema=_NODE_SCHEMA)
        sink = io.BytesIO()
        with pa_ipc.new_file(sink, _NODE_SCHEMA) as writer:
            writer.write_table(table)
        return sink.getvalue()

    def _write_subtree(self, node: Node, created_at: int) -> str:
        """Post-order write of dirty nodes; returns the node's path.
        Dirty nodes get fresh uuid paths (copy-on-write); clean subtrees
        are referenced by their existing paths untouched."""
        if node.leftmost is not None and node.leftmost.dirty:
            node.leftmost_path = self._write_subtree(node.leftmost, created_at)
        for e in node.entries:
            if e.child is not None and e.child.dirty:
                e.child_path = self._write_subtree(e.child, created_at)
        path = loc.new_node_path()
        self.storage.write_atomic(path, self._serialize_rows(node, created_at))
        node.path, node.dirty = path, False
        return path

    def write_root(self, root: RootNode, version: int,
                   created_at: int | None = None) -> str:
        """Write dirty children bottom-up, then atomically seal the new root
        at its version path. Raises StorageAtomicSealFailureError if another
        writer committed this version first (the CAS)."""
        created_at = created_at or int(time.time() * 1000)
        if root.leftmost is not None and root.leftmost.dirty:
            root.leftmost_path = self._write_subtree(root.leftmost, created_at)
        for e in root.entries:
            if e.child is not None and e.child.dirty:
                e.child_path = self._write_subtree(e.child, created_at)
        root.created_at_millis = created_at
        path = loc.root_node_path(version)
        self.storage.write_atomic(path, self._serialize_rows(root, created_at))
        root.path, root.dirty = path, False
        return path

    def try_write_latest_hint(self, version: int) -> None:
        """Best-effort vn/latest update (TreeOperations.java:321-327)."""
        try:
            self.storage.overwrite(loc.LATEST_HINT_PATH, str(version).encode())
        except Exception:  # noqa: BLE001 — hint is advisory by spec
            pass

    # --- version chain ------------------------------------------------------

    def find_latest_version(self) -> int:
        """vn/latest hint, else vn/oldest, else v0; probe versions upward
        until 404 (docs/format.md "Begin a transaction"; the reference's
        probe loop has an off-by-one bug at TreeOperations.java:360-366 —
        probing the same version repeatedly — which we do correctly).
        After version expiration v0 no longer exists, so a stale latest
        hint falls back to the oldest hint, never blindly to 0."""
        candidates: list[int] = []
        for hint in (loc.LATEST_HINT_PATH, loc.OLDEST_HINT_PATH):
            try:
                candidates.append(int(self.storage.read(hint).decode()))
            except (StorageFileOpenFailureError, ValueError):
                pass
        candidates.append(0)
        start = next((c for c in candidates
                      if self.storage.exists(loc.root_node_path(c))), None)
        if start is None:
            raise StorageFileOpenFailureError("no catalog root found")
        v = start
        while self.storage.exists(loc.root_node_path(v + 1)):
            v += 1
        return v

    def load_latest_root(self) -> RootNode:
        return self.load_root(loc.root_node_path(self.find_latest_version()))

    def find_root_for_version(self, root: RootNode, version: int) -> RootNode:
        """Walk the previous_root chain (TreeOperations.java:373-395);
        version paths are deterministic so we can also jump directly."""
        if version > root.version:
            raise TransactionValueError(
                f"version {version} is newer than latest {root.version}")
        path = loc.root_node_path(version)
        if self.storage.exists(path):
            return self.load_root(path)
        node: RootNode = root
        while node.version > version and node.previous_root_path:
            try:
                node = self.load_root(node.previous_root_path)
            except StorageFileOpenFailureError as e:
                raise TransactionValueError(
                    f"version {version} has been expired") from e
        if node.version != version:
            raise TransactionValueError(f"version {version} not found")
        return node

    def find_root_before_timestamp(self, root: RootNode,
                                   ts_millis: int) -> RootNode:
        """Newest root created strictly before ts (TreeOperations.java:397-423)."""
        node: RootNode | None = root
        while node is not None:
            if node.created_at_millis < ts_millis:
                return node
            if not node.previous_root_path:
                break
            try:
                node = self.load_root(node.previous_root_path)
            except StorageFileOpenFailureError:
                break
        raise TransactionValueError(f"no root before timestamp {ts_millis}")

    def list_roots(self, root: RootNode):
        """History iterator newest→oldest (TreeOperations.java:504-551).
        Stops cleanly when the chain crosses the expiration horizon (the
        oldest surviving root still points at a deleted previous root)."""
        node: RootNode | None = root
        while node is not None:
            yield node
            if not node.previous_root_path:
                return
            try:
                node = self.load_root(node.previous_root_path)
            except StorageFileOpenFailureError:
                return

    # --- search / mutate ----------------------------------------------------

    def _child_at(self, node: Node, idx: int) -> Node | None:
        """Load (and cache) the child left of entries[idx]; idx == -1 means
        the leftmost child."""
        if idx == -1:
            if node.leftmost is None and node.leftmost_path:
                node.leftmost = self.load_node(node.leftmost_path)
            return node.leftmost
        e = node.entries[idx]
        if e.child is None and e.child_path:
            e.child = self.load_node(e.child_path)
        return e.child

    @staticmethod
    def _floor_index(node: Node, key: str) -> tuple[int, bool]:
        """Binary search (TreeUtil.java:43-66): (index of greatest entry
        ≤ key, exact-match flag); index -1 if key < all entries."""
        lo, hi = 0, len(node.entries) - 1
        floor = -1
        while lo <= hi:
            mid = (lo + hi) // 2
            k = node.entries[mid].key
            if k == key:
                return mid, True
            if k < key:
                floor = mid
                lo = mid + 1
            else:
                hi = mid - 1
        return floor, False

    def _estimated_node_bytes(self, node: Node) -> int:
        """Conservative serialized-size estimate (Arrow IPC adds per-row
        offsets/validity + fixed header; 64 B/row + 2 KiB covers it)."""
        size = 2048
        for e in node.entries:
            size += (len(e.key or "") + len(e.value or "")
                     + len(e.child_path or "") + 64)
        if isinstance(node, RootNode):
            for k, v in node.actions:
                size += len(k or "") + len(v or "") + 64
        return size

    def _overflows(self, node: Node) -> bool:
        if len(node.entries) > self.order - 1:
            return True
        return (len(node.entries) > 1 and self._estimated_node_bytes(node)
                > self.node_file_max_size_bytes)

    def search(self, root: Node, key: str) -> str | None:
        """Root-to-leaf descent (TreeOperations.java:553-567). Returns the
        value, or None if absent or tombstoned."""
        node: Node | None = root
        while node is not None:
            idx, exact = self._floor_index(node, key)
            if exact:
                return node.entries[idx].value
            node = self._child_at(node, idx)
        return None

    def set_value(self, root: Node, key: str, value: str | None) -> None:
        """Upsert (TreeOperations.java:569-631): descend to the owning
        node, update in place or insert at the leaf, split on overflow
        (> order-1 keys), propagating dirtiness up the path."""
        path: list[tuple[Node, int]] = []   # (node, child index taken)
        node = root
        while True:
            idx, exact = self._floor_index(node, key)
            if exact:
                node.entries[idx].value = value
                node.dirty = True
                for parent, _ in path:
                    parent.dirty = True
                return
            child = self._child_at(node, idx)
            if child is None:
                break
            path.append((node, idx))
            node = child
        # insert into leaf
        idx, _ = self._floor_index(node, key)
        node.entries.insert(idx + 1, Entry(key=key, value=value))
        node.dirty = True
        for parent, _ in path:
            parent.dirty = True
        # split overflowing nodes bottom-up (TreeOperations.java:763-829):
        # overflow is EITHER too many keys (> order-1) OR a serialized size
        # past node_file_max_size_bytes (ObjectDefinitions.java:43,
        # proto/objects.proto:46) — order alone lets 127 large values blow
        # the format's 1 MiB node-file contract
        while self._overflows(node):
            mid = len(node.entries) // 2
            mid_entry = node.entries[mid]
            right = Node(dirty=True,
                         leftmost_path=mid_entry.child_path,
                         leftmost=mid_entry.child,
                         entries=node.entries[mid + 1:])
            node.entries = node.entries[:mid]
            node.dirty = True
            if path:
                parent, pidx = path.pop()
                parent.entries.insert(
                    pidx + 1,
                    Entry(key=mid_entry.key, value=mid_entry.value,
                          child=right))
                parent.dirty = True
                node = parent
            else:
                # node is the root: push both halves down a level
                left = Node(dirty=True, leftmost_path=node.leftmost_path,
                            leftmost=node.leftmost, entries=node.entries)
                node.leftmost_path, node.leftmost = None, left
                node.entries = [Entry(key=mid_entry.key, value=mid_entry.value,
                                      child=right)]
                node.dirty = True
                break

    def remove_key(self, root: Node, key: str) -> None:
        """Tombstone removal (TreeOperations.java:637-640 — the reference
        explicitly defers rebalancing; traversal skips null values)."""
        self.set_value(root, key, None)

    def traverse(self, root: Node):
        """In-order (key, value) generator over live keys
        (TreeOperations.java:425-502), skipping tombstones."""
        def walk(node: Node):
            child = self._child_at(node, -1)
            if child is not None:
                yield from walk(child)
            for i, e in enumerate(node.entries):
                if e.value is not None:
                    yield e.key, e.value
                child = self._child_at(node, i)
                if child is not None:
                    yield from walk(child)
        yield from walk(root)

    def reachable_node_paths(self, root: Node) -> list[str]:
        """All node-file paths reachable from a root (for snapshot export)."""
        out: list[str] = []

        def walk(node: Node):
            if node.path:
                out.append(node.path)
            child = self._child_at(node, -1)
            if child is not None:
                walk(child)
            for i in range(len(node.entries)):
                c = self._child_at(node, i)
                if c is not None:
                    walk(c)
        walk(root)
        return out
