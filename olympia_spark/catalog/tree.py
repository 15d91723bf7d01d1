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

Write-memory model (reference NodeRowMerger.java:26-172,
SliceRowIterator.java:27-220, PendingRowIterator.java): a loaded node
does NOT materialize its rows into per-entry objects. It keeps

* the persisted pivot rows as a zero-copy slice of the loaded Arrow
  table (``Node.pivot``), with a list of live ``Slice`` ranges into it
  (the reference's vector slices), and
* a ``pending`` key→change map (the reference's pending TreeMap).

Point lookups binary-search the Arrow keys in place
(TreeUtil.java:43-66 over Arrow vectors); an update splits the covering
slice around the superseded row and buffers the new value in ``pending``
(TreeOperations.java:592-613); serialization k-way-merges the live
slices with the sorted pending entries (NodeRowMerger's priority-queue
merge — here a two-finger merge, since all slices come from one sorted
table pending keys never collide with live slice keys). Memory per node
is therefore O(changes) on top of the shared Arrow buffer, never
O(entries) of Python objects.

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

import bisect
import io
import time
from dataclasses import dataclass, field
from typing import NamedTuple

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
    """One merged pivot-table row — compatibility view (see
    ``Node.entries``); the live representation is slices + pending."""
    key: str
    value: str | None
    child_path: str | None = None
    child: "Node | None" = None


@dataclass
class Slice:
    """A live [start, stop) row range of a node's persisted pivot table —
    the reference's vector slice (SliceRowIterator.java:27-41)."""
    start: int
    stop: int           # exclusive


@dataclass
class Pending:
    """A buffered change for one key (reference PendingRowIterator's
    TreeMap value): the new value (None = tombstone) and the right-child
    pointer carried over from the superseded persisted row (or None)."""
    value: str | None
    child_path: str | None = None


class _Floor(NamedTuple):
    """Result of the merged floor search: the greatest entry ≤ key."""
    key: str
    value: str | None
    child_path: str | None
    pivot_pos: int | None   # position in Node.pivot if from a slice
    exact: bool


@dataclass
class Node:
    path: str | None = None          # persisted location; None = brand new
    dirty: bool = False
    leftmost_path: str | None = None
    leftmost: "Node | None" = None
    # persisted pivot rows (zero-copy slice of the loaded Arrow table)
    pivot: pa.Table | None = None
    slices: list = field(default_factory=list)      # list[Slice], ordered
    pending: dict = field(default_factory=dict)     # key -> Pending
    children: dict = field(default_factory=dict)    # key -> loaded Node
    # cached sum of per-row byte estimates over merged_rows() (None =
    # recompute lazily). Maintained incrementally by the insert/update
    # hot paths and invalidated by splits: without it the overflow
    # check re-walked every row of the node on EVERY set_value —
    # O(n x order) for a bulk build (72% of the 1M-object catalog
    # build in cProfile).
    rows_bytes_est: int | None = field(default=None, repr=False,
                                       compare=False)
    # lazily-built sorted view of pending's keys (None = rebuild on
    # demand). _floor_entry bisects it instead of linear-scanning the
    # dict per descent level — the next hotspot after rows_bytes_est in
    # the 1M-object build (37s of 90s profiled). _pending_put keeps it
    # ordered on insert; wholesale pending reassignment resets it.
    pending_sorted: list | None = field(default=None, repr=False,
                                        compare=False)

    @staticmethod
    def _row_bytes(k: str | None, v: str | None, p: str | None) -> int:
        """Per-row serialized-size contribution (Arrow IPC adds per-row
        offsets/validity; 64 B/row covers it)."""
        return len(k or "") + len(v or "") + len(p or "") + 64

    def _pending_keys(self) -> list:
        """Sorted pending keys, cached (see pending_sorted)."""
        ks = self.pending_sorted
        if ks is None:
            ks = sorted(self.pending)
            self.pending_sorted = ks
        return ks

    def _pending_put(self, key: str, pe: "Pending") -> None:
        """Insert a STRICTLY NEW pending key, keeping the sorted view
        ordered (value updates of an existing key go straight through
        the dict — the key set is unchanged)."""
        self.pending[key] = pe
        if self.pending_sorted is not None:
            bisect.insort(self.pending_sorted, key)

    # --- pivot accessors (Arrow in place, no materialization) ---------------

    def _pk(self, i: int) -> str:
        return self.pivot.column(0)[i].as_py()

    def _pv(self, i: int) -> str | None:
        return self.pivot.column(1)[i].as_py()

    def _pp(self, i: int) -> str | None:
        return self.pivot.column(2)[i].as_py()

    @property
    def n_entries(self) -> int:
        """Merged entry count: live slice rows + pending changes (pending
        keys never collide with live slice keys — an update splits the
        covering slice first)."""
        return (sum(s.stop - s.start for s in self.slices)
                + len(self.pending))

    def merged_rows(self):
        """K-way merge of live slices and sorted pending changes, in key
        order (reference NodeRowMerger). Yields (key, value, child_path)
        with child_path as persisted — callers needing fresh child paths
        go through ``children``."""
        pend = [(k, self.pending[k]) for k in self._pending_keys()]
        pi = 0
        for sl in self.slices:
            for i in range(sl.start, sl.stop):
                k = self._pk(i)
                while pi < len(pend) and pend[pi][0] < k:
                    pk, pe = pend[pi]
                    pi += 1
                    yield pk, pe.value, pe.child_path
                yield k, self._pv(i), self._pp(i)
        while pi < len(pend):
            pk, pe = pend[pi]
            pi += 1
            yield pk, pe.value, pe.child_path

    @property
    def entries(self) -> list:
        """Materialized merged view as ``Entry`` objects — compatibility /
        debugging surface only; the kernel never calls this."""
        return [Entry(key=k, value=v, child_path=p,
                      child=self.children.get(k))
                for k, v, p in self.merged_rows()]

    @property
    def is_leaf(self) -> bool:
        if self.leftmost_path is not None or self.leftmost is not None:
            return False
        return all(p is None for _k, _v, p in self.merged_rows()) and all(
            c is None for c in self.children.values())


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

    def _read_table(self, path: str) -> pa.Table:
        raw = self.storage.read_cached(path)
        return (pa_ipc.open_file(io.BytesIO(raw)).read_all()
                .combine_chunks())

    def _parse(self, table: pa.Table, node: Node) -> None:
        """Bind a node to its loaded Arrow table (reader protocol: system
        rows run until the first NULL key; pivot = that row + n_keys
        following rows; the rest are action rows). The pivot rows stay in
        the Arrow buffer — ``node.pivot`` is a zero-copy slice."""
        col_k, col_v = table.column(0), table.column(1)
        n_keys = 0
        data_start = None
        for i in range(table.num_rows):
            k = col_k[i].as_py()
            if k is None:
                data_start = i
                break
            v = col_v[i].as_py()
            if k == loc.NUMBER_OF_KEYS:
                n_keys = int(v)
            elif k == loc.CREATED_AT_MILLIS and isinstance(node, RootNode):
                node.created_at_millis = int(v)
            elif k == loc.CATALOG_DEFINITION and isinstance(node, RootNode):
                node.catalog_def_path = v
            elif k == loc.PREVIOUS_ROOT_NODE and isinstance(node, RootNode):
                node.previous_root_path = v
            elif k == loc.ROLLBACK_FROM_ROOT_NODE and isinstance(node,
                                                                 RootNode):
                node.rollback_from_root_path = v
        if data_start is None:
            return
        node.leftmost_path = table.column(2)[data_start].as_py()
        node.pivot = table.slice(data_start + 1, n_keys)
        node.slices = [Slice(0, n_keys)] if n_keys else []
        if isinstance(node, RootNode):
            tail = table.slice(data_start + 1 + n_keys)
            node.actions = list(zip(tail.column(0).to_pylist(),
                                    tail.column(1).to_pylist()))

    def load_root(self, path: str) -> RootNode:
        root = RootNode(path=path)
        self._parse(self._read_table(path), root)
        return root

    def load_node(self, path: str) -> Node:
        node = Node(path=path)
        self._parse(self._read_table(path), node)
        return node

    def _serialize_rows(self, node: Node, created_at: int) -> bytes:
        """Emit system rows, then the merged pivot rows (k-way merge of
        slices + pending), then (roots) action rows. Child pointers are
        refreshed from the in-memory ``children`` cache so rewritten
        subtrees land under their new copy-on-write paths."""
        rows: list[tuple] = [
            (loc.CREATED_AT_MILLIS, str(created_at), None),
            (loc.NUMBER_OF_KEYS, str(node.n_entries), None),
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
        leftmost_path = (node.leftmost.path if node.leftmost is not None
                         and node.leftmost.path else node.leftmost_path)
        rows.append((None, None, leftmost_path))
        for k, v, p in node.merged_rows():
            child = node.children.get(k)
            if child is not None and child.path:
                p = child.path
            rows.append((k, v, p))
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

    def write_dirty_children(self, node: Node, created_at: int) -> None:
        """Post-order write of this node's dirty children (not the node
        itself); their fresh paths are picked up by ``_serialize_rows``
        through the children cache."""
        if node.leftmost is not None and node.leftmost.dirty:
            node.leftmost_path = self._write_subtree(node.leftmost,
                                                     created_at)
        for child in node.children.values():
            if child.dirty:
                self._write_subtree(child, created_at)

    def _write_subtree(self, node: Node, created_at: int) -> str:
        """Post-order write of dirty nodes; returns the node's path.
        Dirty nodes get fresh uuid paths (copy-on-write); clean subtrees
        are referenced by their existing paths untouched."""
        self.write_dirty_children(node, created_at)
        path = loc.new_node_path()
        self.storage.write_atomic(path, self._serialize_rows(node, created_at))
        node.path, node.dirty = path, False
        return path

    def _stage_dirty_children(self, node: Node, created_at: int,
                              blobs: list) -> None:
        """Post-order staging: assign fresh copy-on-write paths and
        serialize dirty descendants to bytes WITHOUT uploading. Children
        stage before their parent serializes, so parent rows already
        carry the new child paths; the bytes can then upload in any
        order because nothing references them until the root CAS
        lands."""
        if node.leftmost is not None and node.leftmost.dirty:
            node.leftmost_path = self._stage_subtree(
                node.leftmost, created_at, blobs)
        for child in node.children.values():
            if child.dirty:
                self._stage_subtree(child, created_at, blobs)

    def _stage_subtree(self, node: Node, created_at: int,
                       blobs: list) -> str:
        self._stage_dirty_children(node, created_at, blobs)
        path = loc.new_node_path()
        node.path = path
        blobs.append((path, self._serialize_rows(node, created_at), node))
        return path

    def write_root(self, root: RootNode, version: int,
                   created_at: int | None = None) -> str:
        """Stage dirty children bottom-up, upload the non-root node files
        IN PARALLEL, then atomically seal the new root at its version
        path — the spec's commit model (docs/format.md:260-267: "write
        child nodes in parallel, then CAS the root"; the reference's
        impl is actually sequential recursion,
        TreeOperations.java:181-202). Fresh-uuid node files are invisible
        until the root seals, so upload order is free; on object storage
        the upload wall-clock is one round-trip, not depth×fan-out.
        Raises StorageAtomicSealFailureError if another writer committed
        this version first (the CAS)."""
        created_at = created_at or int(time.time() * 1000)
        blobs: list = []
        self._stage_dirty_children(root, created_at, blobs)
        if len(blobs) > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(
                    max_workers=min(8, len(blobs))) as ex:
                list(ex.map(
                    lambda b: self.storage.write_atomic(b[0], b[1]), blobs))
        elif blobs:
            self.storage.write_atomic(blobs[0][0], blobs[0][1])
        for _path, _data, node in blobs:
            node.dirty = False
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

    @staticmethod
    def _slice_floor(node: Node, key: str) -> tuple[int, bool]:
        """Greatest LIVE persisted row ≤ key: binary search on the Arrow
        keys in place (reference TreeUtil.java:43-66 over Arrow vectors).
        Returns (pivot position, exact) — position -1 if every live row
        is > key. Slices are key-ordered (disjoint ranges of one sorted
        table), so the floor lives in the last slice whose first key ≤
        key."""
        best, exact = -1, False
        for sl in node.slices:
            if node._pk(sl.start) > key:
                break
            lo, hi = sl.start, sl.stop - 1
            pos = -1
            while lo <= hi:
                mid = (lo + hi) // 2
                k = node._pk(mid)
                if k == key:
                    pos, exact = mid, True
                    break
                if k < key:
                    pos = mid
                    lo = mid + 1
                else:
                    hi = mid - 1
            if pos >= 0:
                best = pos
            if exact:
                break
        return best, exact

    @staticmethod
    def _floor_entry(node: Node, key: str) -> _Floor | None:
        """Merged floor: max over the slice floor and the pending floor
        (keys are disjoint between the two by construction)."""
        spos, sexact = Tree._slice_floor(node, key)
        ks = node._pending_keys()
        i = bisect.bisect_right(ks, key)
        pkey = ks[i - 1] if i else None
        skey = node._pk(spos) if spos >= 0 else None
        if pkey is not None and (skey is None or pkey > skey):
            pe = node.pending[pkey]
            return _Floor(pkey, pe.value, pe.child_path, None, pkey == key)
        if skey is not None:
            return _Floor(skey, node._pv(spos), node._pp(spos), spos, sexact)
        return None

    def _child_at(self, node: Node, hit: _Floor | None) -> Node | None:
        """Load (and cache) the child right of the floor entry; a None hit
        means the leftmost child."""
        if hit is None:
            if node.leftmost is None and node.leftmost_path:
                node.leftmost = self.load_node(node.leftmost_path)
            return node.leftmost
        child = node.children.get(hit.key)
        if child is None and hit.child_path:
            child = self.load_node(hit.child_path)
            node.children[hit.key] = child
        return child

    @staticmethod
    def _supersede(node: Node, hit: _Floor, value: str | None) -> None:
        """Buffer an update for an existing entry: if it lives in a slice,
        split the slice around the superseded row and move the entry (with
        its child pointer) into pending (TreeOperations.java:592-613)."""
        # size accounting: key and child-path contributions are carried
        # over unchanged (the Pending keeps hit.child_path), so only the
        # value length moves
        if node.rows_bytes_est is not None:
            node.rows_bytes_est += (len(value or "")
                                    - len(hit.value or ""))
        if hit.pivot_pos is None:
            node.pending[hit.key].value = value
            return
        pos = hit.pivot_pos
        for i, sl in enumerate(node.slices):
            if sl.start <= pos < sl.stop:
                parts = [Slice(sl.start, pos), Slice(pos + 1, sl.stop)]
                node.slices[i:i + 1] = [s for s in parts if s.start < s.stop]
                break
        node._pending_put(hit.key, Pending(value=value,
                                           child_path=hit.child_path))

    def search(self, root: Node, key: str) -> str | None:
        """Root-to-leaf descent (TreeOperations.java:553-567). Returns the
        value, or None if absent or tombstoned."""
        node: Node | None = root
        while node is not None:
            hit = self._floor_entry(node, key)
            if hit is not None and hit.exact:
                return hit.value
            node = self._child_at(node, hit)
        return None

    def set_value(self, root: Node, key: str, value: str | None) -> None:
        """Upsert (TreeOperations.java:569-631): descend to the owning
        node, buffer the change in its pending map (splitting the covering
        vector slice on update), split on overflow, propagating dirtiness
        up the path."""
        path: list[Node] = []
        node = root
        while True:
            hit = self._floor_entry(node, key)
            if hit is not None and hit.exact:
                self._supersede(node, hit, value)
                node.dirty = True
                for parent in path:
                    parent.dirty = True
                # an update can GROW the node past the byte budget
                # (small value superseded by a large one) — the same
                # overflow check as the insert path
                self._resolve_overflow(node, path)
                return
            child = self._child_at(node, hit)
            if child is None:
                break
            path.append(node)
            node = child
        # buffer the insert at the leaf (a strictly new key — an existing
        # one would have hit the exact-supersede branch above)
        node._pending_put(key, Pending(value=value))
        if node.rows_bytes_est is not None:
            node.rows_bytes_est += Node._row_bytes(key, value, None)
        node.dirty = True
        for parent in path:
            parent.dirty = True
        self._resolve_overflow(node, path)

    # --- splits -------------------------------------------------------------

    @staticmethod
    def _rows_bytes(node: Node) -> int:
        """Cached sum of per-row size estimates (see Node.rows_bytes_est).
        Recomputed O(node) only after a split/load; the insert/update
        paths adjust it incrementally."""
        est = node.rows_bytes_est
        if est is None:
            est = sum(Node._row_bytes(k, v, p)
                      for k, v, p in node.merged_rows())
            node.rows_bytes_est = est
        return est

    def _estimated_node_bytes(self, node: Node) -> int:
        """Conservative serialized-size estimate (Arrow IPC adds per-row
        offsets/validity + fixed header; 64 B/row + 2 KiB covers it).
        Root action rows are summed fresh each call — they are assigned
        wholesale by the commit paths (transactions.py), outside the
        tree's incremental accounting, and number O(statements per
        txn)."""
        size = 2048 + self._rows_bytes(node)
        if isinstance(node, RootNode):
            for k, v in node.actions:
                size += len(k or "") + len(v or "") + 64
        return size

    def _overflows(self, node: Node) -> bool:
        n = node.n_entries
        if n > self.order - 1:
            return True
        return (n > 1 and self._estimated_node_bytes(node)
                > self.node_file_max_size_bytes)

    def _split_pos(self, node: Node) -> int:
        """Index (in merge order) of the entry to promote. Count-triggered
        splits take the middle; size-triggered splits take the first index
        where cumulative estimated bytes crosses half the total, so both
        halves land under the byte budget even with skewed value sizes
        (a midpoint split of 100 × 50 KB entries would leave 2.5 MiB
        halves violating the 1 MiB node-file contract)."""
        n = node.n_entries
        if n > self.order - 1:
            return n // 2
        sizes = [len(k or "") + len(v or "") + len(p or "") + 64
                 for k, v, p in node.merged_rows()]
        half = sum(sizes) / 2
        acc = 0
        pos = n - 1
        for i, s in enumerate(sizes):
            acc += s
            if acc >= half:
                pos = i
                break
        # keep the left half non-empty; the right half may only come up
        # empty in the degenerate 2-entry-oversized case (nothing better
        # exists: one entry must stay, one must move up)
        return max(1, min(pos, n - 2)) if n >= 3 else 1

    def _do_split(self, node: Node) -> tuple[tuple, Node]:
        """Split in place: ``node`` keeps the entries below the promoted
        key, the returned new right sibling takes those above it. Slices
        are split by binary search (SliceRowIterator ranges survive in
        both halves, still zero-copy); pending and loaded children
        partition by key."""
        mid_pos = self._split_pos(node)
        mid = None
        for i, row in enumerate(node.merged_rows()):
            if i == mid_pos:
                mid = row
                break
        mid_key, mid_value, mid_child_path = mid
        left_slices: list[Slice] = []
        right_slices: list[Slice] = []
        for sl in node.slices:
            # lower bound of mid_key in [start, stop)
            lo, hi = sl.start, sl.stop
            while lo < hi:
                m = (lo + hi) // 2
                if node._pk(m) < mid_key:
                    lo = m + 1
                else:
                    hi = m
            cut = lo
            skip = (cut < sl.stop and node._pk(cut) == mid_key)
            if sl.start < cut:
                left_slices.append(Slice(sl.start, cut))
            rstart = cut + (1 if skip else 0)
            if rstart < sl.stop:
                right_slices.append(Slice(rstart, sl.stop))
        right = Node(
            dirty=True, pivot=node.pivot, slices=right_slices,
            pending={k: pe for k, pe in node.pending.items() if k > mid_key},
            children={k: c for k, c in node.children.items() if k > mid_key},
            leftmost_path=mid_child_path,
            leftmost=node.children.get(mid_key))
        node.slices = left_slices
        node.pending = {k: pe for k, pe in node.pending.items()
                        if k < mid_key}
        node.children = {k: c for k, c in node.children.items()
                         if k < mid_key}
        node.dirty = True
        # both halves changed wholesale — recompute lazily (splits are
        # O(order) apart, so the O(order) recompute amortizes to O(1)
        # per insert); `right` was constructed with the default None
        node.rows_bytes_est = None
        node.pending_sorted = None
        return (mid_key, mid_value), right

    def _resolve_overflow(self, node: Node, parents: list) -> None:
        """Split overflowing nodes (TreeOperations.java:763-829): overflow
        is EITHER too many keys (> order-1) OR a serialized size past
        node_file_max_size_bytes (ObjectDefinitions.java:43) — order alone
        lets 127 large values blow the format's 1 MiB node-file contract.
        Both halves are re-checked after a split (a skewed half can still
        overflow) and the parent re-checked after absorbing the promoted
        key."""
        if not self._overflows(node) or node.n_entries < 2:
            return
        (mid_key, mid_value), right = self._do_split(node)
        if parents:
            parent = parents[-1]
            parent._pending_put(mid_key, Pending(value=mid_value))
            if parent.rows_bytes_est is not None:
                parent.rows_bytes_est += Node._row_bytes(
                    mid_key, mid_value, None)
            parent.children[mid_key] = right
            parent.dirty = True
            self._resolve_overflow(right, parents)
            self._resolve_overflow(node, parents)
            self._resolve_overflow(parent, parents[:-1])
        else:
            # node is the root: push both halves down a level
            left = Node(dirty=True, pivot=node.pivot, slices=node.slices,
                        pending=node.pending, children=node.children,
                        leftmost_path=node.leftmost_path,
                        leftmost=node.leftmost)
            node.pivot, node.slices = None, []
            node.pending = {mid_key: Pending(value=mid_value)}
            node.children = {mid_key: right}
            node.leftmost_path, node.leftmost = None, left
            node.dirty = True
            node.rows_bytes_est = Node._row_bytes(mid_key, mid_value,
                                                  None)
            node.pending_sorted = [mid_key]
            # `left` took the post-split contents node no longer
            # accounts for; _do_split already reset node's estimate, so
            # left recomputes lazily (constructed with the default None)
            self._resolve_overflow(left, [node])
            self._resolve_overflow(right, [node])

    def remove_key(self, root: Node, key: str) -> None:
        """Tombstone removal (TreeOperations.java:637-640 — the reference
        explicitly defers rebalancing; traversal skips null values)."""
        self.set_value(root, key, None)

    def traverse(self, root: Node):
        """In-order (key, value) generator over live keys
        (TreeOperations.java:425-502) — a lazy k-way merge of persisted
        slices and pending changes per node, skipping tombstones but
        descending through tombstoned entries' children."""
        def walk(node: Node):
            child = self._child_at(node, None)
            if child is not None:
                yield from walk(child)
            for k, v, p in node.merged_rows():
                if v is not None:
                    yield k, v
                child = node.children.get(k)
                if child is None and p:
                    child = self.load_node(p)
                    node.children[k] = child
                if child is not None:
                    yield from walk(child)
        yield from walk(root)

    def reachable_node_paths(self, root: Node) -> list[str]:
        """All node-file paths reachable from a root (for snapshot export)."""
        out: list[str] = []

        def walk(node: Node):
            if node.path:
                out.append(node.path)
            child = self._child_at(node, None)
            if child is not None:
                walk(child)
            for k, _v, p in node.merged_rows():
                c = node.children.get(k)
                if c is None and p:
                    c = self.load_node(p)
                    node.children[k] = c
                if c is not None:
                    walk(c)
        walk(root)
        return out
