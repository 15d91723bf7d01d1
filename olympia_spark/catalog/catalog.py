"""Catalog API — namespaces / tables / views / versioning (A1-A18, A27-A31).

Each operation is the reference's logic re-expressed in Python: an
existence check against the running tree, a def-file write, a tree
``set_value``/``remove_key``, and an action record
(reference Olympia.java:171-666). Write ops go through
``Transaction.apply`` so they replay on optimistic-commit retries.
"""

from __future__ import annotations

import re
import time
from enum import Enum

from olympia_spark.catalog import locations as loc
from olympia_spark.catalog import transactions as txns
from olympia_spark.catalog.actions import Action, ActionType
from olympia_spark.catalog.defs import (CatalogDef, NamespaceDef, TableDef,
                                        ViewDef, read_def,
                                        write_def)
from olympia_spark.catalog.errors import (NamespaceNotEmptyError,
                                          ObjectAlreadyExistsError,
                                          ObjectNotFoundError,
                                          TransactionValueError)
from olympia_spark.catalog.storage import Storage, storage_for
from olympia_spark.catalog.transactions import Transaction
from olympia_spark.catalog.tree import RootNode, Tree


class DropNamespaceBehavior(str, Enum):
    """reference DropNamespaceBehavior.java."""
    RESTRICT = "RESTRICT"
    CASCADE = "CASCADE"


class Catalog:
    """One catalog per storage prefix (docs/format.md Overview)."""

    def __init__(self, storage: Storage, catalog_def: CatalogDef,
                 catalog_def_path: str):
        self.storage = storage
        self.catalog_def = catalog_def
        self.catalog_def_path = catalog_def_path
        # every def this catalog writes uses the format its own def
        # uses — a reference-written (.binpb) catalog STAYS reference-
        # format under our DDL/DML, so the Java reference can keep
        # reading it
        self.def_suffix = (loc.BINPB_FILE_SUFFIX
                           if catalog_def_path.endswith(
                               loc.BINPB_FILE_SUFFIX)
                           else loc.DEF_FILE_SUFFIX)
        self.tree = Tree(
            storage, order=catalog_def.order,
            node_file_max_size_bytes=catalog_def.node_file_max_size_bytes)

    # --- lifecycle (A1, A2) -------------------------------------------------

    @staticmethod
    def exists(location: str | Storage) -> bool:
        """A1 — probe the version-0 root file (Olympia.java:48-51), and
        the vn/oldest hint: after version expiration v0 is gone but the
        catalog very much exists (without this check a new Engine would
        silently re-create an empty catalog over a live warehouse)."""
        storage = (location if isinstance(location, Storage)
                   else storage_for(location))
        return (storage.exists(loc.root_node_path(0))
                or storage.exists(loc.OLDEST_HINT_PATH))

    @classmethod
    def create(cls, location: str | Storage,
               catalog_def: CatalogDef | None = None,
               def_format: str = "json") -> "Catalog":
        """A2 — write CatalogDef + empty root v0 + latest hint
        (Olympia.java:53-63). ``def_format="binpb"`` creates a
        REFERENCE-format catalog: every def file (this one and all
        later namespace/table/view/dtxn defs) is written as proto3
        wire bytes under the reference's .binpb suffix
        (ObjectDefinitions.java, proto_io.py) — readable by the Java
        reference in place."""
        storage = (location if isinstance(location, Storage)
                   else storage_for(location))
        if cls.exists(storage):
            raise ObjectAlreadyExistsError(f"catalog at {storage.root}")
        cdef = catalog_def or CatalogDef()
        suffix = (loc.BINPB_FILE_SUFFIX if def_format == "binpb"
                  else loc.DEF_FILE_SUFFIX)
        def_path = loc.new_catalog_def_path(suffix)
        storage.write_atomic(def_path, write_def(cdef, def_path))
        tree = Tree(storage, order=cdef.order)
        root = RootNode(catalog_def_path=def_path)
        tree.write_root(root, 0)
        tree.try_write_latest_hint(0)
        return cls(storage, cdef, def_path)

    @classmethod
    def load(cls, location: str | Storage) -> "Catalog":
        storage = (location if isinstance(location, Storage)
                   else storage_for(location))
        tree = Tree(storage)
        root = tree.load_latest_root()
        cdef = read_def(storage.read_cached(root.catalog_def_path),
                        root.catalog_def_path)
        tree.order = cdef.order
        return cls(storage, cdef, root.catalog_def_path)

    # --- transactions (A3, A4, A5) ------------------------------------------

    def begin(self, isolation_level: str | None = None,
              ttl_millis: int | None = None,
              read_only: bool = False) -> Transaction:
        """``read_only=True`` returns a snapshot that REFUSES write ops
        — for decision probes (e.g. should-compact checks) that must
        never leave a half-open writable transaction behind; discarding
        it is always safe (it holds no resources by contract)."""
        return txns.begin(
            self.tree,
            isolation_level or self.catalog_def.txn_isolation_level,
            ttl_millis or self.catalog_def.txn_ttl_millis,
            read_only=read_only)

    def commit(self, txn: Transaction) -> RootNode:
        return txns.commit(txn)

    def _dtxn_probe(self, txn_id: str) -> str | None:
        """The suffix a dist-txn handle actually lives under (None if
        it doesn't exist): the catalog's own format first, then the
        OTHER one — a warehouse can legitimately hold handles from a
        mixed-format writer pair (e.g. the Java reference saved a
        .binpb handle into a catalog we otherwise manage as .json);
        listing accepted both, so loading must too (review r11
        finding). A handle present under BOTH suffixes is AMBIGUOUS —
        one copy is stale, and silently resuming it would discard the
        other writer's progress (review r11 pass-2 #3): refuse loudly
        and name both files."""
        other = (loc.BINPB_FILE_SUFFIX
                 if self.def_suffix == loc.DEF_FILE_SUFFIX
                 else loc.DEF_FILE_SUFFIX)
        found = [sfx for sfx in (self.def_suffix, other)
                 if self.storage.exists(
                     loc.dist_txn_def_path(txn_id, sfx))]
        if len(found) == 2:
            raise TransactionValueError(
                f"distributed transaction {txn_id} exists under BOTH "
                f"{loc.dist_txn_def_path(txn_id, found[0])} and "
                f"{loc.dist_txn_def_path(txn_id, found[1])} — one is a "
                f"stale duplicate from a mixed-format writer; delete "
                f"it before resuming")
        return found[0] if found else None

    def _dtxn_suffix(self, txn_id: str) -> str:
        return self._dtxn_probe(txn_id) or self.def_suffix

    def dtxn_def_paths(self, txn_id: str) -> list[str]:
        """EVERY existing def path of a dist-txn handle (0, 1 or — in
        the ambiguous mixed-writer state — 2 entries, own format
        first). The NON-RAISING read surface for observability and GC:
        resume must refuse ambiguity (:meth:`_dtxn_probe`), but a
        reader that only needs the handle's CONTENT — sys.dtxns rows,
        orphan-GC root pinning — must keep working on (indeed,
        ESPECIALLY on) an ambiguous handle (review r11 pass-3: the
        raise routed into GC's catch-and-continue deleted a live
        transaction's files)."""
        other = (loc.BINPB_FILE_SUFFIX
                 if self.def_suffix == loc.DEF_FILE_SUFFIX
                 else loc.DEF_FILE_SUFFIX)
        return [p for p in
                (loc.dist_txn_def_path(txn_id, self.def_suffix),
                 loc.dist_txn_def_path(txn_id, other))
                if self.storage.exists(p)]

    def save_dist_transaction(self, txn: Transaction) -> str:
        # re-saving an existing handle keeps ITS format (overwrite in
        # place), a fresh handle takes the catalog's
        return txns.save_dist_transaction(txn, self._dtxn_suffix(txn.id))

    def load_dist_transaction(self, txn_id: str) -> Transaction:
        txn = txns.load_dist_transaction(self.tree, txn_id,
                                         self._dtxn_suffix(txn_id))
        # install payload-replay ops so resolvable conflicts roll forward
        for action in list(txn.write_actions):
            txn.ops.append(self._payload_replay_op(action))
        return txn

    def dist_transaction_exists(self, txn_id: str) -> bool:
        # existence is a question, not a resume: answer it on the
        # non-raising surface so an ambiguous BOTH-suffix handle reads
        # as "exists" (ADVICE r11) — only load/save refuse ambiguity
        return bool(self.dtxn_def_paths(txn_id))

    def list_dist_transactions(self) -> list[str]:
        """sys.dtxns virtualization support (A36)."""
        out = []
        for path in self.storage.list(loc.DIST_TXN_DEF_DIR + "/"):
            name = path.rsplit("/", 1)[-1]
            for sfx in (loc.DEF_FILE_SUFFIX, loc.BINPB_FILE_SUFFIX):
                if name.endswith(sfx):
                    txn_id = name[:-len(sfx)]
                    if txn_id not in out:   # both-suffix dup → one row
                        out.append(txn_id)
                    break
        return out

    # --- key helpers --------------------------------------------------------

    def _ns_key(self, ns: str) -> str:
        return loc.namespace_key(
            ns, self.catalog_def.namespace_name_max_size_bytes)

    def _tbl_key(self, ns: str, tbl: str) -> str:
        return loc.table_key(ns, tbl,
                             self.catalog_def.namespace_name_max_size_bytes,
                             self.catalog_def.table_name_max_size_bytes)

    def _view_key(self, ns: str, view: str) -> str:
        return loc.view_key(ns, view,
                            self.catalog_def.namespace_name_max_size_bytes,
                            self.catalog_def.view_name_max_size_bytes)

    # --- namespaces (A6-A11) ------------------------------------------------

    def show_namespaces(self, txn: Transaction) -> list[str]:
        """A6 — in-order traversal filtered to namespace keys
        (Olympia.java:171-190)."""
        txn.record_read(Action(ActionType.CATALOG_SHOW_NAMESPACES, ""))
        ns_max = self.catalog_def.namespace_name_max_size_bytes
        return [loc.namespace_name_from_key(k)
                for k, _ in self.tree.traverse(txn.running_root)
                if loc.is_namespace_key(k, ns_max)]

    def namespace_exists(self, txn: Transaction, ns: str) -> bool:
        """A7 (Olympia.java:192-207)."""
        txn.record_read(Action(ActionType.NAMESPACE_EXISTS, self._ns_key(ns)))
        return self.tree.search(txn.running_root, self._ns_key(ns)) is not None

    def describe_namespace(self, txn: Transaction, ns: str) -> NamespaceDef:
        """A8 (Olympia.java:209-229)."""
        key = self._ns_key(ns)
        txn.record_read(Action(ActionType.NAMESPACE_DESCRIBE, key))
        path = self.tree.search(txn.running_root, key)
        if path is None:
            raise ObjectNotFoundError(f"namespace {ns}")
        return read_def(self.storage.read_cached(path), path)

    def create_namespace(self, txn: Transaction, ns: str,
                         properties: dict | None = None) -> None:
        """A9 (Olympia.java:231-254)."""
        key = self._ns_key(ns)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, key) is not None:
                raise ObjectAlreadyExistsError(f"namespace {ns}")
            def_path = loc.new_namespace_def_path(ns, self.def_suffix)
            self.storage.write_atomic(
                def_path,
                write_def(NamespaceDef(properties=properties or {}),
                          def_path))
            self.tree.set_value(t.running_root, key, def_path)
            return Action(ActionType.NAMESPACE_CREATE, key)
        txn.apply(op)

    def alter_namespace(self, txn: Transaction, ns: str, properties: dict,
                        action_type: ActionType = ActionType.NAMESPACE_ALTER
                        ) -> None:
        """A10 — full replace (Olympia.java:256-297)."""
        key = self._ns_key(ns)

        def op(t: Transaction) -> Action:
            cur_path = self.tree.search(t.running_root, key)
            if cur_path is None:
                raise ObjectNotFoundError(f"namespace {ns}")
            cur: NamespaceDef = read_def(self.storage.read_cached(cur_path), cur_path)
            cur.properties = dict(properties)
            def_path = loc.new_namespace_def_path(ns, self.def_suffix)
            self.storage.write_atomic(def_path, write_def(cur, def_path))
            self.tree.set_value(t.running_root, key, def_path)
            return Action(action_type, key)
        txn.apply(op)

    def set_namespace_properties(self, txn: Transaction, ns: str,
                                 props: dict) -> None:
        """A10 set-properties variant (OlympiaIcebergCatalog.java:253-300)."""
        cur = self.describe_namespace(txn, ns).properties
        cur.update(props)
        self.alter_namespace(txn, ns, cur,
                             ActionType.NAMESPACE_ALTER_SET_PROPERTIES)

    def unset_namespace_properties(self, txn: Transaction, ns: str,
                                   keys: list[str]) -> None:
        cur = self.describe_namespace(txn, ns).properties
        for k in keys:
            cur.pop(k, None)
        self.alter_namespace(txn, ns, cur,
                             ActionType.NAMESPACE_ALTER_UNSET_PROPERTIES)

    def drop_namespace(self, txn: Transaction, ns: str,
                       behavior: DropNamespaceBehavior =
                       DropNamespaceBehavior.RESTRICT) -> None:
        """A11 — RESTRICT errors if non-empty, CASCADE drops members first
        (Olympia.java:299-339)."""
        tables = self.show_tables(txn, ns)
        views = self.show_views(txn, ns)
        if behavior is DropNamespaceBehavior.RESTRICT and (tables or views):
            raise NamespaceNotEmptyError(
                f"namespace {ns} still contains {len(tables)} tables / "
                f"{len(views)} views")
        for t in tables:
            self.drop_table(txn, ns, t)
        for v in views:
            self.drop_view(txn, ns, v)
        key = self._ns_key(ns)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, key) is None:
                raise ObjectNotFoundError(f"namespace {ns}")
            self.tree.remove_key(t.running_root, key)
            return Action(ActionType.NAMESPACE_DROP, key)
        txn.apply(op)

    # --- tables (A12-A16, A18) ----------------------------------------------

    def show_tables(self, txn: Transaction, ns: str) -> list[str]:
        """A12 — traversal filtered by the C===<ns> prefix
        (Olympia.java:341-364)."""
        txn.record_read(Action(ActionType.NAMESPACE_SHOW_TABLES,
                               self._ns_key(ns)))
        ns_max = self.catalog_def.namespace_name_max_size_bytes
        tbl_max = self.catalog_def.table_name_max_size_bytes
        prefix = loc.table_key_namespace_prefix(ns, ns_max)
        return [loc.table_name_from_key(k, ns_max)[1]
                for k, _ in self.tree.traverse(txn.running_root)
                if loc.is_table_key(k, ns_max, tbl_max)
                and k.startswith(prefix)]

    def table_exists(self, txn: Transaction, ns: str, tbl: str) -> bool:
        """A13 (Olympia.java:366-381)."""
        key = self._tbl_key(ns, tbl)
        txn.record_read(Action(ActionType.TABLE_EXISTS, key))
        return self.tree.search(txn.running_root, key) is not None

    def describe_table(self, txn: Transaction, ns: str, tbl: str) -> TableDef:
        """A13 (Olympia.java:383-406). A def written by the Java
        reference is an Iceberg POINTER (proto/objects.proto:58-69 —
        id + format + ``iceberg_metadata_location``, no tracked files);
        it is hydrated here IN MEMORY from the Iceberg metadata it
        points at (schema + live data files + identity-fill constants),
        never committed — so a reference-written catalog is queryable
        in place and the reference stays the owner of its metadata."""
        key = self._tbl_key(ns, tbl)
        txn.record_read(Action(ActionType.TABLE_DESCRIBE, key))
        path = self.tree.search(txn.running_root, key)
        if path is None:
            raise ObjectNotFoundError(f"table {ns}.{tbl}")
        tdef = read_def(self.storage.read_cached(path), path)
        if (tdef.format == "ICEBERG" and not tdef.data_files
                and not tdef.schema_json and tdef.metadata_location):
            _hydrate_iceberg_pointer(tdef)
        return tdef

    def create_table(self, txn: Transaction, ns: str, tbl: str,
                     table_def: TableDef) -> None:
        """A14 — namespace must exist, table must not (Olympia.java:408-438)."""
        ns_key = self._ns_key(ns)
        key = self._tbl_key(ns, tbl)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, ns_key) is None:
                raise ObjectNotFoundError(f"namespace {ns}")
            if self.tree.search(t.running_root, key) is not None:
                raise ObjectAlreadyExistsError(f"table {ns}.{tbl}")
            def_path = loc.new_table_def_path(ns, tbl, self.def_suffix)
            self.storage.write_atomic(def_path,
                                      write_def(table_def, def_path))
            self.tree.set_value(t.running_root, key, def_path)
            return Action(ActionType.TABLE_CREATE, key)
        txn.apply(op)

    def alter_table(self, txn: Transaction, ns: str, tbl: str,
                    table_def: TableDef,
                    action_type: ActionType = ActionType.TABLE_ALTER,
                    payload: dict | None = None) -> None:
        """A15 — replace the TableDef (Olympia.java:440-491); INSERT /
        UPDATE / DELETE data ops also land here with their specific action
        types and file-list payloads (proto/actions.proto:77-92)."""
        key = self._tbl_key(ns, tbl)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, key) is None:
                raise ObjectNotFoundError(f"table {ns}.{tbl}")
            def_path = loc.new_table_def_path(ns, tbl, self.def_suffix)
            self.storage.write_atomic(def_path,
                                      write_def(table_def, def_path))
            self.tree.set_value(t.running_root, key, def_path)
            return Action(action_type, key, payload or {})
        txn.apply(op)

    def update_table_files(self, txn: Transaction, ns: str, tbl: str,
                           add_files: list, remove_paths: list[str],
                           action_type: ActionType,
                           payload: dict | None = None,
                           extra_properties: dict | None = None) -> None:
        """Data-file commit: recompute the def from CURRENT state so that
        replays after a resolvable conflict merge with concurrently
        committed files (the Spark-native analogue of Iceberg's
        refresh-and-retry in OlympiaIcebergTableOperations.java:121-189)."""
        key = self._tbl_key(ns, tbl)

        def op(t: Transaction) -> Action:
            cur_path = self.tree.search(t.running_root, key)
            if cur_path is None:
                raise ObjectNotFoundError(f"table {ns}.{tbl}")
            cur: TableDef = read_def(self.storage.read_cached(cur_path), cur_path)
            removed = set(remove_paths)
            cur.data_files = ([f for f in cur.data_files
                               if f.path not in removed] + list(add_files))
            cur.previous_metadata_location = cur_path
            if extra_properties:
                # e.g. streaming micro-batch ids — the idempotency marker
                # that makes batch replays exactly-once (SURVEY §7)
                cur.properties.update(extra_properties)
            def_path = loc.new_table_def_path(ns, tbl, self.def_suffix)
            self.storage.write_atomic(def_path, write_def(cur, def_path))
            self.tree.set_value(t.running_root, key, def_path)
            act_payload = dict(payload) if payload is not None else {
                "added": [f.path for f in add_files],
                "removed": sorted(removed)}
            # full file entries (stats included) so a resumed dist-txn
            # replay can restore them — path-only replay would lose the
            # stats that drive DML file pruning and $files reporting
            act_payload.setdefault("added_files", [{
                "path": f.path, "num_rows": f.num_rows,
                "size_bytes": f.size_bytes, "stats": f.stats,
                "dir_files": f.dir_files,
            } for f in add_files])
            return Action(action_type, key, act_payload)
        txn.apply(op)

    def drop_table(self, txn: Transaction, ns: str, tbl: str) -> None:
        """A16 (Olympia.java:493-514)."""
        key = self._tbl_key(ns, tbl)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, key) is None:
                raise ObjectNotFoundError(f"table {ns}.{tbl}")
            self.tree.remove_key(t.running_root, key)
            return Action(ActionType.TABLE_DROP, key)
        txn.apply(op)

    def rename_table(self, txn: Transaction, ns: str, tbl: str,
                     new_ns: str, new_tbl: str) -> None:
        """A18 — the reference left this TODO
        (OlympiaIcebergCatalog.java:539-541); implemented as remove+insert
        of the tree key in one transaction."""
        old_key = self._tbl_key(ns, tbl)
        new_key = self._tbl_key(new_ns, new_tbl)
        ns_key = self._ns_key(new_ns)

        def op(t: Transaction) -> Action:
            def_path = self.tree.search(t.running_root, old_key)
            if def_path is None:
                raise ObjectNotFoundError(f"table {ns}.{tbl}")
            if self.tree.search(t.running_root, ns_key) is None:
                raise ObjectNotFoundError(f"namespace {new_ns}")
            if self.tree.search(t.running_root, new_key) is not None:
                raise ObjectAlreadyExistsError(f"table {new_ns}.{new_tbl}")
            self.tree.remove_key(t.running_root, old_key)
            self.tree.set_value(t.running_root, new_key, def_path)
            return Action(ActionType.TABLE_ALTER, new_key,
                          {"renamed_from": old_key})
        txn.apply(op)

    # --- views (A17) --------------------------------------------------------

    def show_views(self, txn: Transaction, ns: str) -> list[str]:
        txn.record_read(Action(ActionType.NAMESPACE_SHOW_VIEWS,
                               self._ns_key(ns)))
        ns_max = self.catalog_def.namespace_name_max_size_bytes
        view_max = self.catalog_def.view_name_max_size_bytes
        prefix = loc.view_key_namespace_prefix(ns, ns_max)
        return [loc.view_name_from_key(k, ns_max)[1]
                for k, _ in self.tree.traverse(txn.running_root)
                if loc.is_view_key(k, ns_max, view_max)
                and k.startswith(prefix)]

    def view_exists(self, txn: Transaction, ns: str, view: str) -> bool:
        key = self._view_key(ns, view)
        txn.record_read(Action(ActionType.VIEW_EXISTS, key))
        return self.tree.search(txn.running_root, key) is not None

    def describe_view(self, txn: Transaction, ns: str, view: str) -> ViewDef:
        key = self._view_key(ns, view)
        txn.record_read(Action(ActionType.VIEW_DESCRIBE, key))
        path = self.tree.search(txn.running_root, key)
        if path is None:
            raise ObjectNotFoundError(f"view {ns}.{view}")
        return read_def(self.storage.read_cached(path), path)

    def create_view(self, txn: Transaction, ns: str, view: str,
                    view_def: ViewDef, replace: bool = False) -> None:
        """A17 create/replace (Olympia.java:560-640)."""
        ns_key = self._ns_key(ns)
        key = self._view_key(ns, view)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, ns_key) is None:
                raise ObjectNotFoundError(f"namespace {ns}")
            exists = self.tree.search(t.running_root, key) is not None
            if exists and not replace:
                raise ObjectAlreadyExistsError(f"view {ns}.{view}")
            def_path = loc.new_view_def_path(ns, view, self.def_suffix)
            self.storage.write_atomic(def_path,
                                      write_def(view_def, def_path))
            self.tree.set_value(t.running_root, key, def_path)
            return Action(ActionType.VIEW_REPLACE if exists
                          else ActionType.VIEW_CREATE, key)
        txn.apply(op)

    def replace_view(self, txn: Transaction, ns: str, view: str,
                     view_def: ViewDef) -> None:
        self.create_view(txn, ns, view, view_def, replace=True)

    def drop_view(self, txn: Transaction, ns: str, view: str) -> None:
        key = self._view_key(ns, view)

        def op(t: Transaction) -> Action:
            if self.tree.search(t.running_root, key) is None:
                raise ObjectNotFoundError(f"view {ns}.{view}")
            self.tree.remove_key(t.running_root, key)
            return Action(ActionType.VIEW_DROP, key)
        txn.apply(op)

    def rename_view(self, txn: Transaction, ns: str, view: str,
                    new_ns: str, new_view: str) -> None:
        """A18 view variant (OlympiaIcebergCatalog.java:611-613 TODO)."""
        old_key = self._view_key(ns, view)
        new_key = self._view_key(new_ns, new_view)

        def op(t: Transaction) -> Action:
            def_path = self.tree.search(t.running_root, old_key)
            if def_path is None:
                raise ObjectNotFoundError(f"view {ns}.{view}")
            if self.tree.search(t.running_root, new_key) is not None:
                raise ObjectAlreadyExistsError(f"view {new_ns}.{new_view}")
            self.tree.remove_key(t.running_root, old_key)
            self.tree.set_value(t.running_root, new_key, def_path)
            return Action(ActionType.VIEW_REPLACE, new_key,
                          {"renamed_from": old_key})
        txn.apply(op)

    # --- time travel / history / rollback / export (A27-A31) ----------------

    def at_version(self, version: int) -> Transaction:
        """A27 — read-only snapshot transaction at a version."""
        latest = self.tree.load_latest_root()
        root = self.tree.find_root_for_version(latest, version)
        return txns.begin(self.tree, self.catalog_def.txn_isolation_level,
                          self.catalog_def.txn_ttl_millis,
                          at_root=root, read_only=True)

    def before_timestamp(self, ts_millis: int) -> Transaction:
        """A28 — newest root created before the timestamp."""
        latest = self.tree.load_latest_root()
        root = self.tree.find_root_before_timestamp(latest, ts_millis)
        return txns.begin(self.tree, self.catalog_def.txn_isolation_level,
                          self.catalog_def.txn_ttl_millis,
                          at_root=root, read_only=True)

    def history(self) -> list[dict]:
        """A29 — root chain newest→oldest."""
        latest = self.tree.load_latest_root()
        return [{"version": r.version,
                 "created_at_millis": r.created_at_millis,
                 "rollback_from": r.rollback_from_root_path}
                for r in self.tree.list_roots(latest)]

    def rollback_to(self, version: int) -> RootNode:
        """A30 — roll-forward rollback (docs/format.md "Catalog Rollback"):
        commit v+1 as a copy of the target root with rollback_from_root
        pointing at the abandoned head."""
        latest = self.tree.load_latest_root()
        target = self.tree.find_root_for_version(latest, version)
        new_root = self.tree.load_root(target.path)
        new_root.rollback_from_root_path = latest.path
        new_root.previous_root_path = latest.path
        new_root.actions = []
        new_version = latest.version + 1
        self.tree.write_root(new_root, new_version)
        self.tree.try_write_latest_hint(new_version)
        return new_root

    def export_snapshot(self, name: str, dest: str | Storage,
                        mode: str = "full",
                        version: int | None = None) -> str:
        """A31 — copy a root (+ reachable files per mode) to a new prefix
        and record it in CatalogDef.exported_snapshots
        (docs/format.md "Snapshot Export").

        mode: 'minimal' = root file only; 'partial' = root + tree nodes;
        'full' = root + nodes + def files (data files are table payload,
        referenced by absolute path either way).

        The destination also receives latest/oldest version hints for the
        exported version — root discovery probes the hints then falls
        back to v0, and an export of version n has no root/0, so without
        hints a (full) export could never be OPENED as a catalog at the
        destination prefix."""
        dest_storage = dest if isinstance(dest, Storage) else storage_for(dest)

        def copy_if_absent(path: str) -> None:
            # node/def/root files are content-immutable at their uuid- or
            # version-addressed paths — an existing destination file IS
            # the same bytes, so a re-export (incremental refresh of the
            # same destination) skips it instead of failing the seal
            if not dest_storage.exists(path):
                dest_storage.write_atomic(path, self.storage.read_cached(path))

        latest = self.tree.load_latest_root()
        root = (latest if version is None
                else self.tree.find_root_for_version(latest, version))
        root_path = root.path
        copy_if_absent(root_path)
        exported_version = loc.version_from_root_path(root_path)
        try:
            # overwrite, not write_atomic: a SECOND export to the same
            # destination must repoint the latest hint or the new root
            # stays invisible (put-if-absent would fail and leave it
            # stale) — but only FORWARD: exporting an older version to a
            # destination that already holds a newer export must not
            # regress the hint (dest roots are sparse, so the upward probe
            # stops at the first gap and the newer root would vanish).
            # Read-compare-write; hints are advisory so a race is fine.
            # The oldest hint keeps its first value (put-if-absent is
            # exactly min semantics for monotonically growing exports).
            cur_hint = -1
            try:
                cur_hint = int(
                    dest_storage.read(loc.LATEST_HINT_PATH).decode())
            except Exception:  # noqa: BLE001 — absent/garbled hint
                pass
            if exported_version > cur_hint:
                dest_storage.overwrite(loc.LATEST_HINT_PATH,
                                       str(exported_version).encode())
        except Exception:  # noqa: BLE001 — hints are advisory by spec
            pass
        try:
            dest_storage.write_atomic(loc.OLDEST_HINT_PATH,
                                      str(exported_version).encode())
        except Exception:  # noqa: BLE001
            pass
        copied = [root_path]
        if mode in ("partial", "full"):
            for node_path in self.tree.reachable_node_paths(root):
                if node_path != root_path:
                    copy_if_absent(node_path)
                    copied.append(node_path)
        if mode == "full":
            for _k, def_path in self.tree.traverse(root):
                copy_if_absent(def_path)
                copied.append(def_path)
            copy_if_absent(root.catalog_def_path)
        # record the export on the catalog definition (proto/objects.proto:50)
        # plus its creation time — the input to the export.retention_millis
        # policy expire_versions applies (txn_ttl-style version GC)
        self.catalog_def.exported_snapshots[name] = root_path
        self.catalog_def.properties[
            f"export.{name}.created_at_millis"] = str(int(time.time() * 1000))
        new_def_path = loc.new_catalog_def_path(self.def_suffix)
        self.storage.write_atomic(new_def_path,
                write_def(self.catalog_def, new_def_path))
        self.catalog_def_path = new_def_path
        txn = self.begin()

        def op(t: Transaction) -> Action:
            t.running_root.catalog_def_path = new_def_path
            t.running_root.dirty = True
            return Action(ActionType.NAMESPACE_ALTER, "catalog_def",
                          {"export": name})
        txn.apply(op)
        self.commit(txn)
        return root_path

    # --- tags: named immutable version refs (A27 companion) -----------------

    def _commit_catalog_def(self, payload: dict, mutate) -> None:
        """Apply ``mutate(properties)`` to a COPY of the CatalogDef
        properties, persist the mutated CatalogDef to a new def file, and
        commit a root pointing at it — the same write-def-then-commit
        sequence export_snapshot uses (docs/format.md "Catalog Definition
        File"). The in-memory CatalogDef and def-path cursor advance only
        AFTER the commit succeeds, so a failed or conflicting commit
        leaves this process's view equal to durable state (the orphaned
        def file is inert — nothing points at it, GC may reclaim it)."""
        new_props = dict(self.catalog_def.properties)
        mutate(new_props)
        prev_props = self.catalog_def.properties
        new_def_path = loc.new_catalog_def_path(self.def_suffix)
        self.catalog_def.properties = new_props
        try:
            self.storage.write_atomic(new_def_path,
                write_def(self.catalog_def, new_def_path))
            txn = self.begin()

            def op(t: Transaction) -> Action:
                t.running_root.catalog_def_path = new_def_path
                t.running_root.dirty = True
                return Action(ActionType.NAMESPACE_ALTER, "catalog_def",
                              payload)
            txn.apply(op)
            self.commit(txn)
        except BaseException:
            self.catalog_def.properties = prev_props
            raise
        self.catalog_def_path = new_def_path

    def create_tag(self, name: str, version: int | None = None,
                   replace: bool = False) -> int:
        """Tag a catalog version with an immutable name (Delta/Iceberg-
        style refs, catalog-WIDE here because the whole catalog is
        versioned): ``VERSION AS OF '<tag>'`` then time-travels every
        table at once. Tags live in CatalogDef.properties (``tag.<name>``)
        so they version, export, and time-travel with the catalog itself."""
        if not re.fullmatch(r"[A-Za-z_][\w.-]*", name):
            raise ValueError(f"invalid tag name: {name!r}")
        latest = self.tree.find_latest_version()
        v = latest if version is None else int(version)
        if not 0 <= v <= latest:
            raise ValueError(f"version {v} does not exist (latest {latest})")
        if not self.storage.exists(loc.root_node_path(v)):
            raise ValueError(f"version {v} has been expired")
        key = f"tag.{name}"
        if key in self.catalog_def.properties and not replace:
            raise ValueError(f"tag already exists: {name}")
        self._commit_catalog_def(
            {"create_tag": name, "version": str(v)},
            lambda props: props.__setitem__(key, str(v)))
        return v

    def drop_tag(self, name: str) -> None:
        key = f"tag.{name}"
        if key not in self.catalog_def.properties:
            raise ObjectNotFoundError(f"tag {name}")
        self._commit_catalog_def({"drop_tag": name},
                                 lambda props: props.pop(key))

    def list_tags(self) -> dict:
        return {k[len("tag."):]: int(v)
                for k, v in sorted(self.catalog_def.properties.items())
                if k.startswith("tag.")}

    def resolve_tag(self, name: str) -> int:
        v = self.catalog_def.properties.get(f"tag.{name}")
        if v is None:
            raise ObjectNotFoundError(f"tag {name}")
        return int(v)

    # --- replay support for resumed distributed transactions ----------------

    def _payload_replay_op(self, action: Action):
        """Rebuild a replay op from a persisted action payload (used when a
        resumed distributed transaction loses its CAS). Only data-file ops
        carry enough payload to re-apply; anything else re-raises as an
        unresolvable conflict."""
        from olympia_spark.catalog.defs import DataFile
        from olympia_spark.catalog.errors import CommitConflictError

        def op(t: Transaction) -> Action:
            if action.type is ActionType.TABLE_INSERT and "added" in \
                    action.def_payload:
                key = action.object_key
                cur_path = self.tree.search(t.running_root, key)
                if cur_path is None:
                    raise ObjectNotFoundError(key)
                cur: TableDef = read_def(self.storage.read_cached(cur_path), cur_path)
                have = {f.path for f in cur.data_files}
                full = {e["path"]: e for e in
                        action.def_payload.get("added_files", [])}
                cur.data_files += [
                    DataFile(path=p,
                             num_rows=full.get(p, {}).get("num_rows", -1),
                             size_bytes=full.get(p, {}).get("size_bytes", -1),
                             stats=full.get(p, {}).get("stats", {}),
                             dir_files=full.get(p, {}).get("dir_files", -1))
                    for p in action.def_payload["added"] if p not in have]
                # derive ns/table from the padded object key so the new def
                # lands under the table's own name, not a fixed placeholder
                ns, tbl = loc.parse_table_key(
                    key, self.catalog_def.namespace_name_max_size_bytes,
                    self.catalog_def.table_name_max_size_bytes)
                def_path_new = loc.new_table_def_path(ns, tbl, self.def_suffix)
                self.storage.write_atomic(def_path_new,
                                          write_def(cur, def_path_new))
                self.tree.set_value(t.running_root, key, def_path_new)
                return action
            raise CommitConflictError(
                f"cannot replay {action.type} from payload in a resumed "
                f"transaction")
        return op


def now_millis() -> int:
    return int(time.time() * 1000)


# (resolved metadata path, mtime_ns, size) -> (schema_json, files,
# ident_fill, fmtver): memoized because describe_table runs several
# times per statement and a full manifest walk per call would dominate
# planning latency (review r11). The key carries the file's mtime+size
# because metadata at a FIXED path can be rewritten in place (our own
# export_iceberg_metadata overwrites v1.metadata.json) — a bare-path
# key would serve the stale snapshot for the life of the process
# (review r11 pass-2 #2). Bounded FIFO so churning tables don't leak.
_POINTER_HYDRATION: dict[tuple, tuple] = {}
_POINTER_HYDRATION_MAX = 64


def _hydrate_iceberg_pointer(tdef: TableDef) -> None:
    """Materialize a reference-written Iceberg-pointer TableDef for
    reading: resolve its current snapshot's live files + schema from
    the Iceberg metadata (the refresh the reference's
    OlympiaIcebergTableOperations.java:87-119 performs per read).
    Mutates the in-memory def only. Snapshots carrying v2 delete files
    (r12) stamp the delete obligation as ``iceberg.mor_deletes`` —
    resolved equality columns + per-data-file sequence/partition scope
    — which the engine's MOR-aware scan applies at assembly
    (engine._iceberg_mor_net); unknown delete kinds, delete files with
    no equality ids, and the MOR×identity-fill combination refuse
    loudly HERE rather than reading wrong."""
    import dataclasses

    import hashlib as _hashlib

    from olympia_spark.catalog import iceberg as il
    mloc = il.resolve_metadata_location(tdef.metadata_location)
    try:
        # CONTENT hash, not mtime+size: metadata rewritten in place
        # within one mtime tick at equal length would still serve the
        # stale snapshot (review r11 pass-3 #4 — memory blind-spot
        # class #2). The metadata JSON is KBs; hashing it is noise next
        # to the manifest walk the cache exists to skip. ValueError is
        # _local_path's non-local-scheme refusal — those paths simply
        # don't cache (OSError likewise: vanished/unstatable file).
        key = (mloc, _hashlib.md5(il._read_bytes(mloc)).hexdigest())
    except (OSError, ValueError):
        key = None
    hit = _POINTER_HYDRATION.get(key) if key else None
    if hit is None:
        meta = il.load_table_metadata(mloc)
        schema = il.iceberg_schema_to_spark(il.current_schema(meta))
        snapshot = il.select_snapshot(meta, None)
        entries, deletes = (il.live_files(snapshot) if snapshot
                            else ([], []))
        mor = ""
        if deletes:
            # v2 merge-on-read snapshot: serve it IN PLACE (r11 VERDICT
            # missing #2 — the reference reads these natively through
            # the Iceberg library, OlympiaIcebergTableScan.java). The
            # def carries the delete obligation + per-data-file scope
            # (seq, partition) as metadata; the engine's read path
            # applies them at scan assembly (_iceberg_mor_net).
            # Equality ids resolve to column names HERE, against the
            # same schema snapshot — unknown ids refuse loudly now, not
            # at some later read.
            import json as _json
            mor = _json.dumps({
                "deletes": il.resolve_mor_deletes(
                    deletes, il.field_names_by_id(
                        il.current_schema(meta))),
                "data": [{"file_path": e["file_path"],
                          "sequence_number": e["sequence_number"],
                          "partition": e.get("partition") or {}}
                         for e in entries],
            }, sort_keys=True, default=str)
        files, ident_fill = il.adopted_files(meta, schema, entries)
        if mor and ident_fill:
            # identity-partitioned estates may OMIT the identity column
            # from data files (readers fill it from manifest constants)
            # — the MOR net-rows scan reads the files directly and
            # would serve those columns as NULL. Refuse loudly rather
            # than silently NULLing (review r12 pass-1); compact the
            # deletes away upstream, or drop the identity spec.
            raise ValueError(
                f"Iceberg pointer {tdef.metadata_location} combines "
                f"merge-on-read deletes with identity-fill partition "
                f"columns ({ident_fill}); the in-place MOR read cannot "
                f"fill manifest constants — compact the table's "
                f"deletes first")
        hit = (schema.json(), files, ident_fill,
               str(meta.get("format-version", 1)), mor)
        if key:
            while len(_POINTER_HYDRATION) >= _POINTER_HYDRATION_MAX:
                _POINTER_HYDRATION.pop(next(iter(_POINTER_HYDRATION)))
            _POINTER_HYDRATION[key] = hit
    schema_json, files, ident_fill, fmtver, mor = hit
    tdef.schema_json = schema_json
    # fresh DataFile copies per describe — stats dicts included, since
    # replace() would alias the cached dict and an in-place stats edit
    # would poison every later hydration of this pointer (ADVICE r11)
    tdef.data_files = [dataclasses.replace(f, stats=dict(f.stats))
                       for f in files]
    # EVERY hydration stamp is overwrite-or-pop, never keep-if-present:
    # each describes THIS hydration's snapshot; a stale copy that rode
    # in on persisted properties (a pre-fix ANALYZE/ALTER commit, an
    # exported def) would replay the OLD file list, OLD deletes or an
    # OLD identity-fill column set over a since-evolved estate (review
    # r12 pass-2 reproduced the mor case; pass-3 flagged the
    # setdefault twins)
    for k, v in (("iceberg.identity_fill", ident_fill),
                 ("iceberg.mor_deletes", mor)):
        if v:
            tdef.properties[k] = v
        else:
            tdef.properties.pop(k, None)
    tdef.properties["iceberg.format-version"] = fmtver
    # transient marker: THIS def's files/schema/stamps are hydration
    # output. engine._persistable keys its strip on it, so an ADOPTED
    # (materialized, snapshot-pinned) def — same format+pointer shape,
    # but with PERSISTED files — is never pointer-ized by an ALTER
    # (review r12 pass-4). Stripped with the rest at every persist.
    tdef.properties["iceberg.hydrated"] = "true"
