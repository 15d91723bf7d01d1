"""Catalog & transaction plane — the reference's real logic, in Python.

The reference (olympiaformat/olympia) is a storage-only lakehouse catalog:
a versioned copy-on-write B-tree of catalog objects persisted as Arrow IPC
node files + definition files directly on object storage, coordinated by a
single put-if-absent primitive (reference docs/format.md). This package
reimplements that plane driver-side — catalog metadata is KB–MB scale, so
none of it needs the cluster; the cluster-facing data plane lives in
:mod:`olympia_spark.engine` on top of it.

Modules:

* ``storage``     — storage ops + atomic put-if-absent (A33, A34)
* ``locations``   — file paths & object key encoding (on-disk contract)
* ``defs``        — object definitions (CatalogDef, TableDef, …)
* ``tree``        — the versioned B-tree kernel over Arrow IPC (A19-A30)
* ``actions``     — action log + conflict analysis (A32, A38)
* ``transactions``— transaction handle + optimistic commit loop (A3-A5)
* ``catalog``     — the catalog API surface (A1-A18, A27-A31)
"""

from olympia_spark.catalog.catalog import Catalog
from olympia_spark.catalog.defs import (CatalogDef, NamespaceDef, TableDef,
                                        ViewDef)
from olympia_spark.catalog.errors import (CommitConflictError,
                                          ObjectAlreadyExistsError,
                                          ObjectNotFoundError)
from olympia_spark.catalog.storage import LocalStorage, Storage

__all__ = [
    "Catalog", "CatalogDef", "NamespaceDef", "TableDef", "ViewDef",
    "Storage", "LocalStorage",
    "ObjectNotFoundError", "ObjectAlreadyExistsError", "CommitConflictError",
]
