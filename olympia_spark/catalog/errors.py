"""Exception hierarchy for the catalog plane (reference: core/.../exception/)."""

from __future__ import annotations


class OlympiaError(Exception):
    """Base for all catalog-plane errors."""


class StorageReadFailureError(OlympiaError):
    pass


class StorageWriteFailureError(OlympiaError):
    pass


class StorageAtomicSealFailureError(StorageWriteFailureError):
    """The put-if-absent lost the race — someone else created the file.

    Reference: StorageAtomicSealFailureException, thrown by the atomic
    output stream on close; triggers the commit conflict-resolution loop
    (Olympia.java:104-123).
    """


class StorageFileOpenFailureError(StorageReadFailureError):
    """File does not exist (404) — used by latest-root probing."""


class ObjectNotFoundError(OlympiaError):
    pass


class ObjectAlreadyExistsError(OlympiaError):
    pass


class NamespaceNotEmptyError(OlympiaError):
    """DROP NAMESPACE RESTRICT on a namespace that still has tables/views."""


class CommitConflictError(OlympiaError):
    """Optimistic commit failed and conflict analysis found the pending
    actions unresolvable against the committed ones (A4/A32)."""


class TransactionValueError(OlympiaError):
    """Invalid transaction state (expired TTL, committed twice, …)."""


class MergeCardinalityError(OlympiaError):
    """MERGE matched one target row to multiple source rows (SQL MERGE
    forbids it — applying every match would duplicate the target row)."""


class CheckConstraintError(OlympiaError):
    """A write produced rows violating a table CHECK constraint."""
