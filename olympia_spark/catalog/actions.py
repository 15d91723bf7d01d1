"""Action log + optimistic-commit conflict analysis (A32, A38).

Every catalog operation appends a typed action to its transaction
(reference action/Action.java; types proto/actions.proto:26-59). On a
commit that loses the storage CAS, the pending actions are analyzed
pairwise against every action committed since the transaction began
(reference AnalyzeActionConflicts.java:22-80 dispatch, per-type 82-353):

* no conflict         — commit can be retried against the new root as-is
* resolvable conflict — retry allowed, but the op must be re-applied
                        against the new state (e.g. concurrent INSERTs to
                        one table merge their file lists)
* unresolvable        — abort (CommitConflictError)

Matrix implemented from the reference's dispatch (same object key only):

  committed ↓ / pending →   effect
  TABLE_DROP      × {ALTER*, INSERT, UPDATE, DELETE}      unresolvable
  TABLE_UPDATE    × {INSERT, UPDATE, DELETE, ALTER*}      unresolvable
  TABLE_DELETE    × {INSERT, ALTER*}                      resolvable
  TABLE_INSERT    × {INSERT, UPDATE, DELETE, ALTER*}      resolvable
  TABLE_ALTER*    × {ALTER*}                              unresolvable
  TABLE_CREATE    × {CREATE}                              unresolvable
  NAMESPACE_ALTER*× {ALTER*}                              unresolvable
  NAMESPACE_CREATE× {CREATE}                              unresolvable
  VIEW_DROP       × {REPLACE}                             unresolvable
  reads           × anything                              no conflict

The reference left SERIALIZABLE read-write conflicts TODO
(AnalyzeActionConflicts.java:141-149); per SURVEY §2 A32 we implement the
documented intent: under SERIALIZABLE a committed write to a table that a
pending TABLE_SELECT read is an unresolvable conflict (the snapshot the
read served from is no longer the serial order).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum


class ActionType(str, Enum):
    """proto/actions.proto:27-54 (ActionDef.ActionType)."""
    CATALOG_SHOW_NAMESPACES = "CATALOG_SHOW_NAMESPACES"
    NAMESPACE_EXISTS = "NAMESPACE_EXISTS"
    NAMESPACE_DESCRIBE = "NAMESPACE_DESCRIBE"
    NAMESPACE_CREATE = "NAMESPACE_CREATE"
    NAMESPACE_ALTER = "NAMESPACE_ALTER"
    NAMESPACE_ALTER_SET_PROPERTIES = "NAMESPACE_ALTER_SET_PROPERTIES"
    NAMESPACE_ALTER_UNSET_PROPERTIES = "NAMESPACE_ALTER_UNSET_PROPERTIES"
    NAMESPACE_DROP = "NAMESPACE_DROP"
    NAMESPACE_SHOW_TABLES = "NAMESPACE_SHOW_TABLES"
    NAMESPACE_SHOW_VIEWS = "NAMESPACE_SHOW_VIEWS"
    TABLE_EXISTS = "TABLE_EXISTS"
    TABLE_DESCRIBE = "TABLE_DESCRIBE"
    TABLE_SELECT = "TABLE_SELECT"
    TABLE_CREATE = "TABLE_CREATE"
    TABLE_ALTER = "TABLE_ALTER"
    TABLE_ALTER_ADD_COLUMNS = "TABLE_ALTER_ADD_COLUMNS"
    TABLE_ALTER_REMOVE_COLUMNS = "TABLE_ALTER_REMOVE_COLUMNS"
    TABLE_INSERT = "TABLE_INSERT"
    TABLE_UPDATE = "TABLE_UPDATE"
    TABLE_DELETE = "TABLE_DELETE"
    TABLE_DROP = "TABLE_DROP"
    VIEW_EXISTS = "VIEW_EXISTS"
    VIEW_DESCRIBE = "VIEW_DESCRIBE"
    VIEW_CREATE = "VIEW_CREATE"
    VIEW_REPLACE = "VIEW_REPLACE"
    VIEW_DROP = "VIEW_DROP"


#: read-only action types — never conflict as the *committed* side
READ_ACTIONS = frozenset({
    ActionType.CATALOG_SHOW_NAMESPACES, ActionType.NAMESPACE_EXISTS,
    ActionType.NAMESPACE_DESCRIBE, ActionType.NAMESPACE_SHOW_TABLES,
    ActionType.NAMESPACE_SHOW_VIEWS, ActionType.TABLE_EXISTS,
    ActionType.TABLE_DESCRIBE, ActionType.TABLE_SELECT,
    ActionType.VIEW_EXISTS, ActionType.VIEW_DESCRIBE,
})

#: actions that modify a table's data or shape (for SERIALIZABLE checks)
TABLE_WRITE_ACTIONS = frozenset({
    ActionType.TABLE_CREATE, ActionType.TABLE_ALTER,
    ActionType.TABLE_ALTER_ADD_COLUMNS, ActionType.TABLE_ALTER_REMOVE_COLUMNS,
    ActionType.TABLE_INSERT, ActionType.TABLE_UPDATE,
    ActionType.TABLE_DELETE, ActionType.TABLE_DROP,
})

_ALTERS = {ActionType.TABLE_ALTER, ActionType.TABLE_ALTER_ADD_COLUMNS,
           ActionType.TABLE_ALTER_REMOVE_COLUMNS}
_NS_ALTERS = {ActionType.NAMESPACE_ALTER,
              ActionType.NAMESPACE_ALTER_SET_PROPERTIES,
              ActionType.NAMESPACE_ALTER_UNSET_PROPERTIES}


@dataclass
class Action:
    type: ActionType
    object_key: str
    # type-specific payload (TableInsertDef/TableSelectDef/… analogues,
    # proto/actions.proto:61-103): file lists, predicate, column names
    def_payload: dict = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps({"type": self.type.value,
                           "def": self.def_payload}, sort_keys=True)

    @staticmethod
    def from_row(object_key: str, value: str) -> "Action":
        d = json.loads(value)
        return Action(type=ActionType(d["type"]), object_key=object_key,
                      def_payload=d.get("def", {}))


NO_CONFLICT = "no_conflict"
RESOLVABLE = "resolvable"
UNRESOLVABLE = "unresolvable"


def _adds_constraint(a: Action) -> bool:
    """TABLE_ALTER that installs a CHECK constraint: its validity claim
    ('every existing row satisfies the predicate') is tied to the exact
    snapshot it validated, so it can never roll forward past a
    concurrent table write in EITHER direction — a writer that lost the
    CAS never enforced the new constraint, and a constraint that lost
    the CAS never validated the new files."""
    return (a.type is ActionType.TABLE_ALTER
            and "add_constraint" in a.def_payload)


_TABLE_WRITES = {ActionType.TABLE_INSERT, ActionType.TABLE_UPDATE,
                 ActionType.TABLE_DELETE}


def analyze(pending: Action, committed: Action,
            isolation_level: str) -> str:
    """Pairwise conflict verdict (AnalyzeActionConflicts.analyze)."""
    p, c = pending.type, committed.type
    same = pending.object_key == committed.object_key

    if c in READ_ACTIONS:
        return NO_CONFLICT
    if same and ((_adds_constraint(committed) and p in _TABLE_WRITES)
                 or (_adds_constraint(pending) and c in _TABLE_WRITES)):
        return UNRESOLVABLE
    if not same:
        # SERIALIZABLE: a committed write still conflicts a pending read
        # of the same table even though keys differ per action row shape —
        # keys here identify the object, so same-key is the table match.
        return NO_CONFLICT

    if c is ActionType.TABLE_DROP:
        if p in _ALTERS | {ActionType.TABLE_INSERT, ActionType.TABLE_UPDATE,
                           ActionType.TABLE_DELETE}:
            return UNRESOLVABLE
    elif c is ActionType.TABLE_UPDATE:
        if p in {ActionType.TABLE_INSERT, ActionType.TABLE_UPDATE,
                 ActionType.TABLE_DELETE} | _ALTERS:
            return UNRESOLVABLE
    elif c is ActionType.TABLE_DELETE:
        if p in {ActionType.TABLE_INSERT} | _ALTERS:
            return RESOLVABLE
    elif c is ActionType.TABLE_INSERT:
        if p in {ActionType.TABLE_INSERT, ActionType.TABLE_UPDATE,
                 ActionType.TABLE_DELETE} | _ALTERS:
            return RESOLVABLE
    elif c in _ALTERS:
        if p in _ALTERS:
            return UNRESOLVABLE
    elif c is ActionType.TABLE_CREATE:
        if p is ActionType.TABLE_CREATE:
            return UNRESOLVABLE
    elif c in _NS_ALTERS:
        if p in _NS_ALTERS:
            return UNRESOLVABLE
    elif c is ActionType.NAMESPACE_CREATE:
        if p is ActionType.NAMESPACE_CREATE:
            return UNRESOLVABLE
    elif c is ActionType.VIEW_DROP:
        if p is ActionType.VIEW_REPLACE:
            return UNRESOLVABLE

    # SERIALIZABLE extension: committed table write × pending read of the
    # same table invalidates the snapshot the read was served from.
    if (isolation_level == "SERIALIZABLE"
            and c in TABLE_WRITE_ACTIONS
            and p is ActionType.TABLE_SELECT):
        return UNRESOLVABLE

    return NO_CONFLICT


def analyze_all(pending: list[Action], committed: list[Action],
                isolation_level: str) -> str:
    """Worst verdict over the pending × committed matrix
    (TreeOperations.java:944-967 invocation pattern)."""
    worst = NO_CONFLICT
    for c in committed:
        for p in pending:
            verdict = analyze(p, c, isolation_level)
            if verdict == UNRESOLVABLE:
                return UNRESOLVABLE
            if verdict == RESOLVABLE:
                worst = RESOLVABLE
    return worst
