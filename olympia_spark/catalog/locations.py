"""File locations + object key encoding — the on-disk contract.

Byte-exact re-expression of the reference's path and key codecs:

* Root node files live at ``vn/<reversed 64-bit binary of version>`` —
  reversed so that consecutive hot versions spread lexicographically
  across object-store key partitions (reference FileLocations.java:57-81,
  docs/format.md "Root Node File").
* Non-root nodes: ``node/<uuid4>.arrow`` (FileLocations.java:122-124).
* Definition files: ``def/{catalog|ns|table|view|dtxn}/<uuid4>[-name].json``
  (reference uses ``.binpb`` protobuf; we serialize the same information
  as JSON — documented deviation, see defs.py).
* Object keys: 4-char base64-ish type id (``B===`` namespace, ``C===``
  table, ``D===`` view) + names right-padded with spaces to the catalog's
  per-type max sizes, so keys of one type sort contiguously and namespace
  prefixes select all tables of that namespace
  (reference ObjectKeys.java:57-216, docs/format.md "Tree Key Encoding").
"""

from __future__ import annotations

import uuid

VERSION_DIR = "vn"
NODE_DIR = "node"
DEF_DIR = "def"
LATEST_HINT_PATH = f"{VERSION_DIR}/latest"
OLDEST_HINT_PATH = f"{VERSION_DIR}/oldest"

CATALOG_DEF_DIR = f"{DEF_DIR}/catalog"
NAMESPACE_DEF_DIR = f"{DEF_DIR}/ns"
TABLE_DEF_DIR = f"{DEF_DIR}/table"
VIEW_DEF_DIR = f"{DEF_DIR}/view"
DIST_TXN_DEF_DIR = f"{DEF_DIR}/dtxn"

DEF_FILE_SUFFIX = ".json"
# reference FileLocations.java:43 PROTOBUF_BINARY_FILE_SUFFIX — def
# files in a reference-format catalog (proto_io.py interop lane)
BINPB_FILE_SUFFIX = ".binpb"
ARROW_FILE_SUFFIX = ".arrow"

_VERSION_BITS = 64

# System internal keys (reference ObjectKeys.java:24-55)
CATALOG_DEFINITION = "catalog_def"
PREVIOUS_ROOT_NODE = "previous_root"
ROLLBACK_FROM_ROOT_NODE = "rollback_from_root"
CREATED_AT_MILLIS = "created_at_millis"
NUMBER_OF_KEYS = "n_keys"
NUMBER_OF_ACTIONS = "n_actions"
SYSTEM_INTERNAL_KEYS = frozenset({
    CATALOG_DEFINITION, PREVIOUS_ROOT_NODE, ROLLBACK_FROM_ROOT_NODE,
    CREATED_AT_MILLIS, NUMBER_OF_KEYS, NUMBER_OF_ACTIONS,
})

_TYPE_ID_LEN = 4
NAMESPACE_TYPE_ID = "B==="
TABLE_TYPE_ID = "C==="
VIEW_TYPE_ID = "D==="


# --- root node version paths ------------------------------------------------

def root_node_path(version: int) -> str:
    """vn/<reversed 64-bit zero-padded binary> (FileLocations.java:72-81)."""
    if version < 0:
        raise ValueError("version must be non-negative")
    binary = format(version, f"0{_VERSION_BITS}b")
    return f"{VERSION_DIR}/{binary[::-1]}"


def is_root_node_path(path: str) -> bool:
    return (len(path) == len(VERSION_DIR) + 1 + _VERSION_BITS
            and path.startswith(f"{VERSION_DIR}/")
            and set(path[len(VERSION_DIR) + 1:]) <= {"0", "1"})


def version_from_root_path(path: str) -> int:
    if not is_root_node_path(path):
        raise ValueError(f"not a root node path: {path}")
    return int(path[len(VERSION_DIR) + 1:][::-1], 2)


# --- def / node file paths --------------------------------------------------

def new_node_path() -> str:
    return f"{NODE_DIR}/{uuid.uuid4()}{ARROW_FILE_SUFFIX}"


def new_catalog_def_path(suffix: str = DEF_FILE_SUFFIX) -> str:
    return f"{CATALOG_DEF_DIR}/{uuid.uuid4()}{suffix}"


def new_namespace_def_path(namespace: str,
                           suffix: str = DEF_FILE_SUFFIX) -> str:
    return f"{NAMESPACE_DEF_DIR}/{uuid.uuid4()}-{namespace}{suffix}"


def new_table_def_path(namespace: str, table: str,
                       suffix: str = DEF_FILE_SUFFIX) -> str:
    return f"{TABLE_DEF_DIR}/{uuid.uuid4()}-{namespace}-{table}{suffix}"


def new_view_def_path(namespace: str, view: str,
                      suffix: str = DEF_FILE_SUFFIX) -> str:
    return f"{VIEW_DEF_DIR}/{uuid.uuid4()}-{namespace}-{view}{suffix}"


def dist_txn_def_path(txn_id: str, suffix: str = DEF_FILE_SUFFIX) -> str:
    return f"{DIST_TXN_DEF_DIR}/{txn_id}{suffix}"


# --- object key encoding ----------------------------------------------------

_FORBIDDEN = set(range(0x00, 0x20)) | {0x20, 0x7F}


def validate_object_name(name: str, max_size: int, kind: str) -> None:
    if not name:
        raise ValueError(f"{kind} name must be non-empty")
    if len(name.encode()) > max_size:
        raise ValueError(f"{kind} name {name!r} exceeds max size {max_size}")
    if any(ord(c) in _FORBIDDEN for c in name):
        raise ValueError(f"{kind} name {name!r} contains forbidden characters")


def _pad(name: str, size: int) -> str:
    return name + " " * (size - len(name))


def namespace_key(namespace: str, ns_max: int) -> str:
    validate_object_name(namespace, ns_max, "namespace")
    return NAMESPACE_TYPE_ID + _pad(namespace, ns_max)


def table_key(namespace: str, table: str, ns_max: int, tbl_max: int) -> str:
    validate_object_name(namespace, ns_max, "namespace")
    validate_object_name(table, tbl_max, "table")
    return TABLE_TYPE_ID + _pad(namespace, ns_max) + _pad(table, tbl_max)


def parse_table_key(key: str, ns_max: int, tbl_max: int) -> tuple[str, str]:
    """Inverse of :func:`table_key` — recover (namespace, table) from a
    padded tree key (used by dist-txn payload replay)."""
    body = key[len(TABLE_TYPE_ID):]
    return body[:ns_max].rstrip(), body[ns_max:ns_max + tbl_max].rstrip()


def view_key(namespace: str, view: str, ns_max: int, view_max: int) -> str:
    validate_object_name(namespace, ns_max, "namespace")
    validate_object_name(view, view_max, "view")
    return VIEW_TYPE_ID + _pad(namespace, ns_max) + _pad(view, view_max)


def table_key_namespace_prefix(namespace: str, ns_max: int) -> str:
    return TABLE_TYPE_ID + _pad(namespace, ns_max)


def view_key_namespace_prefix(namespace: str, ns_max: int) -> str:
    return VIEW_TYPE_ID + _pad(namespace, ns_max)


def is_namespace_key(key: str, ns_max: int) -> bool:
    return (key.startswith(NAMESPACE_TYPE_ID)
            and len(key) == _TYPE_ID_LEN + ns_max)


def is_table_key(key: str, ns_max: int, tbl_max: int) -> bool:
    return (key.startswith(TABLE_TYPE_ID)
            and len(key) == _TYPE_ID_LEN + ns_max + tbl_max)


def is_view_key(key: str, ns_max: int, view_max: int) -> bool:
    return (key.startswith(VIEW_TYPE_ID)
            and len(key) == _TYPE_ID_LEN + ns_max + view_max)


def namespace_name_from_key(key: str) -> str:
    return key[_TYPE_ID_LEN:].rstrip(" ")


def table_name_from_key(key: str, ns_max: int) -> tuple[str, str]:
    """(namespace, table) from a table key."""
    return (key[_TYPE_ID_LEN:_TYPE_ID_LEN + ns_max].rstrip(" "),
            key[_TYPE_ID_LEN + ns_max:].rstrip(" "))


def view_name_from_key(key: str, ns_max: int) -> tuple[str, str]:
    return (key[_TYPE_ID_LEN:_TYPE_ID_LEN + ns_max].rstrip(" "),
            key[_TYPE_ID_LEN + ns_max:].rstrip(" "))
