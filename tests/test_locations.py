"""On-disk contract tests (reference TestFileLocations / TestObjectKeys)."""

from __future__ import annotations

import pytest

from olympia_spark.catalog import locations as loc


def test_root_node_path_reversed_binary():
    # version 100 = 0b1100100 → 64-bit zero-padded, reversed
    # (reference FileLocations.java:72-81, docs/format.md example)
    path = loc.root_node_path(100)
    assert path.startswith("vn/")
    assert len(path) == 3 + 64
    assert path[3:].startswith("00100110")
    assert loc.version_from_root_path(path) == 100


@pytest.mark.parametrize("v", [0, 1, 2, 127, 128, 1 << 40])
def test_root_node_path_roundtrip(v):
    assert loc.version_from_root_path(loc.root_node_path(v)) == v


def test_root_path_lexicographic_spread():
    # consecutive versions differ in their FIRST character after vn/ —
    # the object-store partition-spread property the reversal exists for
    p1, p2 = loc.root_node_path(6), loc.root_node_path(7)
    assert p1[3] != p2[3]


def test_namespace_key_padding():
    key = loc.namespace_key("default", 8)
    assert key == "B===default "
    assert loc.is_namespace_key(key, 8)
    assert loc.namespace_name_from_key(key) == "default"


def test_table_key_layout():
    key = loc.table_key("ns1", "t1", 8, 8)
    assert key == "C===ns1     t1      "
    assert loc.is_table_key(key, 8, 8)
    assert loc.table_name_from_key(key, 8) == ("ns1", "t1")
    assert key.startswith(loc.table_key_namespace_prefix("ns1", 8))


def test_view_key_layout():
    key = loc.view_key("ns1", "v1", 8, 8)
    assert key.startswith("D===")
    assert loc.view_name_from_key(key, 8) == ("ns1", "v1")


def test_keys_sort_by_type_then_namespace():
    ns = loc.namespace_key("ns1", 8)
    tbl = loc.table_key("ns1", "t1", 8, 8)
    view = loc.view_key("ns1", "v1", 8, 8)
    assert ns < tbl < view  # B=== < C=== < D===


def test_name_validation():
    with pytest.raises(ValueError):
        loc.namespace_key("has space", 100)
    with pytest.raises(ValueError):
        loc.namespace_key("x" * 101, 100)
    with pytest.raises(ValueError):
        loc.namespace_key("", 100)
    with pytest.raises(ValueError):
        loc.namespace_key("ctrl\x01", 100)


def test_is_root_node_path():
    assert loc.is_root_node_path(loc.root_node_path(5))
    assert not loc.is_root_node_path("vn/latest")
    assert not loc.is_root_node_path("node/abc.arrow")
