"""Every registered query with an oracle must hash-match DuckDB at sf0.001 —
the same protocol the driver applies at sf0.01 (FIXTURES.md §3)."""

from __future__ import annotations

import pytest

from olympia_spark.operators import load_all_modules, registry
from olympia_spark.testing import compare_query

load_all_modules()

NAMES = sorted(registry.ORACLE_SQL)


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, name):
    rec = compare_query(spark, name, registry.QUERIES[name],
                        registry.ORACLE_SQL[name], sf_dir)
    assert rec.get("error") is None, rec["error"]
    assert rec["ok"], rec


def test_queries_without_oracle_run(spark, sf_dir):
    for name in sorted(set(registry.QUERIES) - set(registry.ORACLE_SQL)):
        df = registry.QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_registry_size_pinned():
    """Ledger guard (VERDICT r14 #8): NOTES/VERDICT registry counts
    drifted once (r14 recorded 304 against a live 303); pin the live
    size so any add/remove must touch this number in the same commit.
    r15: 303 + b151i/j/k/l + b32_stream_mv_refresh + b170 + b171 + b172 = 311."""
    assert len(registry.QUERIES) == 311
    assert set(registry.ORACLE_SQL) <= set(registry.QUERIES)
