from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from olympia_spark.session import get_spark
    s = get_spark("olympia_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL


import contextlib


@contextlib.contextmanager
def hidden_files(paths):
    """Temporarily rename files away. Create the DataFrame FIRST (the
    file index lists paths eagerly), then collect inside this context:
    a scan that file-prunes succeeds — an unpruned scan dies on the
    missing file. The behavioral pruning assertion that replaced the
    plan-string PartitionFilters check when _scan moved to
    _metadata.file_path-derived partition columns."""
    import os
    renamed = []
    try:
        for p in paths:
            os.rename(p, p + ".hidden")
            renamed.append(p)
        yield
    finally:
        for p in renamed:
            os.rename(p + ".hidden", p)
