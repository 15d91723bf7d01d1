"""Session-scoped scratch state shared by operator modules.

Operator families (DML, streaming, ANN) stand up throwaway warehouses /
staging dirs once per session and reuse them across queries. Two rules:

* Cache keys use ``sparkContext.applicationId``, never ``id(spark)`` —
  ``id()`` of a garbage-collected session can be recycled by a brand-new
  session in the same process, silently handing back an engine bound to a
  stopped SparkContext. One JVM hosts one application, so a differing
  applicationId means the old context is gone; its cache entries (and any
  engines inside) are dead weight and are purged, which also bounds the
  dicts.
* Scratch directories register for ``atexit`` removal — a long round
  otherwise leaks GBs of /tmp warehouses/checkpoints.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import SparkSession

_TEMP_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at interpreter exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _TEMP_DIRS.append(d)
    return d


@atexit.register
def _cleanup() -> None:  # pragma: no cover — exercised at interpreter exit
    while _TEMP_DIRS:
        shutil.rmtree(_TEMP_DIRS.pop(), ignore_errors=True)


def get_or_create(cache: dict, spark: SparkSession, sf: str,
                  factory: Callable[[], object]) -> object:
    """Fetch the per-(session, sf) entry, creating it via ``factory`` on
    first use; entries keyed to a previous SparkContext are evicted."""
    app = spark.sparkContext.applicationId
    for k in [k for k in cache if k[0] != app]:
        del cache[k]
    key = (app, sf)
    if key not in cache:
        cache[key] = factory()
    return cache[key]
