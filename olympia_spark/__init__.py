"""olympia_spark — a PySpark-native analytics engine with the capabilities of
olympiaformat/olympia (an open, storage-only lakehouse catalog format).

Two planes, mirroring the reference's architecture (SURVEY.md):

1. **Catalog & transaction plane** (pure Python, driver-side): a versioned
   copy-on-write B-tree of catalog objects (namespaces / tables / views /
   distributed transactions) persisted as Arrow IPC node files + JSON
   definition files directly on object storage, with multi-object ACID
   transactions, snapshot/serializable isolation, catalog-wide time travel,
   rollback and snapshot export.  (Reference: core/src/main/java/org/format/
   olympia — rebuilt from scratch in Python, not translated.)

2. **Data plane** (native PySpark): the full relational surface the reference
   exposes through its Spark integration — scans, joins, aggregates, windows,
   DML as copy-on-write parquet rewrites, streaming ingest — expressed with
   the DataFrame/SQL API so Catalyst/Tungsten/AQE own the physical plan, plus
   large-scale training-data operators (dedup, similarity search, text
   analysis, multimodal columns).
"""

from olympia_spark.version import __version__

__all__ = ["__version__", "Engine", "Catalog"]


def __getattr__(name: str):
    # lazy exports — importing the package must not require a SparkSession
    if name == "Engine":
        from olympia_spark.engine import Engine
        return Engine
    if name == "Catalog":
        from olympia_spark.catalog import Catalog
        return Catalog
    raise AttributeError(name)
