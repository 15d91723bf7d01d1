"""Fixture-table loading helpers.

The driver materializes TPC-H-ish tables plus ``events`` / ``documents`` /
``embeddings`` at ``/root/testdata/sf*/<name>.parquet`` (TESTDATA.md).
Queries access them either directly (``load``) or through the catalog
(``olympia_spark.catalog``), which resolves a table name to its tracked
parquet file list — same shape, catalog-managed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain parquet scan: Catalyst gets full
    predicate-pushdown / column-pruning freedom.

    Some driver generations write ``events.ts`` as TIMESTAMP(NANOS), which
    Spark's vectorized parquet reader rejects; in that case read nanos as
    long and floor-divide to microseconds (same ns→µs truncation DuckDB
    applies), keeping the scan distributed — no driver-side
    materialization. Newer testdata stores µs timestamps directly, so the
    rewrite is gated on the column's actual dtype.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for SQL-form queries."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
