"""B31 — Python UDF / pandas UDF / grouped UDAF surface (SURVEY.md §2).

The reference exposes UDFs through its host Spark session; here they are
first-class but kept on the FAST path: every UDF below is Arrow-batched
(`pandas_udf` / `applyInPandas` / `mapInPandas`), never row-at-a-time
Python. Each query has an exactly-equivalent SQL oracle (DuckDB can't run
our Python, so equivalence-checking the UDF against a pure-SQL formulation
IS the correctness statement — SURVEY.md §2 B31).

Scale posture: pandas UDFs ship Arrow record batches across the Python
boundary — ~10-100× the throughput of row UDFs — and all of them here are
per-partition narrow ops; grouped variants shuffle once on the group key.
"""

from __future__ import annotations

import sys

import pandas as pd

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from olympia_spark.operators.registry import dsum, query
from olympia_spark.tables import load

# Executor Python workers don't share the driver's sys.path — when the repo
# is imported from an arbitrary cwd (the grading driver, spark-submit from
# elsewhere), workers can't `import olympia_spark`. Registering the module
# for pickle-by-value makes every UDF below self-contained in its closure,
# which is also the right posture for a 1000-executor cluster: no egg/zip
# shipping required.
_cloudpickle.register_pickle_by_value(sys.modules[__name__])


# --- scalar pandas UDF ------------------------------------------------------

@F.pandas_udf(StringType())
def _price_tier(total: pd.Series) -> pd.Series:
    """Vectorized tier classification (Arrow batch in, Arrow batch out)."""
    return pd.cut(total, bins=[float("-inf"), 50_000, 150_000, float("inf")],
                  labels=["low", "mid", "high"]).astype(str)


@query("udf_pandas_tiered", oracle="""
SELECT tier, COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM (SELECT o_orderkey,
             CASE WHEN o_totalprice <= 50000 THEN 'low'
                  WHEN o_totalprice <= 150000 THEN 'mid'
                  ELSE 'high' END AS tier
      FROM orders)
GROUP BY tier ORDER BY tier
""")
def udf_pandas_tiered(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar pandas UDF (tier bucketing) checked against the equivalent
    CASE expression. pd.cut uses right-closed bins — mirrored by `<=` in
    the oracle."""
    o = load(spark, sf, "orders")
    return (o.select("o_orderkey", _price_tier("o_totalprice").alias("tier"))
            .groupBy("tier")
            .agg(F.count("*").alias("n"), F.sum("o_orderkey").alias("key_sum"))
            .orderBy("tier"))


# --- grouped-map UDAF (applyInPandas) ---------------------------------------

_CUST_SCHEMA = StructType([
    StructField("o_custkey", LongType()),
    StructField("n_orders", LongType()),
    StructField("price_span", DoubleType()),
])


def _cust_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame({
        "o_custkey": [pdf["o_custkey"].iloc[0]],
        "n_orders": [len(pdf)],
        "price_span": [float(pdf["o_totalprice"].max()
                             - pdf["o_totalprice"].min())],
    })


@query("udf_grouped_custstats", oracle="""
SELECT COUNT(*) AS n_cust,
       CAST(SUM(n_orders) AS BIGINT) AS total_orders,
       CAST(SUM(CAST(price_span AS DECIMAL(25,6))) AS DOUBLE) AS span_sum
FROM (SELECT o_custkey, COUNT(*) AS n_orders,
             MAX(o_totalprice) - MIN(o_totalprice) AS price_span
      FROM orders GROUP BY o_custkey)
""")
def udf_grouped_custstats(spark: SparkSession, sf: str) -> DataFrame:
    """Custom UDAF via applyInPandas: per-customer stats computed in pandas
    (one shuffle on the group key; each group is one Arrow batch), then
    aggregated. Oracle is the pure-SQL equivalent."""
    o = load(spark, sf, "orders")
    per_cust = (o.select("o_custkey", "o_totalprice")
                .groupBy("o_custkey")
                .applyInPandas(_cust_stats, schema=_CUST_SCHEMA))
    return per_cust.agg(
        F.count("*").alias("n_cust"),
        F.sum("n_orders").alias("total_orders"),
        F.sum(F.col("price_span").cast("decimal(25,6)")).cast("double")
         .alias("span_sum"))


# --- mapInPandas (arbitrary batch transform) --------------------------------

def _py_token_count(batches):
    """Pure-Python tokenizer over Arrow batches — the mapInPandas shape used
    when logic can't be expressed in SQL (here it can, which is what makes
    it oracle-checkable)."""
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "py_tokens": pdf["text"].map(lambda t: len(t.split(" "))),
        })


@query("udf_mapinpandas_tokens", oracle="""
SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       COUNT(*) AS n_docs
FROM documents
""")
def udf_mapinpandas_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas streaming batch transform (Python tokenizer), aggregated.
    Narrow op: batches never leave their partition."""
    d = load(spark, sf, "documents").select("doc_id", "text")
    out = d.mapInPandas(_py_token_count, "doc_id long, py_tokens long")
    return out.agg(F.sum("py_tokens").alias("total_tokens"),
                   F.count("*").alias("n_docs"))
