"""Query registry: name → (spark, sf_dir) -> DataFrame, plus DuckDB oracle SQL.

The driver runs each registered query through Spark AND its oracle SQL
through DuckDB on the same parquet, then compares row count + schema +
order-insensitive value hash (FIXTURES.md §3).  Column names must match
exactly — alias every computed column identically on both sides.

Determinism rules used throughout the query modules:

* Sums of wide-range doubles are computed as
  ``CAST(SUM(CAST(expr AS DECIMAL(25,6))) AS DOUBLE)`` on BOTH sides —
  per-row IEEE arithmetic is engine-identical, the decimal sum is exact,
  so the result does not depend on Spark's partial-aggregation order or
  DuckDB's vectorized accumulation order.  Plain ``SUM`` over doubles can
  drift past the 1e-6 rounding canonicalization at sf0.1.
* Averages of small-magnitude columns use plain ``AVG`` (error << 1e-6).
* Every query that the oracle hashes row-by-row either aggregates to a
  small result or carries an explicit total ORDER BY + LIMIT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named data-plane query, optionally with DuckDB oracle SQL.

    Queries without an oracle (streaming, iterative, approx) get the
    driver's weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle.strip()
        return fn

    return deco


# SQL fragment helpers shared by query modules.

def dsum(expr: str, alias: str) -> str:
    """Order-independent SUM of a double expression (see module docstring)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"
