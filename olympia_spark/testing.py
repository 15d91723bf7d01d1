"""Self-check harness replicating the driver's DuckDB-oracle protocol.

Mirrors FIXTURES.md §3: for each registered query, run the Spark DataFrame
and the oracle SQL through DuckDB over the same parquet, canonicalize
(sort columns by name, round floats to 1e-6, order-insensitive rows) and
compare row-count + schema (column names) + value hash.  Used by the pytest
suite so oracle mismatches surface before the driver runs.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import hashlib
import math
import os

import duckdb

from olympia_spark.tables import TABLE_NAMES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _dec.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canonicalize(rows, colnames: list[str]):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort(key=repr)
    return out


def value_hash(rows, colnames: list[str]) -> str:
    canon = canonicalize(rows, colnames)
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def compare_query(spark, name: str, fn, oracle: str, sf_dir: str) -> dict:
    """Run one query both ways; return a result record (raises nothing)."""
    rec = {"name": name, "ok": False}
    try:
        sdf = fn(spark, sf_dir)
        s_rows = [tuple(r) for r in sdf.collect()]
        s_cols = list(sdf.columns)
        con = oracle_connection(sf_dir)
        cur = con.execute(oracle)
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
        rec["spark_rows"] = len(s_rows)
        rec["oracle_rows"] = len(d_rows)
        rec["cols_match"] = sorted(s_cols) == sorted(d_cols)
        rec["spark_cols"] = sorted(s_cols)
        rec["oracle_cols"] = sorted(d_cols)
        sh, dh = value_hash(s_rows, s_cols), value_hash(d_rows, d_cols)
        rec["hash_match"] = sh == dh
        rec["ok"] = (rec["cols_match"] and len(s_rows) == len(d_rows)
                     and rec["hash_match"])
        if not rec["ok"]:
            rec["spark_sample"] = canonicalize(s_rows, s_cols)[:3]
            rec["oracle_sample"] = canonicalize(d_rows, d_cols)[:3]
    except Exception as exc:  # noqa: BLE001 — harness must report, not die
        rec["error"] = f"{type(exc).__name__}: {exc}"
    return rec
