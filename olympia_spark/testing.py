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


def _to_py(v):
    """Unwrap numpy/pandas scalars to plain Python (repr-stable)."""
    if v is None:
        return None
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (bytes, bytearray, str)):
        try:
            return item()
        except (AttributeError, ValueError, TypeError):
            return v
    return v


def _canon_value(v):
    v = _to_py(v)
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, _dec.Decimal):
        # Decimal stays repr-distinct from float — the driver's pandas
        # hasher sees Decimal('0.2000') vs 0.2 as different values, so a
        # DECIMAL-vs-DOUBLE dtype seam must fail HERE, not at the driver.
        return repr(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # dtype-sensitive on purpose: an integer that reached pandas as
        # float64 (e.g. DuckDB HUGEINT) canonicalizes to "3446.000000",
        # NOT 3446 — mirroring the driver's pandas-based hasher so dtype
        # mismatches fail locally first.
        return f"{round(v, 6):.6f}"
    if isinstance(v, _dt.datetime):
        if v != v:                           # pandas NaT (NaT != NaT)
            return None
        v = v.replace(tzinfo=None)
        if v.time() == _dt.time(0, 0):
            # DuckDB DATE reaches pandas as midnight datetime64 while Spark
            # DATE stays datetime.date — the driver treats them as equal.
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_value(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def _canon_frame(pdf):
    """Canonicalize a pandas frame the way the driver does: columns sorted
    by name, rows sorted via pandas ``sort_values`` (which — like the
    driver — raises TypeError on unhashable cells such as raw list
    columns), then per-cell canonicalization."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    rows = [tuple(_canon_value(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return rows


def canonicalize(rows, colnames: list[str]):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_value(row[i]) for i in order) for row in rows]
    out.sort(key=repr)
    return out


def _rows_hash(canon_rows) -> str:
    h = hashlib.sha256()
    for row in canon_rows:
        h.update(repr(row).encode())
        h.update(b"\n")
    return h.hexdigest()


def value_hash(rows, colnames: list[str]) -> str:
    return _rows_hash(canonicalize(rows, colnames))


def compare_query(spark, name: str, fn, oracle: str, sf_dir: str) -> dict:
    """Run one query both ways; return a result record (raises nothing).

    Both sides are fetched as pandas frames — Spark via ``toPandas`` and
    DuckDB via ``.df()`` — because that is how the driver fetches them; it
    makes dtype artifacts (HUGEINT→float64, list columns) reproduce locally.
    """
    rec = {"name": name, "ok": False}
    try:
        sdf = fn(spark, sf_dir)
        s_pdf = sdf.toPandas()
        con = oracle_connection(sf_dir)
        d_pdf = con.execute(oracle).df()
        s_cols = list(s_pdf.columns)
        d_cols = list(d_pdf.columns)
        rec["spark_rows"] = len(s_pdf)
        rec["oracle_rows"] = len(d_pdf)
        rec["cols_match"] = sorted(s_cols) == sorted(d_cols)
        rec["spark_cols"] = sorted(s_cols)
        rec["oracle_cols"] = sorted(d_cols)
        s_canon = _canon_frame(s_pdf)
        d_canon = _canon_frame(d_pdf)
        rec["hash_match"] = _rows_hash(s_canon) == _rows_hash(d_canon)
        rec["ok"] = (rec["cols_match"] and len(s_pdf) == len(d_pdf)
                     and rec["hash_match"])
        if not rec["ok"]:
            rec["spark_sample"] = s_canon[:3]
            rec["oracle_sample"] = d_canon[:3]
    except Exception as exc:  # noqa: BLE001 — harness must report, not die
        rec["error"] = f"{type(exc).__name__}: {exc}"
    return rec
