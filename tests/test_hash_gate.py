"""Hash-gate hardening regressions (round-4 VERDICT items 1 and 4).

1. ``testing._canon_value`` must keep ``decimal.Decimal`` repr-distinct
   from ``float`` — the driver's pandas hasher sees ``Decimal('0.2000')``
   and ``0.2`` as different values, so the local gate has to as well
   (this is exactly how the sim_recall_audit DECIMAL-vs-DOUBLE seam
   escaped to the driver in round 4).
2. The top-k similarity contracts must rank on the ROUNDED cosine with a
   vec_id tiebreak, in BOTH engines, so the rank-10 boundary set cannot
   flip on FP summation order or input permutation.
"""

from __future__ import annotations

import decimal
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from olympia_spark.operators import load_all_modules, registry
from olympia_spark.testing import _canon_value, compare_query, value_hash

load_all_modules()


# --- 1. Decimal stays distinct from float ------------------------------------

def test_decimal_canon_distinct_from_float():
    assert _canon_value(decimal.Decimal("0.2000")) != _canon_value(0.2)
    assert _canon_value(decimal.Decimal("3446")) != _canon_value(3446.0)
    # and the distinction survives into the row hash
    assert (value_hash([(decimal.Decimal("0.2000"),)], ["x"])
            != value_hash([(0.2,)], ["x"]))


def test_decimal_canon_scale_sensitive():
    # DECIMAL(10,4) vs DECIMAL(10,2) renderings of the same value differ
    # in pandas repr — the canonicalizer must not collapse them.
    assert (_canon_value(decimal.Decimal("1.20"))
            != _canon_value(decimal.Decimal("1.2000")))


# --- 2. top-k rank-boundary determinism --------------------------------------

_DIM = 64


def _unit_vec(cos: float) -> list[float]:
    """A vector whose cosine against e1 is ~cos (float32-rounded)."""
    v = [0.0] * _DIM
    v[0] = cos
    v[1] = math.sqrt(max(0.0, 1.0 - cos * cos))
    return v


def _write_crafted(sf_dir: str, reverse: bool) -> None:
    """embeddings.parquet with a deliberate 4dp tie at the rank-10 boundary.

    vec 0 is the query (≈ e1). vecs 1..9 have distinct high cosines; vecs
    10 and 11 both round to 0.8500 but vec 11's raw cosine is ~1e-5
    HIGHER — so raw-cosine ranking would put 11 at rank 10 while the
    rounded+vec_id contract must pick 10. vec 12 is clearly out.
    """
    rows = [(0, _unit_vec(1.0), 5)]
    for i, c in enumerate(
            [0.99, 0.975, 0.96, 0.945, 0.93, 0.915, 0.90, 0.885, 0.87]):
        rows.append((i + 1, _unit_vec(c), 1))
    rows.append((10, _unit_vec(0.850000), 2))
    rows.append((11, _unit_vec(0.850010), 2))   # same 4dp bucket, higher raw
    rows.append((12, _unit_vec(0.20), 3))
    if reverse:
        rows = rows[::-1]
    tbl = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array(
            [np.asarray(r[1], dtype=np.float32) for r in rows],
            pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))


@pytest.mark.parametrize("reverse", [False, True])
def test_topk_boundary_tie_is_engine_stable(spark, tmp_path, reverse):
    d = tmp_path / ("rev" if reverse else "fwd")
    d.mkdir()
    _write_crafted(str(d), reverse)
    rec = compare_query(spark, "sim_topk_bruteforce",
                        registry.QUERIES["sim_topk_bruteforce"],
                        registry.ORACLE_SQL["sim_topk_bruteforce"], str(d))
    assert rec.get("error") is None, rec.get("error")
    assert rec["ok"], rec
    got = (registry.QUERIES["sim_topk_bruteforce"](spark, str(d))
           .toPandas())
    # the rounded-tie boundary slot goes to the LOWER vec_id, not the
    # (higher-raw-cosine) higher id — proves ranking is on ROUND(cos,4)
    assert list(got["vec_id"])[-1] == 10
    assert 11 not in set(got["vec_id"])


def test_topk_hash_invariant_under_permutation(spark, tmp_path):
    hashes = []
    for tag, reverse in (("fwd", False), ("rev", True)):
        d = tmp_path / tag
        d.mkdir()
        _write_crafted(str(d), reverse)
        pdf = (registry.QUERIES["sim_topk_bruteforce"](spark, str(d))
               .toPandas())
        rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
        hashes.append(value_hash(rows, list(pdf.columns)))
    assert hashes[0] == hashes[1]


def test_url_canonicalization_cross_engine_matrix(spark):
    """The _canon_url pipeline must (a) actually canonicalize — case-fold
    scheme+host, strip fragments and EVERY utm_* param with correct
    separator handling, trim trailing slash — and (b) produce identical
    strings in Spark (Java regex, $1 refs, replace-all default) and
    DuckDB (RE2, \\1 refs, needs 'g'). Review round 5 found the original
    degenerate: case-sensitive match blanked every URL in BOTH engines,
    so the hash gate passed while the operator did nothing."""
    import duckdb

    from olympia_spark.operators.dedup import _canon_url

    cases = {
        "HTTPS://Example.COM/docs/5?utm_source=feed&utm_id=7":
            "https://example.com/docs/5",
        "https://example.com/docs/5/": "https://example.com/docs/5",
        "https://EXAMPLE.com/docs/5#section-2": "https://example.com/docs/5",
        "https://example.com/p?utm_a=1&utm_b=2&real=3":
            "https://example.com/p?real=3",
        "https://example.com/p?real=1&utm_x=2&utm_y=3":
            "https://example.com/p?real=1",
        "https://example.com/p?utm_only=1": "https://example.com/p",
        "https://example.com/": "https://example.com",
    }
    spark.createDataFrame([(c,) for c in cases], "url string") \
        .createOrReplaceTempView("canon_u")
    s_out = [r[0] for r in spark.sql(
        f"SELECT {_canon_url('url', 'spark')} FROM canon_u").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE canon_u AS SELECT * FROM (VALUES "
                + ",".join(f"('{c}')" for c in cases) + ") t(url)")
    d_out = [r[0] for r in con.sql(
        f"SELECT {_canon_url('url', 'duck')} FROM canon_u").fetchall()]
    assert s_out == list(cases.values())
    assert d_out == list(cases.values())
