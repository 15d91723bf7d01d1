"""Iceberg murmur3 bucket-transform parity (VERDICT r7 missing #1):
spec golden vectors, a scalar cross-check, engine-level bucket values,
and the bucket-partitioned export round-trip the xxhash64 deviation
used to refuse."""

from __future__ import annotations

import numpy as np
import pytest

from olympia_spark.iceberg_hash import murmur3_bytes, murmur3_long


# Iceberg spec Appendix B publishes these exact hash values.
@pytest.mark.parametrize("value,expected", [
    (34, 2017239379),                    # int 34 (hashes as long)
    (17486, -653330422),                 # date 2017-11-16 (epoch days)
    (81068000000, -662762989),           # time 22:31:08 (micros)
    (1510871468000000, -2047944441),     # timestamp 2017-11-16T22:31:08
])
def test_spec_golden_vectors_long(value, expected):
    assert int(murmur3_long(np.array([value]))[0]) == expected


@pytest.mark.parametrize("raw,expected", [
    (b"iceberg", 1210000089),                            # string
    (b"\x00\x01\x02\x03", -188683207),                   # fixed/binary
    (bytes.fromhex("f79c3e09677c4bbda4793f349cb785e7"),  # uuid
     1488055340),
])
def test_spec_golden_vectors_bytes(raw, expected):
    assert int(murmur3_bytes([raw])[0]) == expected


def _ref_mmh3(data: bytes, seed: int = 0) -> int:
    """Scalar reference murmur3_x86_32 (textbook formulation)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed

    def rl(x, r):
        return ((x << r) | (x >> (32 - r))) & 0xFFFFFFFF

    nblocks = len(data) // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i:4 * i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = rl(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = rl(h, 13)
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[4 * nblocks:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & 0xFFFFFFFF
        k = rl(k, 15)
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h if h < 2 ** 31 else h - 2 ** 32


def test_vectorized_bytes_matches_scalar_reference_all_lengths():
    import random
    rnd = random.Random(7)
    cases = [bytes(rnd.randrange(256) for _ in range(n))
             for n in list(range(0, 17)) + [33, 64, 100]]
    got = murmur3_bytes(list(cases))
    for i, c in enumerate(cases):
        assert int(got[i]) == _ref_mmh3(c), (i, len(c))


def test_vectorized_long_matches_scalar_reference():
    vals = np.array([0, 1, -1, 34, 2 ** 31, -2 ** 63, 2 ** 63 - 1,
                     1510871468000000], np.int64)
    got = murmur3_long(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == _ref_mmh3(int(v).to_bytes(8, "little", signed=True))


def test_engine_bucket_values_match_iceberg_spec(spark, tmp_path):
    """bucket(N, col) through the engine numbers rows EXACTLY like a
    native Iceberg writer: (murmur3(littleEndian(v)) & MAX_INT) % N."""
    from olympia_spark.engine import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE b")
    eng.sql("CREATE TABLE b.t (id BIGINT, s STRING) "
            "PARTITIONED BY (bucket(16, id), bucket(8, s))")
    eng.sql("INSERT INTO b.t (id, s) VALUES (34, 'iceberg'), "
            "(1, 'a'), (100, 'spark')")
    rows = {r.id: (r.id_bucket, r.s_bucket, r.s) for r in
            eng.sql("SELECT id, s, id_bucket, s_bucket FROM b.t")
            .collect()}
    # spec: hash(34L) = 2017239379 → bucket 2017239379 % 16 = 3
    assert rows[34][0] == (2017239379 & 0x7FFFFFFF) % 16 == 3
    # string 'iceberg': hash = 1210000089 → % 8
    assert rows[34][1] == (1210000089 & 0x7FFFFFFF) % 8
    for rid, (ib, sb, s) in rows.items():
        want_i = (_ref_mmh3(int(rid).to_bytes(8, "little", signed=True))
                  & 0x7FFFFFFF) % 16
        want_s = (_ref_mmh3(s.encode()) & 0x7FFFFFFF) % 8
        assert (ib, sb) == (want_i, want_s), rid


def test_bucket_partitioned_export_round_trip(spark, tmp_path):
    """The r7 refusal is gone: a bucket(16, id)-partitioned table
    exports a faithful Iceberg v2 spec — transform 'bucket[16]',
    source-id of the SOURCE column, per-file partition values in the
    manifest — and adopts back with identical rows."""
    import json

    from olympia_spark.engine import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE b")
    eng.sql("CREATE TABLE b.src (id BIGINT, v STRING) "
            "PARTITIONED BY (bucket(16, id))")
    eng.sql("INSERT INTO b.src (id, v) VALUES "
            "(34, 'x'), (1, 'y'), (2, 'z'), (100, 'w')")
    mpath = eng.export_iceberg_table("b.src", str(tmp_path / "ice"))
    meta = json.loads(open(mpath).read())
    spec = meta["partition-specs"][0]["fields"]
    assert len(spec) == 1
    assert spec[0]["transform"] == "bucket[16]"
    assert spec[0]["name"] == "id_bucket"
    id_field = [f for f in meta["schemas"][0]["fields"]
                if f["name"] == "id"][0]
    assert spec[0]["source-id"] == id_field["id"]
    # the synthesized column is a partition FIELD, not a schema column
    assert all(f["name"] != "id_bucket"
               for f in meta["schemas"][0]["fields"])
    # manifest partition values carry the murmur3 bucket per file
    from olympia_spark.catalog import iceberg as il
    m = il.load_table_metadata(mpath)
    snap = il.select_snapshot(m)
    for df in il.live_data_files(snap):
        bucket = df["partition"]["id_bucket"]
        assert 0 <= bucket < 16
    eng.sql("CREATE NAMESPACE back")
    eng.adopt_iceberg_table("back.t", str(tmp_path / "ice"),
                            as_native=True)
    got = {(r.id, r.v) for r in
           eng.sql("SELECT id, v FROM back.t").collect()}
    assert got == {(34, "x"), (1, "y"), (2, "z"), (100, "w")}


def test_export_refuses_mixed_spec_files(spark, tmp_path):
    """Files written before the current spec carry no partition value —
    export refuses until OPTIMIZE rewrites them, then succeeds."""
    from olympia_spark.engine import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE b")
    eng.sql("CREATE TABLE b.e (id BIGINT)")
    eng.sql("INSERT INTO b.e VALUES (1), (2)")
    eng.sql("ALTER TABLE b.e ADD PARTITION FIELD bucket(4, id)")
    eng.sql("INSERT INTO b.e (id) VALUES (3)")
    with pytest.raises(ValueError, match="predate the current"):
        eng.export_iceberg_table("b.e", str(tmp_path / "ice1"))
    eng.compact_table("b.e", min_files=1)
    mpath = eng.export_iceberg_table("b.e", str(tmp_path / "ice2"))
    assert mpath
    eng.sql("CREATE NAMESPACE back2")
    eng.adopt_iceberg_table("back2.e", str(tmp_path / "ice2"),
                            as_native=True)
    assert {r.id for r in eng.sql("SELECT id FROM back2.e").collect()} \
        == {1, 2, 3}


def test_identity_partitioned_export_emits_manifest_constants(
        spark, tmp_path):
    """r9: identity (hive) partitioned tables now export — the column
    stays in the schema, the per-file value rides in the manifest
    partition tuple (spec metadata-constant convention), and the spec
    entry is an identity transform on the column's own field id."""
    import json
    from olympia_spark.engine import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    eng.sql("CREATE NAMESPACE b")
    eng.sql("CREATE TABLE b.i (id BIGINT, p STRING) PARTITIONED BY (p)")
    eng.sql("INSERT INTO b.i VALUES (1, 'a'), (2, 'b')")
    mpath = eng.export_iceberg_table("b.i", str(tmp_path / "ice"))
    meta = json.load(open(mpath))
    spec = meta["partition-specs"][0]["fields"]
    schema_ids = {f["name"]: f["id"]
                  for f in meta["schemas"][0]["fields"]}
    assert spec == [{"name": "p", "field-id": 1000,
                     "source-id": schema_ids["p"],
                     "transform": "identity"}]


def test_sql_udf_long_lane_matches_numpy_spec(spark):
    """r9: iceberg_hash_long is a Catalyst-inlined SQL UDF chain — it
    must be bit-identical to the numpy spec implementation on golden
    vectors, random 64-bit sweeps, and the extremes, and propagate
    NULL."""
    import numpy as np
    import pandas as pd
    from olympia_spark.iceberg_hash import murmur3_long, \
        register_iceberg_hash
    register_iceberg_hash(spark)
    assert spark.sql("SELECT iceberg_hash_long(CAST(34 AS BIGINT)) h"
                     ).first().h == 2017239379
    assert spark.sql("SELECT iceberg_hash_long(CAST(17486 AS BIGINT)) h"
                     ).first().h == -653330422    # date '2017-11-16'
    rng = np.random.default_rng(11)
    vals = (rng.integers(-2**62, 2**62, 1000).tolist()
            + [0, -1, 1, 2**62, -2**62, 2**63 - 1, -2**63])
    df = spark.createDataFrame(pd.DataFrame({"v": vals}))
    got = [r.h for r in
           df.selectExpr("iceberg_hash_long(v) AS h").collect()]
    assert got == murmur3_long(np.array(vals, np.int64)).tolist()
    assert spark.sql("SELECT iceberg_hash_long(CAST(NULL AS BIGINT)) h"
                     ).first().h is None


def test_register_refuses_to_clobber_foreign_ice_functions(spark):
    """ADVICE r9 #4: the _ice_*/iceberg_hash_* temp-function names are
    reserved — registration over a session where a USER function holds
    one must refuse instead of silently replacing it; the engine's own
    marker-backed registration stays idempotent."""
    import pytest
    from olympia_spark.iceberg_hash import register_iceberg_hash
    register_iceberg_hash(spark)            # ours — idempotent
    register_iceberg_hash(spark)
    # simulate a foreign session: drop the canary, keep a colliding fn
    spark.sql("DROP TEMPORARY FUNCTION _ice_olympia_marker")
    with pytest.raises(ValueError, match="reserves"):
        register_iceberg_hash(spark)
    # restore for the rest of the session
    spark.sql("CREATE OR REPLACE TEMPORARY FUNCTION _ice_olympia_marker() "
              "RETURNS INT RETURN 1")
    register_iceberg_hash(spark)
