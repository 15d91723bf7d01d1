"""S3/object-store DATA PLANE end-to-end (round-6 VERDICT item #1).

The reference's entire premise is tables ON object storage
(docs/format.md:218-246; s3/src/main/java/.../S3StorageOps.java:67-365):
data-file bytes move through the storage abstraction, writes spool
locally and upload on close (S3AtomicOutputStream.java:42-47), reads
download to a local cache before random access
(S3StorageOps.java:110-117 prepareToReadLocal). These tests run the
WHOLE engine — CRUD, copy-on-write DML, time travel, RESTORE, OPTIMIZE,
VACUUM, Iceberg export, and a driver-registry query with its DuckDB
oracle — against real boto3 talking to a moto-mocked S3 bucket.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

try:
    import boto3
    from moto import mock_aws
    _HAVE_MOTO = True
except ImportError:                      # pragma: no cover — env-dependent
    _HAVE_MOTO = False

pytestmark = pytest.mark.skipif(not _HAVE_MOTO, reason="moto not installed")


@pytest.fixture()
def s3_env(request):
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    os.environ.setdefault("AWS_DEFAULT_REGION", "us-east-1")
    m = mock_aws()
    m.start()
    request.addfinalizer(m.stop)
    bucket = f"wh-{uuid.uuid4().hex[:12]}"
    boto3.client("s3", region_name="us-east-1").create_bucket(Bucket=bucket)
    return bucket


def _engine(spark, bucket, prefix="lake"):
    from olympia_spark.engine import Engine
    return Engine(spark, f"s3://{bucket}/{prefix}")


def _wipe_cache(eng) -> None:
    """Simulate a DIFFERENT machine: drop the read-local cache so every
    byte must come back down from the object store."""
    shutil.rmtree(eng.catalog.storage.cache_dir, ignore_errors=True)


class _CountingClient:
    """Delegating boto3-client wrapper that counts S3 GETs."""

    def __init__(self, inner):
        self._inner = inner
        self.get_calls: list[str] = []

    def get_object(self, **kw):
        self.get_calls.append(kw["Key"])
        return self._inner.get_object(**kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_engine_crud_dml_time_travel_on_s3(spark, s3_env):
    eng = _engine(spark, s3_env)
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT, v BIGINT, tag STRING)")
    eng.sql("INSERT INTO ns1.t VALUES (1, 10, 'a'), (2, 20, 'b'), "
            "(3, 30, 'a')")
    assert eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ns1.t") \
        .first().s == 60
    v_before = eng.catalog.tree.find_latest_version()
    # copy-on-write UPDATE + DELETE
    eng.sql("UPDATE ns1.t SET v = v + 1 WHERE tag = 'a'")
    eng.sql("DELETE FROM ns1.t WHERE id = 2")
    rows = {(r.id, r.v) for r in
            eng.sql("SELECT id, v FROM ns1.t").collect()}
    assert rows == {(1, 11), (3, 31)}
    # MERGE upsert
    src = spark.createDataFrame([(1, 100), (9, 900)], "id long, v long")
    eng.merge("ns1.t", src, on="t.id = s.id",
              matched_update={"v": "s.v"},
              not_matched_insert={"id": "s.id", "v": "s.v",
                                  "tag": "'m'"})
    rows = {(r.id, r.v) for r in
            eng.sql("SELECT id, v FROM ns1.t").collect()}
    assert rows == {(1, 100), (3, 31), (9, 900)}
    # time travel reads the pre-DML snapshot from the SAME s3 warehouse
    assert eng.sql(
        f"SELECT CAST(SUM(v) AS BIGINT) AS s FROM ns1.t "
        f"VERSION AS OF {v_before}").first().s == 60
    # RESTORE back, then verify
    eng.restore_table("ns1.t", v_before)
    assert eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ns1.t") \
        .first().s == 60


def test_fresh_machine_cold_reads_from_s3(spark, s3_env):
    eng = _engine(spark, s3_env)
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT, v DOUBLE) PARTITIONED BY (id)")
    eng.sql("INSERT INTO ns1.t SELECT id % 4 AS id, CAST(id AS DOUBLE) "
            "AS v FROM RANGE(100)")
    total = eng.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ns1.t") \
        .first().s
    # second machine: empty cache, fresh Engine over the same bucket
    _wipe_cache(eng)
    eng2 = _engine(spark, s3_env)
    assert eng2.sql("SELECT CAST(SUM(v) AS BIGINT) AS s FROM ns1.t") \
        .first().s == total
    # partition pruning still works through the cache paths
    n = eng2.sql("SELECT COUNT(*) AS n FROM ns1.t WHERE id = 1").first().n
    assert n == 25


def test_read_your_writes_costs_zero_data_gets(spark, s3_env):
    """The spool dir IS the read cache: scanning a table this engine
    just wrote must never GET a data object; tree-node re-reads hit the
    prepareToReadLocal cache (one GET per node, VERDICT item #8)."""
    eng = _engine(spark, s3_env)
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT)")
    eng.sql("INSERT INTO ns1.t VALUES (1), (2), (3)")
    counter = _CountingClient(eng.catalog.storage._s3)
    eng.catalog.storage._s3 = counter
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.t").first().n == 3
    assert eng.sql("SELECT CAST(SUM(id) AS BIGINT) AS s FROM ns1.t") \
        .first().s == 6
    data_gets = [k for k in counter.get_calls if "/data/" in k]
    assert data_gets == [], data_gets
    # node files: at most one GET each across BOTH queries
    node_gets = [k for k in counter.get_calls if "/node/" in k]
    assert len(node_gets) == len(set(node_gets)), node_gets


def test_vacuum_deletes_s3_objects_and_cache(spark, s3_env):
    eng = _engine(spark, s3_env)
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT)")
    eng.sql("INSERT INTO ns1.t VALUES (1)")
    eng.sql("INSERT INTO ns1.t VALUES (2)")
    eng.sql("UPDATE ns1.t SET id = id + 10 WHERE id = 1")
    # expire history so the rewritten-away file becomes orphaned
    eng.expire_versions(keep_last=1)
    removed = eng.remove_orphan_files()
    assert removed, "expected at least one orphaned data file"
    s3 = boto3.client("s3", region_name="us-east-1")
    for rel in removed:
        key = f"lake/{rel}"
        with pytest.raises(Exception):
            s3.head_object(Bucket=s3_env, Key=key)
        assert not os.path.exists(
            os.path.join(eng.catalog.storage.cache_dir, rel))
    # live data unaffected
    assert {r.id for r in eng.sql("SELECT id FROM ns1.t").collect()} \
        == {11, 2}


def test_iceberg_export_records_s3_uris(spark, s3_env, tmp_path):
    eng = _engine(spark, s3_env)
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT)")
    eng.sql("INSERT INTO ns1.t VALUES (1), (2)")
    meta = eng.export_iceberg_table("ns1.t", str(tmp_path / "ice"))
    import json
    with open(meta) as f:
        text = f.read()
    assert f"s3://{s3_env}/lake/data/" in text or _manifest_has_s3(
        tmp_path / "ice", s3_env)
    json.loads(text)    # metadata.json is valid JSON


def _manifest_has_s3(ice_dir, bucket) -> bool:
    """Data-file paths live in the (deflate-coded) Avro manifests, not
    metadata.json — decode them with the repo's own OCF reader."""
    import json as _json

    from olympia_spark.catalog import avro_io
    for root, _d, names in os.walk(ice_dir):
        for n in names:
            if n.endswith(".avro"):
                with open(os.path.join(root, n), "rb") as f:
                    _, recs = avro_io.read_ocf(f.read())
                if f"s3://{bucket}/" in _json.dumps(recs, default=str):
                    return True
    return False


def test_driver_registry_query_parity_on_s3(spark, s3_env, monkeypatch):
    """A real driver-registry DML query (B29 copy-on-write DELETE) runs
    against an S3 warehouse and still matches its DuckDB oracle —
    the driver-shape proof that the data plane is format-transparent."""
    import olympia_spark.operators._scratch as scratch
    from olympia_spark.operators import dml_queries, load_all_modules
    from olympia_spark.operators import registry
    from olympia_spark.testing import compare_query

    load_all_modules()
    monkeypatch.setattr(
        scratch, "scratch_dir",
        lambda prefix="": f"s3://{s3_env}/scratch-{uuid.uuid4().hex[:8]}")
    dml_queries._DML_ENGINES.clear()
    try:
        rec = compare_query(
            spark, "b29_delete_where",
            registry.QUERIES["b29_delete_where"],
            registry.ORACLE_SQL["b29_delete_where"],
            "/root/testdata/sf0.001")
        assert rec["ok"], rec
    finally:
        dml_queries._DML_ENGINES.clear()


def test_restore_checks_absolute_path_files_on_s3(spark, s3_env, tmp_path):
    """Round-6 review: object-store RESTORE short-circuits warehouse
    files through one LIST — but absolute-path files (externally
    registered / adopted in place) still need their own existence
    check, or RESTORE 'succeeds' into an unreadable table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    eng = _engine(spark, s3_env)
    eng.sql("CREATE NAMESPACE ns1")
    ext = str(tmp_path / "ext.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), ext)
    eng.register_external_table("ns1.x", ext, format="parquet")
    v1 = eng.catalog.tree.find_latest_version()
    eng.sql("INSERT INTO ns1.x VALUES (3)")
    assert eng.sql("SELECT COUNT(*) AS n FROM ns1.x").first().n == 3
    os.remove(ext)
    with pytest.raises(ValueError, match="no longer exist"):
        eng.restore_table("ns1.x", v1)


def test_binpb_reference_catalog_on_s3(spark, s3_env):
    """Reference-format (.binpb proto3 def files) catalog living ON the
    object store — the combination a Java-reference deployment actually
    ships (defs + node files + data all on S3). DDL/DML keep the
    reference format; a cache-wiped re-open (different machine) reads
    everything back down; def objects on the bucket carry the .binpb
    suffix."""
    from olympia_spark.catalog.catalog import Catalog
    from olympia_spark.engine import Engine
    wh = f"s3://{s3_env}/refwh"
    Catalog.create(wh, def_format="binpb")
    eng = Engine(spark, wh)
    eng.sql("CREATE NAMESPACE b")
    eng.sql("CREATE TABLE b.t (id BIGINT, v STRING)")
    eng.sql("INSERT INTO b.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    eng.sql("DELETE FROM b.t WHERE id = 2")
    assert sorted(r.id for r in eng.sql(
        "SELECT id FROM b.t").collect()) == [1, 3]
    # the def plane on the bucket is reference-format
    keys = [o["Key"] for o in boto3.client("s3").list_objects_v2(
        Bucket=s3_env, Prefix="refwh/def/")["Contents"]]
    assert keys and all(k.endswith(".binpb") for k in keys), keys
    # a different machine (cold cache) re-opens and reads in place
    _wipe_cache(eng)
    eng2 = Engine(spark, wh)
    assert eng2.sql("SELECT COUNT(*) AS n FROM b.t").first().n == 2
    # …and stays binpb under ITS writes too
    eng2.sql("INSERT INTO b.t VALUES (4, 'd')")
    keys2 = [o["Key"] for o in boto3.client("s3").list_objects_v2(
        Bucket=s3_env, Prefix="refwh/def/")["Contents"]]
    assert all(k.endswith(".binpb") for k in keys2), keys2
