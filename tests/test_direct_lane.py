"""Direct object-store executor lane (round-7 VERDICT item #1).

The production data plane hands Spark ``s3a://`` URIs so EXECUTORS
stream the object store in parallel — zero data bytes through the
driver (reference premise: the host engine reads tables in place on
object storage, docs/format.md:218-246, spark/v3.5 via Iceberg FileIO).
This container has no hadoop-aws jar, so these tests pin the lane's
*contract*: mode resolution, URI handoff (what the Spark reader/writer
receives), footer-only ranged-GET stats, and bulk deletes — while the
moto spool suite (test_s3_data_plane.py) keeps covering the fallback
lane end-to-end.
"""

from __future__ import annotations

import io
import os
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


def _engine(spark, bucket, prefix="lake", **kw):
    from olympia_spark.engine import Engine
    return Engine(spark, f"s3://{bucket}/{prefix}", **kw)


# --- lane resolution ---------------------------------------------------------


def test_posix_warehouse_is_local_lane(spark, tmp_path):
    from olympia_spark.engine import Engine
    eng = Engine(spark, str(tmp_path / "wh"))
    assert eng.data_plane == "local"
    # data_plane override is meaningless for posix — still local
    eng2 = Engine(spark, str(tmp_path / "wh"), data_plane="direct")
    assert eng2.data_plane == "local"
    # but a TYPO is rejected even on posix — it must not first surface
    # in production when the same config string hits an s3:// warehouse
    with pytest.raises(ValueError, match="data_plane"):
        Engine(spark, str(tmp_path / "wh"), data_plane="spol")


def test_auto_resolves_spool_without_s3a_jar(spark, s3_env):
    # this container genuinely lacks hadoop-aws, so auto must fall back
    eng = _engine(spark, s3_env)
    assert eng.data_plane == "spool"


def test_auto_resolves_direct_when_s3a_loadable(spark, s3_env, monkeypatch):
    import olympia_spark.engine as engmod
    monkeypatch.setattr(engmod, "_s3a_on_classpath", lambda _s: True)
    eng = _engine(spark, s3_env)
    assert eng.data_plane == "direct"


def test_explicit_modes_and_bad_mode(spark, s3_env):
    assert _engine(spark, s3_env, data_plane="direct").data_plane == "direct"
    assert _engine(spark, s3_env, data_plane="spool").data_plane == "spool"
    with pytest.raises(ValueError, match="data_plane"):
        _engine(spark, s3_env, data_plane="teleport")


def test_direct_mode_configures_custom_endpoint(spark, s3_env):
    # moto's client carries a non-AWS endpoint only when one is set; we
    # simulate a MinIO-style endpoint explicitly
    from olympia_spark.catalog.storage import S3Storage
    client = boto3.client("s3", region_name="us-east-1",
                          endpoint_url="http://localhost:9000")
    storage = S3Storage(s3_env, "lake", client=client)
    from olympia_spark.engine import Engine
    eng = Engine.__new__(Engine)
    eng.spark = spark

    class _Cat:
        pass

    eng.catalog = _Cat()
    eng.catalog.storage = storage
    eng._configure_s3a()
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    # per-BUCKET keys, so a second engine on another bucket/endpoint
    # cannot clobber this warehouse's resolution through the shared
    # session-global Hadoop conf
    assert hconf.get(f"fs.s3a.bucket.{s3_env}.endpoint") == \
        "http://localhost:9000"
    assert hconf.get(f"fs.s3a.bucket.{s3_env}.path.style.access") == "true"
    assert hconf.get("fs.s3a.endpoint") is None

    # a second engine against a DIFFERENT bucket+endpoint coexists
    client2 = boto3.client("s3", region_name="us-east-1",
                           endpoint_url="http://localhost:9001")
    storage2 = S3Storage("otherlake", "lake", client=client2)
    eng2 = Engine.__new__(Engine)
    eng2.spark = spark
    eng2.catalog = _Cat()
    eng2.catalog.storage = storage2
    eng2._configure_s3a()
    assert hconf.get(f"fs.s3a.bucket.{s3_env}.endpoint") == \
        "http://localhost:9000"
    assert hconf.get("fs.s3a.bucket.otherlake.endpoint") == \
        "http://localhost:9001"


# --- URI handoff -------------------------------------------------------------


def test_scan_uris_direct_vs_spool(spark, s3_env):
    direct = _engine(spark, s3_env, data_plane="direct")
    rel = "data/ns/t/u1/part-0.parquet"
    assert direct._scan_uri(rel) == f"s3a://{s3_env}/lake/{rel}"
    assert direct._scan_uris([rel]) == [f"s3a://{s3_env}/lake/{rel}"]
    # absolute (external-table) paths pass through untouched
    assert direct._scan_uri("/abs/elsewhere.parquet") == \
        "/abs/elsewhere.parquet"
    # spool lane: local cache path (and the authoritative export URI
    # stays s3:// in both lanes)
    spool = _engine(spark, s3_env, data_plane="spool")
    assert spool._scan_uri(rel).startswith("/")
    assert direct._data_uri(rel) == f"s3://{s3_env}/lake/{rel}"
    assert spool._data_uri(rel) == f"s3://{s3_env}/lake/{rel}"


class _CapturingReader:
    """Stub for spark.read that records what paths the scan hands Spark."""

    def __init__(self, spark, calls):
        self._spark = spark
        self._calls = calls
        self._schema = None
        self._options = {}

    def schema(self, s):
        self._schema = s
        return self

    def option(self, k, v):
        self._options[k] = v
        return self

    def options(self, **kw):
        self._options.update(kw)
        return self

    def parquet(self, *paths):
        self._calls.append({"paths": list(paths),
                            "options": dict(self._options)})
        # real file relations expose the _metadata struct the era scan
        # derives partition values from — fake it on the stub
        from pyspark.sql import functions as F
        return (self._spark.createDataFrame([], self._schema)
                .withColumn("_metadata", F.struct(
                    F.lit("").alias("file_path"))))

    def csv(self, paths):
        self._calls.append({"paths": list(paths),
                            "options": dict(self._options)})
        return self._spark.createDataFrame([], self._schema)


class _SparkProxy:
    """Delegates to the real session but serves a capturing reader."""

    def __init__(self, spark, calls):
        self._spark = spark
        self._calls = calls

    @property
    def read(self):
        return _CapturingReader(self._spark, self._calls)

    def __getattr__(self, name):
        return getattr(self._spark, name)


def test_direct_scan_hands_spark_s3a_uris(spark, s3_env):
    """The reader must receive s3a:// URIs — the executors stream the
    object store; the driver performs ZERO data GETs/downloads."""
    from pyspark.sql import types as T
    from olympia_spark.catalog.defs import DataFile, TableDef
    eng = _engine(spark, s3_env, data_plane="direct")
    schema = T.StructType([T.StructField("id", T.LongType())])
    rels = [f"data/ns/t/{uuid.uuid4()}/part-0.parquet" for _ in range(2)]
    tdef = TableDef(schema_json=schema.json(),
                    data_files=[DataFile(path=p, num_rows=1, size_bytes=10)
                                for p in rels])
    calls: list = []
    eng.spark = _SparkProxy(spark, calls)
    eng._scan(tdef, rels)
    assert len(calls) == 1
    assert calls[0]["paths"] == [f"s3a://{s3_env}/lake/{p}" for p in rels]
    # nothing was spooled locally
    assert not os.path.exists(eng.catalog.storage.cache_dir) or not any(
        f.endswith(".parquet") for _r, _d, fs in
        os.walk(eng.catalog.storage.cache_dir) for f in fs)


def test_direct_scan_partitioned_paths_are_s3a(spark, s3_env):
    """Partitioned scans in the direct lane hand the reader s3a:// file
    URIs in ONE read call (era scan — partition values derive from
    _metadata.file_path, no per-write-dir basePath legs)."""
    from pyspark.sql import types as T
    from olympia_spark.catalog.defs import DataFile, TableDef
    eng = _engine(spark, s3_env, data_plane="direct")
    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("p", T.LongType())])
    bases = [f"data/ns/t/{uuid.uuid4()}" for _ in range(2)]
    rels = [f"{b}/p={i + 1}/part-0.parquet"
            for i, b in enumerate(bases)]
    tdef = TableDef(schema_json=schema.json(), partition_by=["p"],
                    data_files=[DataFile(path=p, num_rows=1, size_bytes=10)
                                for p in rels])
    calls: list = []
    eng.spark = _SparkProxy(spark, calls)
    eng._scan(tdef, rels)
    # TWO write dirs, ONE era → ONE reader call over both s3a URIs
    assert len(calls) == 1
    assert sorted(calls[0]["paths"]) == sorted(
        f"s3a://{s3_env}/lake/{p}" for p in rels)
    assert "basePath" not in calls[0]["options"]


def test_direct_write_target_is_s3a_dir(spark, s3_env):
    """_write_files hands the DataFrame writer an s3a:// directory —
    executors write straight to the object store, no spool/upload."""
    eng = _engine(spark, s3_env, data_plane="direct")
    rel_dir = "data/ns/t/abc"
    assert eng._scan_uri(rel_dir) == f"s3a://{s3_env}/lake/{rel_dir}"


# --- footer-only remote stats ------------------------------------------------


class _RangeCountingClient:
    def __init__(self, inner):
        self._inner = inner
        self.gets: list[dict] = []

    def get_object(self, **kw):
        self.gets.append(kw)
        return self._inner.get_object(**kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def _upload_parquet(client, bucket, key, table):
    import pyarrow.parquet as pq
    buf = io.BytesIO()
    pq.write_table(table, buf)
    client.put_object(Bucket=bucket, Key=key, Body=buf.getvalue())
    return len(buf.getvalue())


def test_collect_stats_remote_footer_only(spark, s3_env):
    import pyarrow as pa
    eng = _engine(spark, s3_env, data_plane="direct")
    raw = boto3.client("s3", region_name="us-east-1")
    rel_dir = f"data/ns/t/{uuid.uuid4()}"
    n = 200_000                           # big enough that data ≫ footer
    t1 = pa.table({"id": list(range(1, n + 1)),
                   "v": [float(i) * 1.5 for i in range(n)]})
    t2 = pa.table({"id": [7, 8], "v": [70.0, 80.0]})
    size1 = _upload_parquet(raw, s3_env, f"lake/{rel_dir}/part-0.parquet", t1)
    _upload_parquet(raw, s3_env, f"lake/{rel_dir}/tag=x/part-1.parquet", t2)
    counting = _RangeCountingClient(eng.catalog.storage._s3)
    eng.catalog.storage._s3 = counting
    files = {f.path: f for f in eng._collect_stats(rel_dir)}
    f1 = files[f"{rel_dir}/part-0.parquet"]
    assert f1.num_rows == n and f1.size_bytes == size1
    assert f1.stats["id"] == [1, n]
    assert f1.stats["v"] == [0.0, (n - 1) * 1.5]
    f2 = files[f"{rel_dir}/tag=x/part-1.parquet"]
    assert f2.num_rows == 2
    assert f2.stats["tag"] == ["x", "x"]      # hive segment → exact stats
    # every GET carried a Range header, and the TOTAL bytes fetched for
    # the big file are a small fraction of it — footer-only I/O, never a
    # full-file download
    assert counting.gets, "stats must come from ranged GETs"
    big_key = f"lake/{rel_dir}/part-0.parquet"
    fetched_big = 0
    for g in counting.gets:
        assert "Range" in g, f"full-object GET issued: {g}"
        lo, hi = map(int, g["Range"].removeprefix("bytes=").split("-"))
        if g["Key"] == big_key:
            fetched_big += hi - lo + 1
    assert 0 < fetched_big < size1 * 0.2, \
        f"fetched {fetched_big} of {size1} bytes — not footer-only"


def test_ranged_file_seek_read_semantics(s3_env):
    from olympia_spark.catalog.storage import S3Storage
    client = boto3.client("s3", region_name="us-east-1")
    payload = bytes(range(256)) * 4
    client.put_object(Bucket=s3_env, Key="lake/blob.bin", Body=payload)
    storage = S3Storage(s3_env, "lake", client=client)
    assert storage.size("blob.bin") == len(payload)
    with storage.open_ranged("blob.bin") as f:
        assert f.size() == len(payload)
        f.seek(-8, 2)
        assert f.read(8) == payload[-8:]
        assert f.read(8) == b""           # EOF
        f.seek(10)
        assert f.read(5) == payload[10:15]
        assert f.tell() == 15
        f.seek(5, 1)
        assert f.read(1) == payload[20:21]
        assert f.read() == payload[21:]   # read-to-end


# --- bulk deletes ------------------------------------------------------------


class _DeleteCountingClient:
    def __init__(self, inner):
        self._inner = inner
        self.bulk_calls: list[int] = []
        self.single_calls = 0

    def delete_objects(self, **kw):
        self.bulk_calls.append(len(kw["Delete"]["Objects"]))
        return self._inner.delete_objects(**kw)

    def delete_object(self, **kw):
        self.single_calls += 1
        return self._inner.delete_object(**kw)

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_delete_many_batches_1000_per_request(s3_env):
    from olympia_spark.catalog.storage import S3Storage
    counting = _DeleteCountingClient(boto3.client("s3",
                                                  region_name="us-east-1"))
    storage = S3Storage(s3_env, "lake", client=counting)
    keys = [f"data/o/{i:05d}" for i in range(1003)]
    for k in keys[:5]:                    # a sample actually exists
        storage.overwrite(k, b"x")
    storage.delete_many(keys)
    assert counting.bulk_calls == [1000, 3]
    assert counting.single_calls == 0
    for k in keys[:5]:
        assert not storage.exists(k)


class _PartialFailDeleteClient:
    """DeleteObjects returns HTTP 200 with per-key failures in Errors
    (deny policy / object lock) — boto3 does NOT raise on these."""

    def __init__(self, inner, fail_keys):
        self._inner = inner
        self._fail = set(fail_keys)

    def delete_objects(self, **kw):
        objs = kw["Delete"]["Objects"]
        ok = [o for o in objs if o["Key"] not in self._fail]
        self._inner.delete_objects(
            Bucket=kw["Bucket"],
            Delete={"Objects": ok or [{"Key": "__none__"}], "Quiet": True})
        return {"Errors": [{"Key": o["Key"], "Code": "AccessDenied",
                            "Message": "denied"}
                           for o in objs if o["Key"] in self._fail]}

    def __getattr__(self, name):
        return getattr(self._inner, name)


def test_delete_many_raises_on_per_key_failures(s3_env):
    from olympia_spark.catalog.errors import StorageWriteFailureError
    from olympia_spark.catalog.storage import S3Storage
    inner = boto3.client("s3", region_name="us-east-1")
    storage = S3Storage(s3_env, "lake",
                        client=_PartialFailDeleteClient(
                            inner, {"lake/data/o/locked"}))
    for k in ("data/o/a", "data/o/locked", "data/o/b"):
        storage.overwrite(k, b"x")
    with pytest.raises(StorageWriteFailureError, match="locked"):
        storage.delete_many(["data/o/a", "data/o/locked", "data/o/b"])
    # succeeded keys really deleted + cache-evicted; failed key's cache
    # copy survives (the object still exists remotely)
    assert not storage.exists("data/o/a")
    assert not storage.exists("data/o/b")
    assert not os.path.exists(storage.local_cache_path("data/o/a"))


def test_size_maps_only_not_found(s3_env):
    """A throttle/auth ClientError on head_object must NOT surface as
    the deleted/expired signal (StorageFileOpenFailureError) — history
    walks treat that type as end-of-history."""
    from botocore.exceptions import ClientError
    from olympia_spark.catalog.errors import StorageFileOpenFailureError
    from olympia_spark.catalog.storage import S3Storage

    class _ThrottlingClient:
        def __init__(self, inner):
            self._inner = inner

        def head_object(self, **kw):
            raise ClientError(
                {"Error": {"Code": "SlowDown", "Message": "slow down"},
                 "ResponseMetadata": {"HTTPStatusCode": 503}},
                "HeadObject")

        def __getattr__(self, name):
            return getattr(self._inner, name)

    inner = boto3.client("s3", region_name="us-east-1")
    throttled = S3Storage(s3_env, "lake", client=_ThrottlingClient(inner))
    with pytest.raises(ClientError, match="SlowDown"):
        throttled.size("data/x.parquet")
    # genuine 404 still maps to the open-failure type
    plain = S3Storage(s3_env, "lake", client=inner)
    with pytest.raises(StorageFileOpenFailureError):
        plain.size("data/definitely-missing.parquet")


def test_vacuum_uses_bulk_delete(spark, s3_env):
    eng = _engine(spark, s3_env)          # spool lane e2e
    eng.sql("CREATE NAMESPACE ns1")
    eng.sql("CREATE TABLE ns1.t (id BIGINT)")
    eng.sql("INSERT INTO ns1.t VALUES (1), (2)")
    # plant orphans directly on the object store
    raw = eng.catalog.storage
    for i in range(3):
        raw.overwrite(f"data/ns1/t/orphan/{i}.parquet", b"junk")
    counting = _DeleteCountingClient(eng.catalog.storage._s3)
    eng.catalog.storage._s3 = counting
    removed = eng.remove_orphan_files()
    assert sorted(removed) == [f"data/ns1/t/orphan/{i}.parquet"
                               for i in range(3)]
    assert counting.bulk_calls == [3]
    assert counting.single_calls == 0
    # live table unharmed
    assert eng.sql("SELECT COUNT(*) AS c FROM ns1.t").first().c == 2
