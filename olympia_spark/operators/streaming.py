"""B32 — Structured Streaming ingest with catalog commits per micro-batch.

The reference has no streaming code; B32 exists because a catalog commit
per micro-batch is the natural Spark-native extension of TABLE_INSERT
(SURVEY §2 notes). Three shapes, all trigger(availableNow) over the
bounded fixture so they are batch-equivalence-checkable against DuckDB:

* tumbling-window aggregation (readStream → withWatermark → window())
* sliding-window aggregation (overlapping windows)
* file-source → catalog sink via foreachBatch: each micro-batch appends
  parquet files and CAS-commits TABLE_INSERT with the batch id recorded
  in the table properties — the idempotency marker that makes replays
  after a restart exactly-once (plus Spark's own checkpoint).

Scale posture: watermark + windowed agg is incremental state in the
streaming engine (RocksDB-backed on a real cluster); the catalog sink
commits one metadata CAS per batch regardless of data volume.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import cloudpickle as _cloudpickle

from olympia_spark.operators._scratch import get_or_create, scratch_dir
from olympia_spark.operators.registry import dsum, query
from olympia_spark.tables import load

# The stateful operator's Python function ships to executors by VALUE so a
# driver running from a foreign cwd (the grading driver) needs no repo
# import on workers — same posture as udfs.py/multimodal.py.
_cloudpickle.register_pickle_by_value(sys.modules[__name__])

_QUERY_SEQ = 0

# Staged source files are immutable once written — share one staging dir
# across the four B32 queries (keyed per session+sf) so the driver gate
# pays the fixture write once, not four times.
_STAGE_CACHE: dict[tuple[str, str], tuple[str, object]] = {}

_N_STAGE_FILES = 2  # ≥2 proves multi-micro-batch increments; each extra
                    # file is a whole extra scheduling round at fixture scale


def _staged_events_stream(spark: SparkSession, sf: str) -> tuple[DataFrame, str]:
    """Stage the events fixture as parquet files (simulated arrivals)
    and open a file-source stream over them."""
    def stage():
        stage_dir = scratch_dir("olympia_stream_src_")
        events = load(spark, sf, "events")
        # Watermarks/event-time windows require TIMESTAMP (LTZ); newer
        # testdata stores ts as TIMESTAMP_NTZ, so normalize at stage time.
        events = events.withColumn("ts", F.col("ts").cast("timestamp"))
        events.repartition(_N_STAGE_FILES).write.mode("overwrite") \
            .parquet(stage_dir)
        return stage_dir, events.schema

    stage_dir, schema = get_or_create(_STAGE_CACHE, spark, sf, stage)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)      # one file per micro-batch
              .parquet(stage_dir))
    return stream, stage_dir


def _run_to_memory(stream_df: DataFrame, mode: str) -> DataFrame:
    """Drain the bounded stream into a memory sink, return the result.

    The state-store partition count is frozen from
    ``spark.sql.shuffle.partitions`` at query start; under a
    default-config driver session that is 200 partitions × N micro-batches
    of scheduling overhead for a fixture-sized stream. Scope it down for
    the drain and restore the caller's value after."""
    global _QUERY_SEQ
    _QUERY_SEQ += 1
    name = f"olympia_stream_{_QUERY_SEQ}"
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (stream_df.writeStream.format("memory").queryName(name)
             .outputMode(mode)
             .option("checkpointLocation",
                     scratch_dir("olympia_ckpt_"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


@query("b32_stream_tumbling_window", oracle=f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n, {dsum('value', 'value_sum')}
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""")
def b32_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour windows with a watermark; complete-mode memory sink
    so every window is emitted for the batch-equivalence check."""
    stream, _ = _staged_events_stream(spark, sf)
    agg = (stream
           .withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
           .agg(F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
                 .alias("value_sum")))
    out = _run_to_memory(agg, "complete")
    return (out.select(F.col("window.start").alias("window_start"),
                       "event_type", "n", "value_sum")
            .orderBy("window_start", "event_type"))


@query("b32_stream_sliding_window", oracle=f"""
SELECT window_start, COUNT(*) AS n
FROM (
  SELECT date_trunc('hour', ts) AS window_start FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_start FROM events
)
GROUP BY 1
ORDER BY 1
""")
def b32_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding windows (2h length, 1h slide): every event lands in two
    overlapping windows; the oracle reproduces that as a union of the two
    hour-truncations per event."""
    stream, _ = _staged_events_stream(spark, sf)
    agg = (stream
           .withWatermark("ts", "1 hour")
           .groupBy(F.window("ts", "2 hours", "1 hour"))
           .agg(F.count("*").alias("n")))
    out = _run_to_memory(agg, "complete")
    # window.start + 1h == the hour bucket ending inside the window; align
    # to the oracle's representation: each 2h window [s, s+2) is keyed by
    # s+1h (the later of the two hour-buckets it covers)
    return (out.select(
        (F.col("window.start") + F.expr("INTERVAL 1 HOUR"))
        .alias("window_start"), "n")
        .orderBy("window_start"))


@query("b32_stream_session_window", oracle="""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, sess_id
ORDER BY user_id, session_start
""")
def b32_session(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (30-minute inactivity gap) — the stateful merge
    operator batch SQL can't express directly; the oracle reproduces it
    with the islands pattern (lag → new-session flag → running sum).
    Spark merges events whose gap is strictly < 30min; the oracle starts
    a new session at gap ≥ 30min — same boundary.

    No watermark: files arrive time-unordered, and the session-window
    operator filters watermark-late input even in complete mode (unlike
    plain window aggs) — a watermark here silently drops half the events.
    Complete mode keeps all session state instead; a production unbounded
    stream would use append mode + watermark over roughly-ordered
    arrivals."""
    stream, _ = _staged_events_stream(spark, sf)
    agg = (stream
           .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
           .agg(F.count("*").alias("n_events")))
    out = _run_to_memory(agg, "complete")
    return (out.select("user_id",
                       F.col("session_window.start").alias("session_start"),
                       "n_events")
            .orderBy("user_id", "session_start"))


def catalog_ingest_sink(eng):
    """foreachBatch sink: append the micro-batch's files and CAS-commit
    TABLE_INSERT with the batch id recorded in the table properties — the
    idempotency marker that makes replays after a restart exactly-once
    (plus Spark's own checkpoint)."""
    from olympia_spark.catalog.actions import ActionType

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        marker = f"stream_batch_{batch_id}"
        # Idempotency check BEFORE opening the commit transaction: a
        # replayed batch must not leave a dangling begun-but-unfinished
        # txn behind (harmless in-memory, but the dist-txn variant would
        # persist it).
        probe = eng.catalog.begin()
        if marker in eng.catalog.describe_table(
                probe, "stream", "events").properties:
            return                          # replayed batch — exactly-once
        # The commit txn opens BEFORE the (long) file write so its base
        # snapshot predates the batch: DDL committed mid-write (ADD
        # CONSTRAINT, RENAME COLUMN) then fails this txn's CAS and goes
        # through conflict analysis — an unvalidated batch aborts
        # instead of landing silently. The TableDef read under the SAME
        # txn drives the writer chokepoint (CHECK constraints,
        # generated columns, column mapping — streaming batches behave
        # exactly like batch writes); a raising write abandons the
        # in-memory txn with nothing durable (only save_dist persists
        # handles).
        txn = eng.catalog.begin()
        tdef = eng.catalog.describe_table(txn, "stream", "events")
        files = eng._write_files(batch_df, "stream", "events",
                                 tdef.partition_by, tdef=tdef)
        eng.catalog.update_table_files(
            txn, "stream", "events", files, [], ActionType.TABLE_INSERT,
            {"added": [f.path for f in files], "batch_id": batch_id},
            extra_properties={marker: "committed"})
        eng.catalog.commit(txn)

    return sink


@query("b32_stream_catalog_ingest", oracle=f"""
SELECT COUNT(*) AS n_rows, {dsum('value', 'value_sum')},
       COUNT(DISTINCT event_id) AS n_ids,
       MIN(ts) AS ts_min, MAX(ts) AS ts_max
FROM events
""")
def b32_catalog_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """File source → catalog table sink: foreachBatch appends each
    micro-batch through the engine (one TABLE_INSERT CAS commit per
    batch, batch id recorded in table properties for idempotent replays).
    The final catalog table must equal the source exactly.

    The table is declared from the STAGED stream's schema, not a fresh
    ``load()``: staging casts ts NTZ→LTZ for event-time semantics, and the
    declared type must match the written files or any later read of ts
    from the committed table fails under the vectorized reader. The query
    reads ts back (min/max) so the gate proves the round-trip."""
    from olympia_spark.engine import Engine

    stream, _ = _staged_events_stream(spark, sf)
    eng = Engine(spark, scratch_dir("olympia_stream_wh_"))
    eng.sql("CREATE NAMESPACE stream")
    eng.create_table("stream.events", stream.schema)
    sink = catalog_ingest_sink(eng)

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation",
                 scratch_dir("olympia_ckpt_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    return eng.sql(
        "SELECT COUNT(*) AS n_rows, "
        "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum, "
        "COUNT(DISTINCT event_id) AS n_ids, "
        "MIN(ts) AS ts_min, MAX(ts) AS ts_max "
        "FROM stream.events")


# --- streaming dedup --------------------------------------------------------

@query("b32_stream_dedup", oracle="""
SELECT user_id, event_type FROM events
GROUP BY user_id, event_type
ORDER BY user_id, event_type
""")
def b32_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming deduplication: ``dropDuplicates`` keeps per-key state in
    the state store and emits each (user_id, event_type) key exactly once,
    on first arrival, across micro-batches — the ingest-time dedup shape
    (at 100 TB the key would be a content digest; the state store is
    RocksDB-backed and the emitted stream is duplicate-free by
    construction, no batch re-dedup downstream). The emitted KEY SET is
    arrival-order independent, which is what the oracle checks.

    No watermark for the same reason as the session window: the staged
    files replay time-unordered, and ``dropDuplicatesWithinWatermark``
    would drop late keys; a production unbounded stream would use it to
    bound state."""
    stream, _ = _staged_events_stream(spark, sf)
    deduped = stream.dropDuplicates(["user_id", "event_type"])
    out = _run_to_memory(deduped, "append")
    return (out.select("user_id", "event_type")
            .orderBy("user_id", "event_type"))


# --- stream-stream join -----------------------------------------------------

@query("b32_stream_join", oracle=f"""
SELECT c.user_id, COUNT(*) AS n_pairs,
       {dsum('p.value', 'purchase_value_sum')}
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY c.user_id
ORDER BY c.user_id
""")
def b32_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream inner join: clicks and purchases are two independent
    streams over the same staged arrivals; each click joins purchases by
    the same user within the following 30 minutes. Both sides buffer in
    the state store until a match arrives (the attribution-join shape).
    The joined SET is arrival-order independent, so a batch self-join
    oracle applies; the drained pairs are aggregated per user in batch.

    Inner stream-stream joins need no watermark for correctness — only
    for state eviction, which a bounded replay doesn't need; a production
    deployment adds watermarks on both sides + the time bound to let the
    store drop expired rows."""
    stream_c, _ = _staged_events_stream(spark, sf)
    stream_p, _ = _staged_events_stream(spark, sf)
    clicks = (stream_c.filter("event_type = 'click'")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts")))
    purchases = (stream_p.filter("event_type = 'purchase'")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("p_ts"), "value"))
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTE")))
    out = _run_to_memory(joined, "append")
    return (out.groupBy(F.col("c_user").alias("user_id"))
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(F.col("value").cast("decimal(25,6)")).cast("double")
                  .alias("purchase_value_sum"))
            .orderBy("user_id"))


# --- custom stateful operator (applyInPandasWithState) ----------------------

def _user_stats_fn(key, pdfs, state):
    """Per-user running aggregate with EXPLICIT state: (n_events,
    value_micro) carried across micro-batches in a GroupState — the
    applyInPandasWithState shape for operators the built-in window aggs
    can't express (custom accumulators, decay logic, ML feature state).

    The value accumulator is an int64 of floor(value·10⁶) micro-units:
    integer addition is order-free and exact, which is what makes a
    custom streaming accumulator DuckDB-oracle-checkable (a float
    accumulator's pandas summation order is not portable). floor (not
    round) because numpy rounds half-even while SQL ROUND rounds
    half-away — floor is identical everywhere."""
    import numpy as np
    import pandas as pd
    n, vmicro = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        vmicro += int(np.floor(pdf["value"].fillna(0.0).to_numpy()
                               * 1e6).astype("int64").sum())
    state.update((n, int(vmicro)))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "value_micro": [int(vmicro)]})


@query("b32_stream_stateful_counter", oracle="""
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)), 0)
            AS BIGINT) AS value_micro
FROM events
GROUP BY user_id
ORDER BY user_id
""")
def b32_stateful(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user event counter + exact micro-unit value accumulator whose
    state persists in the state store across micro-batches
    (RocksDB-backed on a real cluster). Update mode emits each group's
    row per batch; the LAST emission per user carries the complete
    totals. Integer state makes the result independent of batch split
    and pandas summation order, so the full DuckDB oracle applies."""
    from pyspark.sql.types import LongType, StructField, StructType
    stream, _ = _staged_events_stream(spark, sf)
    out_schema = StructType([
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("value_micro", LongType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("vmicro", LongType()),
    ])
    global _QUERY_SEQ
    stateful = (stream.groupBy("user_id")
                .applyInPandasWithState(
                    _user_stats_fn, out_schema, state_schema,
                    "update", "NoTimeout"))
    out = _run_to_memory(stateful, "update")
    # update mode appends one row per (user, batch); keep each user's last
    # emission (highest n_events) = the fully-accumulated state
    from pyspark.sql import Window
    latest = (out.withColumn(
        "_rn", F.row_number().over(
            Window.partitionBy("user_id")
            .orderBy(F.col("n_events").desc())))
        .filter("_rn = 1").drop("_rn"))
    return (latest.select("user_id", "n_events", "value_micro")
            .orderBy("user_id"))


# --- streaming CDC apply (foreachBatch MERGE) --------------------------------

@query("b32_stream_merge_cdc", oracle=f"""
WITH ranked AS (
  SELECT event_id % 500 AS kid, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_id % 500
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT COUNT(*) AS n_keys, CAST(SUM(event_id) AS BIGINT) AS id_sum,
       {dsum('value', 'value_sum')}
FROM ranked WHERE rn = 1
""")
def b32_stream_merge_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming CDC apply: file-source micro-batches are upserted into a
    catalog table via foreachBatch → MERGE — the change-data-capture sink
    shape (one atomic TABLE_UPDATE CAS commit per batch; only files
    containing matched keys rewrite).

    Determinism contract: arrivals are staged as two files in strict
    (ts, event_id) order (file 2's rows all sort after file 1's), each
    batch pre-reduces to its latest row per key, and MERGE makes later
    batches win — so the final table is exactly the global
    last-write-wins state per key, independent of how Spark schedules
    the batches, and the plain window-rank oracle applies. The staging
    sort is harness setup; the operator under test is the per-batch
    reduce + MERGE, which at 100 TB touches only files holding updated
    keys."""
    import time as _time

    from olympia_spark.engine import Engine
    from pyspark.sql import Window

    events = (load(spark, sf, "events")
              .select((F.col("event_id") % 500).alias("kid"),
                      "event_id", "ts", "value"))
    # stage two time-ordered arrival files (file mtime order = batch order)
    w = Window.orderBy("ts", "event_id")
    ranked = events.select("*", F.row_number().over(w).alias("_rn"))
    half = events.count() // 2
    stage_dir = scratch_dir("olympia_cdc_src_")
    (ranked.filter(F.col("_rn") <= half).drop("_rn")
     .coalesce(1).write.mode("overwrite").parquet(stage_dir))
    _time.sleep(0.05)        # distinct mtimes → stable file-source order
    (ranked.filter(F.col("_rn") > half).drop("_rn")
     .coalesce(1).write.mode("append").parquet(stage_dir))

    eng = Engine(spark, scratch_dir("olympia_cdc_wh_"))
    eng.sql("CREATE NAMESPACE cdc")
    eng.create_table("cdc.state",
                     events.schema)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        bw = Window.partitionBy("kid").orderBy(
            F.col("ts").desc(), F.col("event_id").desc())
        latest = (batch_df.select("*", F.row_number().over(bw).alias("_r"))
                  .filter("_r = 1").drop("_r"))
        # foreachBatch hands a micro-batch-cloned session; a plain temp
        # view would be invisible to the engine's outer session. Global
        # temp views are SparkContext-global — the supported bridge.
        latest.createOrReplaceGlobalTempView("cdc_src")
        eng.sql("""
            MERGE INTO cdc.state t
            USING (SELECT * FROM global_temp.cdc_src) s
            ON t.kid = s.kid
            WHEN MATCHED THEN UPDATE SET event_id = s.event_id, ts = s.ts,
                                         value = s.value
            WHEN NOT MATCHED THEN INSERT (kid, event_id, ts, value)
                VALUES (s.kid, s.event_id, s.ts, s.value)
        """)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(stage_dir))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (stream.writeStream.foreachBatch(sink)
             .option("checkpointLocation", scratch_dir("olympia_ckpt_"))
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

    return eng.sql(
        "SELECT COUNT(*) AS n_keys, CAST(SUM(event_id) AS BIGINT) AS id_sum, "
        "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum "
        "FROM cdc.state")


# --- watermark late-data semantics -------------------------------------------

@query("b32_stream_watermark_append", oracle="""
WITH wm AS (SELECT MAX(ts) - INTERVAL 2 HOUR AS w FROM events)
SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n
FROM events, wm
WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= w
GROUP BY 1
ORDER BY 1
""")
def b32_watermark_append(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark-driven append emission, oracle-exact: append mode must
    emit EXACTLY the finalized windows — those whose end precedes the
    watermark (global max ts − 2 h here) — with complete counts, while
    still-open windows within the watermark horizon stay buffered in the
    state store and are withheld. This is the eviction contract that
    bounds state-store memory on an unbounded stream: state is O(windows
    inside the horizon), never O(stream).

    Staging makes the emission set a pure function of the data: batch 1
    carries the NEWEST half of the events (rank split, mtime-ordered
    files), advancing the watermark to its final value before the older
    half arrives, so every closed window is evicted+emitted at the second
    batch and the SQL oracle (all rows, window_end ≤ max−2h) reproduces
    the sink exactly. Empirically pinned behavior (Spark 4.1): late rows
    merge into fresh state and are emitted at eviction rather than
    dropped pre-aggregation, which is why full counts — not on-time
    counts — are the correct oracle."""
    import time as _time
    from pyspark.sql import Window

    events = (load(spark, sf, "events")
              .withColumn("ts", F.col("ts").cast("timestamp"))
              .select("event_id", "ts"))
    w = Window.orderBy("ts", "event_id")
    ranked = (events.select(
        "event_id", "ts", F.row_number().over(w).alias("_rn")))
    half = events.count() // 2
    stage_dir = scratch_dir("olympia_late_src_")
    # file 1 (first batch): newest half — rank > half
    (ranked.filter(F.col("_rn") > half).drop("_rn")
     .coalesce(1).write.mode("overwrite").parquet(stage_dir))
    _time.sleep(0.05)          # distinct mtimes → stable file-source order
    (ranked.filter(F.col("_rn") <= half).drop("_rn")
     .coalesce(1).write.mode("append").parquet(stage_dir))

    stream = (spark.readStream.schema(ranked.drop("_rn").schema)
              .option("maxFilesPerTrigger", 1).parquet(stage_dir))
    agg = (stream
           .withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour"))
           .agg(F.count("*").alias("n")))
    out = _run_to_memory(agg, "append")
    return (out.select(F.col("window.start").alias("window_start"), "n")
            .orderBy("window_start"))


# --- streaming consumption of the change feed (B58b) -------------------------

def changefeed_sink(eng, src: str, dst: str, key: str = "event_id"):
    """foreachBatch consumer of the B58 change feed: each micro-batch is a
    VERSION CURSOR row (from_version, to_version); the sink pulls that
    version diff through Engine.table_changes — which scans only files
    that entered or left the table, never the whole table — reduces it to
    a net operation per key, and MERGE-applies it to the downstream
    mirror. Batch ids are recorded in the mirror's properties so a
    replayed batch is a no-op (exactly-once on top of Spark's own
    checkpoint). The cursor collect() is catalog METADATA — O(versions),
    never data."""
    def sink(batch_df, batch_id: int) -> None:
        ns, tbl = dst.split(".")
        for cur in sorted(batch_df.collect(),
                          key=lambda r: r.from_version):
            # The idempotency marker is per (batch, cursor row), not per
            # batch: a batch can carry several version diffs, each applied
            # by its OWN merge commit — a batch-level marker written with
            # the first merge would make a crash between merges
            # unrecoverable (replay sees the marker and skips the
            # remaining diffs forever). Probing per row keeps the check
            # against the freshest committed properties.
            marker = f"stream.batch.{batch_id}.v{cur.from_version}"
            probe = eng.catalog.begin()
            if marker in eng.catalog.describe_table(
                    probe, ns, tbl).properties:
                continue                    # replayed diff — exactly-once
            changes = eng.table_changes(src, cur.from_version,
                                        cur.to_version)
            data_cols = [c for c in changes.columns if c != "_change_type"]
            ins = (changes.filter("_change_type = 'insert'")
                   .select(*data_cols).withColumn("_op", F.lit("upsert")))
            dels = (changes.filter("_change_type = 'delete'")
                    .select(*data_cols)
                    .join(ins.select(key), key, "left_anti")
                    .withColumn("_op", F.lit("delete")))
            assign = {c: f"s.{c}" for c in data_cols}
            eng.merge(dst, ins.unionByName(dels), on=f"t.{key} = s.{key}",
                      matched_clauses=[("s._op = 'delete'", "delete", None),
                                       (None, "update", assign)],
                      not_matched_clauses=[("s._op = 'upsert'", assign)],
                      extra_properties={marker: "committed"})
    return sink


@query("b58b_stream_changes", oracle=f"""
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(event_id) AS BIGINT) AS id_sum,
       {dsum("CASE WHEN event_type = 'click' THEN value * 2 "
             "ELSE value END", 'value_sum')}
FROM events
WHERE event_type <> 'error'
GROUP BY event_type
ORDER BY event_type
""")
def b58b_stream_changes(spark: SparkSession, sf: str) -> DataFrame:
    """B58b — streaming consumption of the change data feed: a source
    catalog table evolves (seed → UPDATE clicks ×2 → DELETE errors), a
    downstream MIRROR starts from the seed snapshot and catches up by
    streaming the version cursor — each micro-batch applies one version
    diff via table_changes + MERGE. The mirror's final state must equal
    the source's: the oracle recomputes it from the untouched fixture.
    Cost per batch is O(changed files) (the feed scans only entered/left
    files; MERGE rewrites only matched files) — the downstream job never
    rescans the table, which is the entire point of CDC at 100 TB."""
    import time as _time

    from olympia_spark.engine import Engine

    eng = Engine(spark, scratch_dir("olympia_cdf_wh_"))
    eng.sql("CREATE NAMESPACE cdc")
    src_df = load(spark, sf, "events")
    eng.write_table(src_df.repartition(4), "cdc.src")
    v_seed = eng.catalog.tree.find_latest_version()
    eng.write_table(src_df, "cdc.mirror")         # consumer's seed snapshot
    eng.sql("UPDATE cdc.src SET value = value * 2 WHERE event_type = 'click'")
    v_upd = eng.catalog.tree.find_latest_version()
    eng.sql("DELETE FROM cdc.src WHERE event_type = 'error'")
    v_del = eng.catalog.tree.find_latest_version()

    # stage the version cursor: one file per version diff → one micro-batch
    cursor_dir = scratch_dir("olympia_cdf_cursor_")
    spark.createDataFrame([(v_seed, v_upd)],
                          "from_version INT, to_version INT") \
        .coalesce(1).write.mode("overwrite").parquet(cursor_dir)
    _time.sleep(0.05)
    spark.createDataFrame([(v_upd, v_del)],
                          "from_version INT, to_version INT") \
        .coalesce(1).write.mode("append").parquet(cursor_dir)

    cursor = (spark.readStream
              .schema("from_version INT, to_version INT")
              .option("maxFilesPerTrigger", 1).parquet(cursor_dir))
    q = (cursor.writeStream.foreachBatch(changefeed_sink(
            eng, "cdc.src", "cdc.mirror"))
         .option("checkpointLocation", scratch_dir("olympia_ckpt_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    return eng.sql(
        "SELECT event_type, COUNT(*) AS n, "
        "CAST(SUM(event_id) AS BIGINT) AS id_sum, "
        "CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum "
        "FROM cdc.mirror GROUP BY event_type ORDER BY event_type")


# --- B32 × B151: continuous streaming materialized view (r15) -----------------

@query("b32_stream_mv_refresh", oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS value_sum
FROM events GROUP BY event_type ORDER BY event_type
""")
def b32_stream_mv_refresh(spark: SparkSession, sf: str) -> DataFrame:
    """B32 × B151 (VERDICT r14 #6) — the production continuous-
    aggregate pipeline end to end: a foreachBatch sink that (1) appends
    the micro-batch through the catalog with the batch-id idempotency
    marker (the b32_stream_catalog_ingest mechanism — replays after a
    restart are exactly-once), then (2) calls the MV's INCREMENTAL
    refresh. The refresh needs NO marker of its own: its watermark (the
    catalog version it last consumed) is the idempotency cursor — a
    replayed batch's skipped ingest leaves no new version, so the
    refresh no-ops; a crash BETWEEN ingest and refresh replays into a
    skipped ingest plus a refresh that picks up exactly the orphaned
    delta. Every live batch is ASSERTED to refresh on the incremental
    lane (O(batch), never O(table)); the final MV state batch-equals
    the SQL aggregate over the whole source."""
    from olympia_spark.engine import Engine

    stream, _ = _staged_events_stream(spark, sf)
    eng = Engine(spark, scratch_dir("olympia_stream_mv_"))
    eng.sql("CREATE NAMESPACE stream")
    eng.create_table("stream.events", stream.schema)
    eng.sql("CREATE MATERIALIZED VIEW stream.mv_by_type AS "
            "SELECT event_type, COUNT(*) AS n_events, "
            "SUM(CAST(value AS DECIMAL(25,6))) AS val_dec "
            "FROM stream.events GROUP BY event_type")
    ingest = catalog_ingest_sink(eng)
    modes: list[tuple[int, str]] = []

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest(batch_df, batch_id)
        rep = eng.refresh_materialized_view(
            "stream.mv_by_type").collect()[0]
        modes.append((batch_id, rep.mode))

    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", scratch_dir("olympia_ckpt_"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    if len(modes) < 2 or any(m != "incremental" for _b, m in modes):
        # the per-micro-batch incremental refresh IS the operator
        raise AssertionError(f"expected ≥2 incremental refreshes, "
                             f"got {modes}")
    return eng.sql(
        "SELECT event_type, n_events, "
        "CAST(val_dec AS DOUBLE) AS value_sum "
        "FROM stream.mv_by_type ORDER BY event_type")
