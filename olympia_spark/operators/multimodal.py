"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Pattern (SURVEY-level design for a training-data lake): media lives in a
`binary` column with a typed metadata struct beside it; decode /
feature-extract / frame-sample run as Arrow-batched Python over
``mapInPandas``. The container has no image/audio libraries, so the real
codec step is stubbed (`decode_image`, clearly-marked NotImplementedError)
— but everything Spark-side is real and tested: the binary column, the
metadata struct schema, the mapInPandas signature and batch shape, the
partitioning. The deterministic fake decoder makes the whole pipeline
oracle-checkable: its features (byte length / byte sum / sampled frame
bytes) are re-derivable in pure SQL over the source text.

Scale posture: binary payloads never shuffle — every operator here is a
narrow mapInPandas followed by a small aggregation. At 100 TB the payload
column stays in parquet until the batch reaches Python; column pruning
keeps metadata-only queries from ever reading the bytes.
"""

from __future__ import annotations

import sys

import pandas as pd

from pyspark import cloudpickle as _cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from olympia_spark.operators.registry import query
from olympia_spark.tables import load

# Pickle the batch functions by value (see udfs.py) — executor workers
# can't import this package when the driver runs from another cwd.
_cloudpickle.register_pickle_by_value(sys.modules[__name__])

_FRAME_BYTES = 32          # fake "video": fixed-size frames inside the blob
_FRAME_STRIDE = 4          # sample every 4th frame


def decode_image(payload: bytes) -> "object":
    """Real media decode — STUB. The container ships no codec libraries
    (no PIL/opencv/ffmpeg); a deployment would replace this body with
    `PIL.Image.open(io.BytesIO(payload))` and keep every signature and
    batch shape below unchanged."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use fake_features() for the deterministic test pipeline")


def fake_features(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': (n_bytes, byte_sum). Stands in for
    width/height/channel stats a real decoder would emit."""
    return len(payload), int(sum(payload))


def _media_df(spark: SparkSession, sf: str) -> DataFrame:
    """documents → (doc_id, source, payload BINARY, meta STRUCT).

    The binary payload is the utf-8 text bytes (ascii fixture corpus →
    byte arithmetic is SQL-rederivable); meta is the typed sidecar struct
    every multimodal table carries."""
    d = load(spark, sf, "documents")
    return d.select(
        "doc_id", "source",
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("long").alias("declared_len"),
            F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        ).alias("meta"))


# --- feature extraction (mapInPandas over binary) ---------------------------

def _extract_features(batches):
    import numpy as np
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "n_bytes": payloads.map(len),
            "byte_sum": payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())),
        })


@query("mm_feature_extract", oracle="""
SELECT source,
       COUNT(*) AS n_media,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(SUM(list_aggregate(list_transform(string_split(text, ''),
                                  c -> ascii(c)), 'sum')) AS BIGINT) AS byte_sum
FROM documents
GROUP BY source
ORDER BY source
""")
def mm_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Binary feature extraction: mapInPandas over the payload column
    (Arrow batches of bytes → per-item features), aggregated per source.
    The fake decoder's features are re-derived in SQL by the oracle."""
    media = _media_df(spark, sf).select("doc_id", "source", "payload")
    feats = media.mapInPandas(
        _extract_features,
        "doc_id long, source string, n_bytes long, byte_sum long")
    return (feats.groupBy("source")
            .agg(F.count("*").alias("n_media"),
                 F.sum("n_bytes").alias("total_bytes"),
                 F.sum("byte_sum").alias("byte_sum"))
            .orderBy("source"))


# --- metadata-only query (payload never read) -------------------------------

@query("mm_metadata_scan", oracle="""
SELECT COUNT(*) AS n_media,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       COUNT(*) FILTER (WHERE strlen(text) >= 300) AS n_large
FROM documents
""")
def mm_metadata_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Typed-metadata query: filters/aggregates only the sidecar struct.
    Column pruning keeps the binary payload out of the scan entirely —
    check ReadSchema in .explain(); this is the 100 TB reason the
    metadata struct exists."""
    media = _media_df(spark, sf)
    return media.agg(
        F.count("*").alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.sum(F.when(F.col("meta.n_bytes") >= 300, 1).otherwise(0))
         .alias("n_large"))


# --- frame sampling (video-shaped access) -----------------------------------

def _sample_frames(batches):
    for pdf in batches:
        rows = {"doc_id": [], "frame_no": [], "first_byte": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME_BYTES
            for f in range(0, n_frames, _FRAME_STRIDE):
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(f)
                rows["first_byte"].append(payload[f * _FRAME_BYTES])
        yield pd.DataFrame(rows)


@query("mm_frame_sample", oracle=f"""
SELECT doc_id, j AS frame_no,
       ascii(substr(text, j * {_FRAME_BYTES} + 1, 1)) AS first_byte
FROM (SELECT doc_id, text,
             unnest(generate_series(0,
                 CAST(floor(strlen(text) / {_FRAME_BYTES}) AS BIGINT) - 1,
                 {_FRAME_STRIDE})) AS j
      FROM documents
      WHERE strlen(text) >= {_FRAME_BYTES})
ORDER BY doc_id, frame_no
""")
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over 'video' blobs: every {stride}-th fixed-size frame,
    emitting (doc_id, frame_no, first_byte). mapInPandas fan-out — one input
    row yields many frame rows without leaving the partition. Oracle
    recomputes the sampled bytes with substr arithmetic."""
    media = _media_df(spark, sf).select("doc_id", "payload")
    frames = media.mapInPandas(
        _sample_frames, "doc_id long, frame_no int, first_byte int")
    return frames.orderBy("doc_id", "frame_no")
