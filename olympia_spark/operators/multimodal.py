"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Pattern (SURVEY-level design for a training-data lake): media lives in a
`binary` column with a typed metadata struct beside it; decode /
feature-extract / frame-sample run as Arrow-batched Python over
``mapInPandas``. The container has no image/audio libraries, so
`decode_image` is a header-level decoder — a real magic-bytes parse of
PNG/JPEG/GIF dimensions (what resolution filters and aspect-ratio
bucketing need), with pixel decode left to a PIL swap-in. Everything
Spark-side is real and tested: the binary column, the metadata struct
schema, the mapInPandas signature and batch shape, the partitioning, and
the features (byte length / byte sum / sampled frame bytes / decoded
dims) are re-derivable in pure SQL over the source text.

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


def decode_image(payload: bytes) -> dict:
    """Header-level image decode from magic bytes: returns
    ``{"format", "width", "height"}`` for PNG / JPEG / GIF payloads —
    the metadata a curation pipeline actually needs (resolution filters,
    aspect-ratio bucketing) without any codec library. Full pixel decode
    would swap this body for ``PIL.Image.open(io.BytesIO(payload))``;
    every signature and batch shape downstream stays unchanged."""
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return {"format": "png",
                "width": int.from_bytes(b[16:20], "big"),
                "height": int.from_bytes(b[20:24], "big")}
    if b[:2] == b"\xff\xd8":                       # JPEG SOI
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2                              # standalone marker
                continue
            seg_len = int.from_bytes(b[i + 2:i + 4], "big")
            # SOFn frame headers (not DHT/DAC/restart): height then width
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return {"format": "jpeg",
                        "width": int.from_bytes(b[i + 7:i + 9], "big"),
                        "height": int.from_bytes(b[i + 5:i + 7], "big")}
            i += 2 + seg_len
        raise ValueError("JPEG payload has no SOF frame header")
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return {"format": "gif",
                "width": int.from_bytes(b[6:8], "little"),
                "height": int.from_bytes(b[8:10], "little")}
    raise ValueError(f"unrecognized image magic: {b[:8]!r}")


def encode_png_header(width: int, height: int) -> bytes:
    """Minimal structurally-valid PNG prefix (magic + IHDR chunk) for the
    deterministic test pipeline — decode_image reads exactly these bytes."""
    ihdr = (width.to_bytes(4, "big") + height.to_bytes(4, "big")
            + bytes([8, 2, 0, 0, 0]))
    return (b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big") + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00")                  # CRC not checked


def encode_jpeg_header(width: int, height: int) -> bytes:
    """Minimal JPEG prefix: SOI + SOF0 frame header carrying the dims."""
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
           + height.to_bytes(2, "big") + width.to_bytes(2, "big")
           + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]))
    return b"\xff\xd8" + sof + b"\xff\xd9"


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


# --- image header decode (magic-bytes codec path) ---------------------------

def _synth_and_decode(batches):
    """Per-row: synthesize a real PNG/JPEG byte payload, then push it
    through decode_image — the actual header-parse path a production
    pipeline runs on scraped media."""
    for pdf in batches:
        fmts, ws, hs = [], [], []
        for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
            w, h = int(doc_id) % 640 + 16, int(n_chars) % 480 + 16
            payload = (encode_png_header(w, h) if doc_id % 2 == 0
                       else encode_jpeg_header(w, h))
            info = decode_image(payload)
            fmts.append(info["format"])
            ws.append(info["width"])
            hs.append(info["height"])
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "fmt": fmts,
                            "width": ws, "height": hs})


@query("mm_decode_image_dims", oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       CAST(doc_id % 640 + 16 AS INT) AS width,
       CAST(n_chars % 480 + 16 AS INT) AS height
FROM documents
ORDER BY doc_id
""")
def mm_decode_image_dims(spark: SparkSession, sf: str) -> DataFrame:
    """Image header decode over binary payloads: every doc carries a
    synthesized-but-structurally-real PNG or JPEG byte string whose dims
    are a pure function of (doc_id, n_chars); decode_image parses them
    back from the magic bytes inside an Arrow-batched mapInPandas. The
    oracle re-derives the expected dims arithmetically — a decoder bug
    (endianness, SOF offset, marker walk) breaks the hash. Narrow
    map-only plan: payloads never shuffle."""
    d = load(spark, sf, "documents").select("doc_id", "n_chars")
    out = d.mapInPandas(
        _synth_and_decode, "doc_id long, fmt string, width int, height int")
    return out.orderBy("doc_id")
