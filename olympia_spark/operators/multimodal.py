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
    """Arrow-native feature extraction: a binary column is one contiguous
    data buffer plus an offsets array, so per-item length and byte-sum
    are pure vectorized buffer arithmetic — no per-row Python call, no
    pandas materialization of a bytes object per row (guide §4.2; the
    previous mapInPandas form paid both via Series.map per payload)."""
    import numpy as np
    import pyarrow as pa
    for batch in batches:
        pays = batch.column("payload")
        off0 = pays.offset
        offs = np.frombuffer(pays.buffers()[1], dtype=np.int32)[
            off0:off0 + len(pays) + 1].astype(np.int64)
        data = np.frombuffer(pays.buffers()[2], dtype=np.uint8)
        # exclusive prefix sum over the shared data buffer: per-item sum
        # is csum[end] - csum[start] — correct for empty payloads too
        csum = np.zeros(len(data) + 1, dtype=np.int64)
        np.cumsum(data, dtype=np.int64, out=csum[1:])
        yield pa.RecordBatch.from_arrays(
            [batch.column("doc_id"), batch.column("source"),
             pa.array(offs[1:] - offs[:-1], type=pa.int64()),
             pa.array(csum[offs[1:]] - csum[offs[:-1]],
                      type=pa.int64())],
            names=["doc_id", "source", "n_bytes", "byte_sum"])


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
    """Binary feature extraction: mapInArrow over the payload column
    (Arrow batches of bytes → vectorized per-item features straight off
    the Arrow buffers), aggregated per source. The fake decoder's
    features are re-derived in SQL by the oracle."""
    media = _media_df(spark, sf).select("doc_id", "source", "payload")
    feats = media.mapInArrow(
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


# --- audio decode + frame energy (WAV header/PCM path) ----------------------

def encode_wav(sample_rate: int, samples) -> bytes:
    """Minimal structurally-valid mono 16-bit PCM WAV: RIFF header +
    ``fmt `` chunk + ``data`` chunk. The deterministic synth side of the
    audio pipeline — decode_wav parses exactly this container layout."""
    import numpy as np
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = ((1).to_bytes(2, "little")            # PCM
           + (1).to_bytes(2, "little")          # mono
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * 2).to_bytes(4, "little")   # byte rate
           + (2).to_bytes(2, "little")          # block align
           + (16).to_bytes(2, "little"))        # bits/sample
    body = (b"WAVE"
            + b"fmt " + len(fmt).to_bytes(4, "little") + fmt
            + b"data" + len(pcm).to_bytes(4, "little") + pcm)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_wav(payload: bytes):
    """Real RIFF/WAVE container parse: verifies magic, walks chunks to the
    ``fmt `` and ``data`` chunks (tolerating extra chunks and odd-length
    padding per the RIFF spec), and returns
    ``(sample_rate, int16 numpy samples)``. Raises on non-PCM, non-mono,
    or non-16-bit payloads instead of mis-decoding them."""
    import numpy as np
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError(f"not a RIFF/WAVE payload: {b[:12]!r}")
    pos, rate, bits, channels, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        clen = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)            # chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    if (channels, bits) != (1, 16):
        raise ValueError(f"expected mono/16-bit, got {channels}ch/{bits}bit")
    return rate, np.frombuffer(data, dtype="<i2")


_AUDIO_WINDOW = 64         # samples per energy frame


def _synth_and_energy(batches):
    """Per-row: synthesize a real WAV byte payload whose samples are a
    pure integer function of doc_id, then decode it back through the RIFF
    parser and emit per-window energy (Σ s², exact int64)."""
    import numpy as np
    for pdf in batches:
        rows = {"doc_id": [], "window_no": [], "sample_rate": [],
                "energy": []}
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            n = _AUDIO_WINDOW * (3 + doc_id % 4)
            i = np.arange(n, dtype=np.int64)
            samples = (doc_id * 31 + i * 7) % 65536 - 32768
            payload = encode_wav(8000 + (doc_id % 3) * 4000, samples)
            rate, decoded = decode_wav(payload)
            sq = decoded.astype(np.int64) ** 2
            for w in range(n // _AUDIO_WINDOW):
                rows["doc_id"].append(doc_id)
                rows["window_no"].append(w)
                rows["sample_rate"].append(rate)
                rows["energy"].append(
                    int(sq[w * _AUDIO_WINDOW:(w + 1) * _AUDIO_WINDOW].sum()))
        yield pd.DataFrame(rows)


@query("mm_audio_energy", oracle=f"""
SELECT doc_id,
       CAST(i // {_AUDIO_WINDOW} AS INT) AS window_no,
       CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
       CAST(SUM(((doc_id * 31 + i * 7) % 65536 - 32768)
                * ((doc_id * 31 + i * 7) % 65536 - 32768)) AS BIGINT)
           AS energy
FROM (SELECT doc_id,
             unnest(generate_series(0,
                 {_AUDIO_WINDOW} * (3 + doc_id % 4) - 1)) AS i
      FROM documents)
GROUP BY doc_id, window_no, sample_rate
ORDER BY doc_id, window_no
""")
def mm_audio_energy(spark: SparkSession, sf: str) -> DataFrame:
    """Audio decode + frame-energy extraction: every doc carries a
    synthesized-but-structurally-real mono 16-bit PCM WAV whose samples
    are a pure integer function of doc_id; decode_wav walks the RIFF
    container (magic, fmt chunk, data chunk, alignment) inside an
    Arrow-batched mapInPandas and the per-{_AUDIO_WINDOW}-sample frame
    energies come out as exact int64 sums of squares. The oracle
    re-derives the same energies arithmetically — a parser bug (chunk
    walk, endianness, int16 view) breaks the hash. Narrow map-only plan:
    payload bytes are born and die inside one Python batch, nothing
    binary ever shuffles; at 100 TB this is the shape of a
    feature-extraction pass over an audio lake (swap the synth for the
    parquet binary column, the parser body for torchaudio)."""
    d = load(spark, sf, "documents").select("doc_id")
    out = d.mapInPandas(
        _synth_and_energy,
        "doc_id long, window_no int, sample_rate int, energy long")
    return out.orderBy("doc_id", "window_no")
