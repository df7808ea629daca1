"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata (driver-mandated extension, SURVEY.md §2.C).

The Spark-side plumbing is real and tested: schema (BinaryType payload +
StructType metadata), Arrow-batched mapInPandas for the decode/feature
stage, deterministic partitioning.  The actual media decoding is STUBBED —
the image/audio libraries are not in this container — behind
``decode_image``/``decode_audio`` which raise NotImplementedError, with a
deterministic ``fake_decode`` used by tests and the corpus so the batch
shape / UDF signature / schema path is exercised end to end.

At 100 TB: payloads stay columnar-binary in parquet; mapInPandas streams
Arrow record batches (bounded by spark.sql.execution.arrow.maxRecordsPerBatch),
so executor memory is batch-sized, not partition-sized; feature extraction
parallelism == file-split parallelism with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum_md5", T.StringType()),
        T.StructField("uri", T.StringType()),
    ]
)


def pack_media(payload: Column, media_type: str, uri: Column | None = None) -> Column:
    """Build the typed metadata struct for a binary payload column."""
    return F.struct(
        F.lit(media_type).alias("media_type"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("checksum_md5"),
        (uri if uri is not None else F.lit(None).cast("string")).alias("uri"),
    )


def decode_bmp(payload: bytes) -> dict:
    """REAL image decode for the one container the standard library can
    parse: uncompressed BMP (BITMAPINFOHEADER).  Returns width/height/
    bits-per-pixel and mean pixel brightness (0..1) over the pixel
    array.  Pure struct math — no media libraries."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    pixels = payload[data_offset:]
    brightness = (sum(pixels) / len(pixels) / 255.0) if pixels else 0.0
    return {
        "width": int(width),
        "height": abs(int(height)),  # negative height = top-down rows
        "bits_per_pixel": int(bpp),
        "brightness": float(brightness),
    }


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode via the stdlib ``wave`` module: channels, sample
    width/rate, frame count, duration, and the RMS amplitude (0..1) of
    16-bit PCM frames.  No media libraries."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    rms = None
    if sampwidth == 2 and frames:
        samples = struct.unpack(f"<{len(frames) // 2}h", frames)
        rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0
    return {
        "channels": channels,
        "sample_width": sampwidth,
        "frame_rate": framerate,
        "n_frames": n_frames,
        "duration_seconds": n_frames / framerate if framerate else 0.0,
        "rms": rms,
    }


def decode_image(payload: bytes) -> dict:
    """Image decode: REAL for uncompressed BMP (stdlib struct parsing,
    ``decode_bmp``); compressed formats (JPEG/PNG/...) genuinely need
    pillow/opencv, which are not available here — a production
    deployment plugs its decoder into ``extract_features`` below and
    nothing else changes (same schema, same Arrow batching)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    raise NotImplementedError(
        "only BMP decodes without image libraries; plug a real decoder "
        "into extract_features for JPEG/PNG"
    )


def decode_audio(payload: bytes) -> dict:
    """Audio decode: REAL for RIFF/WAVE PCM (stdlib ``wave``,
    ``decode_wav``); compressed codecs (MP3/AAC/...) need external
    libraries — see decode_image."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    raise NotImplementedError(
        "only WAV decodes without audio libraries; plug a real decoder "
        "into extract_features for compressed codecs"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in decoder: derives pseudo width/height/brightness
    from the bytes.  Exercises the full plumbing without media libs."""
    n = len(payload)
    head = payload[:16]
    s = sum(head)
    return {
        "width": 64 + (s % 192),
        "height": 64 + ((s * 31) % 192),
        "brightness": float(s % 256) / 255.0 if n else 0.0,
    }


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("brightness", T.DoubleType()),
    ]
)


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", decoder=fake_decode
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: the decoder sees pandas Series of bytes; output schema is
    fixed (FEATURES_SCHEMA) so Catalyst can prune/push around the stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(lambda b: decoder(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": feats.map(lambda f: f["width"]).astype("int32"),
                    "height": feats.map(lambda f: f["height"]).astype("int32"),
                    "brightness": feats.map(lambda f: f["brightness"]).astype("float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_len", T.LongType()),
        T.StructField("resized_len", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, factor: int, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Resize stage — STUB semantics, real plumbing.  A production
    deployment decodes + resamples pixels; here "resize by factor k" keeps
    every k-th byte (deterministic, length ceil(n/k)).  The Spark shape is
    what matters: Arrow-batched mapInPandas, binary in → binary out, zero
    shuffle, output schema fixed so downstream pruning works."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1, got {factor}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw = pdf[payload_col].map(bytes)
            resized = raw.map(lambda b: b[::factor])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "orig_len": raw.map(len).astype("int64"),
                    "resized_len": resized.map(len).astype("int64"),
                    "resized": resized,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, RESIZE_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_len", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    every: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame sampling — STUB semantics, real plumbing.  The payload
    is treated as concatenated fixed-size frames of ``frame_bytes``; every
    ``every``-th frame (0, every, 2·every, …) is emitted as its own row.

    This is the row-EXPANDING mapInPandas shape (1 video in, k frames out)
    a real frame sampler needs: output cardinality is decided inside the
    Arrow batch, no explode/join, no shuffle; frames inherit the input's
    partitioning so a downstream per-frame featurizer chains shuffle-free."""
    if frame_bytes < 1 or every < 1:
        raise ValueError("frame_bytes and every must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_len, out_frame = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_len.append(len(chunk))
                    out_frame.append(chunk)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "frame_index": pd.Series(out_idx, dtype="int32"),
                    "frame_len": pd.Series(out_len, dtype="int64"),
                    "frame": pd.Series(out_frame, dtype="object"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, FRAMES_SCHEMA)
