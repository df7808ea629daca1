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


def decode_image(payload: bytes) -> "object":
    """Real image decode — STUB: pillow/opencv are not available here.

    A production deployment plugs the real decoder into
    ``extract_features`` below; nothing else changes (same schema, same
    Arrow batching)."""
    raise NotImplementedError("image decoding libraries are not available in this environment")


def decode_audio(payload: bytes) -> "object":
    """Real audio decode — STUB (see decode_image)."""
    raise NotImplementedError("audio decoding libraries are not available in this environment")


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
