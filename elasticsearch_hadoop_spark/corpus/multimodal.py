"""Multimodal-column corpus.  The fixtures carry no real media, so the
binary payload is derived deterministically from documents.text (utf-8
encode) — which keeps the full binary-column path (BinaryType, metadata
struct, md5 checksums, byte math) oracle-checkable in DuckDB.
The mapInPandas decode stage (operators/multimodal.py) is exercised by
tests and by the rows-only entry below (pandas UDFs obviously have no SQL
twin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.multimodal import (
    extract_features,
    pack_media,
    resize_media,
    sample_frames,
)


@query(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       'image/fake' AS media_type,
       CAST(strlen(text) AS BIGINT) AS n_bytes,
       md5(text) AS checksum_md5,
       concat('mem://documents/', CAST(doc_id AS VARCHAR)) AS uri
FROM documents
ORDER BY doc_id
""",
)
def multimodal_metadata(spark, sf_dir):
    """Binary payload + typed metadata struct (flattened for the oracle):
    byte length + md5 checksum over the payload bytes."""
    d = tbl(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    uri = F.concat(F.lit("mem://documents/"), F.col("doc_id").cast("string"))
    meta = pack_media(payload, "image/fake", uri)
    return (
        d.select("doc_id", meta.alias("m"))
        .select(
            "doc_id",
            F.col("m.media_type").alias("media_type"),
            F.col("m.n_bytes").alias("n_bytes"),
            F.col("m.checksum_md5").alias("checksum_md5"),
            F.col("m.uri").alias("uri"),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_features",
    oracle="""
WITH b AS (SELECT doc_id, encode(text) AS p FROM documents),
s AS (
  SELECT doc_id, CAST(octet_length(p) AS BIGINT) AS n_bytes,
         coalesce(list_sum(list_transform(range(least(octet_length(p), 16)),
           j -> (strpos('0123456789abcdef', substr(lower(hex(p)), 2*j+1, 1)) - 1) * 16
              + (strpos('0123456789abcdef', substr(lower(hex(p)), 2*j+2, 1)) - 1))), 0) AS s
  FROM b)
SELECT doc_id, n_bytes,
       CAST(64 + (s % 192) AS INTEGER) AS width,
       CAST(64 + ((s * 31) % 192) AS INTEGER) AS height,
       round(CASE WHEN n_bytes = 0 THEN 0.0 ELSE (s % 256) / 255.0 END, 6) AS brightness
FROM s
ORDER BY doc_id
""",
)
def multimodal_features(spark, sf_dir):
    """mapInPandas decode/feature pipeline over binary payloads with the
    deterministic fake decoder (real decoders are stubbed —
    operators/multimodal.py).  fake_decode derives width/height/brightness
    from the sum of the payload's first 16 bytes, which the oracle
    reproduces byte-for-byte in DuckDB by hex-parsing the blob — so the
    pandas-UDF stage IS value-hashed end to end (formerly the registry's
    last rows-only query); exact-bytes determinism is additionally pinned
    in tests/test_multimodal.py."""
    d = tbl(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return (
        extract_features(binary)
        .select(
            "doc_id",
            "n_bytes",
            "width",
            "height",
            F.round("brightness", 6).alias("brightness"),
        )
        .orderBy("doc_id")
    )


@query(
    "multimodal_frame_sample",
    oracle="""
WITH sizes AS (
  SELECT doc_id, octet_length(encode(text)) AS n FROM documents
), idx AS (
  SELECT doc_id, n,
         unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT), 2)) AS fi
  FROM sizes
)
SELECT doc_id, CAST(fi AS INTEGER) AS frame_index,
       CAST(least(256, n - fi * 256) AS BIGINT) AS frame_len
FROM idx
ORDER BY doc_id, frame_index
""",
)
def multimodal_frame_sample(spark, sf_dir):
    """Row-expanding mapInPandas frame sampler (every 2nd 256-byte frame of
    the payload).  The frame BYTES can't be oracle-checked (DuckDB here has
    no blob substring/md5), so the hash-checked surface is the expansion
    itself — (doc_id, frame_index, frame_len) must match the closed-form
    integer math; exact frame bytes are pinned in tests/test_multimodal.py."""
    d = tbl(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    frames = sample_frames(binary, frame_bytes=256, every=2)
    return frames.select("doc_id", "frame_index", "frame_len").orderBy(
        "doc_id", "frame_index"
    )


@query(
    "multimodal_resize",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS orig_len,
       CAST(ceil(octet_length(encode(text)) / 4.0) AS BIGINT) AS resized_len
FROM documents
ORDER BY doc_id
""",
)
def multimodal_resize(spark, sf_dir):
    """Binary resize stage (stub semantics: keep every 4th byte).  Oracle
    checks the length contract ceil(n/4); exact output bytes are pinned in
    tests/test_multimodal.py."""
    d = tbl(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return resize_media(binary, factor=4).select(
        "doc_id", "orig_len", "resized_len"
    ).orderBy("doc_id")
