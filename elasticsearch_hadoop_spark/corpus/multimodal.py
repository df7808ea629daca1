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
from elasticsearch_hadoop_spark.operators.multimodal import extract_features, pack_media


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


@query("multimodal_features", oracle=None)
def multimodal_features(spark, sf_dir):
    """mapInPandas decode/feature pipeline over binary payloads with the
    deterministic fake decoder (real decoders are stubbed —
    operators/multimodal.py).  Rows-only check: pandas-UDF stage has no SQL
    twin; determinism is asserted in tests/test_multimodal.py."""
    d = tbl(spark, sf_dir, "documents")
    binary = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return extract_features(binary).orderBy("doc_id")
