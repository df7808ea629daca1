"""Sources: JSON-document ingestion with the ES->Spark type mapping
(SURVEY.md §1.2) — the engine's A4/A8 deserialization + schema-discovery
parity layer.  Parquet/CSV need no veneer: ``spark.read`` is already the
native partitioned columnar scan (A1)."""

from elasticsearch_hadoop_spark.sources.json_docs import (
    mapping_to_struct,
    parse_array_includes,
    read_json_docs,
)

__all__ = ["mapping_to_struct", "parse_array_includes", "read_json_docs"]
