"""Sequence-packing corpus (training-data-pipeline extension,
operators/packing.py): documents are chunked into fixed-budget training
sequences per language via window prefix sums — fully hash-checked, the
window math is identical SQL on both engines."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.operators.packing import pack_sequences

_BUDGET = 4096

_PREFIX = (
    "coalesce(sum(n_chars) OVER (PARTITION BY lang ORDER BY doc_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
)


@query(
    "pack_sequences_by_lang",
    oracle=f"""
SELECT doc_id, lang, n_chars,
       CAST(floor({_PREFIX} / {_BUDGET}) AS BIGINT) AS pack_id,
       CAST({_PREFIX} % {_BUDGET} AS BIGINT) AS pack_offset
FROM documents
ORDER BY doc_id
""",
)
def pack_sequences_by_lang(spark, sf_dir):
    """Concat-and-chunk packing: per language, documents concatenate in
    doc_id order and slice into 4096-char training sequences; each doc
    reports the pack containing its first char and its offset there.  One
    window shuffle per language partition — no global sort, no UDF."""
    d = tbl(spark, sf_dir, "documents")
    out = pack_sequences(d, cost_col="n_chars", budget=_BUDGET, order_col="doc_id", partition_col="lang")
    return out.select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("pack_id").cast("bigint").alias("pack_id"),
        F.col("pack_offset").cast("bigint").alias("pack_offset"),
    ).orderBy("doc_id")


@query(
    "pack_utilization",
    oracle=f"""
WITH packed AS (
  SELECT lang, CAST(floor({_PREFIX} / {_BUDGET}) AS BIGINT) AS pack_id, n_chars
  FROM documents
)
SELECT lang, count(DISTINCT pack_id) AS n_packs,
       CAST(count(*) AS BIGINT) AS n_docs,
       round(sum(n_chars) / (count(DISTINCT pack_id) * {_BUDGET}.0), 6) AS fill_ratio
FROM packed
GROUP BY lang
ORDER BY lang
""",
)
def pack_utilization(spark, sf_dir):
    """Packing efficiency rollup: packs per language and fill ratio
    (chars packed / capacity) — the metric a pipeline tunes budget against.
    Composes the packer with a plain aggregate; still one window + one
    agg shuffle."""
    d = tbl(spark, sf_dir, "documents")
    packed = pack_sequences(d, cost_col="n_chars", budget=_BUDGET, order_col="doc_id", partition_col="lang")
    return (
        packed.groupBy("lang")
        .agg(
            F.countDistinct("pack_id").alias("n_packs"),
            F.count("*").alias("n_docs"),
            F.round(
                F.sum("n_chars") / (F.countDistinct("pack_id") * float(_BUDGET)), 6
            ).alias("fill_ratio"),
        )
        .orderBy("lang")
    )
