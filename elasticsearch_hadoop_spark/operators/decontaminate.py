"""Benchmark decontamination for LLM training corpora: flag training
documents sharing word-n-gram shingles with an evaluation/benchmark set
(the standard train/test-contamination check run before pretraining — the
GPT-3 paper's 13-gram overlap filter is this exact shape).

Not a reference-engine capability: part of the driver-mandated
LLM-pipeline extension set (SURVEY.md §2.C extensions), composed from the
same shingle machinery the dedup operators use (operators/dedup.shingles —
md5-reproducible, so the DuckDB oracle replays it exactly).

Design for 100 TB:
- The benchmark side is small (eval suites are megabytes): its distinct
  gram set broadcasts, so the contaminated-gram count is a broadcast
  semi-join on the exploded corpus grams — map-side, no corpus shuffle.
- The only shuffle is the per-doc groupBy of matched grams, whose input is
  bounded by the match mass (tiny unless the corpus really is
  contaminated), not the corpus gram count.
- Gram explosion is a Catalyst generator over the let-bound token array —
  no Python, no re-tokenization per gram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.operators.dedup import shingles


def contamination_report(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
    n: int = 3,
    broadcast_bench: bool = True,
) -> DataFrame:
    """Per contaminated training document: total distinct n-gram count,
    how many of those grams appear anywhere in the benchmark set, and the
    contamination ratio.  Documents with zero overlap are omitted (the
    overwhelmingly common case — keeps the result proportional to the
    contamination, not the corpus).

    The downstream action is typically ``filter(ratio >= threshold)`` ->
    drop list, mirroring duplicate_clusters' keeper semantics."""
    bench_text_col = bench_text_col or text_col
    doc_grams = docs.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    )
    bench_grams = bench.select(
        F.explode(shingles(F.col(bench_text_col), n)).alias("gram")
    ).distinct()
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_grams.join(bench_grams, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = docs.select(
        F.col(id_col), F.size(shingles(F.col(text_col), n)).alias("n_grams")
    )
    return (
        totals.join(hits, id_col, "inner")  # zero-overlap docs drop here
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            (F.col("n_contaminated") / F.col("n_grams")).alias("ratio"),
        )
    )
