"""ES percolator: store queries, match documents against them.

ES reverses search with the ``percolate`` query: an index holds query-DSL
documents, and a candidate document returns the ids of every stored query
it matches.  The engine loads a shard's percolator queries into memory
and runs each against the in-flight doc — the query SET is assumed
small; the document stream is the big side.

Same shape here, Spark-first: the stored queries are collected once
(driver-bounded like ES's per-shard percolator memory — ``max_queries``
guards it), each compiles to a Column predicate via
query_dsl.compile_query, and ONE projection over the document frame
evaluates all of them: a labels array of ``when(pred_i, id_i)`` entries,
filtered and exploded.  One scan of the documents regardless of query
count, all predicates inside whole-stage codegen — the 100 TB direction
(billions of docs × hundreds of alert queries) is exactly what this
compiles well for.

Reference surface: ES percolate query / percolator field type
(SURVEY.md §2.C query-DSL veneer — the reference connector itself never
percolates; this closes the same user-visible gap aggs_dsl does).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query

MAX_QUERIES = 10_000


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    *,
    query_col: str = "query",
    query_id_col: str = "_id",
    keep_cols: list[str] | None = None,
    max_queries: int = MAX_QUERIES,
) -> DataFrame:
    """Match every document against every stored query: one output row
    per (doc, matched query id), ``matched_query`` holding the id — the
    flat rendering of ES's percolate response.

    ``queries`` rows carry the query-DSL JSON (dict-typed string) in
    ``query_col`` and their id in ``query_id_col``.  ``keep_cols``
    selects the doc columns to carry through (default: all).
    """
    q_rows = queries.select(query_id_col, query_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise QueryDslError(
            f"percolate: more than {max_queries} stored queries — raise "
            "max_queries explicitly if the driver can hold them (ES keeps "
            "a shard's percolator queries in memory the same way)"
        )
    if not q_rows:
        raise QueryDslError("percolate: no stored queries")
    labels = []
    for r in q_rows:
        body = r[query_col]
        if isinstance(body, str):
            body = json.loads(body)
        labels.append(
            F.when(compile_query(body), F.lit(str(r[query_id_col])))
        )
    matched = F.filter(F.array(*labels), lambda x: x.isNotNull())
    cols = keep_cols if keep_cols is not None else docs.columns
    return (
        docs.withColumn("__matched", matched)
        .filter(F.size("__matched") > 0)
        .select(*cols, F.explode("__matched").alias("matched_query"))
    )
