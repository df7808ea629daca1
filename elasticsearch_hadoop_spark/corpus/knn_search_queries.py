"""Corpus: the ES knn search block, rescore, and the pinned / wrapper /
script query clauses (search.py, query_dsl.py)."""

from __future__ import annotations

import base64
import json

from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.corpus import query
from elasticsearch_hadoop_spark.corpus._util import tbl
from elasticsearch_hadoop_spark.query_dsl import compile_query
from elasticsearch_hadoop_spark.search import knn_search, pinned_order, rescore

_QVEC_SQL = "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"


@query(
    "search_knn_filtered",
    oracle=f"""
SELECT vec_id, label,
       round((1 + list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL})) / 2, 6) AS score
FROM embeddings
WHERE label >= 2
ORDER BY (1 + list_cosine_similarity(embedding::DOUBLE[], {_QVEC_SQL})) / 2 DESC, vec_id
LIMIT 10
""",
)
def search_knn_filtered(spark, sf_dir):
    """ES `_search` knn block with a pre-filter: the query-DSL filter
    applies BEFORE ranking (ES semantics), cosine scored as (1+cos)/2
    (ES's published transform), top-10 as a TakeOrderedAndProject.
    The exact endpoint path; IVF/LSH (operators/similarity) is the
    approximate twin at scale."""
    emb = tbl(spark, sf_dir, "embeddings")
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    out = knn_search(
        emb,
        {
            "field": "embedding",
            "query_vector": qv,
            "k": 10,
            "num_candidates": 100,
            "similarity": "cosine",
            "filter": {"range": {"label": {"gte": 2}}},
        },
        tiebreaker="vec_id",
    )
    return out.select("vec_id", "label", F.round("_score", 6).alias("score"))


@query(
    "search_rescore_window",
    oracle="""
WITH win AS (
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice * 0.001 DESC, o_orderkey
    LIMIT 50
)
SELECT o_orderkey,
       round(o_totalprice * 0.001
             + 2.0 * (CASE WHEN o_orderpriority = '1-URGENT' THEN 1.0 ELSE 0.0 END),
             6) AS score
FROM win
ORDER BY score DESC, o_orderkey
""",
)
def search_rescore_window(spark, sf_dir):
    """ES rescore: top-50 window by the cheap initial score, then a
    secondary query re-ranks ONLY those 50 (query_weight/
    rescore_query_weight, score_mode total).  The window is a
    TakeOrderedAndProject; the costlier scoring never touches the tail —
    the entire point of rescoring at 100 TB."""
    o = tbl(spark, sf_dir, "orders").withColumn(
        "score", F.col("o_totalprice") * F.lit(0.001)
    )
    out = rescore(
        o,
        "score",
        {
            "window_size": 50,
            "query": {
                "rescore_query": {"term": {"o_orderpriority": "1-URGENT"}},
                "query_weight": 1.0,
                "rescore_query_weight": 2.0,
                "score_mode": "total",
            },
        },
        tiebreaker="o_orderkey",
    )
    return out.select("o_orderkey", F.round("score", 6).alias("score")).orderBy(
        F.col("score").desc(), "o_orderkey"
    )


@query(
    "query_dsl_pinned_wrapper",
    oracle="""
WITH base AS (
    SELECT o_orderkey, o_totalprice,
           CASE o_orderkey WHEN 7 THEN 0 WHEN 21 THEN 1 WHEN 42 THEN 2
                ELSE 3 END AS pin
    FROM orders
    WHERE o_orderkey IN (7, 21, 42) OR o_totalprice >= 400000.0::DOUBLE
)
SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
FROM base
ORDER BY pin, o_totalprice DESC, o_orderkey
LIMIT 15
""",
)
def query_dsl_pinned_wrapper(spark, sf_dir):
    """`pinned` promoted ids over a `wrapper` (base64-embedded) organic
    query: filter = ids OR organic, ordering = declared pin order first
    then the organic sort — the pin rank is a CASE over three literals,
    no join, and the page is a TakeOrderedAndProject."""
    o = tbl(spark, sf_dir, "orders")
    organic = {"range": {"o_totalprice": {"gte": 400000.0}}}
    wrapped = {
        "wrapper": {
            "query": base64.b64encode(json.dumps(organic).encode()).decode()
        }
    }
    ids = [7, 21, 42]
    dsl = {"pinned": {"ids": ids, "organic": wrapped}}
    hits = o.filter(compile_query(dsl, id_col="o_orderkey"))
    page = pinned_order(
        hits,
        ids,
        organic_sort=[{"o_totalprice": "desc"}, {"o_orderkey": "asc"}],
        id_col="o_orderkey",
        size=15,
    )
    return page.select("o_orderkey", F.round("o_totalprice", 2).alias("o_totalprice"))


@query(
    "query_dsl_script_filter",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_quantity * l_extendedprice, 2) AS line_value
FROM lineitem
WHERE l_quantity * l_extendedprice > 900000.0::DOUBLE AND l_discount < 0.03
ORDER BY l_orderkey, l_linenumber
""",
)
def query_dsl_script_filter(spark, sf_dir):
    """ES `script` query: a painless-lite boolean over two doc fields
    compiles to one codegen predicate — no Python, no UDF; conjunct
    l_discount < 0.03 stays independently pushable to parquet."""
    li = tbl(spark, sf_dir, "lineitem")
    dsl = {
        "script": {
            "script": {
                "source": "doc['l_quantity'].value * doc['l_extendedprice'].value"
                " > 900000.0 && doc['l_discount'].value < 0.03"
            }
        }
    }
    return (
        li.filter(compile_query(dsl))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_quantity") * F.col("l_extendedprice"), 2).alias(
                "line_value"
            ),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
