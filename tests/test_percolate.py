"""ES percolator: documents matched against stored query-DSL documents
in one scan (operators/percolate.py)."""

from __future__ import annotations

import json

import pytest

from elasticsearch_hadoop_spark.operators.percolate import percolate
from elasticsearch_hadoop_spark.query_dsl import QueryDslError


def test_percolate_matches_stored_queries(spark):
    docs = spark.createDataFrame(
        [(1, "error in system", 10.0), (2, "all fine", 3.0), (3, "error minor", 1.0)],
        ["id", "msg", "sev"],
    )
    queries = spark.createDataFrame(
        [
            ("q_err", json.dumps({"match": {"msg": "error"}})),
            ("q_sev", json.dumps({"range": {"sev": {"gte": 5}}})),
            ("q_both", json.dumps({"bool": {"must": [
                {"match": {"msg": "error"}},
                {"range": {"sev": {"gte": 5}}},
            ]}})),
        ],
        ["_id", "query"],
    )
    out = percolate(docs, queries).collect()
    got = sorted((r["id"], r["matched_query"]) for r in out)
    assert got == [(1, "q_both"), (1, "q_err"), (1, "q_sev"), (3, "q_err")]


def test_percolate_guards(spark):
    docs = spark.createDataFrame([(1,)], ["id"])
    empty_q = spark.createDataFrame([], "id string, query string")
    with pytest.raises(QueryDslError, match="no stored queries"):
        percolate(docs, empty_q, query_id_col="id")
    many = spark.createDataFrame(
        [(str(i), json.dumps({"term": {"id": i}})) for i in range(5)],
        ["id", "query"],
    )
    with pytest.raises(QueryDslError, match="more than"):
        percolate(docs, many, query_id_col="id", max_queries=3)


def test_percolate_keep_cols(spark):
    docs = spark.createDataFrame([(1, "x", "error")], ["id", "extra", "msg"])
    queries = spark.createDataFrame(
        [("q", json.dumps({"match": {"msg": "error"}}))], ["_id", "query"]
    )
    out = percolate(docs, queries, keep_cols=["id"]).collect()
    assert out[0].asDict() == {"id": 1, "matched_query": "q"}
