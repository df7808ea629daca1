"""Unit tests: knn search block, rescore, pinned ordering, and the
script / wrapper / pinned query clauses."""

import base64
import json

import pytest

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query
from elasticsearch_hadoop_spark.search import knn_search, pinned_order, rescore


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 1),
        (3, [1.0, 1.0], 1),
        (4, [-1.0, 0.0], 0),
    ]
    return spark.createDataFrame(rows, "vec_id int, v array<double>, label int")


def test_knn_similarities(spark):
    df = _vecs(spark)
    body = {"field": "v", "query_vector": [1.0, 0.0], "k": 2}
    got = knn_search(df, body, tiebreaker="vec_id").collect()
    assert [r["vec_id"] for r in got] == [1, 3]
    assert got[0]["_score"] == pytest.approx(1.0)  # (1+cos)/2, cos=1

    l2 = knn_search(df, {**body, "similarity": "l2_norm", "k": 1}).collect()
    assert l2[0]["vec_id"] == 1 and l2[0]["_score"] == pytest.approx(1.0)

    # vecs 1 and 3 both dot to 1.0 against [1,0] — the tiebreaker makes
    # the expectation deterministic (the flake showed up under local[4])
    dp = knn_search(
        df, {**body, "similarity": "dot_product", "k": 1}, tiebreaker="vec_id"
    ).collect()
    assert dp[0]["vec_id"] == 1 and dp[0]["_score"] == pytest.approx(1.0)

    with pytest.raises(ValueError):
        knn_search(df, {**body, "similarity": "hamming"})


def test_knn_filter_applies_before_ranking(spark):
    df = _vecs(spark)
    got = knn_search(
        df,
        {
            "field": "v",
            "query_vector": [1.0, 0.0],
            "k": 2,
            "filter": {"term": {"label": 1}},
        },
        tiebreaker="vec_id",
    ).collect()
    # vec 1 (the global best) is filtered out; ranking happens after
    assert [r["vec_id"] for r in got] == [3, 2]


def test_rescore_modes_and_window(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 8.0, "y"), (3, 6.0, "x"), (4, 1.0, "x")],
        "id int, score double, tag string",
    )
    body = {
        "window_size": 3,
        "query": {
            "rescore_query": {"term": {"tag": "x"}},
            "query_weight": 0.1,
            "rescore_query_weight": 5.0,
            "score_mode": "total",
        },
    }
    got = rescore(df, "score", body, tiebreaker="id").collect()
    # window = ids 1,2,3 (id 4 outside); combined: 1 -> 6.0, 2 -> 0.8, 3 -> 5.6
    assert [r["id"] for r in got] == [1, 3, 2]
    assert got[0]["score"] == pytest.approx(6.0)
    with pytest.raises(ValueError):
        rescore(df, "score", {"query": {}})


def test_pinned_order_and_clause(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 50.0), (3, 40.0), (4, 30.0)], "id int, p double"
    )
    dsl = {"pinned": {"ids": [4, 1], "organic": {"range": {"p": {"gte": 40.0}}}}}
    hits = df.filter(compile_query(dsl, id_col="id"))
    assert {r["id"] for r in hits.collect()} == {1, 2, 3, 4}
    page = pinned_order(hits, [4, 1], [{"p": "desc"}], id_col="id", size=3)
    assert [r["id"] for r in page.collect()] == [4, 1, 2]


def test_wrapper_and_script_clauses(spark):
    df = spark.createDataFrame([(1, 10.0), (2, 3.0)], "id int, v double")
    b64 = base64.b64encode(json.dumps({"range": {"v": {"gt": 5.0}}}).encode()).decode()
    assert [r["id"] for r in df.filter(compile_query({"wrapper": {"query": b64}})).collect()] == [1]
    with pytest.raises(QueryDslError):
        compile_query({"wrapper": {"query": "!!not-base64!!"}})
    script = {"script": {"script": {"source": "doc['v'].value * 2 > 10"}}}
    assert [r["id"] for r in df.filter(compile_query(script)).collect()] == [1]
