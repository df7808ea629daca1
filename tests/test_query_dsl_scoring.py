"""more_like_this and function_score unit tests: term selection, msm
forms, modifier math, filter-gated functions, score_mode, min_score, and
rejection paths."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.query_dsl import (
    QueryDslError,
    compile_function_score,
    compile_query,
    function_score,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(id=1, text="hash join over sorted keys"),
            Row(id=2, text="query planning and hash tables"),
            Row(id=3, text="window functions only"),
        ]
    )


def test_mlt_min_term_freq_and_msm(docs):
    # like-text tf: hash=2, join=2, query=1 -> terms {hash, join}; msm=2
    dsl = {
        "more_like_this": {
            "fields": ["text"],
            "like": "hash join hash join query",
            "min_term_freq": 2,
            "minimum_should_match": 2,
        }
    }
    got = [r["id"] for r in docs.filter(compile_query(dsl)).collect()]
    assert got == [1]  # only doc 1 has both hash AND join


def test_mlt_percentage_msm(docs):
    # terms {hash, join}; 50% of 2 -> 1 required
    dsl = {
        "more_like_this": {
            "fields": ["text"],
            "like": "hash join hash join",
            "minimum_should_match": "50%",
        }
    }
    got = sorted(r["id"] for r in docs.filter(compile_query(dsl)).collect())
    assert got == [1, 2]


def test_mlt_no_qualifying_terms_matches_nothing(docs):
    dsl = {"more_like_this": {"fields": ["text"], "like": "hash join"}}  # tf 1 < 2
    assert docs.filter(compile_query(dsl)).count() == 0


def test_mlt_requires_fields_and_like():
    with pytest.raises(QueryDslError, match="fields and like"):
        compile_query({"more_like_this": {"like": "x"}})


@pytest.fixture(scope="module")
def orders(spark):
    return spark.createDataFrame(
        [
            Row(k=1, price=100.0, pri="1-URGENT"),
            Row(k=2, price=400.0, pri="5-LOW"),
            Row(k=3, price=None, pri="1-URGENT"),
        ]
    )


def test_fvf_modifiers_and_missing(orders):
    body = {
        "functions": [
            {
                "field_value_factor": {
                    "field": "price",
                    "factor": 2.0,
                    "modifier": "sqrt",
                    "missing": 9.0,
                }
            }
        ]
    }
    got = {r["k"]: r["score"] for r in function_score(orders, body).collect()}
    assert got[1] == pytest.approx(math.sqrt(200.0))
    assert got[3] == pytest.approx(math.sqrt(18.0))  # missing -> 9.0


def test_log_modifiers_are_base10(orders):
    body = {"field_value_factor": {"field": "price", "modifier": "log"}}
    got = {r["k"]: r["score"] for r in function_score(orders, body).collect()}
    assert got[2] == pytest.approx(math.log10(400.0))


def test_filter_gated_weight_and_multiply_mode(orders):
    body = {
        "functions": [
            {"field_value_factor": {"field": "price", "missing": 1.0}},
            {"weight": 10.0, "filter": {"term": {"pri": "1-URGENT"}}},
        ],
        "score_mode": "multiply",
    }
    got = {r["k"]: r["score"] for r in function_score(orders, body).collect()}
    assert got[1] == pytest.approx(1000.0)  # 100 * 10
    assert got[2] == pytest.approx(400.0)  # filtered function -> neutral 1


def test_min_score_gates_predicate(orders):
    body = {
        "field_value_factor": {"field": "price", "missing": 0.0},
        "min_score": 150.0,
    }
    assert [r["k"] for r in function_score(orders, body).collect()] == [2]


def test_script_score_painless_lite(orders):
    body = {
        "functions": [
            {"script_score": {"script": "doc['price'].value * 3 + 1"}}
        ]
    }
    got = {r["k"]: r["score"] for r in function_score(orders, body).collect()}
    assert got[1] == pytest.approx(301.0)


def test_unsupported_score_mode_rejected():
    with pytest.raises(QueryDslError, match="score_mode"):
        compile_function_score(
            {"functions": [{"weight": 1.0}], "score_mode": "avg"}
        )


def test_decay_functions_match_closed_forms(spark):
    df = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(6)])
    for kind, expect_at_scale in (("gauss", 0.5), ("exp", 0.5), ("linear", 0.5)):
        body = {kind: {"v": {"origin": 0.0, "scale": 2.0, "decay": 0.5}}}
        got = {r["k"]: r["score"] for r in function_score(df, body).collect()}
        assert got[0] == pytest.approx(1.0)  # at the origin
        assert got[2] == pytest.approx(expect_at_scale)  # at distance=scale
        assert got[4] < got[2] < got[0]  # monotone falloff


def test_decay_offset_is_flat_zone(spark):
    df = spark.createDataFrame([Row(k=1, v=1.0), Row(k=2, v=3.0)])
    body = {"gauss": {"v": {"origin": 0.0, "scale": 2.0, "offset": 1.0}}}
    got = {r["k"]: r["score"] for r in function_score(df, body).collect()}
    assert got[1] == pytest.approx(1.0)  # inside the offset: no decay


def test_decay_rejects_bad_params(spark):
    with pytest.raises(QueryDslError, match="decay"):
        compile_function_score(
            {"functions": [{"gauss": {"v": {"origin": 0, "scale": 0, "decay": 0.5}}}]}
        )


def test_phrase_slop_in_order_gaps(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="quick brown fox"),      # quick..fox gap 1
            Row(id=2, text="quick red brown fox"),  # gap 2
            Row(id=3, text="fox quick"),            # out of order
            Row(id=4, text="quick a b c fox"),      # gap 3
        ]
    )

    def hits(slop):
        dsl = {"match_phrase": {"text": {"query": "quick fox", "slop": slop}}}
        return sorted(r["id"] for r in df.filter(compile_query(dsl)).collect())

    assert hits(0) == []
    assert hits(1) == [1]
    assert hits(2) == [1, 2]
    assert hits(3) == [1, 2, 4]


def test_phrase_slop_three_terms(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="a x b y c"),  # total gap 2
            Row(id=2, text="a b c"),      # gap 0
            Row(id=3, text="c b a"),      # reversed
        ]
    )
    dsl = {"match_phrase": {"text": {"query": "a b c", "slop": 2}}}
    assert sorted(r["id"] for r in df.filter(compile_query(dsl)).collect()) == [1, 2]


def test_phrase_slop_zero_equals_containment(spark):
    df = spark.createDataFrame([Row(id=1, text="alpha beta gamma")])
    dsl0 = {"match_phrase": {"text": {"query": "alpha beta", "slop": 0}}}
    assert df.filter(compile_query(dsl0)).count() == 1


def test_rank_feature_saturation_log_sigmoid(spark):
    df = spark.createDataFrame([Row(k=1, f=2.0), Row(k=2, f=0.0), Row(k=3, f=None)])
    sat = {"functions": [{"rank_feature": {"field": "f", "saturation": {"pivot": 2.0}}}]}
    got = {r["k"]: r["score"] for r in function_score(df, sat).collect()}
    assert got[1] == pytest.approx(0.5)  # 2/(2+2)
    assert got[2] == 0.0 and got[3] == 0.0  # non-positive/missing -> 0

    lg = {"functions": [{"rank_feature": {"field": "f", "log": {"scaling_factor": 1.0}}}]}
    got = {r["k"]: r["score"] for r in function_score(df, lg).collect()}
    assert got[1] == pytest.approx(math.log(3.0))

    sg = {
        "functions": [
            {"rank_feature": {"field": "f", "sigmoid": {"pivot": 2.0, "exponent": 2.0}}}
        ]
    }
    got = {r["k"]: r["score"] for r in function_score(df, sg).collect()}
    assert got[1] == pytest.approx(4.0 / (4.0 + 4.0))


def test_rank_feature_saturation_requires_pivot(spark):
    with pytest.raises(QueryDslError, match="pivot"):
        compile_function_score(
            {"functions": [{"rank_feature": {"field": "f", "saturation": {}}}]}
        )


def test_distance_feature_numeric_and_predicate(spark):
    df = spark.createDataFrame([Row(k=1, f=10.0), Row(k=2, f=30.0), Row(k=3, f=None)])
    body = {
        "query": {"distance_feature": {"field": "f", "origin": 10.0, "pivot": 5.0}},
        "distance_feature": {"field": "f", "origin": 10.0, "pivot": 5.0},
    }
    got = {r["k"]: r["score"] for r in function_score(df, body).collect()}
    assert set(got) == {1, 2}  # predicate drops the null-field row
    assert got[1] == pytest.approx(1.0)  # at the origin
    assert got[2] == pytest.approx(5.0 / 25.0)
