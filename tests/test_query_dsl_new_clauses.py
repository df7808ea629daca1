"""Edge semantics of the round-4 late query-DSL clauses: multi_match,
dis_max, boosting, terms_set, match_phrase_prefix, match_none,
simple_query_string.  The oracle-parity suite covers the fixture-scale
behavior; these pin the corners (short docs, missing fields, thresholds)."""

from __future__ import annotations

import pytest

from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox", "news", 1),
        (2, "quick foxtrot", "blog", 2),
        (3, None, "quick", 1),
        (4, "fox", "news", 3),
        (5, "slow brown foxhound dances", None, 0),
    ]
    return spark.createDataFrame(rows, "id int, text string, src string, k int")


def ids(df, pred):
    return sorted(r.id for r in df.filter(pred).select("id").collect())


def test_multi_match_best_fields_or(docs):
    p = compile_query({"multi_match": {"query": "quick", "fields": ["text", "src"]}})
    assert ids(docs, p) == [1, 2, 3]  # src carries 'quick' for id=3


def test_multi_match_cross_fields_and(docs):
    p = compile_query(
        {
            "multi_match": {
                "query": "quick news",
                "fields": ["text", "src"],
                "type": "cross_fields",
                "operator": "and",
            }
        }
    )
    # every token in at least one field: id=1 (quick@text, news@src)
    assert ids(docs, p) == [1]


def test_multi_match_phrase(docs):
    p = compile_query(
        {"multi_match": {"query": "brown fox", "fields": ["text"], "type": "phrase"}}
    )
    assert ids(docs, p) == [1]  # 'foxhound' (id=5) is not token 'fox'


def test_dis_max_is_disjunction(docs):
    p = compile_query(
        {
            "dis_max": {
                "queries": [{"term": {"src": "blog"}}, {"term": {"k": 3}}],
                "tie_breaker": 0.7,
            }
        }
    )
    assert ids(docs, p) == [2, 4]


def test_boosting_matches_positive_only(docs):
    p = compile_query(
        {
            "boosting": {
                "positive": {"range": {"k": {"gte": 1}}},
                "negative": {"term": {"src": "news"}},
                "negative_boost": 0.1,
            }
        }
    )
    # negative demotes, never excludes: news rows stay in
    assert ids(docs, p) == [1, 2, 3, 4]


def test_terms_set_per_doc_threshold(spark):
    rows = [
        (1, ["a", "b", "c"], 2),
        (2, ["a"], 2),
        (3, ["b", "c"], 1),
        (4, ["x"], 1),
        (5, ["a", "a", "b"], 2),  # duplicate field values count once
    ]
    df = spark.createDataFrame(rows, "id int, tags array<string>, req int")
    p = compile_query(
        {
            "terms_set": {
                "tags": {"terms": ["a", "b"], "minimum_should_match_field": "req"}
            }
        }
    )
    assert sorted(r.id for r in df.filter(p).collect()) == [1, 3, 5]
    p2 = compile_query(
        {"terms_set": {"tags": {"terms": ["a", "b"], "minimum_should_match": 1}}}
    )
    assert sorted(r.id for r in df.filter(p2).collect()) == [1, 2, 3, 5]


def test_match_phrase_prefix(docs):
    p = compile_query({"match_phrase_prefix": {"text": "brown fox"}})
    # 'brown fox' and 'brown foxhound' both match (last term is a prefix);
    # 'quick foxtrot' lacks 'brown'; doc shorter than the phrase never errors
    assert ids(docs, p) == [1, 5]
    single = compile_query({"match_phrase_prefix": {"text": "foxt"}})
    assert ids(docs, single) == [2]


def test_match_none(docs):
    assert ids(docs, compile_query({"match_none": {}})) == []


def test_simple_query_string_operators(docs):
    p = compile_query(
        {
            "simple_query_string": {
                "query": '"brown fox" | foxt* -slow',
                "fields": ["text"],
                "default_operator": "and",
            }
        }
    )
    # (phrase OR foxt-prefix) AND NOT slow -> ids 1, 2 (5 has 'slow')
    assert ids(docs, p) == [1, 2]


def test_simple_query_string_rejects_unspaced_ops(docs):
    with pytest.raises(QueryDslError):
        compile_query(
            {"simple_query_string": {"query": "a|b", "fields": ["text"]}}
        )


def test_multi_match_requires_fields():
    with pytest.raises(QueryDslError):
        compile_query({"multi_match": {"query": "x", "fields": []}})
