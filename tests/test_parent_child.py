"""ES join-field parent-child: has_child / has_parent / parent_id as
Spark semi-joins over a single join-field frame."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_hadoop_spark.operators.parent_child import (
    has_child,
    has_parent,
    parent_id,
    search_join_index,
)
from elasticsearch_hadoop_spark.query_dsl import QueryDslError, compile_query


@pytest.fixture()
def frame(spark):
    rows = [
        # parents (orders)
        ("o1", {"name": "order", "parent": None}, "F", None),
        ("o2", {"name": "order", "parent": None}, "O", None),
        ("o3", {"name": "order", "parent": None}, "F", None),
        # children (lines)
        ("l1", {"name": "line", "parent": "o1"}, None, 10.0),
        ("l2", {"name": "line", "parent": "o1"}, None, 50.0),
        ("l3", {"name": "line", "parent": "o2"}, None, 60.0),
        ("l4", {"name": "line", "parent": "o2"}, None, 70.0),
        ("l5", {"name": "line", "parent": "o3"}, None, 5.0),
    ]
    return spark.createDataFrame(
        rows,
        "_id string, join_field struct<name:string,parent:string>, "
        "status string, qty double",
    )


def test_parent_id_is_plain_filter(frame):
    got = sorted(r["_id"] for r in parent_id(frame, "line", "o2").collect())
    assert got == ["l3", "l4"]


def test_has_child_semi_join(frame):
    got = sorted(
        r["_id"]
        for r in has_child(frame, "line", {"range": {"qty": {"gte": 40}}}).collect()
    )
    assert got == ["o1", "o2"]


def test_has_child_min_max_children(frame):
    got = sorted(
        r["_id"]
        for r in has_child(
            frame, "line", {"range": {"qty": {"gte": 40}}}, min_children=2
        ).collect()
    )
    assert got == ["o2"]
    got2 = sorted(
        r["_id"]
        for r in has_child(frame, "line", min_children=1, max_children=1).collect()
    )
    assert got2 == ["o3"]


def test_has_parent(frame):
    got = sorted(
        r["_id"]
        for r in has_parent(
            frame, "order", {"term": {"status": "F"}}
        ).collect()
    )
    assert got == ["l1", "l2", "l5"]


def test_search_join_index_bool_mix(frame):
    got = sorted(
        r["_id"]
        for r in search_join_index(
            frame,
            {"bool": {"must": [
                {"has_parent": {"parent_type": "order",
                                "query": {"term": {"status": "F"}}}},
                {"range": {"qty": {"gte": 10}}},
            ]}},
        ).collect()
    )
    assert got == ["l1", "l2"]


def test_search_join_index_rejects_should_join_clause(frame):
    with pytest.raises(QueryDslError):
        search_join_index(
            frame,
            {"bool": {"should": [{"has_child": {"type": "line"}}]}},
        )


def test_compile_query_rejects_join_clauses():
    for q in (
        {"has_child": {"type": "line"}},
        {"has_parent": {"parent_type": "order"}},
        {"parent_id": {"type": "line", "id": "o1"}},
    ):
        with pytest.raises(QueryDslError):
            compile_query(q)
